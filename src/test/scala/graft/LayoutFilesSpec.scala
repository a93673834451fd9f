package graft

import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Round 18: pin the one-file-per-bucket-per-batch write layout (the
  * repartition-before-partitionBy policy, guide §6) — a regression back
  * to tasks×buckets small files multiplies every load's footer reads.
  */
class LayoutFilesSpec extends SparkSuite {
  import ops._

  private def filesUnder(p: String, suffix: String = ".parquet"): Long = {
    val w = Files.walk(Paths.get(p))
    try w.filter(f => Files.isRegularFile(f) &&
      f.getFileName.toString.endsWith(suffix)).count()
    finally w.close()
  }

  test("DedupIndex build lands at most one data file per bucket dir") {
    val docs = Tables.documents(spark, sf0001).localCheckpoint()
    val dir = graft.TempDirs.create("layout_dix") + "/ix"
    DedupIndex.write(spark, docs, dir)
    val bands = filesUnder(s"$dir/bands")
    val sigs = filesUnder(s"$dir/sigs")
    assert(bands <= 64, s"bands/ holds $bands data files (> 1 per bucket)")
    assert(sigs <= 64, s"sigs/ holds $sigs data files (> 1 per bucket)")
  }

  test("TextIndex build lands at most one data file per bucket dir") {
    val docs = Tables.documents(spark, sf0001).localCheckpoint()
    val dir = graft.TempDirs.create("layout_tix") + "/ix"
    TextIndex.writeDocs(spark, docs, dir)
    val postings = filesUnder(s"$dir/postings")
    val positions = filesUnder(s"$dir/positions")
    assert(postings <= 64, s"postings/ holds $postings data files")
    assert(positions <= 64, s"positions/ holds $positions data files")
  }

  test("delete lays exactly one tombstone ledger file per batch") {
    val docs = Tables.documents(spark, sf0001).localCheckpoint()
    val dir = graft.TempDirs.create("layout_tomb") + "/ix"
    DedupIndex.write(spark, docs, dir)
    DedupIndex.delete(spark, dir,
      docs.filter(col("doc_id") % 7 === 0).select(col("doc_id")))
    assert(filesUnder(s"$dir/tombstones") == 1)
    DedupIndex.delete(spark, dir,
      docs.filter(col("doc_id") % 11 === 0).select(col("doc_id")))
    assert(filesUnder(s"$dir/tombstones") == 2)
  }
}
