package graft

import graft.ops.Tombstones
import java.nio.file.Files

/** The epoch marker's crash-safety: writeEpoch stages at `epoch.tmp`
  * then delete-and-renames into place, and readEpoch falls back to the
  * staging copy — so no intermediate crash state can silently reset the
  * epoch to 0 (which would let later tombstones land at te=0, never
  * killing live rows, and re-appends land wrongly dead).
  */
class TombstonesSpec extends SparkSuite {
  import spark.implicits._

  test("writeEpoch roundtrips and bumpEpoch is monotone") {
    val dir = Files.createTempDirectory("graft-ts-rt").toString
    assert(Tombstones.readEpoch(spark, dir) == 0L)
    Tombstones.writeEpoch(spark, dir, 5L)
    assert(Tombstones.readEpoch(spark, dir) == 5L)
    assert(Tombstones.bumpEpoch(spark, dir) == 6L)
    assert(Tombstones.readEpoch(spark, dir) == 6L)
  }

  test("a crash between the marker delete and rename recovers from the staging copy") {
    val dir = Files.createTempDirectory("graft-ts-crash").toString
    Tombstones.writeEpoch(spark, dir, 5L)
    // reconstruct the crash state of writeEpoch(7): staging copy fully
    // written, final marker already deleted, rename never ran
    Seq(7L).toDF("epoch").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/epoch.tmp")
    val p = new org.apache.hadoop.fs.Path(s"$dir/epoch")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    // without the fallback this would read 0 — deletes at te=0 would
    // never kill rows written at epochs 1..7
    assert(Tombstones.readEpoch(spark, dir) == 7L)
    // and the next writer heals the final marker
    assert(Tombstones.bumpEpoch(spark, dir) == 8L)
    assert(p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
    assert(Tombstones.readEpoch(spark, dir) == 8L)
  }

  test("a torn staging write leaves the committed marker authoritative") {
    val dir = Files.createTempDirectory("graft-ts-torn").toString
    Tombstones.writeEpoch(spark, dir, 4L)
    // a crash mid-staging leaves arbitrary junk at epoch.tmp while the
    // final marker is still intact — readEpoch must not consult it
    val tmp = new java.io.File(s"$dir/epoch.tmp")
    tmp.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/epoch.tmp/part-torn.parquet"),
      Array[Byte](1, 2, 3))
    assert(Tombstones.readEpoch(spark, dir) == 4L)
  }
}
