package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten across every serving surface, in O(deleted) —
  * one call scrubs a document id set from (a) the hashed-shard training
  * corpus, (b) the persistent ANN index, and (c) the persistent BM25 /
  * phrase index, with a receipt of exactly what was touched.
  *
  * The 100 TB contract is that NO surface pays corpus-sized work:
  *  - the shard store rewrites ONLY the `shard=k` directories the
  *    deleted keys hash into ([[graft.sources.ShardWriter
  *    .writeShardsHashed]]'s layout makes shard membership a pure
  *    function of the key, so the affected set is computable from the
  *    ids alone — a deletion batch of b ids rewrites ≤ b directories,
  *    each ~corpus/numShards rows, regardless of corpus size);
  *  - [[AnnIndex.delete]] and [[TextIndex.delete]] are O(batch)
  *    tombstone appends whose anti-joins hide the ids from every query
  *    until a later compaction folds them in.
  *
  * ForgetSpec proves the end state: deleted ids absent from every shard
  * file, unaffected shard directories byte-untouched, and both indexes'
  * search results bit-identical to indexes freshly built without the
  * deleted documents.
  */
object Forget {

  /** What a [[forget]] call touched: distinct ids requested, hashed-shard
    * directories rewritten (ids), corpus rows physically removed, and
    * whether each index received tombstones.
    */
  case class Receipt(nIds: Long, shardsRewritten: Seq[Long], rowsRemoved: Long,
    annTombstoned: Boolean, textTombstoned: Boolean,
    dedupTombstoned: Boolean = false)

  /** Scrub `ids(keyCol)` from a corpus written by
    * `ShardWriter.writeShardsHashed(df, path, numShards, col(keyCol))`:
    * recompute each deleted key's shard with the SAME
    * `pmod(xxhash64(key), numShards)` expression the writer used, then
    * rewrite only those directories (anti-join, materialized before the
    * overwrite so the rewrite never races its own input scan). Returns
    * (rewritten shard ids, rows removed).
    */
  def scrubHashedShards(s: SparkSession, path: String, numShards: Int,
      keyCol: String, ids: DataFrame): (Seq[Long], Long) = {
    val idRows = ids.select(col(keyCol)).distinct().localCheckpoint(true)
    val affected = idRows
      .select(pmod(xxhash64(col(keyCol)), lit(numShards.toLong)).as("shard"))
      .distinct().collect().map(_.getLong(0)).sorted.toSeq
    var removed = 0L
    affected.foreach { k =>
      val dir = s"$path/shard=$k"
      val cur = s.read.parquet(dir)
      val before = cur.count()
      val kept = cur.join(broadcast(idRows), Seq(keyCol), "left_anti")
        .localCheckpoint(true)
      removed += before - kept.count()
      kept.write.mode("overwrite").parquet(dir)
    }
    (affected, removed)
  }

  /** Forget `docIds(doc_id)` everywhere it is served from. Each surface
    * is optional — pass only the stores this deployment runs:
    * `hashedShards = Some((path, numShards, keyCol))` for the training
    * corpus, `annIndexDir` for [[AnnIndex]] (doc ids are its vec ids),
    * `textIndexDir` for [[TextIndex]], `dedupIndexDir` for the near-dup
    * signature index ([[DedupIndex]] — a forgotten document must also
    * stop surfacing as other documents' near-dup match).
    */
  def forget(s: SparkSession, docIds: DataFrame,
      hashedShards: Option[(String, Int, String)] = None,
      annIndexDir: Option[String] = None,
      textIndexDir: Option[String] = None,
      dedupIndexDir: Option[String] = None): Receipt = {
    val ids = docIds.select(col("doc_id")).distinct().localCheckpoint(true)
    val nIds = ids.count()
    val (shards, removed) = hashedShards match {
      case Some((path, numShards, keyCol)) =>
        scrubHashedShards(s, path, numShards, keyCol,
          ids.select(col("doc_id").as(keyCol)))
      case None => (Seq.empty[Long], 0L)
    }
    annIndexDir.foreach(d =>
      AnnIndex.delete(s, d, ids.select(col("doc_id").as("vec_id"))))
    textIndexDir.foreach(d => TextIndex.delete(s, d, ids))
    dedupIndexDir.foreach(d => DedupIndex.delete(s, d, ids))
    Receipt(nIds, shards, removed, annIndexDir.nonEmpty, textIndexDir.nonEmpty,
      dedupIndexDir.nonEmpty)
  }
}
