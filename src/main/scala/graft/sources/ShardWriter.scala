package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Training-shard export — the last stage of a corpus pipeline: emit the
  * packed/cleaned corpus as N parquet shards a trainer can stream.
  *
  * Two assignment modes, because the two guarantees trade off:
  *
  *  - [[writeShards]] (range mode): `repartitionByRange` samples the key
  *    to compute BALANCED range bounds (skew-robust), and each shard is
  *    internally sorted, so concatenating shards in filename order
  *    streams the corpus in key order with no global sort. The sampling
  *    seed incorporates the RDD id, so the bounds — and therefore which
  *    side of a boundary a row lands on — can differ between runs; the
  *    global concatenated order is identical either way.
  *  - [[writeShardsHashed]] (hash mode): shard = xxhash64(key) mod N,
  *    materialized as a `shard=k` directory layout — bit-deterministic
  *    membership (a rerun or a different cluster produces identical
  *    shard content), at the cost of no cross-shard ordering. Use when
  *    reproducible shard content is the contract (e.g. resumable
  *    training with per-shard checkpoints).
  *
  * Both bound individual file sizes with `maxRecordsPerFile` (the writer
  * rolls files within a task — no extra repartition).
  */
object ShardWriter {

  def writeShards(
      df: DataFrame,
      path: String,
      numShards: Int,
      key: Column,
      maxRecordsPerFile: Long = 0L): Unit = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    df.repartitionByRange(numShards, key)
      .sortWithinPartitions(key)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(SaveMode.Overwrite)
      .parquet(path)
  }

  def writeShardsHashed(
      df: DataFrame,
      path: String,
      numShards: Int,
      key: Column,
      maxRecordsPerFile: Long = 0L): Unit = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val sharded = df.withColumn("shard", pmod(xxhash64(key), lit(numShards.toLong)))
    // Repartition ON the shard column so each shard's rows co-locate in
    // one task (bounded file count); placement itself comes from the
    // partitionBy directory layout, so a hash collision between shard
    // ids costs parallelism, never correctness.
    sharded.repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), key)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .mode(SaveMode.Overwrite)
      .parquet(path)
  }
}
