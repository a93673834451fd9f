package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
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

  /** Range mode with EXACT deterministic boundaries — both guarantees at
    * once: bit-stable membership (rerun-identical shard content, unlike
    * [[writeShards]] whose sampled bounds shift with the RDD id) AND
    * global key order across shard directories (unlike
    * [[writeShardsHashed]]).
    *
    * Boundaries are exact quantile cuts computed from the key's ECDF
    * over its VALUE DOMAIN (distinct keys + counts, the q120 pattern):
    * cut i = the smallest key whose cumulative count reaches ⌈i·n/N⌉. A
    * row's shard is the number of cuts strictly below its key — a pure
    * function of the key value, so equal keys always co-shard and a
    * rerun (or a different cluster) reproduces identical content. The
    * ECDF window sorts the DISTINCT-key domain in one partition: exact
    * boundaries are the right trade when the key domain is far smaller
    * than the corpus (doc lengths, dates, bucketed scores); for
    * continuous high-cardinality keys use the sampling mode and accept
    * boundary drift. Balance granularity is one key-group: a single key
    * holding more than n/N rows overflows its shard by construction
    * (same as any range partitioner without key-splitting) — and when
    * one key spans SEVERAL quantile targets, the duplicate cuts
    * collapse, so the writer emits FEWER than `numShards` shards with
    * CONTIGUOUS ids 0..m-1 (never a gap: a trainer can still enumerate
    * by listing or by contiguous range). `numShards` is therefore an
    * upper bound under key skew. The shard assignment is an
    * O(numShards)-deep conditional chain per row — fine to the low
    * thousands (Spark splits the generated code); beyond that use
    * hashed mode, or swap in a binary-search expression.
    */
  def writeShardsRangeExact(
      df: DataFrame,
      path: String,
      numShards: Int,
      keyName: String,
      maxRecordsPerFile: Long = 0L): Unit = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    require(numShards <= 4096,
      s"range-exact mode caps at 4096 shards (O(numShards) assignment " +
        s"expression); use writeShardsHashed for $numShards")
    // domain-sized; materialized once — it supplies the total count AND
    // the cut lookup, so the corpus scans exactly once
    val dom = df.groupBy(col(keyName)).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(
        Window.orderBy(col(keyName)).rowsBetween(Window.unboundedPreceding, 0)))
      .localCheckpoint()
    val n = {
      val row = dom.agg(max(col("__cum"))).collect()(0)
      if (row.isNullAt(0)) 0L else row.getLong(0) // null max = empty input
    }
    val targets = (1 until numShards)
      .map(i => (n * i + numShards - 1) / numShards) // ceil(i*n/N)
      .zipWithIndex
    val cuts: Seq[Any] =
      if (targets.isEmpty) Nil
      else {
        val spark = df.sparkSession
        import spark.implicits._
        val tDf = targets.map { case (t, i) => (t, i) }.toDF("__t", "__i")
        dom.join(broadcast(tDf), col("__cum") >= col("__t"))
          .groupBy(col("__i"))
          .agg(min(col(keyName)).as("__cut"))
          .collect().sortBy(_.getAs[Int]("__i")).map(_.get(1)).toSeq
          // a key spanning several quantile targets yields the same cut
          // repeatedly; collapse so shard ids stay CONTIGUOUS (no id is
          // skipped and no directory goes missing under key skew)
          .distinct
      }
    val shard = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col(keyName) > lit(c), 1).otherwise(0)
    }
    df.withColumn("shard", shard)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(keyName))
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
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
