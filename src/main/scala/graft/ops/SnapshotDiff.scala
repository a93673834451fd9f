package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the change-detection primitive behind
  * incremental corpus maintenance: given two versions of a document
  * corpus, classify every id as added / removed / changed / unchanged
  * and measure the content delta, WITHOUT ever shuffling document
  * payloads.
  *
  * At 100 TB the design constraint is that the full-outer id join must
  * carry only `(id, 16-byte digest, small metadata)` — the digest is
  * computed in the scan projection, so the text/payload column is
  * pruned before the exchange (PlanSpec-style: the join input schema
  * has no payload column). When both snapshots are written bucketed by
  * id (`Ingest.writeBucketed`), the join is co-located and the diff is
  * a zero-shuffle zip of bucket pairs. The per-status output feeds
  * downstream invalidation: `added`/`changed` ids are exactly the
  * re-embed / re-index / re-pack work list, `removed` ids feed
  * [[Forget]]-style purges — O(delta), not O(corpus).
  */
object SnapshotDiff {

  /** Per-id diff of two snapshots: full-outer join on `idCol` comparing
    * `digest` (any deterministic content fingerprint — md5 here keeps
    * the DuckDB oracle bit-identical; a production caller can pass
    * xxhash64). `sizeCol` rides along for delta accounting, `tagCols`
    * are carried (new side wins) for grouping. Output: one row per id in
    * either snapshot with `status` ∈ added|removed|changed|unchanged and
    * `size_delta` (new − old, missing side = 0).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      digest: Column, sizeCol: Column,
      tagCols: Seq[String] = Nil): DataFrame = {
    def side(df: DataFrame, p: String): DataFrame =
      df.select(Seq(col(idCol).as(s"${p}_id"), digest.as(s"${p}_dg"),
        sizeCol.cast("int").as(s"${p}_sz")) ++
        tagCols.map(c => col(c).as(s"${p}_$c")): _*)
    val o = side(oldDf, "o")
    val n = side(newDf, "n")
    val joined = o.join(n, col("o_id") === col("n_id"), "full_outer")
    val statusCol = when(col("o_id").isNull, "added")
      .when(col("n_id").isNull, "removed")
      .when(col("o_dg") =!= col("n_dg"), "changed")
      .otherwise("unchanged")
    joined.select(Seq(
      coalesce(col("o_id"), col("n_id")).as(idCol),
      statusCol.as("status"),
      (coalesce(col("n_sz"), lit(0)) - coalesce(col("o_sz"), lit(0)))
        .as("size_delta")) ++
      tagCols.map(c => coalesce(col(s"n_$c"), col(s"o_$c")).as(c)): _*)
  }

  /** q152: corpus version delta report. The "v2" snapshot is derived
    * deterministically in-query (removals at doc_id % 11 = 3, content
    * revisions at doc_id % 7 = 0, additions re-keyed from doc_id % 13 =
    * 1), then [[diff]] classifies every id and the report aggregates
    * doc counts and exact character deltas per (status, source) — the
    * shape an ingest pipeline publishes per corpus release. The oracle
    * replays the same derivation and a full-outer digest join in SQL.
    */
  val snapshotDelta = Q(
    "q152_snapshot_diff",
    """WITH v2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]' ELSE text END AS text,
      |    source
      |  FROM documents WHERE doc_id % 11 <> 3
      |  UNION ALL
      |  SELECT doc_id + 10000000, text || ' [new]', source
      |  FROM documents WHERE doc_id % 13 = 1),
      |o AS (SELECT doc_id, md5(text) AS dg, len(text) AS nc, source FROM documents),
      |n AS (SELECT doc_id, md5(text) AS dg, len(text) AS nc, source FROM v2),
      |j AS (
      |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
      |    CASE WHEN o.doc_id IS NULL THEN 'added'
      |         WHEN n.doc_id IS NULL THEN 'removed'
      |         WHEN o.dg <> n.dg THEN 'changed'
      |         ELSE 'unchanged' END AS status,
      |    COALESCE(n.source, o.source) AS source,
      |    COALESCE(n.nc, 0) - COALESCE(o.nc, 0) AS char_delta
      |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
      |SELECT status, source, COUNT(*) AS n_docs,
      |  CAST(SUM(char_delta) AS BIGINT) AS char_delta
      |FROM j GROUP BY status, source
      |ORDER BY status, source""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select("doc_id", "text", "source")
    val v2 = docs.filter(col("doc_id") % 11 =!= 3)
      .withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")))
      .unionByName(docs.filter(col("doc_id") % 13 === 1)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"),
          concat(col("text"), lit(" [new]")).as("text"), col("source")))
    diff(docs, v2, "doc_id",
      md5(col("text")), length(col("text")), Seq("source"))
      .groupBy(col("status"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("size_delta")).as("char_delta"))
      .orderBy(col("status"), col("source"))
  }

  val specs: Seq[Q] = Seq(snapshotDelta)
}
