package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTENT MinHash/LSH near-duplicate index — the fuzzy twin of the
  * exact-dedup corpus hash set (q65) and the third member of the
  * persisted-index family ([[AnnIndex]], [[TextIndex]]): the signature
  * and band tables the registered q32/q57 family recomputes per run are
  * written once, and every later ingestion batch is near-dup-checked
  * against the corpus in O(batch) — new-batch signatures joined to the
  * stored band table, never a corpus re-shingle.
  *
  * Index layout under `dir` (plain parquet):
  *  - `bands/` (doc_id, b, s1, s2, ep), partitioned by `bkt =
  *    pmod(xxhash64(b, s1, s2), buckets)` with a CORPUS-SIZED bucket
  *    count (n/[[DocsPerBucket]] clamped to [64, 4096], persisted in
  *    `meta/` — [[bucketsFor]]) — the LSH bucket table. Serve-time
  *    batches name their band signatures, so bucketing turns the band
  *    equi-join into PARTITION pruning: a small batch (the interactive
  *    "is this document a near-dup?" case) opens ≤ 8·|batch| of the
  *    directories, each bounded at ~tens of MB, never the whole table.
  *  - `sigs/`  (doc_id, sig: array of 16 longs, ep), partitioned by
  *    `sbkt = pmod(xxhash64(doc_id), buckets)` — for the estimated-
  *    Jaccard verification of candidates, and [[append]]'s done-marker.
  *    Both reads prune to the ids they actually need (candidate ids /
  *    the arriving batch's ids), so the verification read is
  *    candidate-bucket-bounded, not corpus-bounded. Pre-bucketed
  *    layouts (no `sbkt` in the schema) fall back to the full read.
  *  - `tombstones/` (doc_id, te) + `epoch/` — [[delete]]'s O(batch)
  *    ledger and the [[Tombstones]] epoch marker: a row is live iff its
  *    `ep` postdates its id's newest tombstone, so delete-then-reappend
  *    needs no [[compact]] (the release-upgrade fast path); the ledger
  *    folds in at compaction.
  *
  * The signature recipe is [[TextOps.sigsOf]]/[[TextOps.bandsOf]] —
  * the ONE definition shared with the live q32/q57 queries — so an
  * index built yesterday and a batch signed today can never disagree
  * on shingle width, hash constants, or band structure, and
  * DedupIndexSpec proves saved-index [[queryBatch]] BIT-IDENTICAL to
  * the live cross-join computation (q153's shape).
  *
  * Crash/replay safety mirrors [[TextIndex]]: bands land BEFORE sigs,
  * and sigs is [[append]]'s anti-join done-marker — a crash mid-batch
  * leaves at worst orphan band rows for doc_ids absent from sigs, which
  * an at-least-once replay re-writes in full. The stale duplicates it
  * leaves behind are harmless by construction: candidates are DISTINCT
  * pairs from an equi-join, so a doubled band row cannot change the
  * result ([[queryBatch]] needs no dedup-on-read pass).
  *
  * At 100 TB: bands ≈ 8 rows of 3 longs per document and sigs ≈ 16
  * longs per document — gigabytes where the corpus is terabytes. The
  * only pairwise work is confined to LSH buckets, with the stored side
  * capped per bucket at query time ([[LshGuard]]) so one boilerplate
  * signature shared corpus-wide cannot go quadratic; batch-side hot
  * membership is bounded by the batch size itself.
  */
object DedupIndex {

  case class Index(bands: DataFrame, sigs: DataFrame, buckets: Int)

  /** Bucket-count floor, and the assumed count for layouts written
    * before the count was persisted (rounds ≤ 10 always wrote 64).
    */
  private[graft] val DefaultBuckets = 64

  /** Target documents per band bucket: ~160k docs ≈ 1.3M band rows ≈
    * tens of MB per bucket directory — the file-sizing argument, not
    * √n. A √n experiment (2237 buckets at the 5M-doc rehearsal) was
    * MEASURED WORSE on both sides: build 36 → 302 s (a small-file
    * explosion — partitionBy dirs × task count) and 100-doc query
    * 10.7 → 16.0 s (a wide batch names most buckets, so extra
    * directories only add listing/open overhead). Bytes-per-bucket is
    * what actually bounds both the write and the pruned read.
    */
  private[graft] val DocsPerBucket = 160000L

  /** CORPUS-SIZED band-bucket count: n/[[DocsPerBucket]] clamped to
    * [64, 4096] — the floor binds below ~10M docs (every local bench
    * keeps 64 directories and pays no small-file tax), and a corpus
    * that outgrows it gets proportionally more buckets so pruned-bucket
    * serve reads stay directory-bounded. Decided once at [[write]],
    * persisted in `meta/`, and reused by every append/compact/serve —
    * mixing counts within one layout would silently break the bucket
    * equi-pruning (spec-covered via an override-built layout).
    */
  private[graft] def bucketsFor(nDocs: Long): Int =
    math.max(DefaultBuckets.toLong,
      math.min(4096L, nDocs / DocsPerBucket)).toInt

  private def bktCol(nB: Int): Column =
    pmod(xxhash64(col("b"), col("s1"), col("s2")), lit(nB.toLong)).cast("int")

  private def sbktCol(nB: Int): Column =
    pmod(xxhash64(col("doc_id")), lit(nB.toLong)).cast("int")

  /** Epoch layouts stamp every band/sig row with its batch epoch
    * ([[Tombstones]]) so deferred deletes allow re-appends; pre-epoch
    * layouts keep the legacy blocked-until-compact semantics.
    */
  private[graft] def isEpochLayout(s: SparkSession, dir: String): Boolean =
    s.read.parquet(s"$dir/sigs").columns.contains("ep")

  /** Ids of `ids` already present — and, on an epoch layout, LIVE — in
    * the sigs done-marker: the pruned O(batch) replay check shared by
    * [[append]] and the ingestion gate's sink-side marker. On epoch
    * layouts a tombstoned id is NOT done (it re-appends at a fresh
    * epoch); on legacy layouts presence alone blocks, the pre-epoch
    * contract.
    */
  private[graft] def doneIds(s: SparkSession, dir: String,
      ids: DataFrame): DataFrame = {
    val sigs = s.read.parquet(s"$dir/sigs")
    val present = pruneSigs(sigs, readBuckets(s, dir), ids)
    val live =
      if (sigs.columns.contains("ep"))
        Tombstones.liveByEpoch(present, Tombstones.tombMax(s, dir, "doc_id"), "doc_id")
      else present
    live.join(ids.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id"))
  }

  /** Prune a bucketed sigs read to the partitions holding `ids` —
    * driver-bounded (≤ the layout's bucket count distinct values). No-op
    * on pre-bucketed layouts (no `sbkt` partition column).
    */
  private def pruneSigs(sigs: DataFrame, nB: Int, ids: DataFrame): DataFrame =
    if (!sigs.columns.contains("sbkt")) sigs
    else {
      val wanted = ids.select(sbktCol(nB).as("sbkt")).distinct()
        .collect().map(_.getInt(0)).toSeq
      sigs.filter(col("sbkt").isin(wanted: _*))
    }

  private def writeMeta(s: SparkSession, dir: String, nB: Int): Unit = {
    import s.implicits._
    Seq(nB).toDF("buckets").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** The layout's bucket count — persisted at [[write]]; absent on
    * pre-round-11 layouts, which were all written with 64.
    */
  private def readBuckets(s: SparkSession, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/meta")
    if (p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p))
      MetaScalar.scalarLong(s, p.toString, "buckets").map(_.toInt)
        .getOrElse(s.read.parquet(p.toString).collect()(0).getInt(0))
    else DefaultBuckets
  }

  /** `ep = None` writes the legacy (epoch-less) schema for a table —
    * appends must match each existing table's columns, or mixed files
    * under one root become unreadable. `bandsEp`/`sigsEp` are tracked
    * separately for the same reason (a hand-downgraded sigs table must
    * not force epoch-less band rows into an epoch-stamped bands dir).
    */
  private def writeBatch(sigs: DataFrame, dir: String, mode: String,
      nB: Int, sigsBucketed: Boolean = true,
      bandsEp: Option[Long] = Some(0L), sigsEp: Option[Long] = Some(0L)): Unit = {
    def stamp(df: DataFrame, ep: Option[Long]): DataFrame =
      ep.fold(df)(e => df.withColumn("ep", lit(e)))
    // Repartition by the partition column before each dynamic-
    // partitioned write (round 18, guide §6): one file per bucket per
    // batch instead of (tasks × buckets) small files — the measured
    // layout carried ~4× the files, taxing every load's footer reads,
    // the release-upgrade clones, and the write commits themselves.
    // bands first, sigs LAST: sigs is append's done-marker (see object doc)
    stamp(TextOps.bandsOf(sigs), bandsEp)
      .withColumn("bkt", bktCol(nB)).transform(Layout.writeByBucket(_, col("bkt")))
      .write.partitionBy("bkt").mode(mode).parquet(s"$dir/bands")
    // appends must match the existing sigs layout — mixing flat files
    // with sbkt= partition dirs under one root is unreadable; a flat
    // (pre-round-10) layout stays flat until compact upgrades it whole
    if (sigsBucketed)
      stamp(sigs, sigsEp).withColumn("sbkt", sbktCol(nB))
        .transform(Layout.writeByBucket(_, col("sbkt")))
        .write.partitionBy("sbkt").mode(mode).parquet(s"$dir/sigs")
    else stamp(sigs, sigsEp).write.mode(mode).parquet(s"$dir/sigs")
  }

  /** Build the index from `docs(doc_id, text)`, replacing anything at
    * `dir`. The signature pass is the same one-shuffle shape as live
    * q32: flat codegen'd shingle hashing, 16-min partial aggregation
    * before the exchange. The band layout gets a corpus-sized bucket
    * count ([[bucketsFor]]), persisted for the layout's lifetime.
    */
  def write(s: SparkSession, docs: DataFrame, dir: String,
      bucketsOverride: Option[Int] = None): Index = {
    val sigs = TextOps.sigsOf(docs).localCheckpoint(true)
    val nB = bucketsOverride.getOrElse(bucketsFor(sigs.count()))
    writeMeta(s, dir, nB)
    writeBatch(sigs, dir, "overwrite", nB)
    val p = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    Tombstones.writeEpoch(s, dir, 0L)
    load(s, dir)
  }

  private def tombstones(s: SparkSession, dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(s.read.parquet(p.toString).select(col("doc_id")))
    else None
  }

  /** Load the live index: both tables folded against the tombstone
    * ledger (broadcast-sized until [[compact]] — epoch comparison per
    * table when its rows carry `ep`, id anti-join otherwise).
    */
  def load(s: SparkSession, dir: String): Index = {
    lazy val tMax = Tombstones.tombMax(s, dir, "doc_id")
    lazy val tIds = tombstones(s, dir)
    def live(df: DataFrame): DataFrame =
      if (df.columns.contains("ep")) Tombstones.liveByEpoch(df, tMax, "doc_id")
      else tIds.fold(df)(ids => df.join(broadcast(ids), Seq("doc_id"), "left_anti"))
    Index(
      live(s.read.parquet(s"$dir/bands")),
      live(s.read.parquet(s"$dir/sigs")),
      readBuckets(s, dir))
  }

  /** Append a document batch using the frozen hash recipe. Idempotent
    * under at-least-once replay: ids already present in sigs (the
    * done-marker, written last) are skipped via an anti-join confined
    * to batch-sized data by the semi-join, so replay cost is O(batch),
    * not O(index). A torn band write from a crashed append is re-written
    * whole (its doc_id never reached sigs); the duplicates it leaves are
    * invisible to the DISTINCT candidate join. On an epoch layout a
    * tombstoned id RE-APPENDS at a fresh epoch (the release-upgrade
    * fast path); on a legacy layout it stays blocked until [[compact]],
    * as in [[AnnIndex.append]].
    */
  def append(s: SparkSession, dir: String, docs: DataFrame): Index = graft.Jobs.labeled(s, "dedup-index: append") {
    val sigs = graft.Jobs.labeled(s, "dedup-index: append/sigsOf") {
      // the intake batch is serve-contract sized: one batch-bounded
      // exchange spreads the shingle hashing off its arrival
      // partitioning (round 19, guide §2.5)
      TextOps.sigsOf(graft.Spread.batch(docs)).localCheckpoint(true)
    }
    val nB = readBuckets(s, dir)
    val existing = s.read.parquet(s"$dir/sigs")
    val epochMode = existing.columns.contains("ep")
    // done-marker check reads only the batch ids' sig buckets; in epoch
    // mode "done" means LIVE, so a deferred-deleted id re-appends
    val present = pruneSigs(existing, nB, sigs)
    val marker =
      if (epochMode)
        Tombstones.liveByEpoch(present, Tombstones.tombMax(s, dir, "doc_id"), "doc_id")
      else present
    val done = marker
      .join(sigs.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id"))
    val fresh = graft.Jobs.labeled(s, "dedup-index: append/fresh") {
      sigs.join(done, Seq("doc_id"), "left_anti").localCheckpoint(true)
    }
    val ep = if (epochMode) Some(Tombstones.bumpEpoch(s, dir)) else None
    graft.Jobs.labeled(s, "dedup-index: append/writeBatch") {
      writeBatch(fresh, dir, "append", nB,
        sigsBucketed = existing.columns.contains("sbkt"),
        bandsEp = if (s.read.parquet(s"$dir/bands").columns.contains("ep")) ep else None,
        sigsEp = ep)
    }
    load(s, dir)
  }

  /** O(batch) delete: tombstone append; rows vanish from [[load]] (and
    * so every [[queryBatch]]) immediately, files are untouched until
    * [[compact]] — which runs inline once the ledger outgrows
    * `autoCompactAt` rows ([[Tombstones.AutoCompactRows]]), so a long
    * delete sequence keeps the broadcast side bounded by construction.
    * On an epoch layout the tombstone records the current epoch, so a
    * later [[append]] re-adds the id without compacting.
    */
  def delete(s: SparkSession, dir: String, ids: DataFrame,
      autoCompactAt: Long = Tombstones.AutoCompactRows): Index = graft.Jobs.labeled(s, "dedup-index: delete") {
    val t = ids.select(col("doc_id"))
    // one ledger file per delete batch (round 18); repartition(1), not
    // coalesce(1): coalesce propagates the single partition UP the
    // narrow lineage, so computing a large delete batch's ids would run
    // one-task (round-18 advice) — repartition confines the 1-partition
    // constraint to the write itself
    (if (isEpochLayout(s, dir))
       t.withColumn("te", lit(Tombstones.readEpoch(s, dir)))
     else t).repartition(1).write.mode("append").parquet(s"$dir/tombstones")
    if (MetaScalar.rowCount(s, s"$dir/tombstones").getOrElse(
        s.read.parquet(s"$dir/tombstones").count()) >= autoCompactAt)
      compact(s, dir)
    else load(s, dir)
  }

  /** Fold tombstones into rewritten band/sig files (keeping the
    * band- and sig-bucket partitioning — a pre-bucketed sigs layout is
    * upgraded in place here, since the rewrite re-derives `sbkt`) and
    * drop the ledger. Also materializes the torn-append heal: duplicate
    * band rows from replayed appends are collapsed by the rewrite's
    * dropDuplicates.
    */
  def compact(s: SparkSession, dir: String): Index = {
    tombstones(s, dir).foreach { _ =>
      val live = load(s, dir)
      val nB = readBuckets(s, dir)
      // the rewrite restarts epoch history at 0 (no tombstones survive
      // it) and upgrades legacy/hand-downgraded tables to the epoch
      // schema, since every row is re-stamped
      live.bands.dropDuplicates("doc_id", "b")
        .drop("ep").withColumn("ep", lit(0L)).localCheckpoint(true)
        .transform(Layout.writeByBucket(_, col("bkt")))
        .write.partitionBy("bkt").mode("overwrite").parquet(s"$dir/bands")
      live.sigs.select(col("doc_id"), col("sig")).dropDuplicates("doc_id")
        .withColumn("ep", lit(0L))
        .withColumn("sbkt", sbktCol(nB)).localCheckpoint(true)
        .transform(Layout.writeByBucket(_, col("sbkt")))
        .write.partitionBy("sbkt").mode("overwrite").parquet(s"$dir/sigs")
      val p = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      Tombstones.writeEpoch(s, dir, 0L)
    }
    load(s, dir)
  }

  /** The ONE candidate-join shape, shared by the persisted serve path
    * ([[queryBatch]]) and the live registered q153: batch bands
    * equi-joined to corpus bands per (b, s1, s2), with the CORPUS side
    * capped per bucket at query time ([[LshGuard]] — write-time capping
    * would freeze membership and complicate append; query-time capping
    * runs after partition pruning, so the window is serve-sized). Self
    * pairs (a batch doc already indexed) are excluded. Returns DISTINCT
    * (batch_id, corpus_id).
    */
  def candidatePairs(s: SparkSession, corpusBands: DataFrame,
      batchBands: DataFrame, tag: String = "dedup-index"): DataFrame = {
    // Confine the corpus side to the batch's band signatures BEFORE the
    // rank-cap window. A bucket here IS its (b, s1, s2) triple, and the
    // semi-join filters on exactly those keys, so every surviving
    // bucket keeps its COMPLETE membership — ranks, the cap, and the
    // resulting pairs are identical to capping first (the oracle's ccap
    // CTE still replays this). What changes is cost: without this, the
    // window's row_number shuffles every band row in the batch's
    // pruned BUCKETS (≈ corpus/buckets × named dirs — 20-80M rows at a
    // 20M-doc corpus, measured 14-35 s/query); confined, it sorts only
    // rows matching the batch's ≤8·|batch| signatures. The batch side
    // is serve-contract bounded, so its distinct triple set broadcasts.
    val confined = corpusBands.join(
      broadcast(batchBands.select(col("b"), col("s1"), col("s2")).distinct()),
      Seq("b", "s1", "s2"), "left_semi")
    // materialize=false (round 17 — the q161 carried flag + the
    // per-batch block-accretion advice): every caller's corpus side is
    // a bucket-pruned parquet scan (queryBatch), a projection of an
    // already-checkpointed batch (the gate's self pass), or a
    // projection of a session-shared signature checkpoint (q153) — all
    // cheaper to read twice through the broadcast semi-join than to
    // copy into block storage, and this join runs ONCE PER INTAKE
    // BATCH: an internal localCheckpoint here accretes a batch-count's
    // worth of session-lifetime executor blocks on the serve path.
    val capped = LshGuard.capBuckets(s, confined, Seq("b", "s1", "s2"),
      "doc_id", tag = tag, materialize = false)
    batchBands.as("q")
      .join(capped.as("c"),
        col("q.b") === col("c.b") && col("q.s1") === col("c.s1") &&
          col("q.s2") === col("c.s2") && col("q.doc_id") =!= col("c.doc_id"))
      .select(col("q.doc_id").as("batch_id"), col("c.doc_id").as("corpus_id"))
      .distinct()
  }

  /** Near-dup-check `batch(doc_id, text)` against the persisted corpus:
    * O(batch) signature pass, band-bucket partition pruning (the batch's
    * band signatures name their buckets — computed with the same
    * xxhash64 expression the write side used), the shared candidate
    * join, then estimated Jaccard from signature agreement (q32's flat
    * 16-comparison codegen'd form; the corpus sigs read is confined to
    * candidate ids). Returns (batch_id, corpus_id, est_jaccard) in total
    * order.
    */
  def queryBatch(s: SparkSession, dir: String, batch: DataFrame): DataFrame = graft.Jobs.labeled(s, "dedup-index: queryBatch") {
    val bSigs = graft.Jobs.labeled(s, "dedup-index: queryBatch/sigsOf") {
      // batch-contract spread, as in [[append]] (round 19)
      TextOps.sigsOf(graft.Spread.batch(batch)).localCheckpoint(true)
    }
    val bBands = TextOps.bandsOf(bSigs)
    val ix = load(s, dir) // carries the layout's persisted bucket count
    val bkts = bBands.select(bktCol(ix.buckets).as("bkt")).distinct()
      .collect().map(_.getInt(0)).toSeq // ≤ buckets values, driver-bounded
    val corpusBands = ix.bands.filter(col("bkt").isin(bkts: _*))
    // candidate-sized (cap-bounded) — checkpointed because the pair set
    // is consumed twice: once to name the sig buckets it needs, once in
    // the verification join itself
    val pairs = graft.Jobs.labeled(s, "dedup-index: queryBatch/pairs") {
      candidatePairs(s, corpusBands, bBands).localCheckpoint(true)
    }
    val corpusSigs = pruneSigs(ix.sigs, ix.buckets,
      pairs.select(col("corpus_id").as("doc_id")))
    val agree = (1 to 16).map { i =>
      when(element_at(col("sa.sig"), i) === element_at(col("sb.sig"), i), 1).otherwise(0)
    }.reduce(_ + _)
    pairs
      .join(bSigs.as("sa"), col("batch_id") === col("sa.doc_id"))
      .join(corpusSigs.as("sb"), col("corpus_id") === col("sb.doc_id"))
      .select(col("batch_id"), col("corpus_id"),
        round(agree / lit(16.0), 6).as("est_jaccard"))
      .orderBy(col("batch_id"), col("corpus_id"))
  }

  /** Incremental near-dup under the hard gate: the arriving delta
    * (doc_id >= 400, q65's convention) checked against the existing
    * corpus (doc_id < 400) through the SAME [[candidatePairs]] join the
    * persisted index serves — batch-vs-corpus band join, corpus side
    * capped, est-Jaccard verification — so the oracle gates the
    * production serve shape, and DedupIndexSpec pins persisted
    * [[queryBatch]] bit-identical to this live form.
    */
  val incrementalNearDup = Q(
    "q153_incremental_neardup",
    (TextOps.lshOracleSql() +
      """,
      |corpusb AS (SELECT doc_id, b, s1, s2 FROM bands WHERE doc_id < 400),
      |""" + LshGuard.capCteSql("ccap", "corpusb",
        Seq("doc_id", "b", "s1", "s2"), Seq("b", "s1", "s2"), "doc_id") +
      """,
      |batchb AS (SELECT doc_id, b, s1, s2 FROM bands WHERE doc_id >= 400),
      |cand AS (
      |  SELECT DISTINCT q.doc_id AS batch_id, c.doc_id AS corpus_id
      |  FROM batchb q JOIN ccap c
      |    ON q.b = c.b AND q.s1 = c.s1 AND q.s2 = c.s2)
      |SELECT batch_id, corpus_id,
      |  ROUND(list_sum(list_transform(range(1, 17),
      |    i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / 16.0, 6) AS est_jaccard
      |FROM cand
      |JOIN sigs sa ON sa.doc_id = batch_id
      |JOIN sigs sb ON sb.doc_id = corpus_id
      |ORDER BY batch_id, corpus_id""").stripMargin) { (s, d) =>
    val sigs = TextOps.minhashSigs(s, d)
    val corpusSigs = sigs.filter(col("doc_id") < 400)
    val batchSigs = sigs.filter(col("doc_id") >= 400)
    val pairs = candidatePairs(s,
      TextOps.bandsOf(corpusSigs), TextOps.bandsOf(batchSigs))
    val agree = (1 to 16).map { i =>
      when(element_at(col("sa.sig"), i) === element_at(col("sb.sig"), i), 1).otherwise(0)
    }.reduce(_ + _)
    pairs
      .join(sigs.as("sa"), col("batch_id") === col("sa.doc_id"))
      .join(sigs.as("sb"), col("corpus_id") === col("sb.doc_id"))
      .select(col("batch_id"), col("corpus_id"),
        round(agree / lit(16.0), 6).as("est_jaccard"))
      .orderBy(col("batch_id"), col("corpus_id"))
  }

  def specs: Seq[Q] = Seq(incrementalNearDup)
}
