package graft

import graft.ops.{AnnIndex, LmModel, RetrainFlow}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The act-on-alarm composition (round-15 verdict item 2): an
  * undrifted batch is a no-op, a drifted batch triggers
  * rebuild → serve-equivalence gate → swap, a staged index that lost
  * recall is REFUSED, and after a swap the alarm clears and the old
  * baseline is retired with the old model.
  */
class RetrainFlowSpec extends SparkSuite {
  import spark.implicits._

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def exists(d: String) =
    fs.exists(new org.apache.hadoop.fs.Path(d))

  private lazy val corpus = Tables.embeddings(spark, sf0001)
    .select($"vec_id", graft.functions.VectorFunctions.asDouble($"embedding").as("v"))
    .localCheckpoint(true)

  private def probes16 = corpus.filter($"vec_id" < 16)
    .select($"vec_id".as("qid"), $"v")

  private def driftedBatch = corpus.filter($"vec_id" % 20 === 3)
    .select(($"vec_id" + 1000000000L).as("vec_id"),
      expr("transform(v, x -> x * 1.5d + 0.25d)").as("v"))

  test("ANN: undrifted batch is a no-op — no alarm, no staging, serving dir untouched") {
    val dir = Files.createTempDirectory("graft_rtf_noop").toString + "/ann"
    AnnIndex.writeVectors(spark, corpus, dir)
    val sameBatch = corpus.filter($"vec_id" % 20 === 3)
      .select(($"vec_id" + 1000000000L).as("vec_id"), $"v")
    val before = spark.read.parquet(s"$dir/quantstats").collect().toSeq
    val r = RetrainFlow.annCycle(spark, dir, corpus, sameBatch, probes16,
      frac = 1.0)
    assert(!r.alarmed && !r.rebuilt && !r.swapped, r.toString)
    assert(r.alarmPpm <= 1500000L, s"undrifted batch read as drifted: ${r.alarmPpm}")
    assert(!exists(s"$dir-staging") && !exists(s"$dir-retired"))
    assert(spark.read.parquet(s"$dir/quantstats").collect().toSeq == before,
      "no-op cycle touched the serving baseline")
  }

  test("ANN: a regime shift alarms, gates pass, swap ships the retrained index and the alarm clears") {
    val dir = Files.createTempDirectory("graft_rtf_swap").toString + "/ann"
    AnnIndex.writeVectors(spark, corpus, dir)
    val oldStats = spark.read.parquet(s"$dir/quantstats").collect().toSeq
    // a genuine regime SHIFT: the whole corpus re-ingested under the
    // affine drift — the union retrain allocates codebook mass to the
    // new mode, so the alarm clears against the staged baseline
    val batch = corpus
      .select(($"vec_id" + 1000000000L).as("vec_id"),
        expr("transform(v, x -> x * 1.5d + 0.25d)").as("v"))
      .localCheckpoint(true)
    val r = RetrainFlow.annCycle(spark, dir, corpus, batch, probes16,
      frac = 1.0)
    assert(r.alarmed && r.rebuilt && r.equivalent && r.recovered && r.swapped,
      r.toString)
    assert(r.alarmPpm > 1500000L, s"fixture not drifted enough: ${r.alarmPpm}")
    // staging was promoted; the old model+baseline retired TOGETHER
    assert(!exists(s"$dir-staging"), "staging left behind after a swap")
    assert(exists(s"$dir-retired/quantstats"), "old baseline not retired")
    assert(spark.read.parquet(s"$dir-retired/quantstats").collect().toSeq == oldStats)
    val newStats = spark.read.parquet(s"$dir/quantstats").collect().toSeq
    assert(newStats != oldStats, "swap did not install a fresh baseline")
    // the alarm CLEARS against the swapped serving dir
    assert(RetrainFlow.annAlarmPpm(spark, dir, batch) <= 1500000L,
      "post-swap alarm did not clear")
    // and a re-run of the same cycle is a no-op (the batch is absorbed)
    val r2 = RetrainFlow.annCycle(spark, dir, corpus.unionByName(batch),
      batch, probes16, frac = 1.0)
    assert(!r2.alarmed && !r2.swapped, r2.toString)
  }

  test("ANN: an outlier slice fails the recovery gate — no swap, staging kept for inspection") {
    // a 5% slice far off-distribution ALARMS, but after the union
    // retrain the codebook mass still follows the corpus, the slice
    // still dominates the p95 tail, and the alarm does NOT clear —
    // shipping a new index would churn serving state without curing
    // the alarm, so the cycle must refuse (the regime-shift case above
    // is the one that clears and swaps)
    val dir = Files.createTempDirectory("graft_rtf_refuse").toString + "/ann"
    AnnIndex.writeVectors(spark, corpus, dir)
    val before = spark.read.parquet(s"$dir/quantstats").collect().toSeq
    val r = RetrainFlow.annCycle(spark, dir, corpus, driftedBatch.localCheckpoint(true),
      probes16, frac = 1.0)
    assert(r.alarmed && r.rebuilt && r.equivalent && !r.recovered && !r.swapped,
      r.toString)
    assert(spark.read.parquet(s"$dir/quantstats").collect().toSeq == before,
      "refused cycle still touched the serving layout")
    assert(exists(s"$dir-staging"), "refused staging should be kept for inspection")
    assert(!exists(s"$dir-retired"))
  }

  test("ANN: the equivalence gate refuses a staged index that lost recall on served data") {
    val dir = Files.createTempDirectory("graft_rtf_gate").toString + "/ann"
    AnnIndex.writeVectors(spark, corpus, dir)
    // adversarial staged layout: built WITHOUT one vector the serving
    // index returns as an answer today (the smallest non-seed answer
    // id, so the Lloyd seeds vec_id < k stay intact) — the staged index
    // cannot return it, whatever the probe fraction
    val victim = AnnIndex.searchRerank(spark, AnnIndex.load(spark, dir),
      corpus, probes16, k = 10, frac = 1.0)
      .filter($"cand" >= 16).agg(min($"cand")).collect()(0).getLong(0)
    val staging = s"$dir-staging"
    AnnIndex.writeVectors(spark, corpus.filter($"vec_id" =!= victim), staging)
    val (equivalent, _) = RetrainFlow.annGate(spark, dir, staging,
      corpus, corpus, driftedBatch, probes16, k = 10, frac = 1.0,
      alarmRatioPpm = 1500000L)
    assert(!equivalent, "gate accepted a staged index missing served answers")
    // and against an honestly-rebuilt staging the same gate passes
    AnnIndex.writeVectors(spark, corpus, staging)
    val (eq2, _) = RetrainFlow.annGate(spark, dir, staging,
      corpus, corpus, driftedBatch, probes16, k = 10, frac = 1.0,
      alarmRatioPpm = 1500000L)
    assert(eq2, "gate refused an equivalent staged index")
  }

  test("ANN: sampled-probe gate mode — recall-tolerant where the exact gate refuses (boundary-pinned)") {
    // round-16 policy knob: the exact gate demands identical top-k (the
    // O(corpus)-shortlist contract); the sampled mode gates on retained
    // (qid, cand) recall instead. Fixture: a staged index missing ONE
    // served answer — exact refuses; sampled passes at exactly the
    // staged recall and refuses one ppm above it (floor-div boundary).
    val dir = Files.createTempDirectory("graft_rtf_sampled").toString + "/ann"
    AnnIndex.writeVectors(spark, corpus, dir)
    val oldTop = AnnIndex.searchRerank(spark, AnnIndex.load(spark, dir),
      corpus, probes16, k = 10, frac = 1.0,
      shortlistPerProbe = 1 + corpus.count().toInt / 8)
      .select($"qid", $"cand").collect().map(r => (r.getLong(0), r.getLong(1)))
    val victim = oldTop.map(_._2).filter(_ >= 16).min
    val lost = oldTop.count(_._2 == victim)
    assert(lost >= 1)
    val staging = s"$dir-staging"
    AnnIndex.writeVectors(spark, corpus.filter($"vec_id" =!= victim), staging)
    val recallPpm = Math.floorDiv((oldTop.length - lost).toLong * 1000000L,
      oldTop.length.toLong)
    def gate(ppm: Long): Boolean = RetrainFlow.annGate(spark, dir, staging,
      corpus, corpus, driftedBatch, probes16, k = 10, frac = 1.0,
      alarmRatioPpm = 1500000L,
      shortlistPerProbe = 1 + corpus.count().toInt / 8, recallPpm = ppm)._1
    assert(!gate(1000000L), "exact mode accepted a staged index missing a served answer")
    assert(gate(recallPpm), s"sampled mode refused at its own recall ($recallPpm ppm)")
    assert(!gate(recallPpm + 1), "sampled mode accepted below-tolerance recall")
  }

  test("ANN: beforeSwap runs store-first — before the index swap, and its failure leaves serving untouched") {
    // the round-16 advice ordering: companion state (maintain's raw
    // vector store) must roll BEFORE the index swap, so the serving
    // index never references ids absent from the store — including if
    // the process dies inside the companion roll itself.
    val dir = Files.createTempDirectory("graft_rtf_order").toString + "/ann"
    AnnIndex.writeVectors(spark, corpus, dir)
    val oldStats = spark.read.parquet(s"$dir/quantstats").collect().toSeq
    val batch = corpus
      .select(($"vec_id" + 1000000000L).as("vec_id"),
        expr("transform(v, x -> x * 1.5d + 0.25d)").as("v"))
      .localCheckpoint(true)
    var statsAtHook: Seq[org.apache.spark.sql.Row] = null
    val crash = intercept[RuntimeException] {
      RetrainFlow.annCycle(spark, dir, corpus, batch, probes16, frac = 1.0,
        beforeSwap = _ => {
          statsAtHook = spark.read.parquet(s"$dir/quantstats").collect().toSeq
          throw new RuntimeException("simulated crash mid-companion-roll")
        })
    }
    assert(crash.getMessage.contains("simulated crash"))
    // the hook observed the OLD serving layout (it runs pre-index-swap)…
    assert(statsAtHook == oldStats, "beforeSwap ran after the index swap")
    // …and the aborted swap left serving untouched, staging inspectable
    assert(spark.read.parquet(s"$dir/quantstats").collect().toSeq == oldStats)
    assert(exists(s"$dir-staging") && !exists(s"$dir-retired"))
    // the replayed cycle completes: alarm still fires, swap lands
    val r = RetrainFlow.annCycle(spark, dir, corpus, batch, probes16, frac = 1.0)
    assert(r.alarmed && r.swapped, r.toString)
  }

  test("ANN: exact gate converges on replay after a store-first crash — allow-list is index membership, not the store") {
    // The round-17 advice scenario: maintain's beforeSwap swaps the raw
    // vector store FIRST; if the process dies before the index swap,
    // the replayed cycle reads a store that already contains the batch.
    // A store-derived allow-list would admit batch vectors into the
    // staged top-k that the serving index can never return — the exact
    // gate would refuse on EVERY retry, leaving the layout permanently
    // half-swapped. The fixture forces that collision deterministically:
    // the batch carries exact duplicates of the probes' best answers
    // under fresh ids (identical cosine ⇒ they tie into the staged
    // top-k whenever they are allowed), so this test fails against a
    // store-derived allow-list and passes against index membership.
    val base = Files.createTempDirectory("graft_rtf_replay").toString
    val dir = base + "/ann"
    AnnIndex.writeVectors(spark, corpus, dir)
    corpus.write.parquet(s"$base/vecs")
    val n = corpus.count()
    val batch = corpus
      .select(($"vec_id" + 1000000000L).as("vec_id"),
        expr("transform(v, x -> x * 1.5d + 0.25d)").as("v"))
      .unionByName(corpus.filter($"vec_id" < 16)
        .select(($"vec_id" + 2000000000L).as("vec_id"), $"v"))
      .localCheckpoint(true)
    def spp(union: Long): Int = ((union + 15) / 16).toInt // corpus-covering at fixed-16
    // attempt 1: the store swap LANDS, then the process "dies" before
    // the index swap — the exact half-swapped state the advice names
    val crash = intercept[RuntimeException] {
      RetrainFlow.annCycle(spark, dir, corpus, batch, probes16, frac = 1.0,
        shortlistPerProbe = spp(n + batch.count()),
        beforeSwap = nv => {
          nv.write.mode("overwrite").parquet(s"$base/vecs-staging")
          RetrainFlow.swapDirs(spark, s"$base/vecs", s"$base/vecs-staging")
          throw new RuntimeException("simulated crash between the two swaps")
        })
    }
    assert(crash.getMessage.contains("simulated crash"))
    val store = spark.read.parquet(s"$base/vecs")
    assert(store.count() > n, "fixture: the store swap did not land")
    // replay, as maintain would: vectors re-read from the swapped store.
    // The alarm re-fires (old index, drifted batch) and the EXACT gate
    // must pass — batch ids absorbed by the store are not served data.
    val r = RetrainFlow.annCycle(spark, dir, store, batch, probes16,
      frac = 1.0, shortlistPerProbe = spp(store.count() + batch.count()))
    assert(r.alarmed, r.toString)
    assert(r.equivalent,
      "replayed exact gate refused — allow-list leaked store-absorbed batch ids")
    assert(r.recovered && r.swapped, r.toString)
    assert(!exists(s"$dir-staging") && exists(s"$dir-retired"))
  }

  test("QM: a degraded-crawl batch alarms, retrain absorbs it, swap retires model+baseline together") {
    // q208's degraded-crawl shape: the real corpus trains the model,
    // the batch is every doc truncated to its first 2 tokens — length
    // and vocabulary density collapse, the frozen means center the
    // batch far off-distribution, scores fall past the threshold
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").localCheckpoint(true)
    val dir = Files.createTempDirectory("graft_rtf_qm").toString + "/qm"
    ops.QualityModel.write(spark, docs, dir)
    ops.QualityModel.writeScoreStats(spark, dir, docs)
    val batch = docs.select(($"doc_id" + 1000000L).as("doc_id"),
      concat_ws(" ", slice(split($"text", " "), 1, 2)).as("text"))
      .localCheckpoint(true)
    // the hard-sigmoid clamps the classifier's low tail, so its ppm
    // drift is COMPRESSED relative to the LM's (measured: the 2-token
    // collapse moves p05 by 1.18×, not the LM's >3×) — the alarm
    // threshold is a per-model policy knob, and the classifier's sits
    // tighter (10% here)
    val thr = 1100000L
    // undrifted zero point first: the training docs land ON the baseline
    val r0 = RetrainFlow.qmCycle(spark, dir, docs, docs, alarmRatioPpm = thr)
    assert(!r0.alarmed && !r0.swapped && r0.alarmPpm == 1000000L, r0.toString)
    val oldStats = spark.read.parquet(s"$dir/scorestats").collect().toSeq
    val r = RetrainFlow.qmCycle(spark, dir, docs, batch, alarmRatioPpm = thr)
    assert(r.alarmed && r.rebuilt && r.recovered && r.swapped, r.toString)
    assert(r.alarmPpm > thr, s"fixture not drifted enough: ${r.alarmPpm}")
    assert(exists(s"$dir-retired/scorestats") && !exists(s"$dir-staging"))
    assert(spark.read.parquet(s"$dir-retired/scorestats").collect().toSeq == oldStats)
    // post-swap: the truncated regime is trained in — alarm clears
    assert(RetrainFlow.qmAlarmPpm(spark, dir, batch) <= thr,
      "post-swap QM alarm did not clear")
  }

  test("maintain: the gate's monitor→retrain loop rolls the drifted stages and absorbs the batch") {
    import graft.ops.{IngestionGate, LmModel}
    // crafted corpus: predictable transitions (LM drift is LOUD under
    // reversal) + the real sf0.001 vectors as the semantic store
    val docs = (0L until 40L).map(i => (i, "a b c a b c a b c"))
      .toDF("doc_id", "text").localCheckpoint(true)
    val vecs = corpus.filter($"vec_id" < 40).localCheckpoint(true)
    val base = Files.createTempDirectory("graft_rtf_maint").toString
    LmModel.write(spark, docs, s"$base/lm")
    LmModel.writeScoreStats(spark, s"$base/lm", docs)
    IngestionGate.writeSemantic(spark, vecs, s"$base/sem")
    val cfg = IngestionGate.Config(s"$base/dix", s"$base/lm", s"$base/acc",
      semanticDir = Some(s"$base/sem"))
    // drifted batch: reversed text (every bigram unseen) + the whole
    // vector regime affine-shifted — both stages must alarm and roll
    val batch = docs.join(vecs.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"))
      .select(($"doc_id" + 1000L).as("doc_id"),
        concat_ws(" ", reverse(split($"text", " "))).as("text"),
        expr("transform(v, x -> x * 1.5d + 0.25d)").as("v"))
      .localCheckpoint(true)
    val out = IngestionGate.maintain(spark, cfg, batch, docs)
      .collect().map(r => r.getAs[String]("stage") ->
        (r.getAs[Boolean]("alarmed"), r.getAs[Boolean]("swapped"))).toMap
    assert(out.keySet == Set("lm", "semantic"), out.toString)
    assert(out("lm") == ((true, true)), s"lm stage did not roll: $out")
    assert(out("semantic") == ((true, true)), s"semantic stage did not roll: $out")
    // Column order is NOT part of the maintain-frame contract (round 18:
    // readers are by-name, the positional append-only-columns convention
    // is retired) — a schema-order shuffle must read identically.
    val shuffled = IngestionGate.maintain(spark, cfg, batch, docs)
      .select($"swapped", $"ms_gate", $"stage", $"alarmed", $"ms_rebuild",
        $"recovered", $"alarm_ppm", $"rebuilt")
      .collect().map(r => r.getAs[String]("stage") ->
        (r.getAs[Boolean]("alarmed"), r.getAs[Boolean]("swapped"))).toMap
    assert(shuffled.keySet == Set("lm", "semantic"), shuffled.toString)
    // the vector store rolled WITH the index (sweeps can't miss members)
    assert(spark.read.parquet(s"$base/sem/vecs").count() == 80L)
    assert(exists(s"$base/sem/vecs-retired") && !exists(s"$base/sem/vecs-staging"))
    // absorbed: the same batch against the rolled layouts is a no-op
    val out2 = IngestionGate.maintain(spark, cfg, batch, docs)
      .collect().map(r => r.getAs[String]("stage") -> r.getAs[Boolean]("alarmed")).toMap
    assert(out2 == Map("lm" -> false, "semantic" -> false),
      s"re-maintain was not a no-op: $out2")
    // mid-stream heal (round 16): the NEXT batch from the SAME new
    // regime — different ids, same reversed text + affine vectors —
    // serves green against the healed layouts: every monitor quiet
    // (the swap absorbed the regime, not just the one batch)…
    val next = docs.join(vecs.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"))
      .select(($"doc_id" + 2000L).as("doc_id"),
        concat_ws(" ", reverse(split($"text", " "))).as("text"),
        expr("transform(v, x -> x * 1.5d + 0.25d)").as("v"))
      .localCheckpoint(true)
    val out3 = IngestionGate.maintain(spark, cfg, next, docs)
      .collect().map(r => r.getAs[String]("stage") -> r.getAs[Boolean]("alarmed")).toMap
    assert(out3 == Map("lm" -> false, "semantic" -> false),
      s"next new-regime batch re-alarmed after the heal: $out3")
    // …and the healed semantic layout DECIDES correctly on it: each
    // next-batch vector is an exact re-render of a swapped-in member
    // (same affine image), so the gate's semantic stage rejects it —
    // the healed index is actually serving the new regime's members.
    // Stages 1–2 are opened wide (maxJaccard > 1 admits all; ppm ≥ 0)
    // so the zero count can ONLY come from the semantic stage.
    ops.DedupIndex.write(spark, docs, s"$base/dix")
    val decided = IngestionGate.decide(spark,
      cfg.copy(minMeanPpm = 0L, maxJaccard = 2.0), next)
    assert(decided.count() == 0,
      "healed semantic stage failed to catch re-renders of swapped-in members")
  }

  test("LM: reversed batch alarms, retrain absorbs it, swap retires model+baseline together") {
    // the loud-drift crafted corpus (LmModelSpec's): near-deterministic
    // transitions, so reversal collapses scores far past the threshold
    val docs = (0L until 40L).map(i => (i, "a b c a b c a b c"))
      .toDF("doc_id", "text").localCheckpoint(true)
    val dir = Files.createTempDirectory("graft_rtf_lm").toString + "/lm"
    LmModel.write(spark, docs, dir)
    LmModel.writeScoreStats(spark, dir, docs)
    val batch = docs.select(($"doc_id" + 1000L).as("doc_id"),
      concat_ws(" ", reverse(split($"text", " "))).as("text")).localCheckpoint(true)
    // undrifted: the training docs themselves — exact zero point, no-op
    val r0 = RetrainFlow.lmCycle(spark, dir, docs, docs)
    assert(!r0.alarmed && !r0.swapped && r0.alarmPpm == 1000000L, r0.toString)
    val oldStats = spark.read.parquet(s"$dir/scorestats").collect().toSeq
    val r = RetrainFlow.lmCycle(spark, dir, docs, batch)
    assert(r.alarmed && r.rebuilt && r.recovered && r.swapped, r.toString)
    assert(r.alarmPpm > 1500000L, s"fixture not drifted enough: ${r.alarmPpm}")
    assert(exists(s"$dir-retired/scorestats") && !exists(s"$dir-staging"))
    assert(spark.read.parquet(s"$dir-retired/scorestats").collect().toSeq == oldStats)
    // post-swap: the batch's transitions are trained in — alarm clears
    assert(RetrainFlow.lmAlarmPpm(spark, dir, batch) <= 1500000L,
      "post-swap LM alarm did not clear")
  }
}
