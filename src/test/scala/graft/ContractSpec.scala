package graft

import java.nio.file.{Files, Paths}

/** Driver-contract insurance: the correctness gate consumes Verify's
  * outDir (per-query parquet + oracle_sql.json) and Bench's machine
  * line; a malformed oracle_sql.json or a query/oracle key drift would
  * silently zero a whole round, so these invariants are build-locked.
  */
class ContractSpec extends SparkSuite {

  test("every oracle key is a registered query; name collisions impossible") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os -- qs}")
    // two Q values with one name would silently drop a query in the Map
    val all = SparkEntry.allSpecs.map(_.name)
    val dups = all.groupBy(identity).collect { case (n, occ) if occ.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(all.size == qs.size)
  }

  test("COVERAGE.md's totals line matches the live registry size") {
    // doc totals drifted stale-by-N twice in two rounds (157-vs-166,
    // 169-vs-170) — so the sync is now build-locked: the spec fails the
    // moment a query registers without the totals line moving
    val totals = """\*\*Totals: (\d+) registered queries""".r
    val text = new String(Files.readAllBytes(Paths.get("COVERAGE.md")))
    val documented = totals.findFirstMatchIn(text).map(_.group(1).toInt)
    assert(documented.contains(SparkEntry.allSpecs.size),
      s"COVERAGE.md totals line says $documented, registry has ${SparkEntry.allSpecs.size}")
  }

  test("Verify.main writes parsable oracle_sql.json and per-query parquet") {
    val out = Files.createTempDirectory("graft_contract").toString
    Verify.dump(spark, sf0001, out) // full dump at the smallest SF
    // the driver does json.load — any escaping bug breaks the whole round
    val df = spark.read.option("multiLine", "true").json(s"$out/oracle_sql.json")
    assert(df.columns.length == SparkEntry.oracleSql.size,
      s"json keys ${df.columns.length} != oracles ${SparkEntry.oracleSql.size}")
    // every registered query produced a readable parquet dump; a few may
    // be legitimately empty at the smallest SF (q15's anti-join), but
    // widespread emptiness means a loader broke
    val counts = SparkEntry.queries.keys.map { name =>
      assert(Files.exists(Paths.get(s"$out/$name")), s"missing dump for $name")
      name -> spark.read.parquet(s"$out/$name").count()
    }.toMap
    val empties = counts.collect { case (n, 0L) => n }
    assert(empties.size <= 3, s"suspiciously many empty dumps: $empties")
  }
}
