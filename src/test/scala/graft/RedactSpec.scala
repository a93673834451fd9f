package graft

import graft.ops.Redact
import org.apache.spark.sql.functions._

/** PII scrubbing semantics on crafted text: each class redacts to its
  * typed token, counts gate correctly, non-PII look-alikes survive, and
  * the real corpus (digit-free words) passes through untouched.
  */
class RedactSpec extends SparkSuite {
  import spark.implicits._

  private def scrubOne(s: String): (String, Int, Int, Int) = {
    val r = Redact.stage(Seq(Tuple1(s)).toDF("text"), "text").collect().head
    (r.getAs[String]("text_scrubbed"), r.getAs[Int]("n_emails"),
      r.getAs[Int]("n_ips"), r.getAs[Int]("n_phones"))
  }

  test("each PII class redacts to its typed token, in one pass") {
    assert(scrubOne("mail me at jane.doe+spam@corp-mail.example.org today") ==
      (("mail me at <EMAIL> today", 1, 0, 0)))
    assert(scrubOne("server 192.168.0.1 answered") ==
      (("server <IP> answered", 0, 1, 0)))
    assert(scrubOne("call +1 (415) 555-0123 now") ==
      (("call <PHONE> now", 0, 0, 1)))
    // all three in one string; email digits are not re-eaten as a phone
    val (t, e, i, p) =
      scrubOne("a@b.co or 10.0.0.2 or +44 20 7946 0958 end")
    assert(t == "<EMAIL> or <IP> or <PHONE> end")
    assert((e, i, p) == ((1, 1, 1)))
  }

  test("look-alikes survive: short numbers, years, dates, versions") {
    assert(scrubOne("spark 4.1.2 shipped in 2026")._1 ==
      "spark 4.1.2 shipped in 2026")
    assert(scrubOne("room 12345678 floor 9")._1 == "room 12345678 floor 9")
    // ISO dates are 8 digits — below the 9-digit phone floor
    assert(scrubOne("deployed 2026-08-13 as planned")._1 ==
      "deployed 2026-08-13 as planned")
    assert(scrubOne("between 1000-2000 units")._1 == "between 1000-2000 units")
    // documented trade: a 4-field dotted version IS redacted as an IP
    assert(scrubOne("build 10.1.2.3 tagged")._1 == "build <IP> tagged")
    // documented trade: 9+ digits of dashed numbers redact (conservative)
    assert(scrubOne("range 10000-20000 units")._1 == "range <PHONE> units")
  }

  test("long digit runs redact completely — no trailing-digit leak") {
    // 16-digit card number: the phone pattern consumes 15 digits, the
    // remnant collapse eats the 16th instead of leaking "<PHONE>6"
    assert(scrubOne("card 4532015112830366 end") ==
      (("card <PHONE> end", 0, 0, 1)))
    // separators inside the overlong run collapse with it
    assert(scrubOne("acct 1234-5678-9012-3456-78 end")._1 == "acct <PHONE> end")
    // 38 digits = two full 15-digit matches + an 8-digit remnant (below
    // the 9-digit floor) folded into the second placeholder
    assert(scrubOne("id " + "9" * 38 + " end") ==
      (("id <PHONE><PHONE> end", 0, 0, 2)))
    // 40 digits = 15 + 15 + 10, all real matches: counts equal tokens
    assert(scrubOne("id " + "9" * 40 + " end") ==
      (("id <PHONE><PHONE><PHONE> end", 0, 0, 3)))
    // boundary (round-6 advice fix): a standalone number that merely
    // FOLLOWS a full 15-digit match is NOT part of the run — the remnant
    // collapse requires its first digit to abut the placeholder directly
    assert(scrubOne("call 555123456789012 3 times")._1 == "call <PHONE> 3 times")
    // …but a digit within separator reach of a SHORTER run is consumed
    // by the greedy phone match itself (separator-joined runs are one
    // unit by the phone pattern's own definition)
    assert(scrubOne("call 5551234567 3 times")._1 == "call <PHONE> times")
    // a digit BEYOND separator reach survives
    assert(scrubOne("call 5551234567, at 9am")._1 == "call <PHONE>, at 9am")
  }

  test("counts equal emitted tokens: digit-dense emails never double-count") {
    val (t, e, i, p) = scrubOne("contact 1234567890@mail.com soon")
    assert(t == "contact <EMAIL> soon")
    assert((e, i, p) == ((1, 0, 0)), "email local part must not count as a phone")
  }

  test("counts gate: a mostly-PII doc is identifiable before scrubbing") {
    val df = Seq(
      (1L, "normal words only here"),
      (2L, "x@y.io a@b.co c@d.net 1.2.3.4 5.6.7.8")).toDF("doc_id", "text")
    val staged = Redact.stage(df, "text")
    val hot = staged.filter(col("n_emails") + col("n_ips") + col("n_phones") >= 3)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    assert(hot == Seq(2L))
  }

  test("the synthetic corpus is PII-free and passes through byte-identical") {
    val staged = Redact.stage(Tables.documents(spark, sf0001), "text")
    val changed = staged.filter(col("text") =!= col("text_scrubbed")).count()
    assert(changed == 0L)
    val hits = staged.agg(
      sum(col("n_emails") + col("n_ips") + col("n_phones"))).collect()(0).getLong(0)
    assert(hits == 0L)
  }
}
