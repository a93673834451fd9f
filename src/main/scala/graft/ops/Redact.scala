package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction pass a training-corpus pipeline runs
  * before anything ships: emails, IPv4 addresses, and phone-like digit
  * runs are replaced with typed placeholder tokens, and per-document
  * hit counts are surfaced so the pipeline can gate on them (a document
  * that is MOSTLY PII usually should be dropped, not scrubbed).
  *
  * Built entirely from `regexp_replace` / `regexp_count` — codegen'd
  * scalar expressions, one projection over the corpus, no UDF, no
  * shuffle. The three patterns apply in a fixed order chosen so the
  * classes cannot partially consume each other (emails contain no
  * spaces/parens, the phone pattern admits no dots, IPv4 requires
  * dots), so the chain is order-stable.
  *
  * This is a LIBRARY operator (ScalaTest-verified, like the JDBC and
  * sink families): Java and DuckDB regex dialects differ in corner
  * semantics, so an oracle-hash query would test engine regex parity,
  * not redaction semantics. Known accepted trades, documented here
  * rather than hidden: dotted version strings with four numeric fields
  * ("10.1.2.3") are indistinguishable from IPv4 and redact; phone
  * matching counts DIGITS (9–15, the E.164 range, separators free), so
  * years, ISO dates (8 digits) and ordinary integers survive, while a
  * digit-dense span like a 5+5-digit numeric range or a date glued to
  * a clock time reaches 9+ digits and redacts — conservative in the
  * privacy direction. Corpora heavy in timestamps should normalize
  * dates before this stage.
  */
object Redact {

  /** RFC-lite email: local@domain.tld. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Four dot-separated 1-3 digit octets, word-bounded. */
  val Ipv4Pattern = "\\b(?:\\d{1,3}\\.)(?:\\d{1,3}\\.)(?:\\d{1,3}\\.)\\d{1,3}\\b"

  /** Phone-like: optional +, then 9–15 DIGITS with up to two separator
    * chars (space/()/-) after each — "1 (415)" needs two — so the
    * quantifier bounds the DIGIT count, not the span length. No dots:
    * disjoint from IPv4 by construction; an 8-digit ISO date cannot
    * reach the 9-digit floor.
    */
  val PhonePattern = "\\+?(?:\\d[\\s()-]{0,2}){8,14}\\d"

  /** Digit remnants left when a run exceeds 15 digits: the phone
    * pattern consumes digits in chunks of 9–15, so a 16-digit card
    * number would otherwise survive as `<PHONE>6` — a privacy leak.
    * The remnant must START with a digit directly abutting the
    * placeholder (the 15-digit match always ends ON a digit, so an
    * overlong contiguous run's tail is directly attached); once
    * anchored, separator-joined digits continue the collapse. Requiring
    * the direct-abut anchor keeps standalone numbers that merely FOLLOW
    * a redacted phone ("call 555123456789012 3 times" keeps its "3") —
    * the round-5 advice fix. Accepted residual trade: an overlong run
    * with a separator exactly at the 15-digit boundary ("555 … 012 345")
    * leaves its ≤8-digit tail unredacted — preferable to eating
    * arbitrary following numbers. Runs of 24+ digits emit one
    * placeholder per full 15-digit chunk (each a real pattern match, so
    * hit counts still equal placeholders emitted).
    */
  val PhoneRemnantPattern = "(<PHONE>)\\d(?:[\\s()-]{0,2}\\d)*"

  /** Scrub a text column: PII spans become `<EMAIL>` / `<IP>` / `<PHONE>`.
    * Order matters and matches [[stage]]'s counting order: emails first
    * (their digit-dense local parts must not be eaten as phones), then
    * IPs, then phones.
    */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailPattern, "<EMAIL>"),
          Ipv4Pattern, "<IP>"),
        PhonePattern, "<PHONE>"),
      PhoneRemnantPattern, "$1")

  /** The full gate+scrub stage: adds `n_emails`/`n_ips`/`n_phones` and a
    * scrubbed text column; callers drop rows above their PII budget and
    * ship `text_scrubbed` (CorpusPipeline-shaped: one narrow projection,
    * then an ordinary filter).
    *
    * Counts are taken SEQUENTIALLY on the progressively-scrubbed text —
    * each count sees the previous classes already replaced — so one
    * span can never double-count across classes and the counts always
    * equal the placeholder tokens actually emitted (a digit-dense email
    * local part counted on raw text would also match the phone
    * pattern).
    */
  def stage(df: org.apache.spark.sql.DataFrame, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    val afterEmail = regexp_replace(col(textCol), EmailPattern, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Pattern, "<IP>")
    df.withColumn("n_emails", regexp_count(col(textCol), lit(EmailPattern)))
      .withColumn("n_ips", regexp_count(afterEmail, lit(Ipv4Pattern)))
      .withColumn("n_phones", regexp_count(afterIp, lit(PhonePattern)))
      .withColumn("text_scrubbed",
        regexp_replace(
          regexp_replace(afterIp, PhonePattern, "<PHONE>"),
          PhoneRemnantPattern, "$1"))
  }
}
