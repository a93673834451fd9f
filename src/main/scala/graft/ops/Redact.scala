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
  * matching requires ≥ 9 digits-ish characters so ordinary integers
  * and years survive.
  */
object Redact {

  /** RFC-lite email: local@domain.tld. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Four dot-separated 1-3 digit octets, word-bounded. */
  val Ipv4Pattern = "\\b(?:\\d{1,3}\\.)(?:\\d{1,3}\\.)(?:\\d{1,3}\\.)\\d{1,3}\\b"

  /** Phone-like: optional +, then ≥ 9 chars of digits/space/()/-,
    * ending in a digit (no dots — disjoint from IPv4 by construction).
    */
  val PhonePattern = "\\+?\\d[\\d()\\s-]{7,}\\d"

  /** Scrub a text column: PII spans become `<EMAIL>` / `<IP>` / `<PHONE>`. */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Per-row PII hit counts, for gating (count BEFORE scrubbing). */
  def hitCounts(text: Column): (Column, Column, Column) = (
    regexp_count(text, lit(EmailPattern)),
    regexp_count(text, lit(Ipv4Pattern)),
    regexp_count(text, lit(PhonePattern)))

  /** The full gate+scrub stage: adds `n_emails`/`n_ips`/`n_phones` and a
    * scrubbed text column; callers drop rows above their PII budget and
    * ship `text_scrubbed` (CorpusPipeline-shaped: one narrow projection,
    * then an ordinary filter).
    */
  def stage(df: org.apache.spark.sql.DataFrame, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    val (e, i, p) = hitCounts(col(textCol))
    df.withColumn("n_emails", e)
      .withColumn("n_ips", i)
      .withColumn("n_phones", p)
      .withColumn("text_scrubbed", scrub(col(textCol)))
  }
}
