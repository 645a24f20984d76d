package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection/redaction + blocklist term scrubbing — the privacy /
  * content-policy pass every training-data pipeline runs before a corpus
  * ships (the C4 badwords filter and the standard email/phone/IP redactors
  * are the public reference points; the reference engine has no analog —
  * this is part of the beyond-reference curation surface).
  *
  * Spark-first: everything is built from `regexp_count` / `regexp_replace`
  * native functions — per-row codegen string work, no UDFs, no shuffles, no
  * state. On a 100 TB corpus this is a pure map stage that pipelines with
  * whatever scan/filter precedes it; the patterns ride in the plan as
  * literals. Counts are computed on the ORIGINAL text (detection is
  * independent of redaction order); redaction applies the patterns in one
  * fixed documented order so engines replay byte-identically.
  *
  * Pattern dialect: the common Java-regex/RE2 subset (character classes,
  * bounded repetition, `\b` ASCII word boundaries, alternation) — every
  * pattern here parses identically in Spark (java.util.regex) and DuckDB
  * (RE2), which is what makes the operator oracle-replayable.
  */
object Scrub {

  /** user@host.tld — conservative: no quoting/comment forms. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** 123-45-6789 (checked before phone: 3-2-4 grouping is more specific). */
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** 555-123-4567 / 555.123.4567. */
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Dotted-quad IPv4 (no octet-range validation — redaction over-matching
    * is the safe direction for a scrubber).
    */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Whole-word alternation over the blocklist terms. Terms must be plain
    * words: interpolated verbatim, so a metacharacter would corrupt the
    * pattern, and an empty list would yield `\b()\b` — which matches the
    * EMPTY STRING at every word boundary and shreds the text. Both are
    * hard errors, not silent.
    */
  def blocklistRe(terms: Seq[String]): String = {
    require(terms.nonEmpty, "empty blocklist — omit the pass instead")
    terms.foreach(t => require(t.matches("[A-Za-z0-9_]+"),
      s"blocklist term '$t' is not a plain word (regex metacharacters and " +
        "non-word chars would corrupt the word-boundary pattern)"))
    terms.mkString("\\b(", "|", ")\\b")
  }

  /** The fixed redaction order: email first (its local part can contain
    * digits/dots that the numeric patterns would otherwise bite into), then
    * SSN before phone (3-2-4 vs 3-3-4 — disjoint, but the order is part of
    * the contract), then phone before IPv4 (a dotted phone is not an IP
    * once redacted), then the blocklist.
    */
  private val piiPasses: Seq[(String, String)] = Seq(
    EmailRe -> "<EMAIL>", SsnRe -> "<SSN>", PhoneRe -> "<PHONE>", Ipv4Re -> "<IP>")

  /** Adds per-class PII counts (`n_email`/`n_ssn`/`n_phone`/`n_ip`, counted
    * on the original text), `n_blocked` (blocklist hits), `clean` (text
    * after all redaction passes), and `pii_free` (1 when no PII class hit).
    */
  def scrub(df: DataFrame, textCol: String, blocklist: Seq[String]): DataFrame = {
    val t = col(textCol)
    val blRe = blocklistRe(blocklist)
    val redacted = (piiPasses :+ (blRe -> "<TERM>")).foldLeft(t) {
      case (c, (re, tag)) => regexp_replace(c, re, tag)
    }
    df.withColumn("n_email", regexp_count(t, lit(EmailRe)).cast("long"))
      .withColumn("n_ssn", regexp_count(t, lit(SsnRe)).cast("long"))
      .withColumn("n_phone", regexp_count(t, lit(PhoneRe)).cast("long"))
      .withColumn("n_ip", regexp_count(t, lit(Ipv4Re)).cast("long"))
      .withColumn("n_blocked", regexp_count(t, lit(blRe)).cast("long"))
      .withColumn("clean", redacted)
      .withColumn("pii_free",
        when(col("n_email") + col("n_ssn") + col("n_phone") + col("n_ip") === 0, 1L)
          .otherwise(0L))
  }

  /** The same transform as ANSI SQL over RE2 (DuckDB's `regexp_replace`
    * needs the explicit 'g' flag for replace-all; Spark's replaces all by
    * default).
    */
  def scrubSql(textExpr: String, blocklist: Seq[String]): String = {
    // single-quoted SQL literals keep backslashes literal in DuckDB (no
    // escape processing), so the Java-side patterns interpolate verbatim —
    // the JSON layer between here and the oracle runner escapes and
    // unescapes them symmetrically
    val blRe = blocklistRe(blocklist)
    val e = EmailRe; val s = SsnRe; val p = PhoneRe; val i = Ipv4Re
    s"""
       |  CAST(len(regexp_extract_all($textExpr, '$e')) AS BIGINT) AS n_email,
       |  CAST(len(regexp_extract_all($textExpr, '$s')) AS BIGINT) AS n_ssn,
       |  CAST(len(regexp_extract_all($textExpr, '$p')) AS BIGINT) AS n_phone,
       |  CAST(len(regexp_extract_all($textExpr, '$i')) AS BIGINT) AS n_ip,
       |  CAST(len(regexp_extract_all($textExpr, '$blRe')) AS BIGINT) AS n_blocked,
       |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |    $textExpr, '$e', '<EMAIL>', 'g'), '$s', '<SSN>', 'g'),
       |    '$p', '<PHONE>', 'g'), '$i', '<IP>', 'g'), '$blRe', '<TERM>', 'g') AS clean,
       |  CAST(CASE WHEN len(regexp_extract_all($textExpr, '$e'))
       |       + len(regexp_extract_all($textExpr, '$s'))
       |       + len(regexp_extract_all($textExpr, '$p'))
       |       + len(regexp_extract_all($textExpr, '$i')) = 0
       |    THEN 1 ELSE 0 END AS BIGINT) AS pii_free""".stripMargin
  }
}
