package graft

import org.apache.spark.sql.functions._

import graft.operators.Scrub

/** PII/blocklist scrubbing: pattern hits, redaction order, and the
  * no-PII-pass-through invariant on crafted rows (the synthetic corpus has
  * no real PII, so the oracle gate exercises the zero path; this spec
  * exercises the hit paths).
  */
class ScrubSpec extends SparkSpec {
  import spark.implicits._

  private val bl = Seq("badword", "verboten")

  private def scrubOne(text: String) = {
    val row = Scrub.scrub(Seq((1L, text)).toDF("id", "text"), "text", bl)
      .select("n_email", "n_ssn", "n_phone", "n_ip", "n_blocked", "clean", "pii_free")
      .first()
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4), row.getString(5), row.getLong(6))
  }

  test("each PII class is counted and redacted") {
    val (ne, ns, np, ni, nb, clean, free) = scrubOne(
      "mail a@b.org and c.d+e@f-g.co ssn 123-45-6789 phone 555-123-4567 " +
        "or 555.123.4567 ip 10.0.0.1 plus badword")
    assert((ne, ns, np, ni, nb) === ((2L, 1L, 2L, 1L, 1L)))
    assert(free === 0L)
    assert(clean ===
      "mail <EMAIL> and <EMAIL> ssn <SSN> phone <PHONE> or <PHONE> ip <IP> plus <TERM>")
  }

  test("clean text passes through untouched; pii_free = 1") {
    val text = "perfectly ordinary text with words only"
    val (ne, ns, np, ni, nb, clean, free) = scrubOne(text)
    assert((ne, ns, np, ni, nb) === ((0L, 0L, 0L, 0L, 0L)))
    assert(free === 1L)
    assert(clean === text)
  }

  test("blocklist matches whole words only and does not flip pii_free") {
    val (_, _, _, _, nb, clean, free) = scrubOne("badwordish stays but verboten goes")
    assert(nb === 1L)
    assert(free === 1L) // blocklist hits are policy, not PII
    assert(clean === "badwordish stays but <TERM> goes")
  }

  test("redaction order: an email's numeric local part never leaks to the numeric passes") {
    val (ne, _, np, ni, _, clean, _) = scrubOne("contact 555.123.4567x@example.com now")
    // the whole token is one email (x@ makes it mail-shaped) — email pass
    // consumes it before phone/ip can bite into the digits
    assert(ne === 1L && np === 0L && ni === 0L)
    assert(clean === "contact <EMAIL> now")
  }

  test("ssn-shaped and phone-shaped groupings stay distinct classes") {
    val (_, ns, np, _, _, clean, _) = scrubOne("a 123-45-6789 b 123-456-7890")
    assert(ns === 1L && np === 1L)
    assert(clean === "a <SSN> b <PHONE>")
  }

  test("corpus query shape: blocklist hits present, zero PII, schema stable") {
    val out = graft.queries.PipelineQueries.piiScrub(spark, sf0001)
    assert(out.columns.toSeq === Seq("doc_id", "n_email", "n_ssn", "n_phone",
      "n_ip", "n_blocked", "clean", "pii_free"))
    val agg = out.agg(
      sum(col("n_email") + col("n_ssn") + col("n_phone") + col("n_ip")),
      sum(col("n_blocked")), min(col("pii_free"))).first()
    assert(agg.getLong(0) === 0L, "synthetic corpus should carry no PII")
    assert(agg.getLong(1) > 0L, "blocklist terms should hit the corpus vocab")
    assert(agg.getLong(2) === 1L)
  }
}
