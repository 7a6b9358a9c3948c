package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** PII scrubber semantics on seeded fixtures (the gate corpus is clean,
  * so redaction behavior is pinned here): emails, IPv4s, and dashed/
  * dotted phone numbers redact; look-alikes survive. */
class PiiScrubSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  // mirrors q110's SQL exactly (same patterns module-private there; the
  // point of this spec is behavior, so the SQL is restated inline)
  private def scrub(text: String): (String, Long, Long, Long) = {
    import spark.implicits._
    Seq((1L, text)).toDF("doc_id", "text").createOrReplaceTempView("pii_docs")
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\\\.[a-z]{2,}"
    val ip = "\\\\b\\\\d{1,3}\\\\.\\\\d{1,3}\\\\.\\\\d{1,3}\\\\.\\\\d{1,3}\\\\b"
    val phone = "\\\\b\\\\d{3}[-.]\\\\d{3}[-.]\\\\d{4}\\\\b"
    val r = spark.sql(s"""
      SELECT regexp_replace(regexp_replace(regexp_replace(lower(text),
               '$email', '<EMAIL>'), '$ip', '<IP>'), '$phone', '<PHONE>') AS scrubbed,
             CAST(size(regexp_extract_all(lower(text), '$email', 0)) AS BIGINT) AS n_emails,
             CAST(size(regexp_extract_all(lower(text), '$ip', 0)) AS BIGINT) AS n_ips,
             CAST(size(regexp_extract_all(lower(text), '$phone', 0)) AS BIGINT) AS n_phones
      FROM pii_docs""").head()
    (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("emails, IPs, phones redact; counts match") {
    val (s, e, i, p) = scrub(
      "Contact Jane.Doe+spam@Example.ORG or 10.0.42.7, call 555-123-4567 today")
    assert(s == "contact <EMAIL> or <IP>, call <PHONE> today")
    assert(e == 1L && i == 1L && p == 1L)
  }

  test("multiple hits all redact (global replace)") {
    val (s, e, _, _) = scrub("a@b.co then c@d.io")
    assert(s == "<EMAIL> then <EMAIL>" && e == 2L)
  }

  test("look-alikes survive: bare words, version strings, short digit runs") {
    val (s, e, i, p) = scrub("release v1.2.3.4beta at node7 email-less 12-34-5678")
    // 'v1' and '4beta' put word characters flush against the digit runs,
    // so \b never matches and the IP look-alike survives; 12-34-5678 has
    // the wrong digit grouping for the phone pattern
    assert(e == 0L && i == 0L && p == 0L)
    assert(s == "release v1.2.3.4beta at node7 email-less 12-34-5678")
  }

  test("clean text is byte-identical (the q110 gate contract)") {
    val clean = "the quick brown fox jumps over the lazy dog"
    val (s, e, i, p) = scrub(clean)
    assert(s == clean && e == 0L && i == 0L && p == 0L)
  }
}
