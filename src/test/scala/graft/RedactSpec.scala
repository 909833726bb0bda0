package graft

import org.apache.spark.sql.functions._
import graft.operators.Redact

/** PII scrub semantics: detection counts, token replacement, category
  * precedence, and non-PII text passing through untouched. */
class RedactSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "mail a.b+c@sub.example.org and x@y.io twice"),
    (1L, "call +1 (555) 123-4567 now"),
    (2L, "ssn 987-65-4321 inline"),
    (3L, "host 192.168.0.1 and 10.0.0.255"),
    (4L, "clean text with digits 12345 and dots a.b"),
    (5L, "combo u@v.com +44 (020) 555-0199 111-22-3333 8.8.8.8")
  ).toDF("doc_id", "text")

  test("scrub: counts per category and token replacement") {
    val got = Redact.scrub(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Int]("n_email"),
          r.getAs[Int]("n_phone"), r.getAs[Int]("n_ssn"),
          r.getAs[Int]("n_ipv4"))).toMap
    assert(got(0L) == ("mail [EMAIL] and [EMAIL] twice", 2, 0, 0, 0))
    assert(got(1L) == ("call [PHONE] now", 0, 1, 0, 0))
    assert(got(2L) == ("ssn [SSN] inline", 0, 0, 1, 0))
    assert(got(3L) == ("host [IPV4] and [IPV4]", 0, 0, 0, 2))
    assert(got(4L) == ("clean text with digits 12345 and dots a.b", 0, 0, 0, 0))
    assert(got(5L) == ("combo [EMAIL] [PHONE] [SSN] [IPV4]", 1, 1, 1, 1))
  }

  test("scrub plan is map-only (no shuffle) and idempotent") {
    val scrubbed = Redact.scrub(docs)
    assert(!scrubbed.queryExecution.executedPlan.toString.contains("Exchange"))
    // tokens carry no digits: a second pass finds nothing and changes nothing
    val twice = scrubbed.select(col("doc_id"),
      Redact.scrubText(col("text")).as("text2"), col("text"))
      .filter(col("text2") =!= col("text")).count()
    assert(twice == 0L)
  }
}
