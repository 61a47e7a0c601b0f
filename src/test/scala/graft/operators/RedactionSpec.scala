package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RedactionSpec extends SparkSpec {
  import spark.implicits._

  private val fixture =
    "contact john.doe+x@mail.example.io or 555-1234, card 4111-1111-1111-1111, " +
      "ssn 123-45-6789, ip 192.168.0.1 done"

  test("default scrub replaces every PII family with its placeholder") {
    val out = Seq(fixture).toDF("t")
      .select(Redaction.redact(col("t")).as("r")).as[String].head()
    assert(out ===
      "contact [email] or [phone], card [card], ssn [ssn], ip [ip] done")
  }

  test("redaction is idempotent and counts match on the original text") {
    val df = Seq(fixture).toDF("t")
      .select(col("t"), Redaction.redact(col("t")).as("r"))
    val twice = df.select(Redaction.redact(col("r")).as("rr")).as[String].head()
    assert(twice === df.select("r").as[String].head(),
      "placeholders must never re-match a pattern")
    val counts = df.select(
      Redaction.matchCount(col("t"), Redaction.EmailPattern),
      Redaction.matchCount(col("t"), Redaction.PhonePattern),
      Redaction.matchCount(col("t"), Redaction.CardPattern),
      Redaction.matchCount(col("t"), Redaction.SsnPattern),
      Redaction.matchCount(col("t"), Redaction.Ipv4Pattern)).head()
    assert((0 until 5).map(counts.getLong) === Seq(1L, 1L, 1L, 1L, 1L))
  }

  test("digit runs inside longer numbers don't false-match (boundary anchors)") {
    val out = Seq("order 123456789012345678 qty 12").toDF("t")
      .select(Redaction.redact(col("t")).as("r")).as[String].head()
    assert(out === "order 123456789012345678 qty 12",
      "an 18-digit run is neither a card, a phone, nor an ssn")
  }

  test("plan shape: the scrub is a pure per-row projection (zero exchanges)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = docs.select(col("doc_id"), Redaction.redact(col("text")).as("r"))
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"redaction must not shuffle:\n$plan")
  }
}
