package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** UAX #15 behavior of the native unicode_normalize expression and the
  * stripAccents composition — pinned against hand-computed normal forms
  * (the same tables DuckDB's utf8proc implements, so these pins are the
  * oracle contract for q121). */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._
  import NormalizeFunctions._

  private val composed = "caf\u00e9"      // e-acute precomposed
  private val decomposed = "cafe\u0301"   // e + combining acute

  test("NFC composes, NFD decomposes, and both are idempotent") {
    val df = Seq((composed, decomposed)).toDF("c", "d")
    val row = df.select(
      unicodeNormalize(col("d"), "NFC"),
      unicodeNormalize(col("c"), "NFD"),
      unicodeNormalize(unicodeNormalize(col("d"), "NFC"), "NFC"),
      length(col("d")), length(unicodeNormalize(col("d"), "NFC"))
    ).head()
    assert(row.getString(0) === composed, "NFC must compose e+U+0301 to é")
    assert(row.getString(1) === decomposed, "NFD must decompose é")
    assert(row.getString(2) === composed, "NFC must be idempotent")
    assert(row.getInt(3) === 5 && row.getInt(4) === 4,
      "code-point length must shrink by the composed mark")
  }

  test("NFKC folds compatibility forms NFC leaves alone") {
    // U+FB01 ﬁ ligature → fi; U+2460 ① → 1; U+00BD ½ → 1⁄2
    val df = Seq("ﬁle ①").toDF("s")
    val (kc, c) = df.select(
      unicodeNormalize(col("s"), "NFKC"),
      unicodeNormalize(col("s"), "NFC")).as[(String, String)].head()
    assert(kc === "file 1")
    assert(c === "ﬁle ①", "NFC must not touch compatibility forms")
  }

  test("stripAccents matches the q121 battery and round-trips composed and decomposed input") {
    val battery = Seq(
      ("\u00e1\u00e9\u00ed\u00f3\u00fa", "aeiou"),
      ("\u00f1\u00fc\u00e7", "nuc"),
      ("café mañana", "cafe manana"),
      ("plain ascii 123", "plain ascii 123"))
    battery.foreach { case (in, want) =>
      val got = Seq(in).toDF("s").select(stripAccents(col("s"))).as[String].head()
      assert(got === want, s"stripAccents($in)")
    }
  }

  test("null propagates, astral text passes through untouched, already-NFC fast path is identity") {
    val n = Seq[Option[String]](None).toDF("s")
      .select(unicodeNormalize(col("s"), "NFC")).collect().head
    assert(n.isNullAt(0))
    // astral (surrogate-pair) text has no decomposition — must be byte-stable
    val astral = "math 𝐀 emoji 😀"
    val got = Seq(astral).toDF("s")
      .select(unicodeNormalize(col("s"), "NFC"), stripAccents(col("s")))
      .as[(String, String)].head()
    assert(got._1 === astral && got._2 === astral)
  }

  test("rejects unknown forms at construction and non-string input at analysis") {
    intercept[IllegalArgumentException] {
      unicodeNormalize(lit("x"), "NFX")
    }
    intercept[Exception] {
      Seq(1L).toDF("x").select(unicodeNormalize(col("x"), "NFC")).collect()
    }
  }

  test("SQL registration and interpreted/codegen parity on corpus-scale input") {
    val viaSql = spark.sql("SELECT unicode_normalize('café', 'NFC')")
      .as[String].head()
    assert(viaSql === composed)
    // parity: the codegen'd path over a corpus column equals per-row kernel calls
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        regexp_replace(col("text"), "a", "á").as("raw"))
    val engine = docs.select(col("doc_id"),
      unicodeNormalize(col("raw"), "NFC").as("n")).as[(Long, String)].collect()
    val local = docs.as[(Long, String)].collect().map { case (id, raw) =>
      (id, java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.NFC))
    }
    assert(engine.sorted.sameElements(local.sorted))
  }
}
