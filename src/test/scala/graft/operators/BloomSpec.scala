package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom probe: zero false negatives, bounded false positives") {
    val rnd = new scala.util.Random(42)
    val members = Array.fill(1000)(rnd.nextLong())
    val f = Bloom.build(members)
    val memberHits = members.toSeq.toDF("h")
      .where(Bloom.mightContain(f, col("h"))).count()
    assert(memberHits === 1000L, "a Bloom filter can never miss a member")
    // disjoint probe set: expected FP rate ~0.3% at 12 bits/key, k=6
    val memberSet = members.toSet
    val probes = Array.fill(20000)(rnd.nextLong()).filterNot(memberSet)
    val fps = probes.toSeq.toDF("h")
      .where(Bloom.mightContain(f, col("h"))).count()
    assert(fps.toDouble / probes.length < 0.05,
      s"false-positive rate ${fps.toDouble / probes.length} is far above the sizing math")
  }

  test("bloom probe stays inside whole-stage codegen (no fallback expressions)") {
    val f = Bloom.build(Seq(1L, 2L, 3L))
    // a literal source constant-folds the probe away — scan parquet instead
    val exec = spark.read.parquet(s"$sf/documents.parquet")
      .where(Bloom.mightContain(f, xxhash64(col("text"))))
      .queryExecution.executedPlan
    val spans = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, s"probe fell out of codegen:\n$exec")
  }

  test("bloomDecontaminate complements contaminationHits: clean + hit partition the corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpus = docs.where(col("doc_id") >= 10)
    val bench = docs.where(col("doc_id") < 10)
    val clean = TextAnalysis.bloomDecontaminate(corpus, bench, "doc_id", "text", n = 4)
      .select("doc_id").as[Long].collect().toSet
    val hit = TextAnalysis.contaminationHits(corpus, bench, "doc_id", "text", n = 4)
      .select("doc_id").as[Long].collect().toSet
    val all = corpus.select("doc_id").as[Long].collect().toSet
    assert((clean intersect hit).isEmpty, "a doc cannot be both clean and contaminated")
    assert((clean union hit) === all, "every corpus doc is exactly one of clean/contaminated")
    assert(hit.nonEmpty && clean.nonEmpty, "fixture should exercise both sides")
    graft.GraftSession.releaseCaches(spark, blocking = true)
  }
}
