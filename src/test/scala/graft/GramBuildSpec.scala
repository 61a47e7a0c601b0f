package graft

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Pins the round-20 gram-build shapes (OPTIMIZATION_r20.md): the sites
  * where the posexplode + get(tk, pos+j) rewrite was a measured win must
  * not regrow a lead-window gram build (an exchange + per-doc sort of
  * the corpus token stream), and the one window those operators still
  * legitimately plan (q40's rolling minimum) must stay exactly one.
  * The sites where the rewrite was measured a LOSS and reverted
  * (ngramNovelty, the shingle set build) are NOT pinned window-free —
  * their window exchange is shared with the per-doc reduce by design. */
class GramBuildSpec extends SparkSpec {

  private def windowCount(df: org.apache.spark.sql.DataFrame): Int = {
    val plan = df.queryExecution.executedPlan
    plan.collectWithSubqueries {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }.flatMap(_.collect { case w: WindowExec => w }).size
  }

  test("tfidf tokens / ExactSubstr / bigram gram builds plan no window") {
    val docs = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("tok"))
    assert(windowCount(operators.TextAnalysis.tfidfCosinePairsTokens(
      docs, "doc_id", "tok", 5, "lang", 0.5)) === 0)
    assert(windowCount(operators.TextAnalysis.exactSubstrRemove(
      sources.Tables.documents(spark, sf), "doc_id", "text", n = 8)) === 0)
    assert(windowCount(operators.TextAnalysis.bigramLogProb(
      sources.Tables.documents(spark, sf), "doc_id", "text")) === 0)
    assert(windowCount(operators.TextAnalysis.kneserNeyLogProb(
      sources.Tables.documents(spark, sf), "doc_id", "text")) === 0)
  }

  test("winnow plans exactly the rolling-min window, not the lead build") {
    val docs = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("tok"))
    assert(windowCount(operators.TextAnalysis.winnowedFingerprints(
      docs, "doc_id", "tok")) === 1)
  }
}
