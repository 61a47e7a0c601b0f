package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Engine-wide plan contract: NO declared query may plan a cartesian
  * product, and nested-loop joins are allowed only where a broadcast
  * all-pairs comparison is the intended algorithm. Catches any future
  * operator or Catalyst upgrade that silently degrades an equi-join into
  * a quadratic scan — across the whole surface, not one spec at a time. */
class PlanContractSpec extends SparkSpec {

  /** Queries whose PLAN legitimately contains a BroadcastNestedLoopJoin —
    * every entry broadcasts a PROVABLY tiny side by design:
    *  - q27: brute-force cosine baseline (small query set × corpus).
    *  - q70: PQ ADC search (small query set × persisted code relation).
    *  - q63/q64: a SINGLE-ROW grand-total cross join (an equi-join on a
    *    constant key would be folded back to a BNLJ by ConstantPropagation
    *    anyway — 1 × N is linear, not quadratic).
    *  - q93: kNN labeling's neighbor stage IS q27's brute tier (the same
    *    broadcast small-query-set × corpus scan); the vote stage on top
    *    is equi-join + reduce only.
    *  - q101: SQ8 search is q70's whole-corpus ADC shape at a different
    *    codec (small query set × persisted reconstruction relation).
    *  - q102: semantic decontamination broadcasts the eval-sized suite
    *    against the corpus — q27's brute tier with a threshold gate.
    *  - q113: TWO single-row scalar attaches of the q63/q64 kind — the
    *    drift relation's grand total plus the softmax's micro-unit
    *    normalizer (1 × |slices| each, linear).
    *  - q119/q125: the perplexity-bucket tertile cuts are a SINGLE-ROW
    *    scalar attach (1 × N, the q63 pattern); q125 composes q119.
    *  - q124: hard-negative mining's candidate stage IS q27's brute tier
    *    (broadcast small-query-set × corpus) with a band gate.
    *  - q126/q127: the dense component of the RRF fusion and BOTH walks
    *    of the recall report (truth + SQ8 candidate) are q27's brute
    *    tier; the fusion/report stages on top are answer-sized
    *    equi-joins and reduces only.
    *  - q133/q134: both walks of the Matryoshka evals (full-dim truth +
    *    prefix candidate) are q27's brute tier; the recall/NDCG stages
    *    on top are answer-sized equi-joins and reduces only (NDCG's
    *    IDCG side is a k-row series). */
  private val intendedBnlj = Set("q27_ann_cosine", "q70_pq_adc",
    "q63_source_drift", "q64_distinctive_terms", "q93_knn_label",
    "q101_sq_topk", "q102_semantic_decontam", "q113_doremi_weights",
    "q119_perplexity_buckets", "q124_hard_negatives", "q125_curriculum_order",
    "q126_hybrid_rrf", "q127_sq8_recall", "q133_matryoshka_recall",
    "q134_prefix_ndcg")

  test("no declared query plans a cartesian product; BNLJ only where intended") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    queries.Queries.all.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan
      val nodes = plan.collectWithSubqueries {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }.flatMap(_.collect {
        case c: CartesianProductExec => ("cartesian", c)
        case b: BroadcastNestedLoopJoinExec => ("bnlj", b)
      })
      if (nodes.exists(_._1 == "cartesian")) offenders += s"$name: CartesianProduct"
      if (nodes.exists(_._1 == "bnlj") && !intendedBnlj(name)) offenders += s"$name: BNLJ"
      GraftSession.releaseCaches(spark, blocking = true)
    }
    assert(offenders.isEmpty,
      s"quadratic join shapes outside the intended brute-force tiers:\n${offenders.mkString("\n")}")
  }
}
