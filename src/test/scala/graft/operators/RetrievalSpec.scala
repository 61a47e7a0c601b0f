package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RRF fusion and recall reporting: hand-computed micro-unit arithmetic,
  * consensus-over-single-system ordering, zero-hit reporting, guards. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def micro(rank: Long, k0: Long = 60L): Long =
    math.round(1e12 / (k0 + rank))

  test("rrfFuse: consensus documents outrank single-system toppers; exact micro-units") {
    // doc 7 is rank 2 in BOTH systems; doc 1 tops system A only, doc 2
    // tops system B only. RRF: 2/(60+2) > 1/(60+1) — consensus wins.
    val a = Seq((1L, 1L), (7L, 2L), (3L, 3L)).toDF("doc_id", "rk")
    val b = Seq((2L, 1L), (7L, 2L), (4L, 3L)).toDF("doc_id", "rk")
    val got = Retrieval.rrfFuse(Seq(a, b), "doc_id", "rk", k0 = 60, topK = 10)
      .as[(Long, Long, Long)].collect()
    assert(got.head._1 === 7L && got.head._2 === 2L)
    assert(got.head._3 === 2 * micro(2))
    val d1 = got.find(_._1 == 1L).get
    assert(d1._2 === 1L && d1._3 === micro(1))
    // full ordering: 7 (consensus), then 1 and 2 (tied micro, id break), 3, 4
    assert(got.map(_._1).toSeq === Seq(7L, 1L, 2L, 3L, 4L))
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(Seq(a), "doc_id", "rk") }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(a, b), "doc_id", "rk", k0 = -1)
    }
  }

  test("recallReport: hits counted per query, zero-hit queries report 0, guards") {
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L), (3L, 30L), (3L, 31L))
      .toDF("query_id", "neighbor_id")
    val cand = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 99L), (3L, 98L), (3L, 99L))
      .toDF("query_id", "neighbor_id")
    val got = Retrieval.recallReport(truth, cand, k = 2)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 2L, 1.0), (2L, 1L, 0.5), (3L, 0L, 0.0)))
    intercept[IllegalArgumentException] { Retrieval.recallReport(truth, cand, 0) }
  }

  test("ndcgReport: rank-discounted gains against a hand computation, " +
    "rank-sensitivity recall cannot see, short truth IDCG, zero-hit 0, guards") {
    def d(r: Long) = 1.0 / (math.log(r + 1.0) / math.log(2.0))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L), (3L, 30L))
      .toDF("query_id", "neighbor_id")
    // q1: both hits, at ranks 1 and 3; q2: same RECALL as a rank-1+2
    //     ordering would give, but hits at ranks 2 and 3 — NDCG drops;
    // q3: single-truth query (IDCG over ONE slot), zero hits
    val cand = Seq((1L, 10L, 1L), (1L, 99L, 2L), (1L, 11L, 3L),
      (2L, 98L, 1L), (2L, 20L, 2L), (2L, 21L, 3L),
      (3L, 97L, 1L)).toDF("query_id", "neighbor_id", "rk")
    val got = Retrieval.ndcgReport(truth, cand, k = 3)
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    val idcg2 = d(1) + d(2)
    assert(got(0) === ((1L, r6(d(1) + d(3)), r6((d(1) + d(3)) / idcg2))))
    assert(got(1) === ((2L, r6(d(2) + d(3)), r6((d(2) + d(3)) / idcg2))))
    assert(got(2) === ((3L, 0.0, 0.0)), "zero hits report 0, not silence")
    assert(got(0)._3 > got(1)._3,
      "equal recall, better ranks → higher NDCG (the metric's point)")
    // a perfect ordering scores exactly 1.0
    val perfect = Seq((1L, 10L, 1L), (1L, 11L, 2L))
      .toDF("query_id", "neighbor_id", "rk")
    val p = Retrieval.ndcgReport(truth.where(col("query_id") === 1),
      perfect, k = 2).select("ndcg").as[Double].head()
    assert(p === 1.0)
    // ranks beyond k are ignored (re-score a wide list at tighter k)
    val wide = Retrieval.ndcgReport(truth, cand, k = 2)
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(wide(0)._2 === r6(d(1)), "q1's rank-3 hit is outside k=2")
    intercept[IllegalArgumentException] { Retrieval.ndcgReport(truth, cand, 0) }
  }
}
