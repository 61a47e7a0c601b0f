package graft

import graft.queries.Queries

/** The shared-index contract (round 11): q81/q82/q83 all probe ONE
  * memoized clustered layout built once per (application, SF dir), and
  * each must stay value-identical to its in-memory twin (q72/q39/q80 —
  * whose SQL is also their oracle), so the sharing can never move a hash.
  * Running all three in one suite also exercises the memo: the second and
  * third queries reuse the first build. */
class QueriesIndexedSpec extends SparkSpec {

  private def sortedRows(q: Queries.Q): Seq[String] =
    q(spark, sf).collect().map(_.toString).sorted.toSeq

  test("q81 (ADC probe over the shared stored index) ≡ q72 (in-memory IVF+PQ)") {
    assert(sortedRows(Queries.q81_ivfpq_indexed) === sortedRows(Queries.q72_ivfpq))
  }

  test("q82 (exact-cosine probe over the shared stored index) ≡ q39 (in-memory IVF)") {
    assert(sortedRows(Queries.q82_ivf_indexed) === sortedRows(Queries.q39_ann_ivf))
  }

  test("q83 (stored-index SemDeDup) ≡ q80 (in-memory SemDeDup)") {
    assert(sortedRows(Queries.q83_semantic_indexed) === sortedRows(Queries.q80_semantic_dedup))
  }
}
