package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{OracleSql, Queries}

/** Every declared query must carry a DuckDB oracle and vice versa — the
  * correctness gate hash-compares exactly the intersection, so a missing
  * oracle silently downgrades a query to rows-only and an orphaned oracle
  * is dead verification code. (This is also what keeps the OracleSql
  * header's "all of them" claim honest; the count drifted twice before.) */
class OracleCoverageSpec extends AnyFunSuite {

  test("queries and oracles cover exactly the same keys") {
    val q = Queries.all.keySet
    val o = OracleSql.all.keySet
    assert((q -- o) === Set.empty[String], s"queries without an oracle: ${q -- o}")
    assert((o -- q) === Set.empty[String], s"oracles without a query: ${o -- q}")
  }

  test("SparkEntry re-exports the full maps") {
    assert(SparkEntry.queries.keySet === Queries.all.keySet)
    assert(SparkEntry.oracleSql.keySet === OracleSql.all.keySet)
  }
}
