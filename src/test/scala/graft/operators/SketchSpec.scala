package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bounded-error property for the approximate-aggregate tier (q38): HLL++
  * estimates must land within the configured relative error of the exact
  * distinct counts (default rsd = 5%; allow 3× slack for small groups). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct is within tolerance of exact counts") {
    val rows = graft.queries.Queries.q38_hll_distinct(spark, sf)
      .select("event_type", "exact_users", "approx_ok")
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, exact, ok) =>
      assert(exact > 0, s"$et: exact count must be positive")
      assert(ok, s"$et: HLL estimate strayed beyond 15% of exact=$exact")
    }
  }
}
