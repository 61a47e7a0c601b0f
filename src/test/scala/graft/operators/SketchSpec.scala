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

  test("count-min sketch never undercounts, and is exact without collisions") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact")).cache()
    // narrow grid: collisions certain (vocab 31 into width 8)
    val narrow = Sketches.cmsEstimate(
      Sketches.countMinSketch(toks, "tok", depth = 2, width = 8),
      exact.select("tok"), "tok", depth = 2, width = 8)
    val n = narrow.join(exact, Seq("tok"))
      .as[(String, Long, Long)].collect()
    assert(n.nonEmpty && n.forall { case (_, est, ex) => est >= ex },
      "CMS point estimates must never undercount")
    assert(n.exists { case (_, est, ex) => est > ex },
      "width 8 over a 31-token vocab must collide somewhere")
    // wide grid: no collisions expected → estimates exact
    val wide = Sketches.cmsEstimate(
      Sketches.countMinSketch(toks, "tok", depth = 4, width = 4096),
      exact.select("tok"), "tok", depth = 4, width = 4096)
    assert(wide.join(exact, Seq("tok"))
      .where(col("cms_count") =!= col("exact")).count() === 0,
      "a 4096-wide grid over 31 keys should estimate exactly")
    exact.unpersist()
  }

  test("never-seen probe keys estimate 0 when any cell is untouched") {
    // build over 3 keys on a wide grid: an unseen probe key almost surely
    // hits at least one zero cell, and min over ALL depth rows must see it
    val seen = Seq("alpha", "beta", "gamma").toDF("tok")
    val sketch = Sketches.countMinSketch(seen, "tok", depth = 4, width = 4096)
    val probes = Seq("alpha", "never-in-the-stream", "also-absent").toDF("tok")
    val est = Sketches.cmsEstimate(sketch, probes, "tok", depth = 4, width = 4096)
      .as[(String, Long)].collect().toMap
    assert(est.size === 3, "every probe key must surface, seen or not")
    assert(est("alpha") === 1L)
    assert(est("never-in-the-stream") === 0L && est("also-absent") === 0L,
      "a key hitting an unmaterialized (zero) cell must estimate 0, not vanish")
  }

  test("count-min grids from disjoint shards merge by cell-wise addition") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def grid(df: org.apache.spark.sql.DataFrame) = Sketches.countMinSketch(
      df.select(explode(split(col("text"), " ")).as("tok")), "tok", 4, 64)
    val whole = grid(docs)
    val merged = grid(docs.where(col("doc_id") % 2 === 0))
      .unionByName(grid(docs.where(col("doc_id") % 2 === 1)))
      .groupBy("d", "b").agg(sum(col("cnt")).as("cnt"))
    assert(whole.join(merged, Seq("d", "b"))
      .where(whole("cnt") =!= merged("cnt")).count() === 0
      && whole.count() === merged.count(),
      "sketch(A ∪ B) must equal sketch(A) + sketch(B) cell-wise")
  }
}
