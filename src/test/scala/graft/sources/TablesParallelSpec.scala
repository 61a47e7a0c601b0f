package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.SparkSpec

/** The unsplittable-scan guard (OPTIMIZATION_r19.md Finding 1):
  * `Tables.parallel` repartitions a table by its key ONLY when the
  * physical scan cannot reach the session's core count, and never costs
  * the scan its pushdown. */
class TablesParallelSpec extends SparkSpec {

  test("parallel repartitions a single-row-group scan up to the core count") {
    val df = Tables.documents(spark, sf)
    assert(df.rdd.getNumPartitions < spark.sparkContext.defaultParallelism,
      "fixture assumption: the testdata scan is narrower than the session")
    val par = Tables.parallel(df, col("doc_id"))
    assert(par.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
    // identical rows — the repartition is layout-only
    assert(par.count() === df.count())
  }

  test("parallel is a no-op when the scan already reaches the core count") {
    // a relation already at (or beyond) session parallelism passes through
    val wide = Tables.documents(spark, sf)
      .repartition(spark.sparkContext.defaultParallelism + 3, col("doc_id"))
    val par = Tables.parallel(wide, col("doc_id"))
    assert(par.rdd.getNumPartitions === wide.rdd.getNumPartitions,
      "parallel must not touch an input that already has enough partitions")
  }

  test("filter pushdown survives the repartition (PushedFilters on the scan)") {
    val par = Tables.parallel(Tables.events(spark, sf), col("event_id"))
      .where(col("event_type") === "purchase")
    par.count()
    val scan = par.queryExecution.executedPlan.collectWithSubqueries {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }.flatMap(_.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }).head
    assert(scan.metadata("PushedFilters").contains("EqualTo(event_type,purchase)"),
      s"filter must push through the repartition: ${scan.metadata("PushedFilters")}")
    // and the repartition exchange is present above it
    val shuffles = par.queryExecution.executedPlan.collectWithSubqueries {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }.flatMap(_.collect { case e: ShuffleExchangeExec => e })
    assert(shuffles.nonEmpty)
  }
}
