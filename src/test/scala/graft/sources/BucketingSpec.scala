package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing is the at-rest co-location strategy SCALE.md leans on: a join
  * between two tables bucketed on the join key runs WITHOUT any shuffle
  * exchange — each task zips matching buckets. This spec proves the engine's
  * write path produces such tables and that Catalyst exploits them. */
class BucketingSpec extends SparkSpec {

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // force AQE final plan
    // under AQE, exchanges hide inside materialized ShuffleQueryStageExec
    // subtrees — count on the plan string, which renders all of them
    df.queryExecution.executedPlan.toString
      .linesIterator.count(l => l.contains("Exchange hashpartitioning"))
  }

  test("join of co-bucketed tables plans zero shuffle exchanges") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable("b_orders")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable("b_lineitem")

    val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
    // disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      assert(shuffles(joined) === 0,
        "co-bucketed join must not shuffle (bucket-local sort-merge)")
      // sanity: same join on raw parquet DOES shuffle
      val raw = spark.read.parquet(s"$sf/orders.parquet")
        .join(spark.read.parquet(s"$sf/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
      assert(shuffles(raw) > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
