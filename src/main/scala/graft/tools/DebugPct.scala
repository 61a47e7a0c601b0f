package graft.tools
import org.apache.spark.sql.functions._
object DebugPct {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val o = graft.sources.Tables.orders(spark, "/root/testdata/sf0.01")
    o.groupBy(col("o_orderpriority")).agg(
      percentile(col("o_totalprice"), lit(0.5)).as("med"),
      percentile(col("o_totalprice"), lit(0.9)).as("p90"),
      count(lit(1)).as("n")).orderBy("o_orderpriority")
      .collect().foreach(r => println(s"SPARK|${r.mkString("|")}"))
    spark.stop()
  }
}
