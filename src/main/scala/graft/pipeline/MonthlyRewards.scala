package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** A1: the `monthly_count` analytics aggregate (reference api.py:9-24):
  * filter rejected → group by month(createdAt) → sum/mean/max/min → round(2).
  *
  * P4 parity (SURVEY §8.5): pandas `!=` KEEPS null reasons; Spark `=!=`
  * would drop them, so the filter is null-safe — 57/1753 fixture rows have
  * null `reason` and must survive.
  */
object MonthlyRewards {

  def monthlyCount(rewards: DataFrame): DataFrame =
    rewards
      .where(col("reason").isNull || col("reason") =!= "Rejected by admin")
      .groupBy(date_trunc("month", col("createdAt")).as("month"))
      .agg(
        round(sum(col("plu_amount").cast("double")), 2).as("sum_plu"),
        round(avg(col("plu_price")), 2).as("plu_mean"),
        round(max(col("plu_price")), 2).as("plu_max"),
        round(min(col("plu_price")), 2).as("plu_min"))
}
