package graft.streaming

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Structured-Streaming re-expression of the reference's batch refresh
  * (SURVEY §2.9): the overwrite-everything + load-time anti-join strategy
  * becomes watermarked keyed dedup + incremental windowed aggregation.
  *
  * These are plan builders: they accept a streaming DataFrame (readStream /
  * MemoryStream in tests) and return a streaming DataFrame, so the same
  * logic runs under `Trigger.AvailableNow` (the batch-refresh analog) or
  * continuously.
  */
object Streams {

  /** Keyed dedup with bounded state: the streaming J2. The watermark bounds
    * how long a key is remembered — the 45-day budget mirrors the business
    * rule "Automated approval after 45 days" (rewards.csv reason values). */
  def dedupStream(events: DataFrame, key: String, tsCol: String,
                  watermark: String = "45 days"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq(key))

  /** Incremental tumbling-window aggregate — the streaming twin of
    * Queries.q13_hourly_rollup (identical logical plan, incremental state). */
  def hourlyRollup(events: DataFrame, tsCol: String = "ts",
                   watermark: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))
}
