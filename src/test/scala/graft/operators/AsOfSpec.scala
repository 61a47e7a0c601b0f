package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private lazy val trades = Seq(
    (1L, t("2024-01-01 10:00:00"), 100.0),
    (1L, t("2024-01-01 11:00:00"), 101.0),
    (2L, t("2024-01-01 10:30:00"), 50.0),
  ).toDF("sym", "ts", "px")

  private lazy val quotes = Seq(
    (1L, t("2024-01-01 09:59:00"), 99.5),
    (1L, t("2024-01-01 10:00:00"), 99.9), // equal-ts vs trade 1
    (1L, t("2024-01-01 10:30:00"), 100.5),
    (3L, t("2024-01-01 09:00:00"), 1.0),  // key absent from left
  ).toDF("sym", "ts", "bid")

  test("strict as-of: most recent strictly-earlier quote per key") {
    val out = AsOf.joinAsOf(trades, quotes, Seq("sym"), "ts", "ts", strict = true)
      .select("sym", "ts", "px", "bid", "ts_right")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.get(3))).toSet
    assert(out === Set(
      (1L, t("2024-01-01 10:00:00"), 99.5),   // equal-ts quote excluded
      (1L, t("2024-01-01 11:00:00"), 100.5),
      (2L, t("2024-01-01 10:30:00"), null)))  // no quotes for sym 2
  }

  test("inclusive as-of admits the equal-timestamp right row") {
    val out = AsOf.joinAsOf(trades, quotes, Seq("sym"), "ts", "ts", strict = false)
      .where(col("sym") === 1L && col("ts") === t("2024-01-01 10:00:00"))
      .select("bid").collect().head.getDouble(0)
    assert(out === 99.9)
  }

  test("right-side nulls: attached columns all come from the same matched row") {
    // regression: per-column last(ignoreNulls) windows would stitch bid=99.0
    // from the 10:00 row onto the 11:00 match — the right row must travel
    // as one struct
    val left = Seq((1L, t("2024-01-01 12:00:00"), 1.0)).toDF("sym", "ts", "px")
    val right = Seq(
      (1L, t("2024-01-01 10:00:00"), Some(99.0), Option.empty[Double]),
      (1L, t("2024-01-01 11:00:00"), Option.empty[Double], Some(101.0)),
    ).toDF("sym", "ts", "bid", "ask")
    val out = AsOf.joinAsOf(left, right, Seq("sym"), "ts", "ts")
      .select("ts_right", "bid", "ask").collect().head
    assert(out.getTimestamp(0) === t("2024-01-01 11:00:00"))
    assert(out.isNullAt(1), "bid must be null — it was stitched from an older row")
    assert(out.getDouble(2) === 101.0)
  }

  test("name collisions get the right-suffix; left schema is preserved") {
    val out = AsOf.joinAsOf(trades, quotes, Seq("sym"), "ts", "ts")
    assert(out.columns.toSeq === Seq("sym", "ts", "px", "ts_right", "bid"))
    assert(out.count() === 3)
  }
}
