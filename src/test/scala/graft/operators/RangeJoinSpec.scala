package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("bucketized interval join equals the naive range join exactly") {
    // Tables.events owns the ts normalization (nanos-era long vs the
    // micros TIMESTAMP the round-13 testdata writes) — never convert raw
    val ev = graft.sources.Tables.events(spark, sf)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))

    val bucketized = RangeJoin.intervalJoin(p, v, "user_id", "ts", "view_ts", 3600L)
      .select("event_id", "view_id")
    val naive = p.join(v, Seq("user_id"))
      .where(col("view_ts") <= col("ts") &&
             col("view_ts") >= col("ts") - expr("INTERVAL 1 HOUR"))
      .select("event_id", "view_id")

    assert(bucketized.count() === naive.count())
    assert(bucketized.exceptAll(naive).isEmpty && naive.exceptAll(bucketized).isEmpty)
    assert(bucketized.count() > 0, "fixture should produce matches")
  }

  test("gap boundary: equal timestamps match, gap+1s does not") {
    import spark.implicits._
    val t = java.sql.Timestamp.valueOf(_: String)
    val l = Seq((1L, 10L, t("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val r = Seq(
      (10L, 100L, t("2024-01-01 10:00:00")),  // equal: match
      (10L, 101L, t("2024-01-01 09:00:00")),  // exactly gap: match
      (10L, 102L, t("2024-01-01 08:59:59")),  // gap+1s: no
      (10L, 103L, t("2024-01-01 10:00:01"))   // future: no
    ).toDF("user_id", "view_id", "view_ts")
    val got = RangeJoin.intervalJoin(l, r, "user_id", "ts", "view_ts", 3600L)
      .select("view_id").as[Long].collect().toSet
    assert(got === Set(100L, 101L))
  }
}
