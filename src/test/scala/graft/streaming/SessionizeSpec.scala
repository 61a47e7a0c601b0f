package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class SessionizeSpec extends SparkSpec {
  import spark.implicits._
  import Sessionize._

  private def t(s: String) = Timestamp.valueOf(s)

  test("flatMapGroupsWithState sessionization closes sessions after the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Click]
    val q = Sessionize.sessionize(input.toDS(), gapSeconds = 600, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    // user 1: two events 5 min apart (one session); user 2: one event
    input.addData(
      Click(1L, t("2024-01-01 10:00:00"), 2.0),
      Click(1L, t("2024-01-01 10:05:00"), 3.0),
      Click(2L, t("2024-01-01 10:01:00"), 7.0))
    q.processAllAvailable()
    // advance the watermark far past both sessions' gap windows
    input.addData(Click(3L, t("2024-01-01 12:00:00"), 1.0))
    q.processAllAvailable()
    input.addData(Click(3L, t("2024-01-01 13:00:00"), 1.0))
    q.processAllAvailable()
    val out = spark.table("sessions_out")
      .select("user_id", "n_events", "total_value")
      .as[(Long, Long, Double)].collect().toSet
    q.stop()
    assert(out.contains((1L, 2L, 5.0)), s"got $out")
    assert(out.contains((2L, 1L, 7.0)), s"got $out")
  }

  test("a new event after the gap opens a second session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Click]
    val q = Sessionize.sessionize(input.toDS(), gapSeconds = 60, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions_out2")
      .outputMode("append").start()
    input.addData(Click(1L, t("2024-01-01 10:00:00"), 1.0))
    q.processAllAvailable()
    input.addData(Click(1L, t("2024-01-01 10:10:00"), 1.0)) // > 60s later
    q.processAllAvailable()
    input.addData(Click(9L, t("2024-01-01 11:00:00"), 1.0)) // push watermark
    q.processAllAvailable()
    input.addData(Click(9L, t("2024-01-01 12:00:00"), 1.0))
    q.processAllAvailable()
    val n = spark.table("sessions_out2").where($"user_id" === 1L).count()
    q.stop()
    assert(n === 2L, "expected two closed sessions for user 1")
  }

  test("a sub-watermark event does not crash the query (timeout clamp contract)") {
    // regression for the setTimeoutTimestamp clamp: an event whose ts + gap
    // lands at or below the current watermark must never kill the query.
    // Spark 4.1's stateful-operator late filter drops such rows before the
    // function (so the session never forms); the clamp in Sessionize guards
    // the remaining race where the late-events watermark lags the eviction
    // watermark by a batch. Either way the contract is: no crash, later
    // sessions unaffected.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Click]
    val q = Sessionize.sessionize(input.toDS(), gapSeconds = 60, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode("append").start()
    input.addData(Click(9L, t("2024-01-01 12:00:00"), 1.0))
    q.processAllAvailable() // watermark advances to 12:00
    // 10:00 is two hours below the watermark; unclamped timeout would be 10:01
    input.addData(Click(1L, t("2024-01-01 10:00:00"), 5.0))
    q.processAllAvailable() // must not throw
    // normal in-order traffic still sessionizes after the late arrival
    input.addData(Click(2L, t("2024-01-01 12:30:00"), 3.0))
    q.processAllAvailable()
    input.addData(Click(9L, t("2024-01-01 14:00:00"), 1.0))
    q.processAllAvailable()
    input.addData(Click(9L, t("2024-01-01 15:00:00"), 1.0))
    q.processAllAvailable()
    assert(q.exception.isEmpty, s"query died: ${q.exception}")
    val out = spark.table("sessions_late").where($"user_id" === 2L)
      .select("n_events", "total_value").as[(Long, Double)].collect().toSet
    q.stop()
    assert(out === Set((1L, 3.0)), s"post-late-event session missing: $out")
  }
}
