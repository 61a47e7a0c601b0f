package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's failure arithmetic — the exact surface a -1.0 sentinel once
  * corrupted (a failed run used to flow into medians and SHRINK the
  * headline total). */
class BenchSpec extends AnyFunSuite {

  test("median ignores failed runs") {
    assert(Bench.medianOverSuccesses(Seq(Some(1.0), None, Some(3.0))) === (Some(3.0), 1))
    assert(Bench.medianOverSuccesses(Seq(Some(2.0), Some(1.0), Some(3.0))) === (Some(2.0), 0))
    assert(Bench.medianOverSuccesses(Seq(None, None, None)) === (None, 3))
    assert(Bench.medianOverSuccesses(Nil) === (None, 0))
  }

  test("all-failed queries are excluded from the total and counted, partial failures listed") {
    val json = Bench.renderJson(Seq(
      ("q_ok", Some(1.5), 0),
      ("q_flaky", Some(2.0), 1),
      ("q_dead", None, 3)), runsPerQuery = 3, sfDir = "/sf")
    // total = 1.5 + 2.0 only; q_dead contributes nothing (never -1.0)
    assert(json.contains("\"value\":3.5"), json)
    assert(json.contains("\"queries\":{\"q_ok\":1.5,\"q_flaky\":2.0}"), json)
    assert(json.contains("\"failed_runs\":{\"q_flaky\":1,\"q_dead\":3}"), json)
    assert(json.contains("\"n_failed_queries\":1"), json)
    assert(!json.contains("-1"), json)
  }

  test("clean run renders empty failure fields") {
    val json = Bench.renderJson(Seq(("q1", Some(0.5), 0)), 3, "/sf")
    assert(json.contains("\"failed_runs\":{}") && json.contains("\"n_failed_queries\":0"))
  }
}
