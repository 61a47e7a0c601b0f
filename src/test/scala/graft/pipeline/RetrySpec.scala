package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class RetrySpec extends AnyFunSuite {

  private def policy(attempts: Int = 3, slept: collection.mutable.Buffer[Long] = null) =
    Retry.Policy(attempts = attempts, initialDelayMs = 10L,
      sleep = d => if (slept != null) slept += d)

  test("a flaky operation succeeds on a later attempt with exponential backoff") {
    val slept = collection.mutable.Buffer.empty[Long]
    var calls = 0
    val out = Retry(policy(slept = slept)) {
      calls += 1
      if (calls < 3) throw new java.io.IOException("connection reset")
      "payload"
    }
    assert(out === "payload" && calls === 3)
    assert(slept.toSeq === Seq(10L, 20L), "backoff rate 2.0 over the 10ms base")
  }

  test("attempts are exhausted and the last transient failure propagates") {
    var calls = 0
    val e = intercept[java.io.IOException] {
      Retry(policy(attempts = 3)) { calls += 1; throw new java.io.IOException(s"down $calls") }
    }
    assert(calls === 3 && e.getMessage === "down 3")
  }

  test("non-transient failures never retry") {
    var calls = 0
    intercept[IllegalArgumentException] {
      Retry(policy()) { calls += 1; throw new IllegalArgumentException("bad input") }
    }
    assert(calls === 1)
  }

  test("programming errors that extend RuntimeException are not retried") {
    // the transient default is an allowlist: anything outside it — including
    // RuntimeException subclasses like MatchError — re-throws on attempt 1
    var calls = 0
    intercept[MatchError] {
      Retry(policy()) { calls += 1; (calls: Any) match { case "never" => } }
    }
    assert(calls === 1)
    var calls2 = 0
    intercept[ClassCastException] {
      Retry(policy()) { calls2 += 1; throw new ClassCastException("bad cast") }
    }
    assert(calls2 === 1)
  }

  test("wrapped transients are retried: the cause chain is inspected") {
    // client wrappers routinely bury the transient root one or two causes
    // deep (UncheckedIOException, ExecutionException-style wrappers)
    var calls = 0
    val out = Retry(policy()) {
      calls += 1
      if (calls < 2) throw new java.io.UncheckedIOException(
        new java.io.IOException("connection reset"))
      "ok"
    }
    assert(out === "ok" && calls === 2)
    var calls2 = 0
    val out2 = Retry(policy()) {
      calls2 += 1
      if (calls2 < 2) throw new RuntimeException("client wrapper",
        new RuntimeException("inner wrapper",
          new java.util.concurrent.TimeoutException("read timed out")))
      "ok"
    }
    assert(out2 === "ok" && calls2 === 2)
    // a wrapper whose chain holds no transient root is still a programming
    // error — no retry
    var calls3 = 0
    intercept[RuntimeException] {
      Retry(policy()) { calls3 += 1
        throw new RuntimeException("wrapper", new IllegalStateException("bug")) }
    }
    assert(calls3 === 1)
    // a cyclic cause chain must not hang the classifier
    val cyclic = new RuntimeException("a")
    val inner = new RuntimeException("b", cyclic)
    cyclic.initCause(inner)
    assert(!Retry.defaultTransient(cyclic))
  }

  test("the explicit TransientFailure signal opts a failure into retry") {
    var calls = 0
    val out = Retry(policy()) {
      calls += 1
      if (calls < 2) throw new Retry.TransientFailure("status 503")
      "ok"
    }
    assert(out === "ok" && calls === 2)
  }

  test("flaky API client: pipeline fetch succeeds without the fixture fallback") {
    val spark = graft.SparkSpec.session
    var calls = 0
    val flaky = new ApiIngest.Client {
      def getTransactions(): String = {
        calls += 1
        if (calls < 2) throw new Retry.TransientFailure("status 503")
        """[{"transaction_id": "t1", "date": "2024-01-01", "amount": "1.00"}]"""
      }
      def getRewards(): String =
        """[{"reward_id": "r1", "plu_amount": "5", "reward_type": "cashback"}]"""
    }
    val (tx, rw) = ApiIngest.fetchData(spark, Some(flaky),
      "/nonexistent.csv", "/nonexistent.csv", retry = Retry.Policy(sleep = _ => ()))
    // the fixture paths are unreadable, so rows can only have come from the
    // retried API pull
    assert(tx.count() === 1L && rw.count() === 1L && calls === 2)
  }
}
