package graft.pipeline

import scala.util.control.NonFatal

/** Stage-level retry with exponential backoff — the reference's Step
  * Functions retry policy (infra/lambda.tf:161-173: 3 attempts, backoff
  * rate 2.0) as a driver-side wrapper. Spark task retry already covers
  * executor loss; this covers whole-stage transients the task scheduler
  * can't see, like the API fetch.
  */
object Retry {

  /** @param transient only failures this predicate accepts are retried —
    *                   programming errors re-throw immediately (the
    *                   reference retries Lambda transients, not task.failed)
    * @param sleep injectable for specs (no real sleeping in tests) */
  final case class Policy(attempts: Int = 3, initialDelayMs: Long = 1000L,
                          backoff: Double = 2.0,
                          transient: Throwable => Boolean = defaultTransient,
                          sleep: Long => Unit = Thread.sleep) {
    require(attempts >= 1, s"attempts must be >= 1, got $attempts")
  }

  /** Explicit transient signal for remote-status failures (HTTP 5xx,
    * throttling) that surface as something other than an IOException —
    * clients raise this to opt a failure into the default retry set. */
  final class TransientFailure(message: String, cause: Throwable = null)
    extends RuntimeException(message, cause)

  /** Transient = an explicit allowlist: network I/O, timeouts, and the
    * explicit [[TransientFailure]] signal. Everything else — including
    * RuntimeException subclasses like MatchError or ClassCastException —
    * is a programming error and re-throws immediately rather than being
    * masked behind backoff sleeps; callers needing broader retry pass a
    * custom predicate. */
  def defaultTransient(e: Throwable): Boolean = e match {
    case _: TransientFailure                      => true
    case _: java.io.IOException                   => true
    case _: java.util.concurrent.TimeoutException => true
    case _                                        => false
  }

  /** Run `f`, retrying per `policy`. The last failure propagates. */
  def apply[A](policy: Policy = Policy())(f: => A): A = {
    var delay = policy.initialDelayMs
    var attempt = 1
    while (true) {
      try return f
      catch {
        case NonFatal(e) if attempt < policy.attempts && policy.transient(e) =>
          policy.sleep(delay)
          delay = math.max(1L, (delay * policy.backoff).toLong)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
