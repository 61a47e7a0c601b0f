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

  /** Bound on the cause-chain walk: deep enough for any realistic client
    * wrapper stack, finite even if a pathological chain cycles. */
  private val MaxCauseDepth = 8

  /** Transient = an explicit allowlist: network I/O (wrapped or not),
    * timeouts, and the explicit [[TransientFailure]] signal. Client
    * libraries routinely wrap the transient root (UncheckedIOException,
    * ExecutionException, bespoke RuntimeExceptions), so the WHOLE cause
    * chain is inspected, bounded by [[MaxCauseDepth]]. Everything else —
    * including RuntimeException subclasses like MatchError or
    * ClassCastException — is a programming error and re-throws immediately
    * rather than being masked behind backoff sleeps; callers needing
    * broader retry pass a custom predicate. */
  def defaultTransient(e: Throwable): Boolean = {
    def matches(t: Throwable): Boolean = t match {
      case _: TransientFailure                      => true
      case _: java.io.IOException                   => true
      case _: java.io.UncheckedIOException          => true
      case _: java.util.concurrent.TimeoutException => true
      case _                                        => false
    }
    var t = e
    var depth = 0
    while (t != null && depth < MaxCauseDepth) {
      if (matches(t)) return true
      t = if (t.getCause eq t) null else t.getCause
      depth += 1
    }
    false
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
