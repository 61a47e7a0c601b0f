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

  /** Transient = I/O-shaped: network/timeouts and generic runtime failures
    * from remote surfaces; argument/state bugs are not retried. */
  def defaultTransient(e: Throwable): Boolean = e match {
    case _: java.io.IOException                   => true
    case _: java.util.concurrent.TimeoutException => true
    case _: IllegalArgumentException              => false
    case _: IllegalStateException                 => false
    case _: NullPointerException                  => false
    case NonFatal(_)                              => true
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
