package graft.util

/** Generic retry for non-HTTP callables — the engine-side form of the
  * reference's `retry` / `retry_v2` decorators
  * (`/root/reference/src/pyveb/custom_decorators.py:13-77`).
  *
  * Semantics preserved from the reference:
  *   - the current attempt number is injected into the callable
  *     (`attempt = 0, 1, …`) so idempotent cleanup can branch on it
  *     ("Ensure you setup **kwargs … The attempt number is passed");
  *   - quadratic backoff between attempts: sleep (attempt+1)² seconds
  *     after failed attempt `attempt`;
  *   - `retry_v2` raises the last error after the final attempt. The
  *     reference's v1 calls `sys.exit(1)` — a library must not kill the
  *     JVM, so both variants here surface a [[RetryExhausted]] carrying
  *     every attempt's error instead (the caller can exit if it wants).
  *
  * HTTP-aware retry (status-code classes, Retry-After) lives in
  * [[graft.api.ApiFanout.RetryPolicy]]; this is the plain-callable tier.
  */
object Retry {

  final class RetryExhausted(val attempts: Int, val errors: Seq[Throwable])
    extends RuntimeException(
      s"failed after $attempts attempts: ${errors.lastOption.fold("?")(_.toString)}",
      errors.lastOption.orNull)

  /** Backoff hook — seconds to wait after failed attempt `attempt`
    * (0-based). Reference formula: (attempt+1)². Overridable so tests
    * don't sleep. */
  type Backoff = Int => Double
  val QuadraticBackoff: Backoff = attempt => (attempt + 1.0) * (attempt + 1.0)

  /** Run `f(attempt)` up to `retries` times (reference `retry`:
    * attempts = retries). Throws [[RetryExhausted]] when all fail. */
  def retry[T](retries: Int, backoff: Backoff = QuadraticBackoff,
               sleep: Double => Unit = defaultSleep)(f: Int => T): T =
    run(retries, backoff, sleep, f)

  /** Run `f(attempt)` up to `retries + 1` times — one initial attempt
    * plus `retries` retries (reference `retry_v2`'s loop over
    * `range(retries+1)`). */
  def retryV2[T](retries: Int, backoff: Backoff = QuadraticBackoff,
                 sleep: Double => Unit = defaultSleep)(f: Int => T): T =
    run(retries + 1, backoff, sleep, f)

  private def defaultSleep(seconds: Double): Unit =
    Thread.sleep((seconds * 1000).toLong)

  private def run[T](attempts: Int, backoff: Backoff, sleep: Double => Unit,
                     f: Int => T): T = {
    require(attempts > 0, s"retry needs at least one attempt, got $attempts")
    val errors = scala.collection.mutable.ArrayBuffer.empty[Throwable]
    var attempt = 0
    while (attempt < attempts) {
      try return f(attempt)
      catch {
        case scala.util.control.NonFatal(e) =>
          errors += e
          if (attempt < attempts - 1) sleep(backoff(attempt))
      }
      attempt += 1
    }
    throw new RetryExhausted(attempts, errors.toSeq)
  }
}
