package graft.tools

import java.util.concurrent.{Callable, ExecutorService, Executors, Future, Semaphore}
import java.util.concurrent.atomic.AtomicLong

/** Admission control for a serving gateway: at most `maxInFlight`
  * requests execute concurrently and at most `maxQueued` wait behind
  * them; a request arriving past both bounds is REJECTED immediately
  * (fail fast, caller backs off and retries) instead of joining an
  * unbounded queue where every request eventually times out and the
  * driver's heap holds the backlog. This is the standard bounded-queue
  * posture a production gateway puts in front of a shared Spark
  * driver: the driver's scheduler (FAIR pools, see
  * [[ServeGateway]]) shares executor slots across the in-flight set,
  * and the queue bound keeps that set small enough that p99 stays a
  * multiple of p50 rather than a multiple of the backlog length.
  *
  * Not a Spark component — pure JVM admission control in front of
  * whatever closure serves the request (everything here runs
  * driver-side; the Spark jobs a request submits are already bounded
  * by the executor slots).
  */
final class RequestQueue(val maxInFlight: Int, val maxQueued: Int) {
  require(maxInFlight > 0 && maxQueued >= 0)
  // one permit per admissible request (executing or queued) — the
  // tryAcquire is the admission decision, made without blocking
  private val slots = new Semaphore(maxInFlight + maxQueued)
  private val pool: ExecutorService = Executors.newFixedThreadPool(maxInFlight)
  private val rejectedCount = new AtomicLong(0L)
  private val admittedCount = new AtomicLong(0L)

  /** Admit-or-reject: `Some(future)` if the request got a slot
    * (executing now or queued behind ≤ maxQueued others), `None` if
    * the gateway is saturated — the caller's signal to shed load.
    * A submit racing (or following) [[shutdown]] is also `None`, not
    * an exception: the pool's RejectedExecutionException is caught
    * and the already-acquired permit RELEASED — without that, a
    * drain-time straggler would both see an undocumented throw and
    * permanently shrink capacity by one. */
  def submit[A](f: => A): Option[Future[A]] =
    if (!slots.tryAcquire()) { rejectedCount.incrementAndGet(); None }
    else {
      try {
        val fut = pool.submit(new Callable[A] {
          override def call(): A = try f finally slots.release()
        })
        admittedCount.incrementAndGet()
        Some(fut)
      } catch {
        case _: java.util.concurrent.RejectedExecutionException =>
          slots.release()
          rejectedCount.incrementAndGet()
          None
      }
    }

  def rejected: Long = rejectedCount.get()
  def admitted: Long = admittedCount.get()
  def shutdown(): Unit = { pool.shutdown(): Unit }
}
