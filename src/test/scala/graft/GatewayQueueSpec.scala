package graft

import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.CountDownLatch

/** Gateway admission control ([[graft.tools.RequestQueue]]): the
  * bounded-queue contract — in-flight + queued capped, overflow shed
  * immediately, capacity recovered as requests complete. */
class GatewayQueueSpec extends AnyFunSuite {

  test("burst past capacity: maxInFlight+maxQueued admitted, the rest rejected immediately, slots recycle") {
    val q = new graft.tools.RequestQueue(maxInFlight = 2, maxQueued = 2)
    val gate = new CountDownLatch(1)
    // admission is permit-based at submit time (no execution race):
    // exactly 4 of a burst of 8 get slots, 4 are shed synchronously
    val burst = (0 until 8).map(_ => q.submit { gate.await(); "ok" })
    assert(burst.count(_.isDefined) == 4,
      s"admitted ${burst.count(_.isDefined)} of a burst of 8 at capacity 2+2")
    assert(q.rejected == 4 && q.admitted == 4)
    // a straggler while saturated is also shed, not queued unboundedly
    assert(q.submit("late").isEmpty && q.rejected == 5)
    gate.countDown()
    burst.flatten.foreach(f => assert(f.get() == "ok"))
    // completed requests release their permits: admission resumes
    val again = q.submit(42)
    assert(again.isDefined && again.get.get() == 42)
    assert(q.admitted == 5)
    q.shutdown()
  }

  test("submit after shutdown sheds (None), never throws, and leaks no permit") {
    val q = new graft.tools.RequestQueue(maxInFlight = 2, maxQueued = 2)
    assert(q.submit(1).map(_.get()) == Some(1))
    q.shutdown()
    // drain-time straggler: documented load-shed signal, not an
    // undocumented RejectedExecutionException
    assert(q.submit(2).isEmpty && q.rejected == 1)
    // the permit the racing tryAcquire took was released — capacity
    // would otherwise shrink by one per post-shutdown submit
    assert(q.submit(3).isEmpty && q.rejected == 2)
  }

  test("work executes with at most maxInFlight concurrently") {
    val q = new graft.tools.RequestQueue(maxInFlight = 2, maxQueued = 6)
    val active = new java.util.concurrent.atomic.AtomicInteger(0)
    val peak = new java.util.concurrent.atomic.AtomicInteger(0)
    val fs = (0 until 8).flatMap(_ => q.submit {
      val a = active.incrementAndGet()
      peak.getAndUpdate(p => math.max(p, a)): Unit
      Thread.sleep(20)
      active.decrementAndGet(): Unit
    })
    assert(fs.size == 8, "all 8 fit within capacity 2+6")
    fs.foreach(_.get())
    assert(peak.get() <= 2, s"executed ${peak.get()} concurrently past the in-flight bound")
    q.shutdown()
  }
}
