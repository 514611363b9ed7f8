package graft.core

import java.util.concurrent.CountDownLatch
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite

/** Fail-fast contract of the driver-side unit pool: callers unwind
  * (and e.g. unpersist shared caches) only AFTER every sibling unit
  * has stopped touching caller-owned resources.
  */
class ParSpec extends AnyFunSuite {

  test("mapOrdered: a poisoned unit interrupts siblings and awaits their exit before throwing") {
    val startGate = new CountDownLatch(4)
    val exited = new AtomicInteger(0)
    val t0 = System.nanoTime()
    val e = intercept[RuntimeException] {
      Par.mapOrdered(Array(1, 2, 3, 4), maxThreads = 4) { u =>
        startGate.countDown()
        startGate.await() // every unit is live before the poison fires
        if (u == 1) throw new RuntimeException("poison")
        try Thread.sleep(60000L)
        catch { case _: InterruptedException => () } // fail-fast interrupt
        finally exited.incrementAndGet()
        u
      }
    }
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(e.getMessage == "poison")
    // returned long before the siblings' 60 s sleeps: the pool was
    // interrupted, not drained
    assert(elapsedSec < 30, s"fail-fast took ${elapsedSec}s — siblings were not interrupted")
    // and every sibling had EXITED before mapOrdered returned — the
    // caller can safely release shared resources while unwinding
    assert(exited.get() == 3, s"${exited.get()} of 3 siblings exited before the caller resumed")
  }

  test("mapOrdered: success keeps input order") {
    val out = Par.mapOrdered(Array(3, 1, 2), maxThreads = 3)(u => { Thread.sleep(u * 10L); u * 10 })
    assert(out.toSeq == Seq(30, 10, 20))
  }
}
