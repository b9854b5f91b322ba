package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.Concurrent

/** The §2.6 overlap combinator: results in leg order, genuine overlap,
  * and the settle-all failure discipline (a failing leg must not tear
  * down its siblings mid-write — everything runs, then the first
  * failure rethrows). */
class ConcurrentSpec extends AnyFunSuite {

  test("all returns results in leg order") {
    val out = Concurrent.all[Int](Seq(
      () => { Thread.sleep(30); 1 },
      () => 2,
      () => { Thread.sleep(10); 3 }))
    assert(out == Seq(1, 2, 3))
  }

  test("legs overlap (wall-clock below the serial sum)") {
    val t0 = System.nanoTime()
    Concurrent.run(
      () => Thread.sleep(150),
      () => Thread.sleep(150),
      () => Thread.sleep(150),
      () => Thread.sleep(150))
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 450, s"four 150 ms legs took $ms ms — not overlapped")
  }

  test("a failing leg lets siblings settle, then rethrows") {
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val e = intercept[RuntimeException](Concurrent.run(
      () => throw new RuntimeException("leg boom"),
      () => { Thread.sleep(50); done.incrementAndGet(): Unit },
      () => { Thread.sleep(50); done.incrementAndGet(): Unit }))
    assert(e.getMessage == "leg boom")
    assert(done.get() == 2, "siblings must run to completion before rethrow")
  }

  test("empty and single-leg calls run inline") {
    assert(Concurrent.all[Int](Seq.empty) == Seq.empty)
    val t = Thread.currentThread()
    var ran: Thread = null
    Concurrent.all[Int](Seq(() => { ran = Thread.currentThread(); 7 }))
    assert(ran eq t, "a single leg must not pay a pool")
  }
}
