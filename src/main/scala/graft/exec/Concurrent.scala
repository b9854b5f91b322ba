package graft.exec

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Try}

/** Overlap INDEPENDENT Spark actions from driver threads — the guide's
  * §2.6 "overlap independent jobs" lever: Spark's scheduler happily runs
  * several jobs at once inside one application; actions are sequential
  * only because driver code calls them sequentially. Legs submitted from
  * separate threads let the next leg's tasks back-fill executors freed by
  * the current leg's tail (FIFO scheduling is exactly the back-fill
  * behaviour wanted), and — just as important for composite lifecycle
  * queries — overlap the per-leg DRIVER costs (planning, file listing,
  * commit protocol) that serial composition pays end to end.
  *
  * Correctness contract: legs must be INDEPENDENT — no leg may read state
  * another leg writes (distinct standing structures, distinct output
  * paths). The combinators below change only WHEN each leg's work happens
  * relative to its siblings, never what any leg computes.
  *
  * Failure discipline (the [[graft.ext.DedupIndex]] writeImpl rule): wait
  * for ALL legs to SETTLE, then rethrow the first failure — failing fast
  * would tear down siblings mid-write and, for table appends, leave state
  * inconsistently appended. Each call gets its own bounded pool so legs
  * that themselves use the global ExecutionContext (index builds) cannot
  * starve the orchestration layer. */
object Concurrent {

  /** Run the legs concurrently, wait for all to settle, return their
    * results in order; rethrows the first failure after all settle. */
  def all[A](legs: Seq[() => A]): Seq[A] = {
    if (legs.isEmpty) return Seq.empty
    if (legs.size == 1) return Seq(legs.head())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      legs.size,
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger(0)
        override def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-concurrent-${n.getAndIncrement()}")
          t.setDaemon(true)
          t
        }
      })
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val settled = Await.result(
        Future.sequence(legs.map(l => Future(l()).transform(Try(_)))),
        Duration.Inf)
      settled.collectFirst { case Failure(e) => throw e }
      settled.map(_.get)
    } finally pool.shutdown()
  }

  /** Unit-leg convenience: `run(legA, legB, ...)`. */
  def run(legs: (() => Unit)*): Unit = { all(legs): Unit }
}
