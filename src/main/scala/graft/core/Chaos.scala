package graft.core

import org.apache.spark.TaskContext

/** Fault-injection hook for retry-determinism tests (chaos-engineering
  * style: the hook ships in production code so the EXACT production
  * closure is what gets exercised under task retry, but it is inert
  * unless a session explicitly opts in via conf).
  *
  * `spark.graft.test.failSweepOnce = true` makes every sweep task's
  * FIRST attempt throw (TaskContext.attemptNumber == 0); the retry
  * (attempt 1) runs normally, so with `spark.task.maxFailures >= 2`
  * the job completes and the test asserts the chain is bit-identical
  * to a no-failure run — the determinism claim behind "a retried task
  * recomputes the same draw" (the sweep RNG is a pure function of
  * (seed, iteration, partition), never of the attempt). Resolved on
  * the driver per step and captured in the closure, so the hook costs
  * one conf lookup when off and works identically on a real cluster.
  */
object Chaos {

  /** Session conf key: fail the first attempt of every sweep task. */
  val FailSweepKey = "spark.graft.test.failSweepOnce"

  /** Injected-failure count (JVM-local — meaningful in local-mode
    * tests, where it proves the fault actually fired rather than the
    * spec silently passing on a no-op hook). */
  val injected = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Throw iff this is the task's first attempt — callers gate on the
    * conf-resolved flag so the hot path never reaches here when off. */
  def failFirstAttempt(tag: String): Unit = {
    val tc = TaskContext.get()
    if (tc != null && tc.attemptNumber() == 0) {
      injected.incrementAndGet()
      throw new RuntimeException(
        s"graft chaos: injected first-attempt task failure ($tag)")
    }
  }
}
