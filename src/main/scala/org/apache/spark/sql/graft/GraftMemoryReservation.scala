// In the org.apache.spark.sql namespace alongside the other graft
// operators — same placement the reference uses (org.apache.spark.sql.comet).
package org.apache.spark.sql.graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.TaskContext
import org.apache.spark.internal.Logging
import org.apache.spark.memory.{MemoryConsumer, MemoryMode, TaskMemoryManager}

/** Coarse-grained execution-memory accounting for the columnar
  * operators' JVM-array state (reference analogue: CometTaskMemoryManager
  * bridging native allocations into Spark's task memory manager,
  * CometExecIterator.scala:293-326).
  *
  * The graft columnar operators (grouped agg hash table, sort column
  * buffers) hold their state in plain JVM arrays. Their SIZE is already
  * structurally bounded (maxGroups early-flush; scan-block-bounded sort
  * partitions) — but without registration those buffers are invisible to
  * Spark's memory manager, so on a busy executor they compete with
  * Tungsten's pages unaccounted. This consumer registers their
  * approximate footprint with the task's [[TaskMemoryManager]]:
  * Tungsten consumers now see the pressure (and spill sooner), and the
  * graft operators see Tungsten's pressure as a failed [[reserve]].
  *
  * Pressure flows BOTH ways (the CometTaskMemoryManager contract,
  * CometExecIterator.scala:293-326):
  *  - the operator's own `reserve` returns false on a shortfall — the
  *    grouped agg answers by flushing its partial groups early (always
  *    correct — the final merge combines duplicates), the sort by
  *    spilling the current block as a sorted run;
  *  - a FOREIGN consumer's allocation (a Tungsten shuffle writer, an
  *    UnsafeExternalSorter) can reclaim this consumer's memory through
  *    [[spill]] when the owner has ARMED a spill handler: the sort arms
  *    "flush the current block as a run" during its build phase and
  *    disarms before emission (when the buffers are live output state).
  *    With no handler armed, spill returns 0 and pressure surfaces only
  *    through reserve.
  * All spill invocations happen on the task's own thread (Spark
  * triggers them inside acquireExecutionMemory), so the handler runs at
  * a consistent point of the single-threaded operator loop. A
  * SELF-triggered spill returns 0 — the owner's reserve=false path
  * already covers its own pressure, and double-handling would corrupt
  * the caller's accounting mid-reserve.
  *
  * On a reserve shortfall the partial grant is KEPT, not returned: the
  * arrays exist either way, so accounting stays as close to truth as
  * the manager allows. All reservations are released at task end via
  * the task-completion listener installed by
  * [[GraftMemoryReservation.forTask]].
  */
final class GraftMemoryReservation(tmm: TaskMemoryManager)
    extends MemoryConsumer(tmm, MemoryMode.ON_HEAP) with Logging {

  import GraftMemoryReservation._

  private var warned = false

  @volatile private var spillHandler: () => Long = null
  @volatile private var ownerThread: Thread = null

  /** Arm `f` as the response to a foreign consumer's memory pressure;
    * it must free buffered state and return the bytes released. The
    * calling thread is recorded as the owner: only ITS allocations may
    * run the handler (see [[spill]]). */
  def armSpillHandler(f: () => Long): Unit = {
    ownerThread = Thread.currentThread()
    spillHandler = f
  }

  /** Disarm before the owner's buffers become live output state. */
  def disarmSpillHandler(): Unit = spillHandler = null

  override def spill(size: Long, trigger: MemoryConsumer): Long = {
    val h = spillHandler
    // The handler mutates the owner's buffered state (bufs/n/reserved)
    // without a lock — safe only because Spark invokes spill() inside
    // acquireExecutionMemory ON the allocating thread. A same-task
    // HELPER thread allocating through the shared TaskMemoryManager
    // (e.g. a Python runner's writer thread) would run the handler
    // concurrently with the owner's build loop, so a foreign-THREAD
    // trigger degrades to 0 (pressure then surfaces to that consumer as
    // a short grant, exactly like the disarmed case).
    if (h == null || size <= 0L || (trigger eq this) ||
      (Thread.currentThread() ne ownerThread)) 0L
    else {
      val freed = h()
      if (freed > 0) {
        logInfo(s"graft columnar buffers spilled $freed bytes under " +
          s"foreign memory pressure (requested $size)")
      }
      freed
    }
  }

  /** Grow the reservation by `bytes`; false on a shortfall (the partial
    * grant is kept — see class doc). */
  def reserve(bytes: Long): Boolean = {
    if (bytes <= 0L) true
    else {
      val got = acquireMemory(bytes)
      currentReserved.addAndGet(got)
      peakReserved.accumulateAndGet(currentReserved.get(), Math.max(_, _))
      if (got >= bytes) true
      else {
        if (!warned) {
          warned = true
          logWarning(s"graft columnar buffer reservation short: asked $bytes, " +
            s"granted $got — executor memory pressure (a Tungsten consumer holds the rest)")
        }
        false
      }
    }
  }

  def freeAll(): Unit = {
    val u = getUsed
    if (u > 0) {
      freeMemory(u)
      currentReserved.addAndGet(-u)
    }
  }
}

object GraftMemoryReservation {
  /** Test-visible accounting totals across tasks (local-mode JVM):
    * `currentReserved` must return to 0 once all tasks finish. */
  val currentReserved = new AtomicLong(0L)
  val peakReserved = new AtomicLong(0L)

  /** A per-task reservation wired to release on task completion, or None
    * outside a task (driver-side plan construction). */
  def forTask(): Option[GraftMemoryReservation] =
    Option(TaskContext.get()).map { tc =>
      val r = new GraftMemoryReservation(tc.taskMemoryManager())
      tc.addTaskCompletionListener[Unit](_ => r.freeAll())
      r
    }
}
