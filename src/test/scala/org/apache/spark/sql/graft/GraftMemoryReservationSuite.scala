package org.apache.spark.sql.graft

import org.apache.spark.SparkConf
import org.apache.spark.memory.{MemoryConsumer, MemoryMode, TaskMemoryManager, UnifiedMemoryManager}
import org.scalatest.funsuite.AnyFunSuite

/** White-box test of the CometTaskMemoryManager role: a FOREIGN
  * Tungsten consumer's oversized allocation must be able to reclaim the
  * graft columnar buffers through the armed spill handler — and must
  * NOT touch them when the handler is disarmed (emission phase) or when
  * the trigger is the reservation itself (the reserve=false path owns
  * that case).
  */
class GraftMemoryReservationSuite extends AnyFunSuite {

  private def newTmm(bytes: Long): TaskMemoryManager = {
    val conf = new SparkConf()
      .set("spark.testing.memory", bytes.toString)
      .set("spark.testing.reservedMemory", "0")
      .set("spark.memory.fraction", "1.0")
    new TaskMemoryManager(UnifiedMemoryManager(conf, numCores = 1), 0L)
  }

  private def foreignConsumer(tmm: TaskMemoryManager): MemoryConsumer =
    new MemoryConsumer(tmm, tmm.pageSizeBytes(), MemoryMode.ON_HEAP) {
      override def spill(size: Long, trigger: MemoryConsumer): Long = 0L
    }

  test("a foreign consumer's allocation forces the armed handler to spill") {
    val mb = 1024L * 1024L
    val tmm = newTmm(4 * mb)
    val res = new GraftMemoryReservation(tmm)
    var handlerRuns = 0
    res.armSpillHandler { () =>
      handlerRuns += 1
      val freed = res.getUsed
      res.freeAll()
      freed
    }
    assert(res.reserve(3 * mb), "the reservation itself must fit")
    val foreign = foreignConsumer(tmm)
    // 2 MB cannot fit next to the 3 MB reservation in a 4 MB pool: the
    // task memory manager must reclaim through our spill handler
    val got = foreign.acquireMemory(2 * mb)
    assert(handlerRuns == 1, "the armed handler must have been invoked exactly once")
    assert(got == 2 * mb, s"the foreign consumer must get its full request, got $got")
    assert(res.getUsed == 0L, "the reservation must have been flushed")
    foreign.freeMemory(got)
    tmm.cleanUpAllAllocatedMemory()
  }

  test("disarmed: foreign pressure gets only what is free, buffers stay") {
    val mb = 1024L * 1024L
    val tmm = newTmm(4 * mb)
    val res = new GraftMemoryReservation(tmm)
    var handlerRuns = 0
    res.armSpillHandler { () => handlerRuns += 1; val f = res.getUsed; res.freeAll(); f }
    assert(res.reserve(3 * mb))
    res.disarmSpillHandler()
    val foreign = foreignConsumer(tmm)
    val got = foreign.acquireMemory(2 * mb)
    assert(handlerRuns == 0, "a disarmed handler must never run")
    assert(got < 2 * mb, "without the handler only the free 1 MB is grantable")
    assert(res.getUsed == 3 * mb, "live emission buffers must be untouched")
    foreign.freeMemory(got)
    res.freeAll()
    tmm.cleanUpAllAllocatedMemory()
  }

  test("self-triggered pressure does not re-enter the handler") {
    val mb = 1024L * 1024L
    val tmm = newTmm(4 * mb)
    val res = new GraftMemoryReservation(tmm)
    var handlerRuns = 0
    res.armSpillHandler { () => handlerRuns += 1; val f = res.getUsed; res.freeAll(); f }
    assert(res.reserve(3 * mb))
    // the second reserve cannot fit: its own shortfall must surface as
    // reserve=false (the operator's flush path), NOT through the
    // handler — re-entering it would corrupt the caller's accounting
    assert(!res.reserve(2 * mb))
    assert(handlerRuns == 0, "self-pressure must not invoke the spill handler")
    res.freeAll()
    tmm.cleanUpAllAllocatedMemory()
  }
}
