package org.apache.spark.sql.graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the memory-pressure signal path of
  * [[GroupAggState]]: a failed onAlloc must set `pressure` (the partial
  * agg's early-flush trigger) without breaking the growth itself — the
  * arrays exist either way, the signal only schedules a flush.
  */
class GroupAggStatePressureSuite extends AnyFunSuite {

  test("constructor allocation reports through onAlloc") {
    var asked = 0L
    val st = new GroupAggState(2, 1, b => { asked += b; true })
    assert(asked > 0L, "constructor must report its array footprint")
    assert(!st.pressure)
  }

  test("grow() under a refusing allocator sets pressure but still grows") {
    val st = new GroupAggState(1, 1, _ => false)
    // ctor alloc already refused -> pressure set from the start
    assert(st.pressure)
    st.pressure = false
    val before = st.capacity
    st.grow()
    assert(st.capacity == before * 2, "grow must proceed despite refusal")
    assert(st.pressure, "refused grow must raise the pressure flag")
  }

  test("granting allocator leaves pressure clear across grow and rehash") {
    val st = new GroupAggState(1, 1, _ => true)
    st.grow()
    var i = 0
    // push enough distinct keys through the probe table to force rehash
    while (i < 3000) {
      val slot = st.probeGet(i.toLong * 0x9E3779B97F4A7C15L)
      if (slot < 0) {
        val gid = st.nGroups
        if (gid == st.capacity) st.grow()
        st.nGroups += 1
        st.probePut(slot, i.toLong * 0x9E3779B97F4A7C15L, gid)
      }
      i += 1
    }
    assert(!st.pressure)
  }
}
