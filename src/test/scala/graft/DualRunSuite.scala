package graft

/** Every inventory query, run three ways — default, whole-stage codegen
  * OFF, broadcast joins OFF (forcing shuffle joins / SMJ) — results must
  * be identical. This is the engine's differential gate (reference
  * pattern: CometTestBase.checkSparkAnswer with Comet on/off; here the
  * variation axes are the physical-planning choices that must never
  * change semantics). Also pins SortMergeJoin coverage: with broadcast
  * disabled every equi-join plans as SMJ/shuffled-hash.
  */
class DualRunSuite extends GraftTestBase {

  Catalog.validated.foreach { q =>
    test(s"${q.name}: invariant under codegen off") {
      checkInvariantUnder(
        q.run(spark, sfDir),
        Seq("spark.sql.codegen.wholeStage" -> "false"))
    }
    test(s"${q.name}: invariant under broadcast off") {
      checkInvariantUnder(
        q.run(spark, sfDir),
        Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1"))
    }
    test(s"${q.name}: invariant under ANSI off") {
      // The inventory avoids ANSI-divergent inputs (malformed casts use
      // try_cast, no overflowing arithmetic) — eval mode must not change
      // any result (reference scar: SURVEY §7.4 ANSI/LEGACY/TRY).
      checkInvariantUnder(
        q.run(spark, sfDir),
        Seq("spark.sql.ansi.enabled" -> "false"))
    }
    test(s"${q.name}: invariant under AQE off") {
      // No query may depend on adaptive re-planning (coalesced
      // partitions, runtime skew handling) for its RESULT.
      checkInvariantUnder(
        q.run(spark, sfDir),
        Seq("spark.sql.adaptive.enabled" -> "false"))
    }
    test(s"${q.name}: invariant under memory pressure (forced flush/spill/degrade)") {
      // Crank every degrade knob at once: the grouped-agg partial flushes
      // mid-partition, the columnar sort spills and k-way merges runs,
      // the window-group-limit probe bails on group blowup, the
      // range-slide ring degrades to the spill-backed buffer, and
      // Spark's own window/EAOURA buffers spill every few rows. This is
      // the 100 TB posture (every operator under executor memory
      // pressure) exercised on EVERY query — results must not move.
      checkInvariantUnder(
        q.run(spark, sfDir),
        Seq(
          org.apache.spark.sql.graft.GraftColumnarGroupedAggExec.maxGroupsKey -> "7",
          org.apache.spark.sql.graft.GraftColumnarRule.wglMaxGroupsKey -> "4",
          org.apache.spark.sql.execution.graft.GraftColumnarSortExec.spillThresholdKey -> "65536",
          org.apache.spark.sql.execution.graft.GraftWindowRangeSlideExec.maxRingBytesKey -> "65536",
          "spark.sql.windowExec.buffer.in.memory.threshold" -> "16",
          "spark.sql.windowExec.buffer.spill.threshold" -> "64"))
    }
    test(s"${q.name}: invariant under columnar off") {
      // The graft columnar runtime (filter/project/agg/joins/topk/wgl/
      // distinct swaps) must never change a result — every query
      // differentially validates every columnar operator it touches
      // against Spark's row path.
      checkInvariantUnder(
        q.run(spark, sfDir),
        Seq(org.apache.spark.sql.graft.GraftColumnarRule.enabledKey -> "false"))
    }
  }

  test("driver smoke: SparkEntry.entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
