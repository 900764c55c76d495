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
