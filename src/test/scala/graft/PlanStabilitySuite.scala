package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Plan-stability snapshots (reference layer 5:
  * CometPlanStabilitySuite.scala:47-342 — simplified golden plans): the
  * optimized logical plan skeleton (node names + nesting only, no
  * expression ids) of each key query is pinned to a golden file. A diff
  * means the plan changed — intentional changes regenerate with
  * GRAFT_REGEN_PLANS=1.
  */
class PlanStabilitySuite extends GraftTestBase {

  private val goldenDir = Paths.get("src/test/resources/plans")

  private val pinned = Seq(
    "q01_tpch_q1", "q03_join_agg_topk", "q08_null_aware_anti",
    "q17_rollup", "q22_window_running", "q46_dedup_ngram_jaccard",
    "q47_dedup_minhash_lsh", "q49_embedding_neardup",
    "q50_ann_bruteforce_topk", "q64_sort_merge_join",
    "q69_skew_salted_join", "q74_llm_prep_pipeline",
    "q76_bloom_filter_join", "q78_range_repartition",
    "q82_asof_join", "q83_range_join_banded",
    // the round-5 TPC-H set: pin the join-order/broadcast skeletons the
    // 100 TB story depends on
    "q87_tpch_q5", "q97_tpch_q6", "q98_tpch_q7", "q99_tpch_q8",
    "q100_tpch_q10", "q102_tpch_q15", "q103_tpch_q17", "q104_tpch_q19",
    "q105_tpch_q4", "q107_tpch_q22", "q110_sample_stratified",
    "q114_aqe_skew_join",
    // partsupp-derived TPC-H completions: the decorrelated-min (Q2) and
    // composite-key fact join (Q9) skeletons are the scale-critical ones
    "q118_tpch_q2", "q119_tpch_q9", "q122_tpch_q20",
    // round-7 columnar operators: pin the logical skeletons feeding the
    // columnar sort (opt-in), shuffled semi, and rank/dense_rank
    // group-limit swaps (physical presence is asserted separately in
    // PlanAssertionSuite)
    "q164_sorted_run_export", "q165_bucketed_shuffled_semi",
    "q168_rank_group_limit", "q169_dense_rank_group_limit",
    "q170_bucketed_shuffled_inner",
    // round-8: the left-outer shuffled probe and the spill-unlocked
    // bucketed sorted export
    "q171_bucketed_shuffled_left_outer", "q172_bucketed_sorted_export")

  private def skeleton(p: LogicalPlan, depth: Int = 0): String = {
    val self = ("  " * depth) + p.nodeName
    (self +: p.children.map(skeleton(_, depth + 1))).mkString("\n")
  }

  pinned.foreach { name =>
    test(s"$name optimized plan matches golden skeleton") {
      val df = Catalog.validated.find(_.name == name).get.run(spark, sfDir)
      val actual = skeleton(df.queryExecution.optimizedPlan) + "\n"
      val golden = goldenDir.resolve(s"$name.txt")
      if (sys.env.contains("GRAFT_REGEN_PLANS") || !Files.exists(golden)) {
        Files.createDirectories(goldenDir)
        Files.writeString(golden, actual,
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      }
      val expected = Files.readString(golden)
      assert(actual == expected,
        s"plan skeleton drifted for $name — if intentional, regenerate with GRAFT_REGEN_PLANS=1\n--- golden:\n$expected\n--- actual:\n$actual")
    }
  }
}
