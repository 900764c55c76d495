package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape assertions (reference pattern:
  * checkSparkAnswerAndOperator + CometPlanStabilitySuite): the 100 TB
  * story lives in the physical plan, so pin it — filters pushed to the
  * scan, columns pruned, the right join algorithm, and no cartesian
  * products hiding in the LLM-pipeline operators.
  */
class PlanAssertionSuite extends GraftTestBase {

  private def planString(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def run(name: String): DataFrame =
    Catalog.validated.find(_.name == name).get.run(spark, sfDir)

  /** Build (and execute, for executedPlan pins) a query with the
    * presentation-sort materialization OFF: Tables.sortedOnce truncates
    * the final plan to Sort-over-LogicalRDD, so pins of the pipeline's
    * own operators inspect the un-truncated plan instead (the pipeline
    * below the checkpoint is identical — only the sampling double-run
    * differs).
    */
  private def runFullPlan(name: String): DataFrame = {
    spark.conf.set(graft.Tables.sortedOnceEnabledKey, "false")
    try {
      val df = run(name)
      df.collect()
      df
    } finally spark.conf.unset(graft.Tables.sortedOnceEnabledKey)
  }

  test("q64 plans a SortMergeJoin") {
    assert(planString(run("q64_sort_merge_join")).contains("SortMergeJoin"))
  }

  test("q03 broadcasts the filtered dimension") {
    assert(planString(run("q03_join_agg_topk")).contains("BroadcastHashJoin"))
  }

  test("q01 pushes the shipdate filter into the parquet scan") {
    val p = planString(run("q01_tpch_q1"))
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      s"expected pushed l_shipdate filter in:\n$p")
  }

  test("q11 scan prunes to the three projected columns") {
    val p = planString(run("q11_topk"))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(Seq("p_partkey", "p_name", "p_retailprice").forall(readSchema.contains)
      && !readSchema.contains("p_type"),
      s"expected pruned ReadSchema, got: $readSchema")
  }

  test("q10 top-k plans a bounded top-k (no full global sort); OFFSET rides columnar") {
    val p = planString(run("q10_sort_limit_offset"))
    // OFFSET now rides the columnar probe (limit = fetch+offset, skip at
    // the sorted emit) instead of forcing the row TakeOrderedAndProject
    assert(p.contains("GraftColumnarTopK"),
      s"expected the columnar top-k despite OFFSET:\n$p")
    assert(!p.contains("TakeOrderedAndProject"), s"row top-k must be swapped out:\n$p")
  }

  test("dedup and similarity queries never plan a cartesian product") {
    // (q145's only nested-loop is the broadcast of K=16 centroids — the
    // within-cluster pair join itself is a cid equi-join)
    Seq("q46_dedup_ngram_jaccard", "q47_dedup_minhash_lsh",
        "q49_embedding_neardup", "q51_ann_lsh_bucketed", "q145_semdedup").foreach { name =>
      val p = planString(run(name))
      assert(!p.contains("CartesianProduct"), s"$name planned a cartesian:\n$p")
    }
  }

  test("brute-force ANN uses broadcast (not cartesian) for the probe set") {
    val p = planString(run("q50_ann_bruteforce_topk"))
    assert(p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q75 plans through the custom GraftTopKExec operator") {
    val p = planString(run("q75_custom_topk_operator"))
    assert(p.contains("GraftTopK"), s"expected GraftTopKExec in plan:\n$p")
  }

  test("q72 scan carries a partition filter (pruned directories)") {
    val p = planString(run("q72_partition_pruning"))
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("o_orderstatus"), s"expected o_orderstatus partition filter, got: $pf")
  }

  test("q77 scan carries a runtime dynamicpruning partition filter") {
    val p = planString(run("q77_dynamic_partition_pruning"))
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("dynamicpruning"),
      s"expected dynamicpruning subquery in PartitionFilters, got: $pf\nfull plan:\n$p")
  }

  test("q78 plans a RangePartitioning exchange") {
    val p = planString(run("q78_range_repartition"))
    assert(p.toLowerCase.contains("rangepartitioning"),
      s"expected a range exchange in:\n$p")
  }

  test("q76 builds the bloom via ObjectHashAggregate and prefilters the probe") {
    val df = run("q76_bloom_filter_join")
    df.collect()
    val p = planString(df)
    assert(p.contains("might_contain"), s"expected might_contain prefilter in:\n$p")
    assert(p.contains("bloom_filter_agg") && p.contains("ObjectHashAggregate"),
      s"expected the bloom sketch built by ObjectHashAggregate in:\n$p")
    assert(p.contains("partial_bloom_filter_agg"),
      s"expected partial (pre-shuffle) bloom aggregation in:\n$p")
  }

  test("q81 executes its projection on ColumnarBatch via GraftColumnarSelect") {
    // Columnar rules apply inside AQE query stages, so materialize first
    // and read the final plan.
    val df = run("q81_columnar_select")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarSelect"),
      s"expected the columnar operator swap in:\n$p")
    assert(p.contains("ColumnarToRow"),
      s"expected a ColumnarToRow transition above the columnar operator:\n$p")
  }

  test("q82 as-of join plans as union+window — no join operator, no cartesian") {
    val p = planString(run("q82_asof_join"))
    assert(p.contains("Window"), s"expected windowed LOCF in:\n$p")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"as-of must not plan a join operator:\n$p")
  }

  test("q83 banded range join is an equi-join, never a cartesian") {
    val p = planString(run("q83_range_join_banded"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"range join must stay an equi-join:\n$p")
  }

  test("q01 aggregates partially before the shuffle (two HashAggregate stages)") {
    val p = planString(run("q01_tpch_q1"))
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"expected partial+final agg:\n$p")
  }

  test("q17/q18 run their rollup/cube Expand on ColumnarBatch") {
    // the aggregation above stays row (decimal sum — tagged fallback);
    // the Expand fan-out itself is the columnar kernel
    Seq("q17_rollup", "q18_cube").foreach { name =>
      val df = run(name)
      df.collect()
      val p = planString(df)
      assert(p.contains("GraftColumnarExpand"),
        s"$name: expected the columnar Expand swap in:\n$p")
    }
  }

  test("q143 runs its decimal money arithmetic on ColumnarBatch") {
    val df = run("q143_decimal_money")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarProject"),
      s"q143: expected the Decimal64 kernels in a columnar project in:\n$p")
    // no project-level fallback: the decimal tree compiled
    val fallback = df.queryExecution.executedPlan.collect {
      case pr: org.apache.spark.sql.execution.ProjectExec
          if pr.getTagValue(org.apache.spark.sql.graft.GraftColumnarRule.fallbackReasonTag)
            .isDefined => pr
    }
    assert(fallback.isEmpty, s"q143: decimal project fell back:\n$p")
  }

  test("q144 probes both existence joins on ColumnarBatch") {
    val df = run("q144_columnar_semi_anti")
    df.collect()
    val p = planString(df)
    assert("GraftColumnarSemiBHJ".r.findAllIn(p).size >= 2,
      s"q144: expected BOTH semi and anti columnar probes in:\n$p")
    assert(p.contains("GraftColumnarGroupedAgg"),
      s"q144: expected the grouped partial agg to stay columnar above the probes in:\n$p")
  }

  test("q154 probes the existence join on ColumnarBatch, filter stays columnar") {
    val df = run("q154_columnar_existence_join")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarExistenceBHJ"),
      s"q154: expected the columnar existence probe in:\n$p")
    assert(p.contains("GraftColumnarFilter"),
      s"q154: expected the disjunctive exists-OR filter columnar in:\n$p")
    assert(p.contains("GraftColumnarGroupedAgg"),
      s"q154: expected the grouped partial agg columnar above the probe in:\n$p")
  }

  test("q155 runs filter AND top-k on ColumnarBatch — no row TakeOrderedAndProject") {
    val df = run("q155_columnar_topk")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarTopK"),
      s"q155: expected the columnar top-k swap in:\n$p")
    assert(p.contains("GraftColumnarFilter"),
      s"q155: expected the filter columnar below the top-k in:\n$p")
    assert(!p.contains("TakeOrderedAndProject"),
      s"q155: row TakeOrderedAndProject must be swapped out:\n$p")
  }

  test("q191 absorbs computed aggregate args into a columnar kernel project") {
    val df = run("q191_computed_arg_agg")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarProject"),
      s"q191: expected the absorbed-args kernel Project below the agg in:\n$p")
    assert(p.contains("GraftColumnarGroupedAgg"),
      s"q191: expected the computed-arg grouped partial agg columnar in:\n$p")
  }

  test("q71 runs its embedding L2 folds through the columnar array-fold project") {
    val df = run("q71_embedding_normalize")
    df.collect()
    val p = planString(df)
    // both row Projects swap (the fold/element_at lanes + the norm
    // division lane), so the final stage is scan → columnar filter →
    // two columnar projects → ColumnarToRow
    assert(p.sliding("GraftColumnarProject".length).count(_ == "GraftColumnarProject") >= 2,
      s"q71: expected BOTH projects (folds + element_at/divide) columnar in:\n$p")
    assert(p.contains("GraftColumnarFilter"),
      s"q71: expected the filter columnar below the fold projects in:\n$p")
  }

  test("q192 absorbs conditional int128 money args into the columnar partial agg") {
    val df = run("q192_conditional_arg_agg")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarProject"),
      s"q192: expected the absorbed CASE/int128 kernel Project below the agg in:\n$p")
    assert(p.contains("GraftColumnarGroupedAgg"),
      s"q192: expected the conditional-arg grouped partial agg columnar in:\n$p")
  }

  test("q99 (TPC-H Q8) runs its market-share partial agg columnar over the row join") {
    val df = run("q99_tpch_q8")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarGroupedAgg"),
      s"q99: expected the conditional int128 partial agg columnar in:\n$p")
    assert(p.contains("RowToColumnar"),
      s"q99: expected the row-join → batch staging below the agg kernel in:\n$p")
  }

  test("q101 (TPC-H Q14) runs its promo-share partial agg columnar over the row join") {
    val df = run("q101_tpch_q14")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarPartialAgg"),
      s"q101: expected the conditional int128 global partial agg columnar in:\n$p")
  }

  test("q194 absorbs FILTER aggregates onto the conditional kernels") {
    val df = run("q194_filter_agg")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarGroupedAgg"),
      s"q194: expected the FILTER-rewritten grouped partial agg columnar in:\n$p")
    assert(p.contains("MinMaxDec128Spec"),
      s"q194: expected the int128 min/max lanes in:\n$p")
  }

  test("q190 runs the date_trunc grouped map side fully columnar") {
    val df = run("q190_datetrunc_agg")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarProject"),
      s"q190: expected the pulled-out date_trunc key to compile onto the " +
        s"long kernel's Project in:\n$p")
    assert(p.contains("GraftColumnarGroupedAgg"),
      s"q190: expected the computed-key grouped partial agg columnar in:\n$p")
  }

  test("q162 runs DISTINCT columnar on both exchange sides") {
    val df = run("q162_columnar_distinct")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarGroupedAgg"),
      s"q162: expected the partial dedup columnar in:\n$p")
    assert(p.contains("GraftColumnarFinalAgg"),
      s"q162: expected the final dedup columnar in:\n$p")
  }

  test("q209/q210: the whole 4-level value-distinct plan swaps columnar") {
    for (name <- Seq("q209_distinct_sum_long", "q210_distinct_sum_double")) {
      val df = run(name)
      df.collect()
      val p = planString(df)
      // dedup partial+merge AND the distinct-marked partial/final — the
      // row operator must be absent entirely
      assert(p.contains("GraftColumnarGroupedAgg") && p.contains("GraftColumnarFinalAgg"),
        s"$name: expected columnar agg nodes in:\n$p")
      assert(!p.contains("HashAggregate("),
        s"$name: expected NO row HashAggregate in:\n$p")
    }
  }

  test("q216 mixed-distinct runs its PartialMerge buffer re-merge columnar") {
    val df = run("q216_distinct_mixed")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the emitBuffers twin prints its flag as the last constructor arg
    assert(p.linesIterator.exists(l =>
      l.contains("GraftColumnarFinalAgg") && l.trim.endsWith("true")),
      s"q216: expected the emitBuffers PartialMerge re-merge in:\n$p")
    assert(p.contains("GraftColumnarGroupedAgg"),
      s"q216: expected the dedup partial columnar in:\n$p")
    // the MIXED merge+partial node swaps with a non-empty mergeIdx set
    // — and with it, NO row HashAggregate remains anywhere in the plan
    assert(!p.contains("HashAggregate("),
      s"q216: expected ALL FOUR aggregate levels columnar in:\n$p")
  }

  test("q211 multi-distinct runs on the columnar Expand rewrite") {
    val df = run("q211_distinct_count_two")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarExpand"),
      s"q211: expected the columnar Expand twin in:\n$p")
    assert(p.contains("GraftColumnarGroupedAgg") && p.contains("GraftColumnarFinalAgg"),
      s"q211: expected columnar dedup levels in:\n$p")
  }

  test("q227 composes channel aggs -> full outer join -> cumulative windows in one plan") {
    val df = run("q227_tpcds_q51_cumulative")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("FullOuter"), s"q227: expected the FULL OUTER channel join in:\n$p")
    // the channel FINAL merges, the pre-join sorts, and the cumulative
    // running-frame windows all swap; the partials stay row per the
    // measured no-money-lane RowToColumnar gate
    assert(p.contains("GraftColumnarFinalAgg"),
      s"q227: expected the per-channel final merges columnar in:\n$p")
    assert(p.contains("GraftColumnarWindow"),
      s"q227: expected the cumulative running windows columnar in:\n$p")
    assert(p.contains("GraftColumnarSort"),
      s"q227: expected the pre-join sorts columnar in:\n$p")
  }

  test("q228 plans the EXISTS AND (EXISTS OR EXISTS) gate as semi + existence joins") {
    val df = run("q228_tpcds_q35_exists_gate")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ExistenceJoin"),
      s"q228: expected ExistenceJoins for the disjunctive EXISTS pair in:\n$p")
    assert(p.contains("LeftSemi"),
      s"q228: expected the leading EXISTS as a semi join in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"q228: correlated gates must stay equi-joins:\n$p")
  }

  test("q212 composes Expand -> columnar grouped agg -> window group-limit in one plan") {
    val df = run("q212_tpcds_rollup_topk")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Expand"), s"q212: expected the rollup Expand in:\n$p")
    assert(p.contains("GraftColumnarGroupedAgg") && p.contains("GraftColumnarFinalAgg"),
      s"q212: expected the rollup partial+final columnar in:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"q212: expected the rank top-k group-limit in:\n$p")
  }

  test("q215 answers all eight Q88 bands from a SINGLE pushed-down fact scan") {
    val df = run("q215_tpcds_q88_one_scan")
    df.collect()
    // count scans in the FINAL adaptive plan only (the explain string
    // repeats the tree in its Initial Plan section)
    val full = df.queryExecution.executedPlan.toString
    val p = full.split("== Initial Plan ==")(0)
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"q215: expected exactly ONE fact scan, got $scans in:\n$p")
    assert(p.contains("PushedFilters") && p.contains("l_quantity"),
      s"q215: expected the band envelope pushed to parquet in:\n$p")
    // the literal 8-subquery shape keeps each band scan pruned to the
    // two predicate columns
    val lit8 = run("q214_tpcds_scalar_subqueries")
    lit8.collect()
    val p8 = lit8.queryExecution.executedPlan.toString
    assert(p8.contains("PushedFilters: [IsNotNull(l_quantity)"),
      s"q214: expected band predicates pushed into each subquery scan in:\n$p8")
  }

  test("q229 TPC-DS Q3: dims broadcast, constraint pushed to the fact scan, columnar agg+topk") {
    val df = Catalog.validated.find(_.name == "q229_tpcds_q3").get.run(spark, GraftTestBase.sfDriverDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"),
      s"q229: expected the item/date_dim sides broadcast in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"q229: star joins must stay equi-joins:\n$p")
    // Catalyst propagates the item filter's i_manufact_id constraint
    // through the equi-join onto the lineitem side — at 100 TB this is
    // the difference between scanning 0.2% of the fact and all of it
    assert(p.contains("(l_partkey#") && p.contains("% 500)"),
      s"q229: expected the manufact-id constraint propagated onto the fact scan in:\n$p")
    assert(p.contains("GraftColumnarFinalAgg") && p.contains("GraftColumnarTopK"),
      s"q229: expected the final agg and LIMIT-ordered topk columnar in:\n$p")
  }

  test("q231 TPC-DS Q34: ticket aggregate below the customer join, VALUES dims broadcast") {
    val df = Catalog.validated.find(_.name == "q231_tpcds_q34").get.run(spark, GraftTestBase.sfDriverDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct"),
      s"q231: star joins must stay equi-joins:\n$p")
    // the only nested-loop joins allowed are the constant VALUES cross
    // products that BUILD the 100/300-row demographics dims (literal
    // inline tables, no fact involvement) — every fact-side join must
    // be a broadcast hash join on its key
    p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).foreach { l =>
      assert(l.contains("Cross"),
        s"q231: non-constant nested loop join leaked into the star:\n$l\n$p")
    }
    // the cnt HAVING-band runs columnar directly on the final agg's
    // output, BEFORE the broadcast join to customer — the join probes
    // only surviving tickets
    assert(p.contains("GraftColumnarFilter") && p.contains("cnt#"),
      s"q231: expected the cnt band filtered columnar below the customer join in:\n$p")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 5,
      s"q231: expected orders/date_dim/store/hdemo/customer sides broadcast in:\n$p")
  }

  test("q230/q232/q233 TPC-DS stars: every fact-side join broadcast, no non-constant nested loops") {
    // r16 (verdict item: the r15-landed TPC-DS stars were never plan-
    // pinned): same discipline as q229/q231 — the fact joins must all
    // be broadcast hash joins, the only nested loops allowed are the
    // constant VALUES cross products that BUILD the demographics dims,
    // and no cartesian may appear.
    Seq("q230_tpcds_q7", "q232_tpcds_q42", "q233_tpcds_q73").foreach { name =>
      val df = Catalog.validated.find(_.name == name).get.run(spark, GraftTestBase.sfDriverDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(!p.contains("CartesianProduct"),
        s"$name: star joins must stay equi-joins:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$name: every dim fits its broadcast threshold — a sort-merge join " +
          s"means a dim grew past it or a hint was lost:\n$p")
      p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).foreach { l =>
        assert(l.contains("Cross"),
          s"$name: non-constant nested loop join leaked into the star:\n$l\n$p")
      }
      assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 3,
        s"$name: expected the star dims broadcast in:\n$p")
    }
  }

  test("q93 executes its predicate on ColumnarBatch via GraftColumnarFilter") {
    val df = run("q93_columnar_filter")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarFilter"),
      s"expected the columnar filter swap in:\n$p")
    assert(p.contains("ColumnarToRow"),
      s"expected a ColumnarToRow transition above the columnar operator:\n$p")
  }

  test("q94 bucketed join reads co-located buckets with no exchange on the join inputs") {
    import org.apache.spark.sql.execution.{SortExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val df = run("q94_bucketed_colocated_join")
    df.collect()
    // AQE query stages are leaves to collect(), so flatten them manually
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    def deepCollect[T](n: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
      val here = n match {
        case a: AdaptiveSparkPlanExec => deepCollect(a.executedPlan)(pf)
        case q: QueryStageExec => deepCollect(q.plan)(pf)
        case other =>
          (if (pf.isDefinedAt(other)) Seq(pf(other)) else Nil) ++
            other.children.flatMap(c => deepCollect(c)(pf))
      }
      here
    }
    val root = df.queryExecution.executedPlan
    val p = planString(df)
    assert(p.contains("SelectedBucketsCount"), s"expected bucketed scans in:\n$p")
    val smj = deepCollect(root) { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, s"expected SMJ in:\n$p")
    // co-location: nothing below the join re-shuffles. (A within-partition
    // Sort remains: Spark 3+ does not trust bucket-file sort order without
    // spark.sql.legacy.bucketedTableScan.outputOrdering — linear, no
    // exchange, so the scale win, the absent shuffle, is unaffected.)
    val bad = smj.head.children.flatMap(c => deepCollect(c) {
      case _: ShuffleExchangeLike => "ShuffleExchange"
    })
    assert(bad.isEmpty, s"join inputs must be exchange-free, found $bad in:\n$p")
  }

  test("q96 accumulates its partial aggregation on ColumnarBatch") {
    val df = run("q96_columnar_partial_agg")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarPartialAgg"),
      s"expected the columnar partial agg swap in:\n$p")
    assert(p.contains("GraftColumnarFilter"),
      s"expected the whole pre-shuffle stage columnar in:\n$p")
  }

  test("q97 (TPC-H Q6) pushes every predicate into the parquet scan") {
    val p = planString(run("q97_tpch_q6"))
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(Seq("l_shipdate", "l_discount", "l_quantity").forall(pushed.contains),
      s"expected all three Q6 predicates pushed, got: $pushed")
  }

  test("q98 (TPC-H Q7) broadcasts the nation-filtered supplier dim") {
    assert(planString(run("q98_tpch_q7")).contains("BroadcastHashJoin"))
  }

  test("q99 (TPC-H Q8) reduces the customer side to a semi-join probe") {
    val p = planString(run("q99_tpch_q8"))
    assert(p.contains("LeftSemi"), s"expected customer semi-join in:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast dims in:\n$p")
  }

  test("q104 (TPC-H Q19) disjunctive predicate extracts the equi-key — hash join, no cartesian") {
    val p = planString(run("q104_tpch_q19"))
    assert(p.contains("BroadcastHashJoin") && !p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoop"),
      s"Q19's OR-of-ANDs must keep the partkey equi-join:\n$p")
  }

  test("q105 (TPC-H Q4) plans the EXISTS as a left-semi join") {
    assert(planString(run("q105_tpch_q4")).contains("LeftSemi"))
  }

  test("q107 (TPC-H Q22) plans the anti-join and the single-row threshold broadcast") {
    val p = planString(run("q107_tpch_q22"))
    assert(p.contains("LeftAnti"), s"expected anti-join to orders in:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"threshold compare must broadcast the single-row agg, not cartesian:\n$p")
  }

  test("q118 (TPC-H Q2) min-cost join is all-broadcast, no cartesian") {
    val p = planString(run("q118_tpch_q2"))
    assert(p.contains("BroadcastHashJoin") && !p.contains("CartesianProduct"),
      s"Q2's decorrelated min must broadcast, not cartesian:\n$p")
  }

  test("q119 (TPC-H Q9) prunes lineitem with the part semi-join before the fact joins") {
    val p = planString(run("q119_tpch_q9"))
    assert(p.contains("LeftSemi"), s"expected red-part semi-prune in:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q120 (TPC-H Q11) threshold is a single-row broadcast, inputs semi-pruned") {
    val p = planString(run("q120_tpch_q11"))
    assert(p.contains("LeftSemi"), s"expected nation-supplier semi-prune in:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"HAVING threshold must broadcast the single-row agg:\n$p")
  }

  test("q121 (TPC-H Q16) NOT IN plans a broadcast anti-join") {
    val p = planString(run("q121_tpch_q16"))
    assert(p.contains("LeftAnti"), s"expected excluded-supplier anti-join in:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q122 (TPC-H Q20) decorrelated stock check keeps equi-joins only") {
    val p = planString(run("q122_tpch_q20"))
    assert(p.contains("LeftSemi"), s"expected supplier semi-join in:\n$p")
    // The only nested-loop allowed is the single-row broadcast cross join
    // that attaches |supplier| to the partsupp derivation (q65 pattern);
    // a cartesian would mean the correlated compare escaped the equi-join.
    assert(!p.contains("CartesianProduct"),
      s"availqty>0.5*sum must ride the (part,supp) equi-join as a post-filter:\n$p")
  }

  test("q137 reads the columnar cache via InMemoryTableScan") {
    val df = run("q137_cached_scan")
    df.collect()
    val p = planString(df)
    assert(p.contains("InMemoryTableScan"),
      s"expected the cached columnar batches to serve the scan:\n$p")
  }

  test("AQE coalesces the post-shuffle partitions of a small aggregation") {
    // 32 shuffle partitions over 3 result groups: AQE must coalesce the
    // read side instead of scheduling 32 near-empty tasks — at 100 TB
    // the same mechanism right-sizes every stage after the first.
    val df = run("q36_agg_minmax_avg")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AQEShuffleRead") && p.contains("coalesced"),
      s"expected AQE partition coalescing in:\n$p")
  }

  test("q131 CDC compaction pushes a partial WindowGroupLimit below the shuffle") {
    val df = run("q131_cdc_latest")
    df.collect()
    val p = planString(df)
    assert(p.contains("WindowGroupLimit"),
      s"rank-1 filter must prune candidates map-side before the key shuffle:\n$p")
    assert(!p.contains("CartesianProduct"))
    // the map-side pre-filter is the COLUMNAR probe — and it needs no
    // sort below it: the only Sort left is the final-stage one above
    // the exchange (plus the output ORDER BY)
    assert(p.contains("GraftColumnarWindowGroupLimit"),
      s"expected the columnar WGL probe in:\n$p")
    val mapSideSort = df.queryExecution.executedPlan.exists {
      case s: org.apache.spark.sql.execution.SortExec =>
        s.exists(_.isInstanceOf[
          org.apache.spark.sql.execution.graft.GraftColumnarWindowGroupLimitExec])
      case _ => false
    }
    assert(!mapSideSort, s"no sort may remain below the columnar probe:\n$p")
  }

  test("q168 rank group limit probes columnar with no map-side sort") {
    val df = run("q168_rank_group_limit")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarRankGroupLimit"),
      s"expected the columnar rank probe in:\n$p")
    // no sort may remain below the probe (the probe replaces it)
    val mapSideSort = df.queryExecution.executedPlan.exists {
      case s: org.apache.spark.sql.execution.SortExec =>
        s.exists(_.isInstanceOf[
          org.apache.spark.sql.execution.graft.GraftColumnarRankGroupLimitExec])
      case _ => false
    }
    assert(!mapSideSort, s"no sort may remain below the columnar rank probe:\n$p")
  }

  test("q169 dense_rank group limit probes columnar with no map-side sort") {
    val df = run("q169_dense_rank_group_limit")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarRankGroupLimit"),
      s"expected the columnar dense_rank probe in:\n$p")
    val mapSideSort = df.queryExecution.executedPlan.exists {
      case s: org.apache.spark.sql.execution.SortExec =>
        s.exists(_.isInstanceOf[
          org.apache.spark.sql.execution.graft.GraftColumnarRankGroupLimitExec])
      case _ => false
    }
    assert(!mapSideSort, s"no sort may remain below the columnar dense_rank probe:\n$p")
  }

  test("q177/q178 bucketed right/full-outer joins probe columnar with the build-outer sweep") {
    for ((name, wantLeftOuter) <- Seq(
        "q177_bucketed_shuffled_right_outer" -> false,
        "q178_bucketed_shuffled_full_outer" -> true)) {
      val df = run(name)
      df.collect()
      val p = planString(df)
      assert(p.contains("GraftColumnarShuffledInnerJoin"),
        s"$name: expected the columnar shuffled probe in:\n$p")
      // the swap carries the build-outer flags (plan string shows args)
      assert(p.contains(s"$wantLeftOuter, true"),
        s"$name: expected leftOuter=$wantLeftOuter buildOuter=true in:\n$p")
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.size <= 2, s"$name: stream side must not shuffle:\n$p")
    }
  }

  test("q170 bucketed shuffled inner join probes columnar with a single build-side exchange") {
    val df = run("q170_bucketed_shuffled_inner")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarShuffledInnerJoin"),
      s"expected the columnar shuffled inner probe in:\n$p")
    // the bucketed stream side joins in place: exchanges = build side +
    // the final aggregation's at most
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 2, s"stream side must not shuffle:\n$p")
  }

  test("q171 bucketed shuffled left-outer join probes columnar with a single build-side exchange") {
    val df = run("q171_bucketed_shuffled_left_outer")
    df.collect()
    val p = planString(df)
    // deep traversal: AQE wraps the final plan in AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def deep(n: SparkPlan): Seq[SparkPlan] = n match {
      case a: AdaptiveSparkPlanExec => deep(a.executedPlan)
      case q: QueryStageExec => deep(q.plan)
      case other => other +: other.children.flatMap(deep)
    }
    val probe = deep(df.queryExecution.executedPlan).collectFirst {
      case e: org.apache.spark.sql.execution.graft.GraftColumnarShuffledInnerJoinExec => e
    }
    assert(probe.exists(_.leftOuter),
      s"expected the columnar shuffled left-outer probe in:\n$p")
    // the bucketed stream side joins in place: exchanges = build side +
    // the final aggregation's at most
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 2, s"stream side must not shuffle:\n$p")
  }

  test("q172 bucketed sorted export swaps the per-bucket sort columnar with zero exchanges") {
    val df = run("q172_bucketed_sorted_export")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarSort"),
      s"expected the columnar sort kernel over the bucketed scan in:\n$p")
    assert(p.contains("SelectedBucketsCount"), s"expected a bucketed scan in:\n$p")
    // the whole point: per-bucket sorted runs, no exchange anywhere
    assert(!p.contains("Exchange"), s"bucketed sorted export must not shuffle:\n$p")
    val rowSort = df.queryExecution.executedPlan.exists {
      case _: org.apache.spark.sql.execution.SortExec => true
      case _ => false
    }
    assert(!rowSort, s"row SortExec must be swapped:\n$p")
  }

  test("q37 variance family aggregates columnar on BOTH exchange sides") {
    val df = run("q37_agg_variance")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarGroupedAgg"),
      s"expected the columnar grouped partial agg for the stddev/corr/covar family in:\n$p")
    assert(p.contains("GraftColumnarFinalAgg"),
      s"expected the moments/cov/corr FINAL merge columnar in:\n$p")
  }

  test("q174 decimal averages partial-aggregate columnar on the Decimal64 kernel") {
    val df = run("q174_decimal_avg")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarGroupedAgg"),
      s"expected the columnar grouped partial agg for avg(decimal) in:\n$p")
  }

  test("q130 skewness/kurtosis pipeline swaps columnar on BOTH exchange sides") {
    val df = run("q130_higher_moments")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarGroupedAgg"),
      s"expected the columnar grouped partial agg for skew/kurt in:\n$p")
    assert(p.contains("GraftColumnarFinalAgg"),
      s"expected the moments FINAL merge columnar (MomentsFinalSpec) in:\n$p")
  }

  test("q175 partial SortAggregate + map-side sort absorbed into the columnar grouped agg") {
    val df = run("q175_string_minmax_agg")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarGroupedAgg"),
      s"expected the partial string min/max stage absorbed by the columnar kernel in:\n$p")
    // Exactly one SortAggregate survives in the executed plan: the FINAL
    // stage above the exchange (string buffers stay immutable there). If
    // the partial one reappears, the absorption gate regressed. (The
    // formatted explain is not used here — its "Initial Plan" section and
    // per-node details repeat the name.)
    val ep = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val sortAggs = "SortAggregate".r.findAllIn(ep).size
    assert(sortAggs == 1, s"expected only the final SortAggregate, found $sortAggs in:\n$ep")
  }

  test("partial SortAggregate is NOT absorbed when no shuffle sits above it") {
    // Bucketed-but-unsorted input on the grouping key: the scan's
    // HashPartitioning satisfies the aggregation's distribution, so
    // EnsureRequirements inserts a map-side Sort below the partial
    // SortAggregate but NO exchange between partial and final — the
    // final's requiredChildOrdering is met by the partial's own
    // outputOrdering. Absorbing Sort + partial into the (unordered)
    // hash kernel here would feed the final SortAggregate unsorted
    // rows → silent duplicate groups. The rule matches on the exchange
    // precisely to keep this shape on the row path.
    import org.apache.spark.sql.functions.{min, max}
    val tbl = "nation_bucketed_unsorted_gate"
    spark.read.parquet(s"$sfDir/nation.parquet")
      .write.bucketBy(4, "n_regionkey").mode("overwrite").saveAsTable(tbl)
    try {
      val df = spark.table(tbl).groupBy("n_regionkey")
        .agg(min("n_name").as("min_n"), max("n_name").as("max_n"))
      val rows = df.collect()
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      // if the planner ever shuffles here the shape no longer exercises
      // the gate, so make that visible instead of passing vacuously
      assert(!plan.contains("Exchange"),
        s"expected a shuffle-free bucketed group-by plan, got:\n$plan")
      assert(!plan.contains("GraftColumnarGroupedAgg"),
        s"SortAggregate absorbed without a shuffle above it:\n$plan")
      // correctness regardless of shape: one row per distinct key
      val expected = spark.table(tbl).select("n_regionkey").distinct().count()
      assert(rows.length == expected,
        s"duplicate groups: got ${rows.length} rows for $expected keys")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("q176 running-frame window aggregation swaps to the streaming window exec") {
    val df = run("q176_window_streaming_agg")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("GraftColumnarWindow"),
      s"expected the streaming window agg swap in:\n$p")
    val rowWindows = "(?<!GraftColumnar)Window \\[".r.findAllIn(p).size
    assert(rowWindows == 0,
      s"no row WindowExec should remain for the running frame:\n$p")
  }

  test("q185 wide rolling frames swap to the O(n) sliding window exec") {
    val df = runFullPlan("q185_window_rolling_wide")
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("GraftWindowSliding"),
      s"expected the 1,000-row frames on the invertible sliding kernels in:\n$p")
    val rowWindows = "(?<!GraftColumnar)Window \\[".r.findAllIn(p).size
    assert(rowWindows == 0,
      s"no row WindowExec should remain for the wide sliding frames:\n$p")
  }

  test("q186 wide value-range frames swap to the incremental range-slide exec") {
    val df = runFullPlan("q186_window_range_wide")
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("GraftWindowRangeSlide"),
      s"expected the wide RANGE frames on the incremental kernels in:\n$p")
    val rowWindows = "(?<!GraftColumnar)Window \\[".r.findAllIn(p).size
    assert(rowWindows == 0,
      s"no row WindowExec should remain for the wide RANGE frames:\n$p")
  }

  test("q187 size-based window functions swap to the partition-buffered face") {
    // BOTH nodes leave the row exec: the kind-0 ntile/percent_rank/rank
    // node (single emission cursor) and the kind-1 cume_dist +
    // RANGE-running-agg node (peer-scout cursor)
    val df = runFullPlan("q187_window_sizebased")
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val swapped = "GraftColumnarWindow".r.findAllIn(p).size
    assert(swapped >= 2,
      s"expected both size-based window nodes on GraftColumnarWindowExec in:\n$p")
    val rowWindows = "(?<!GraftColumnar)Window \\[".r.findAllIn(p).size
    assert(rowWindows == 0,
      s"no row WindowExec should remain for the size-based functions:\n$p")
  }

  test("q188 mixed-kind window node splits into three swapped graft nodes") {
    // one WindowExec mixing streaming (running sum/row_number/lag/
    // sliding min), size-based (ntile) and deferred RANGE-running
    // kinds: the splitter chains three homogeneous nodes over the one
    // sort and every one leaves the row exec
    val df = runFullPlan("q188_window_mixed_kinds")
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val swapped = "GraftColumnarWindow".r.findAllIn(p).size
    assert(swapped >= 3,
      s"expected the three split window nodes on GraftColumnarWindowExec in:\n$p")
    val rowWindows = "(?<!GraftColumnar)Window \\[".r.findAllIn(p).size
    assert(rowWindows == 0,
      s"no row WindowExec should remain after the mixed-kind split:\n$p")
    // ONE sort feeds the whole chain — splitting must not add sorts
    val sorts = "Sort \\[".r.findAllIn(p).size
    assert(sorts <= 2, // the window sort + the query's output ORDER BY
      s"the split chain must reuse the single window sort:\n$p")
  }

  test("q189 suffix frames swap to the block-combined face") {
    // both nodes (ROWS suffix over the total order, RANGE suffix over
    // the tied quantity order) leave the O(n^2) row exec
    val df = runFullPlan("q189_window_suffix")
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val swapped = "GraftColumnarWindow".r.findAllIn(p).size
    assert(swapped >= 2,
      s"expected both suffix window nodes on GraftColumnarWindowExec in:\n$p")
    val rowWindows = "(?<!GraftColumnar)Window \\[".r.findAllIn(p).size
    assert(rowWindows == 0,
      s"no row WindowExec should remain for the suffix frames:\n$p")
  }

  test("q179 RANGE running frame swaps to the deferred streaming window exec") {
    val df = run("q179_window_range_peers")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("GraftColumnarWindow"),
      s"expected the deferred window agg swap in:\n$p")
    val rowWindows = "(?<!GraftColumnar)Window \\[".r.findAllIn(p).size
    assert(rowWindows == 0,
      s"no row WindowExec should remain for the RANGE running frame:\n$p")
  }

  test("q156 winnowing windows all leave the row WindowExec") {
    // 6-gram assembly = pure-lead nodes (GraftWindowOffsetExec);
    // fingerprint selection = sliding string-min + lead in ONE node
    // (fn-13 mixed machine)
    val df = runFullPlan("q156_winnowing_dedup")
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("GraftWindowOffset") || p.contains("GraftColumnarWindow"),
      s"expected streaming window execs in:\n$p")
    val rowWindows = "(?<!GraftColumnar)Window \\[".r.findAllIn(p).size
    assert(rowWindows == 0, s"no row WindowExec should remain:\n$p")
  }

  test("q24 double-key value-range window swaps to the ring exec") {
    val df = run("q24_window_range")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("GraftWindowRangeSlide"),
      s"expected the RANGE-slide exec in:\n$p")
    val rowWindows = "(?<!GraftColumnar)Window \\[".r.findAllIn(p).size
    assert(rowWindows == 0, s"no row WindowExec should remain:\n$p")
  }

  test("q184 rolling time-range window swaps to the value-bounded ring exec") {
    val df = run("q184_window_range_rolling")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("GraftWindowRangeSlide"),
      s"expected the RANGE-slide exec in:\n$p")
    val rowWindows = "(?<!GraftColumnar)Window \\[".r.findAllIn(p).size
    assert(rowWindows == 0, s"no row WindowExec should remain:\n$p")
  }

  test("q183 forward-fill / first-last-nth swaps to the boxed streaming lane") {
    val df = run("q183_window_ffill")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("GraftColumnarWindow"),
      s"expected the streaming window exec in:\n$p")
    val rowWindows = "(?<!GraftColumnar)Window \\[".r.findAllIn(p).size
    assert(rowWindows == 0, s"no row WindowExec should remain:\n$p")
  }

  test("q182 sliding frames swap to the ring-buffer window exec") {
    val df = run("q182_window_sliding")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("GraftWindowSliding"),
      s"expected the sliding window exec in:\n$p")
    val rowWindows = "(?<!GraftColumnar)Window \\[".r.findAllIn(p).size
    assert(rowWindows == 0, s"no row WindowExec should remain:\n$p")
  }

  test("q181 ranking nodes swap to the streaming window exec") {
    val df = run("q181_window_ranking_stream")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("GraftColumnarWindow"),
      s"expected the streaming window exec in:\n$p")
    val rowWindows = "(?<!GraftColumnar)Window \\[".r.findAllIn(p).size
    assert(rowWindows == 0,
      s"both ranking nodes (unique-order and tie-prone) should swap:\n$p")
  }

  test("q180 lag/lead swaps to the streaming offset exec") {
    val df = run("q180_window_lag_lead")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("GraftWindowOffset"),
      s"expected the streaming offset exec in:\n$p")
    val rowWindows = "(?<!GraftColumnar)Window \\[".r.findAllIn(p).size
    assert(rowWindows == 0, s"no row WindowExec should remain:\n$p")
  }

  test("q173 timestamp-key semi join probes columnar through the unsafe-key path") {
    val df = run("q173_date_key_semi")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarSemiBHJ"),
      s"expected the columnar semi probe on the timestamp key in:\n$p")
  }

  test("q164 sorted-run export swaps the scan-side local sort for the columnar kernel") {
    val df = run("q164_sorted_run_export")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarSort"),
      s"expected the columnar sort kernel over the scan block in:\n$p")
    // no exchange: the whole point is one sorted run per scan split
    assert(!p.contains("Exchange"), s"sorted-run export must not shuffle:\n$p")
    // and no row Sort left anywhere
    val rowSort = df.queryExecution.executedPlan.exists {
      case _: org.apache.spark.sql.execution.SortExec => true
      case _ => false
    }
    assert(!rowSort, s"row SortExec must be swapped:\n$p")
  }

  test("q165 bucketed shuffled semi join probes columnar with a single build-side exchange") {
    val df = run("q165_bucketed_shuffled_semi")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarShuffledSemiJoin"),
      s"expected the columnar shuffled semi probe in:\n$p")
    // exactly two exchanges may appear: the build side's and the final
    // aggregation's — the bucketed stream side must join in place
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 2, s"stream side must not shuffle:\n$p")
  }

  test("q124 ORC re-scan pushes the quantity predicate into the ORC scan") {
    val p = planString(run("q124_orc_roundtrip"))
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("l_quantity"),
      s"expected l_quantity pushed to the ORC scan, got: $pushed")
  }

  test("q193 computed-partition-key window canonicalizes onto the columnar suffix kernel") {
    // pmod(l_orderkey, 4096) PARTITION BY: the rule materializes the key
    // in a Project below and retries — the O(n) suffix exec must swap
    // (executed plan: the swap lives inside materialized AQE stages)
    val df = runFullPlan("q193_window_suffix_hicard")
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("GraftColumnarWindow"),
      s"computed-key window must canonicalize and swap:\n$p")
    assert(p.contains("_graftpkey"), s"expected the materialized key below:\n$p")
  }

  test("q195 chunking is map-side: no exchange below the presentation sort") {
    val p = planString(run("q195_chunk_overlap"))
    // exactly one exchange — the rangepartitioning of the final orderBy;
    // tokenize/sequence/posexplode/slice all ride the scan stage
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size == 1,
      s"chunking must not shuffle below the presentation sort:\n$p")
    assert(p.contains("Generate"), s"expected posexplode Generate:\n$p")
  }

  test("q196 url canonicalization shuffles once, on the canonical key") {
    val p = planString(run("q196_url_canonicalize"))
    // one partial+final agg pair around one exchange (+ the presentation
    // sort's range exchange): canonicalization itself is map-side
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size == 2,
      s"expected agg + presentation exchanges only:\n$p")
    assert(p.contains("HashAggregate"), s"expected hash agg on the canonical key:\n$p")
  }

  test("q197 inference scores map-side and prunes the scan to its feature columns") {
    val p = planString(run("q197_lr_inference"))
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size == 2,
      s"expected rollup + presentation exchanges only:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("n_chars") && readSchema.contains("lang") &&
      !readSchema.contains("doc_id"),
      s"expected the scan pruned to feature columns, got: $readSchema")
  }

  test("q109 hash sampling is a pure scan-filter — zero exchanges, columnar predicate") {
    val p = planString(run("q109_sample_hash"))
    assert(!p.contains("Exchange"), s"deterministic sample must not shuffle:\n$p")
    // the md5-threshold predicate compiles through the string kernel
    // language (CastIntegralToStr → Md5Hex → Substr → ComputedStrCmp)
    assert(p.contains("GraftColumnarFilter"),
      s"expected the sampling predicate on the columnar filter:\n$p")
  }

  test("q110 stratified sampling shuffles once, on the stratum key") {
    val p = planString(run("q110_sample_stratified"))
    // formatted mode lists each operator once in the tree and once in the
    // details — count the numbered detail entries.
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size == 1 && p.contains("Window"),
      s"expected exactly one exchange feeding the window rank:\n$p")
    // rank-limit is applied map-side BEFORE the shuffle (Partial
    // WindowGroupLimit): at 100 TB only ≤20 rows per stratum per input
    // partition ever shuffle, not the corpus.
    assert(p.contains("WindowGroupLimit"),
      s"expected partial window-group-limit pushdown:\n$p")
  }

  test("q111 computes its projection on ColumnarBatch via GraftColumnarProject") {
    val df = run("q111_columnar_project")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarProject"),
      s"expected the columnar project swap in:\n$p")
    assert(p.contains("GraftColumnarFilter"),
      s"expected the whole pre-sort stage columnar in:\n$p")
  }

  test("q128 computes its string projection on ColumnarBatch via GraftColumnarProject") {
    val df = run("q128_columnar_string_project")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarProject"),
      s"expected the columnar project swap in:\n$p")
    assert(p.contains("GraftColumnarFilter"),
      s"expected the whole pre-sort stage columnar in:\n$p")
  }

  test("q133 probes the broadcast join and partial-aggregates entirely on ColumnarBatch") {
    val df = run("q133_columnar_broadcast_join")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarBHJ"),
      s"expected the columnar broadcast join swap in:\n$p")
    assert(p.contains("GraftColumnarFilter") && p.contains("GraftColumnarGroupedAgg"),
      s"expected the whole pre-shuffle stage columnar in:\n$p")
  }

  test("q113 runs BOTH grouped aggregation stages on ColumnarBatch") {
    val df = run("q113_columnar_grouped_agg")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarGroupedAgg"),
      s"expected the grouped columnar partial agg swap in:\n$p")
    assert(p.contains("GraftColumnarFinalAgg"),
      s"expected the columnar FINAL agg above the exchange in:\n$p")
    assert(p.contains("GraftColumnarFilter"),
      s"expected the whole pre-shuffle stage columnar in:\n$p")
  }

  test("q146 runs Q1's money sums Decimal64-columnar on BOTH sides of the shuffle") {
    val df = run("q146_tpch_q1_dec64")
    df.collect()
    val p = planString(df)
    assert(p.contains("GraftColumnarGroupedAgg"),
      s"expected the Decimal64 grouped partial agg columnar in:\n$p")
    assert(p.contains("GraftColumnarFinalAgg"),
      s"expected the Decimal64 FINAL agg columnar above the exchange in:\n$p")
    assert(p.contains("GraftColumnarProject") && p.contains("GraftColumnarFilter"),
      s"expected the whole pre-shuffle money pipeline columnar in:\n$p")
  }

  test("q114 skewed partition is split by AQE (skew=true), results unchanged") {
    // The oracle run uses default thresholds (sf0.01 is below the 256MB
    // skew trigger); here the thresholds are lowered so the same plan
    // fires the split at test scale — the knobs a real deployment tunes,
    // not a behavior change.
    def mk() = run("q114_aqe_skew_join")
    val expected = withSQLConf("spark.sql.adaptive.enabled" -> "false")(canon(mk()))
    withSQLConf(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB") {
      val df = mk()
      val got = canon(df)
      assert(got == expected, s"skew-split changed results: $got vs $expected")
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"expected a skew-split SMJ in:\n$p")
    }
  }

  test("q115/q117 unbounded sides carry NO broadcast hint — AQE decides at runtime") {
    // Both formerly-hinted sides grow with corpus size (boilerplate
    // segments, vocabulary), so a static broadcast() hint would OOM
    // the driver at 100 TB. The plans must leave broadcast to AQE's
    // size-measured decision. q117 keeps exactly one hint: the
    // single-row totals, which is bounded by construction.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val h115 = run("q115_corpus_span_dedup")
      .queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(h115.isEmpty, s"q115 must carry no broadcast hints, found: $h115")
    val q117 = run("q117_unigram_lm_score")
    val h117 = q117.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(h117.size == 1,
      s"q117 may hint only the single-row totals, found ${h117.size}: $h117")
    // the corpus-side join is hash-led: xxhash64 longs lead the key
    assert(planString(q117).contains("xxhash64"),
      "q117 token join must be keyed on xxhash64 longs")
  }

  test("cosine_sim stays inside whole-stage codegen") {
    // Plain scan→project (no AQE exchange wrapping): the projection
    // computing cosine_sim must sit inside a WholeStageCodegen span.
    val df = Tables.t(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "cosine_sim(embedding, embedding) AS c")
    // formatted mode marks codegen membership with "[codegen id : N]"
    val p = planString(df)
    val projLine = p.linesIterator.find(_.startsWith("(3) Project")).getOrElse("")
    assert(p.contains("codegen id") && projLine.contains("codegen id"),
      s"expected the cosine_sim Project inside a codegen span:\n$p")
  }
}
