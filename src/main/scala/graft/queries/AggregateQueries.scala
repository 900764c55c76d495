package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Aggregate long tail (SURVEY §2.3, reference serde/aggregates.scala:
  * 35-687): min/max/avg, variance family, corr/covar, first/last,
  * bit aggregates, collect_set, count(DISTINCT), FILTER clauses.
  *
  * Determinism rules (these run on 32 shuffle partitions — any
  * order-dependent float accumulation would flake):
  *  - avg is exercised on integers (exact in double up to 2^53) and the
  *    decimal ratio form for doubles.
  *  - variance/corr/covar are single-pass merges in both engines with
  *    ~1e-12 relative error → both sides round at a magnitude-appropriate
  *    decimal place.
  *  - first/last are only deterministic when the aggregated value is
  *    functionally dependent on the group key — exercised exactly so.
  *  - collect_set is sorted on both sides before comparison.
  * All of these plan as partial+final HashAggregate (collect_set →
  * ObjectHashAggregate) around a single shuffle — the 100 TB shape.
  */
object AggregateQueries {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private val decSql = "DECIMAL(18,2)"

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q191_computed_arg_agg",
      (s, dir) => {
        import s.implicits._
        // COMPUTED aggregate arguments, aggregated columnar: Spark
        // evaluates function inputs inline (no PullOutGrouping for
        // args), so sum(price * (1 - disc)) historically kept the whole
        // partial on the row path. The planner now absorbs
        // deterministic kernel-compilable args into a
        // GraftColumnarProject below the agg (pinned). All check lanes
        // order-free: exact Decimal64 net-revenue sum (the q146 money
        // discipline — WITHOUT the manual pre-projection), selection
        // min/max over computed doubles, count.
        // SURFACE (r14): the exact decimal sum travels as BIGINT
        // MICRO-UNITS (the r10 q174 convention). The scale-6 product
        // values have 1e-4-step discounts ⇒ two dead trailing digits
        // ("…00"), exactly the driver's decimal trailing-zero
        // normalization boundary (str(Decimal) != repr(float) — see
        // ProbeQueries' characterization; red r11–r13 for precisely
        // this). Engine exercise unchanged: the computed-arg absorption
        // and the int128 sum still run columnar; *1e6 is a post-agg
        // projection over 6 rows.
        val dp = $"l_extendedprice".cast("decimal(9,2)")
        val dd = $"l_discount".cast("decimal(5,4)")
        Tables.t(s, dir, "lineitem")
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sum(dp * (lit(1).cast("decimal(5,4)") - dd)).as("net_rev"),
            min(-$"l_extendedprice").as("min_neg_price"),
            max(abs($"l_discount" - $"l_tax")).as("max_spread"),
            count(lit(1)).as("n"))
          .select($"l_returnflag", $"l_linestatus",
            ($"net_rev" * 1000000).cast("long").as("net_rev_micros"),
            $"min_neg_price", $"max_spread", $"n")
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
          CAST(round(sum(CAST(l_extendedprice AS DECIMAL(9,2))
              * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))))
            * 1000000, 0) AS BIGINT) AS net_rev_micros,
          min(-l_extendedprice) AS min_neg_price,
          max(abs(l_discount - l_tax)) AS max_spread,
          count(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      doc = "Computed aggregate arguments (sum of a decimal product, min/max of computed doubles) absorbed into a columnar kernel Project below the grouped partial agg — the TPC-H Q1 money shape swaps without manual pre-projection; exact sum surfaced as BIGINT micro-units per the money convention."),

    QueryDef(
      "q192_conditional_arg_agg",
      (s, dir) => {
        import s.implicits._
        // CONDITIONAL computed aggregate arguments — the TPC-H Q8/Q14
        // market-share shape: sum(CASE WHEN flag THEN money ELSE 0).
        // The revenue product at the spec's own DECIMAL(18,2) operand
        // widths lands on DECIMAL(37,4) — past Decimal64 — so the
        // absorbed kernel Project runs the int128 lane (Mul128x64 /
        // CaseWhen128) and the partial agg accumulates int128
        // (SumDec128Spec), the JVM twin of the reference's
        // sum_decimal.rs. The CASE branches evaluate under a selection
        // mask, giving the row path's lazy ANSI error semantics. The
        // double CASE lanes (conditional sum/count) pin CaseWhenD.
        val rev = $"l_extendedprice".cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)"))
        Tables.t(s, dir, "lineitem")
          .groupBy($"l_linestatus")
          .agg(
            sum(when($"l_returnflag" === "R", rev)
              .otherwise(lit(0).cast("decimal(37,4)"))).as("ret_rev"),
            sum(rev).as("rev"),
            sum(when($"l_quantity" < 25, $"l_extendedprice").otherwise(lit(0.0)))
              .as("small_rev"),
            count(when($"l_returnflag" === "R", lit(1.0))).as("n_ret"),
            count(lit(1)).as("n"))
          .orderBy($"l_linestatus")
      },
      Some("""SELECT l_linestatus,
          CAST(sum(CASE WHEN l_returnflag = 'R'
              THEN CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
              ELSE CAST(0 AS DECIMAL(37,4)) END) AS DECIMAL(38,4)) AS ret_rev,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
              * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DECIMAL(38,4)) AS rev,
          sum(CASE WHEN l_quantity < 25 THEN l_extendedprice ELSE 0.0 END) AS small_rev,
          count(CASE WHEN l_returnflag = 'R' THEN 1.0 END) AS n_ret,
          count(*) AS n
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""),
      doc = "Conditional computed aggregate arguments (the TPC-H Q8/Q14 market-share shape): CASE-gated DECIMAL(37,4) money products absorbed into the int128 columnar lane below the grouped partial agg, plus conditional double sum/count lanes."),

    QueryDef(
      "q194_filter_agg",
      (s, dir) => {
        import s.implicits._
        // FILTER (WHERE) on null-ignoring aggregates — rewritten by the
        // planner onto the masked conditional kernels (agg(x) FILTER f
        // == agg(IF(f, x, NULL)); counts gate a non-null marker), so
        // the previously blanket-fallback FILTER surface swaps
        // columnar. min/max over the DECIMAL(37,4) money product pin
        // the int128 comparison lanes on both exchange sides.
        // SURFACE (r14): the decimal lanes travel as BIGINT 1e-4 units —
        // max(rev) rows are zero-discount products ending "…00" at
        // scale 4, the driver's trailing-zero normalization boundary
        // (see ProbeQueries; the r13 probes localized this query's red
        // to exactly the min/max lanes — q203/q204/q206 green, q205
        // red). Engine exercise unchanged: FILTER rewrite + int128
        // min/max still run columnar; *1e4 is a post-agg projection.
        val rev = $"l_extendedprice".cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)"))
        Tables.t(s, dir, "lineitem")
          .withColumn("rev", rev)
          .groupBy($"l_returnflag")
          .agg(
            expr("sum(rev) FILTER (WHERE l_quantity < 25)").as("rev_small"),
            expr("count(1) FILTER (WHERE l_linestatus = 'F')").as("n_f"),
            expr("count(l_partkey) FILTER (WHERE l_quantity >= 25)").as("n_big"),
            min($"rev").as("mn_rev"),
            max($"rev").as("mx_rev"),
            expr("round(avg(l_extendedprice) FILTER (WHERE l_quantity < 10), 4)")
              .as("avg_small"))
          .select($"l_returnflag",
            ($"rev_small" * 10000).cast("long").as("rev_small_u"),
            $"n_f", $"n_big",
            ($"mn_rev" * 10000).cast("long").as("mn_rev_u"),
            ($"mx_rev" * 10000).cast("long").as("mx_rev_u"),
            $"avg_small")
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
          CAST(round(sum(rev) FILTER (WHERE l_quantity < 25) * 10000, 0) AS BIGINT) AS rev_small_u,
          count(*) FILTER (WHERE l_linestatus = 'F') AS n_f,
          count(l_partkey) FILTER (WHERE l_quantity >= 25) AS n_big,
          CAST(round(min(rev) * 10000, 0) AS BIGINT) AS mn_rev_u,
          CAST(round(max(rev) * 10000, 0) AS BIGINT) AS mx_rev_u,
          round(avg(l_extendedprice) FILTER (WHERE l_quantity < 10), 4) AS avg_small
        FROM (SELECT *, CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS rev
          FROM lineitem)
        GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "FILTER (WHERE) aggregation surface: filtered sum/count/avg rewritten onto the masked conditional kernels (agg(x) FILTER f == agg(IF(f, x, NULL))), int128 min/max over the DECIMAL(37,4) money product — the whole partial swaps columnar where FILTER was previously a blanket row-path fallback."),

    QueryDef(
      "q36_agg_minmax_avg",
      (s, dir) => {
        import s.implicits._
        // r15: median() is Percentile(0.5) — its partial buffers every
        // value, and the single-row-group scan is one task; repartition
        // so the buffers build in parallel (q85's note applies). r16:
        // gated on the scan's task count (Tables.spreadIfNarrow) so a
        // splittable at-scale input skips the exchange.
        Tables.spreadIfNarrow(Tables.t(s, dir, "lineitem"), $"l_orderkey")
          .groupBy($"l_returnflag")
          .agg(
            min($"l_quantity").as("min_qty"),
            max($"l_quantity").as("max_qty"),
            min($"l_shipdate").as("min_ship"),
            max($"l_shipdate").as("max_ship"),
            min($"l_linestatus").as("min_status"),
            max($"l_linestatus").as("max_status"),
            avg($"l_linenumber").as("avg_ln"),
            (sum(dec($"l_extendedprice")).cast("double") / count(lit(1)))
              .as("avg_price"),
            count($"l_quantity").as("n_nonnull"),
            round(median($"l_quantity"), 4).as("med_qty"))
          .orderBy($"l_returnflag")
      },
      Some(s"""SELECT l_returnflag,
          min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
          min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
          min(l_linestatus) AS min_status, max(l_linestatus) AS max_status,
          avg(l_linenumber) AS avg_ln,
          CAST(sum(CAST(l_extendedprice AS $decSql)) AS DOUBLE) / count(*) AS avg_price,
          count(l_quantity) AS n_nonnull,
          round(median(CAST(l_quantity AS DOUBLE)), 4) AS med_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "min/max over double+timestamp+string, avg over int (exact) and decimal-ratio avg over double."),

    QueryDef(
      "q37_agg_variance",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            round(stddev_pop($"l_extendedprice"), 2).as("sd_pop"),
            round(stddev_samp($"l_extendedprice"), 2).as("sd_samp"),
            round(var_pop($"l_quantity"), 4).as("v_pop"),
            round(var_samp($"l_quantity"), 4).as("v_samp"),
            round(corr($"l_quantity", $"l_extendedprice"), 6).as("cr"),
            round(covar_pop($"l_quantity", $"l_discount"), 6).as("cv_pop"),
            round(covar_samp($"l_quantity", $"l_discount"), 6).as("cv_samp"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
          round(stddev_pop(l_extendedprice), 2) AS sd_pop,
          round(stddev_samp(l_extendedprice), 2) AS sd_samp,
          round(var_pop(l_quantity), 4) AS v_pop,
          round(var_samp(l_quantity), 4) AS v_samp,
          round(corr(l_quantity, l_extendedprice), 6) AS cr,
          round(covar_pop(l_quantity, l_discount), 6) AS cv_pop,
          round(covar_samp(l_quantity, l_discount), 6) AS cv_samp
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "stddev/var/corr/covar families, rounded at magnitude-appropriate places for merge-order independence."),

    QueryDef(
      "q38_agg_misc",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "lineitem").filter($"l_orderkey" < 2000)
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            first(concat($"l_returnflag", $"l_linestatus")).as("fst"),
            last(concat($"l_linestatus", $"l_returnflag")).as("lst"),
            bit_and($"l_linenumber").cast("long").as("b_and"),
            bit_or($"l_linenumber").cast("long").as("b_or"),
            bit_xor($"l_linenumber").cast("long").as("b_xor"),
            countDistinct($"l_partkey").as("n_parts"),
            // Stringified: raw list columns are not hashable by the driver's
            // pandas harness; the collect_set/array_sort path stays exercised.
            array_join(array_sort(collect_set($"l_linenumber")).cast("array<string>"), ",").as("lns"),
            expr("count(*) FILTER (WHERE l_quantity > 25)").as("n_big"),
            expr(s"CAST(sum(CAST(l_quantity AS $decSql)) FILTER (WHERE l_discount > 0.05) AS DOUBLE)")
              .as("qty_disc"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
          l_returnflag || l_linestatus AS fst,
          l_linestatus || l_returnflag AS lst,
          CAST(bit_and(l_linenumber) AS BIGINT) AS b_and,
          CAST(bit_or(l_linenumber) AS BIGINT) AS b_or,
          CAST(bit_xor(l_linenumber) AS BIGINT) AS b_xor,
          count(DISTINCT l_partkey) AS n_parts,
          array_to_string(list_sort(list(DISTINCT l_linenumber)), ',') AS lns,
          count(*) FILTER (WHERE l_quantity > 25) AS n_big,
          CAST(sum(CAST(l_quantity AS $decSql)) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS qty_disc
        FROM lineitem WHERE l_orderkey < 2000
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""),
      doc = "first/last (group-constant → deterministic), bit_and/or/xor, count(DISTINCT), sorted collect_set (ObjectHashAggregate), per-aggregate FILTER clauses."),

    QueryDef(
      "q85_percentiles",
      (s, dir) => {
        import s.implicits._
        // Exact interpolated percentiles (Spark `percentile` ==
        // DuckDB `quantile_cont`, both linear interpolation). At 100 TB
        // you'd switch to percentile_approx — same plan shape, sketch
        // merge instead of full sort per group; the exact form is what
        // the oracle can check bit-for-bit (after rounding).
        // One array-form percentile aggregate per source column (not one
        // aggregate per requested percentile): each percentile() buffers
        // the full column, so five scalar calls cost 5 buffers where two
        // array calls cost 2 — measured 3.0 s → ~1 s at sf0.1.
        // r15 (guide §2.5): the exact percentile partial buffers every
        // value into per-group count maps, and the single-row-group scan
        // is one task — repartition by orderkey so 32 partial maps build
        // in parallel (the merge is an order-independent count-map sum;
        // results are bit-identical). r16: gated on the scan's task
        // count (Tables.spreadIfNarrow) so a splittable at-scale input
        // skips the exchange.
        Tables.spreadIfNarrow(Tables.t(s, dir, "lineitem"), $"l_orderkey")
          .groupBy($"l_returnflag")
          .agg(
            expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))").as("q_"),
            expr("percentile(l_extendedprice, array(0.95D, 0.99D))").as("p_"))
          .select($"l_returnflag",
            round(element_at($"q_", 2), 6).as("p50_qty"),
            round(element_at($"q_", 1), 6).as("p25_qty"),
            round(element_at($"q_", 3), 6).as("p75_qty"),
            round(element_at($"p_", 1), 4).as("p95_price"),
            round(element_at($"p_", 2), 4).as("p99_price"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
          round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
          round(quantile_cont(l_quantity, 0.25), 6) AS p25_qty,
          round(quantile_cont(l_quantity, 0.75), 6) AS p75_qty,
          round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
          round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "Exact interpolated percentiles per group (Spark percentile vs DuckDB quantile_cont), p25/p50/p75/p95/p99."),

    QueryDef(
      "q91_percentile_approx",
      (s, dir) => {
        import s.implicits._
        // The 100 TB twin of q85: percentile_approx (QuantileSummaries
        // sketch — mergeable, partial-aggregated before the shuffle, no
        // per-group sort). The sketch value itself is engine-specific, so
        // what the oracle checks is the GUARANTEE, not the value: a
        // returned p-quantile v must satisfy
        //   frac(x <= v) >= p - eps  AND  frac(x < v) <= p + eps
        // with eps = 1/accuracy. We compute the empirical CDF at each
        // returned value with a broadcast join back over the data and
        // emit the bound checks as booleans; the DuckDB oracle is the
        // all-TRUE table. An exact percentile passes trivially; a sketch
        // violating its error bound fails the row hash.
        val acc = 10000
        val eps = 2.0 / acc // sketch bound 1/acc + rank/frac edge slack
        val l = Tables.t(s, dir, "lineitem")
        val approx = l.groupBy($"l_returnflag")
          .agg(percentile_approx($"l_quantity",
            array(lit(0.25), lit(0.5), lit(0.75)), lit(acc)).as("ap"))
        val checks = l.join(broadcast(approx), "l_returnflag")
          .groupBy($"l_returnflag")
          .agg(
            avg(when($"l_quantity" <= element_at($"ap", 1), 1.0d).otherwise(0.0d)).as("le25"),
            avg(when($"l_quantity" < element_at($"ap", 1), 1.0d).otherwise(0.0d)).as("lt25"),
            avg(when($"l_quantity" <= element_at($"ap", 2), 1.0d).otherwise(0.0d)).as("le50"),
            avg(when($"l_quantity" < element_at($"ap", 2), 1.0d).otherwise(0.0d)).as("lt50"),
            avg(when($"l_quantity" <= element_at($"ap", 3), 1.0d).otherwise(0.0d)).as("le75"),
            avg(when($"l_quantity" < element_at($"ap", 3), 1.0d).otherwise(0.0d)).as("lt75"))
        checks.select($"l_returnflag",
            ($"le25" >= 0.25 - eps && $"lt25" <= 0.25 + eps).as("p25_ok"),
            ($"le50" >= 0.5 - eps && $"lt50" <= 0.5 + eps).as("p50_ok"),
            ($"le75" >= 0.75 - eps && $"lt75" <= 0.75 + eps).as("p75_ok"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "percentile_approx sketch (mergeable, no per-group sort) with its rank-error guarantee verified against the empirical CDF; oracle = the guarantee holds."),

    QueryDef(
      "q129_approx_distinct",
      (s, dir) => {
        import s.implicits._
        // HyperLogLog++ — the 100 TB distinct-count path (mergeable
        // registers, partial-aggregated before the shuffle; exact
        // count(DISTINCT) re-shuffles the values themselves). The HLL
        // register state is a max-merge over value hashes, so the
        // estimate is a pure function of the VALUE SET — deterministic
        // across runs, partitionings, and cluster sizes — but it is
        // Spark-specific, so (q91 pattern) the oracle checks the
        // GUARANTEE: the estimate must land within 3 standard errors
        // (rsd = 0.05) of the exact count, which the same aggregation
        // also computes.
        Tables.t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            countDistinct($"l_partkey").as("exact_cnt"),
            approx_count_distinct($"l_partkey", 0.05).as("approx"))
          .select($"l_returnflag", $"exact_cnt",
            (abs($"approx" - $"exact_cnt").cast("double") <=
              $"exact_cnt".cast("double") * 0.15).as("approx_ok"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
          count(DISTINCT l_partkey) AS exact_cnt, TRUE AS approx_ok
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "approx_count_distinct (HLL++, rsd 0.05): mergeable-sketch distinct counting with the 3-sigma error bound asserted against the exact count; oracle = exact counts + the guarantee holds."),

    QueryDef(
      "q130_higher_moments",
      (s, dir) => {
        import s.implicits._
        // skewness / kurtosis (3rd/4th central moments). Spark's
        // definitions: skew = sqrt(n)*m3/m2^1.5, kurt = n*m4/m2^2 - 3
        // (population, excess) — DuckDB's built-ins use the
        // sample-adjusted estimators, so the oracle computes Spark's
        // formula explicitly from two-pass moment sums. Rounded to 4
        // decimals: the single-pass merge accumulates in doubles, so
        // the trailing bits are partition-order noise (same trade as
        // q37's variance family).
        Tables.t(s, dir, "lineitem")
          .groupBy($"l_linestatus")
          .agg(
            round(skewness($"l_extendedprice"), 4).as("skew"),
            round(kurtosis($"l_extendedprice"), 4).as("kurt"),
            count(lit(1)).as("n"))
          .orderBy($"l_linestatus")
      },
      Some("""WITH mu AS (
          SELECT l_linestatus, avg(l_extendedprice) AS m, count(*) AS n
          FROM lineitem GROUP BY l_linestatus),
        mom AS (
          SELECT l.l_linestatus,
            sum(pow(l.l_extendedprice - mu.m, 2)) AS m2,
            sum(pow(l.l_extendedprice - mu.m, 3)) AS m3,
            sum(pow(l.l_extendedprice - mu.m, 4)) AS m4,
            max(mu.n) AS n
          FROM lineitem l JOIN mu USING (l_linestatus)
          GROUP BY l.l_linestatus)
        SELECT l_linestatus,
          round(sqrt(n) * m3 / pow(m2, 1.5), 4) AS skew,
          round(n * m4 / (m2 * m2) - 3, 4) AS kurt,
          CAST(n AS BIGINT) AS n
        FROM mom ORDER BY l_linestatus"""),
      doc = "skewness/kurtosis (population excess, Spark's definitions) checked against an explicit two-pass moment computation in the oracle; rounded at the partition-order noise floor."),

    QueryDef(
      "q139_misc_aggs",
      (s, dir) => {
        import s.implicits._
        // mode / max_by / min_by / count_if / bool_and / bool_or.
        // Determinism notes: mode's winner is strict in this data at
        // every shipped SF (checked; ties would be engine-arbitrary);
        // max_by/min_by order by a UNIQUE composite (orderkey*10 +
        // linenumber) so the arg-extremum is single-valued.
        val ord = $"l_orderkey" * 10 + $"l_linenumber"
        Tables.t(s, dir, "lineitem")
          .groupBy($"l_linestatus")
          .agg(
            mode($"l_returnflag").as("mode_flag"),
            max_by($"l_returnflag", ord).as("last_flag"),
            min_by($"l_returnflag", ord).as("first_flag"),
            count_if($"l_discount" > 0.05).as("n_disc"),
            bool_and($"l_quantity" > 0).as("all_pos"),
            bool_or($"l_quantity" > 49).as("any_49"))
          .orderBy($"l_linestatus")
      },
      Some("""SELECT l_linestatus,
          mode(l_returnflag) AS mode_flag,
          max_by(l_returnflag, l_orderkey * 10 + l_linenumber) AS last_flag,
          min_by(l_returnflag, l_orderkey * 10 + l_linenumber) AS first_flag,
          CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_disc,
          bool_and(l_quantity > 0) AS all_pos,
          bool_or(l_quantity > 49) AS any_49
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""),
      doc = "mode / max_by / min_by / count_if / bool_and / bool_or: arg-extremum aggregates on a unique composite ordinal, strict-winner mode — all single-shuffle partial-aggregated."),

    QueryDef(
      "q140_listagg",
      (s, dir) => {
        import s.implicits._
        // Spark 4 listagg WITHIN GROUP (ORDER BY ...): ordered string
        // aggregation — deterministic because the within-group sort
        // totally orders on the unique suppkey. (Unordered listagg is
        // partition-order-dependent and unusable cross-engine.)
        Tables.t(s, dir, "supplier")
          .filter($"s_suppkey" < 40)
          .groupBy($"s_nationkey")
          .agg(count(lit(1)).as("n"),
            expr("listagg(CAST(s_suppkey AS STRING), ',') WITHIN GROUP (ORDER BY s_suppkey)")
              .as("members"))
          .orderBy($"s_nationkey")
      },
      Some("""SELECT s_nationkey, count(*) AS n,
          string_agg(CAST(s_suppkey AS VARCHAR), ',' ORDER BY s_suppkey) AS members
        FROM supplier WHERE s_suppkey < 40
        GROUP BY s_nationkey ORDER BY s_nationkey"""),
      doc = "Spark 4 listagg WITHIN GROUP: ordered string aggregation over a unique sort key (DuckDB twin: string_agg ORDER BY) — deterministic only because the within-group order is total."),

    QueryDef(
      "q146_tpch_q1_dec64",
      (s, dir) => {
        import s.implicits._
        // TPC-H Q1's money aggregation, shaped to stay entirely inside
        // the Decimal64 columnar runtime: every product is cast to
        // DECIMAL(18,4) before its SUM, so the pre-shuffle pipeline is
        // scan → columnar filter → columnar decimal project → columnar
        // grouped partial agg (exact unscaled-long sums), and the
        // post-shuffle merge is the columnar final agg — both stages
        // pinned in PlanAssertionSuite. At 100 TB the partial stage
        // reduces each scan partition to ≤ |groups| buffer rows before
        // the one shuffle (the same plan Spark's row engine gets; the
        // kernels just execute it columnar, the reference's
        // sum_decimal.rs investment re-expressed on the JVM).
        // Operand precisions chosen so EVERY node stays ≤ 18 digits
        // with zero rounding (discount/tax/price have ≤ 2 decimals in
        // TPC-H): price(8,2) × (1−disc)(4,2) → net(13,4);
        // net × (1+tax)(4,2) → charge(18,6). Sums widen +10 into the
        // 64-bit-escape buffer range (23,4)/(28,6).
        val one = lit(1).cast("decimal(3,2)")
        Tables.t(s, dir, "lineitem")
          .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
          // pre-project the money columns so every aggregate input is a
          // plain attribute (the cast/multiply tree runs in the columnar
          // project, the sums in the columnar agg)
          .select($"l_returnflag", $"l_linestatus",
            dec($"l_quantity").as("qty"),
            dec($"l_extendedprice").as("price"),
            ($"l_extendedprice".cast("decimal(8,2)") *
              (one - $"l_discount".cast("decimal(3,2)"))).as("net"),
            (($"l_extendedprice".cast("decimal(8,2)") *
              (one - $"l_discount".cast("decimal(3,2)"))) *
              (one + $"l_tax".cast("decimal(3,2)"))).as("charge"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sum($"qty").cast("double").as("sum_qty"),
            sum($"price").cast("double").as("sum_base_price"),
            sum($"net").cast("double").as("sum_disc_price"),
            sum($"charge").cast("double").as("sum_charge"),
            min($"qty").cast("double").as("min_qty"),
            max($"price").cast("double").as("max_price"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
          CAST(sum(CAST(l_quantity AS $decSql)) AS DOUBLE) AS sum_qty,
          CAST(sum(CAST(l_extendedprice AS $decSql)) AS DOUBLE) AS sum_base_price,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(8,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
          CAST(sum((CAST(l_extendedprice AS DECIMAL(8,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
          CAST(min(CAST(l_quantity AS $decSql)) AS DOUBLE) AS min_qty,
          CAST(max(CAST(l_extendedprice AS $decSql)) AS DOUBLE) AS max_price,
          count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      doc = "TPC-H Q1 money math fully inside the Decimal64 columnar runtime: exact unscaled-long sum/min/max kernels on both sides of the shuffle (partial + final grouped agg pinned columnar), products cast to DECIMAL(18,4) to stay in 64-bit range."),

    QueryDef(
      "q163_regr_family",
      (s, dir) => {
        import s.implicits._
        // Linear-regression aggregate family (SQL:2016, reference
        // aggregates serde covers corr/covar — regr_* is the remaining
        // §2.3 tail). Same determinism treatment as q37: single-pass
        // mergeable moments on both engines, rounded where double
        // summation error (~n·eps relative) is orders below the rounded
        // place. The second-moment sums (sxx/syy/sxy) grow with n·var —
        // scaled down by 1e6 before rounding so the rounded digit sits
        // ~8 orders above the merge-order noise floor. regr_count is
        // exact; DuckDB returns it wide → CAST AS BIGINT (the q130/q139
        // HUGEINT convention).
        Tables.t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            regr_count($"l_extendedprice", $"l_quantity").as("n"),
            round(regr_slope($"l_extendedprice", $"l_quantity"), 4).as("slope"),
            round(regr_intercept($"l_extendedprice", $"l_quantity"), 2).as("icept"),
            round(regr_r2($"l_extendedprice", $"l_quantity"), 6).as("r2"),
            round(regr_avgx($"l_extendedprice", $"l_quantity"), 4).as("ax"),
            round(regr_avgy($"l_extendedprice", $"l_quantity"), 2).as("ay"),
            round(regr_sxx($"l_extendedprice", $"l_quantity") / 1e6, 2).as("sxx_m"),
            round(regr_syy($"l_extendedprice", $"l_quantity") / 1e6, 2).as("syy_m"),
            round(regr_sxy($"l_extendedprice", $"l_quantity") / 1e6, 2).as("sxy_m"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
          CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
          round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
          round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept,
          round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
          round(regr_avgx(l_extendedprice, l_quantity), 4) AS ax,
          round(regr_avgy(l_extendedprice, l_quantity), 2) AS ay,
          round(regr_sxx(l_extendedprice, l_quantity) / 1e6, 2) AS sxx_m,
          round(regr_syy(l_extendedprice, l_quantity) / 1e6, 2) AS syy_m,
          round(regr_sxy(l_extendedprice, l_quantity) / 1e6, 2) AS sxy_m
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "regr_* linear-regression aggregate family (count/slope/intercept/r2/avgx/avgy/sxx/syy/sxy): single-pass mergeable moments, partial-before-shuffle; second moments scaled before rounding for merge-order independence."),

    QueryDef(
      "q175_string_minmax_agg",
      (s, dir) => {
        import s.implicits._
        // String min/max buffers are immutable, so vanilla Spark plans the
        // PARTIAL stage as Sort + SortAggregate (ObjectHashAggregate only
        // applies to TypedImperativeAggregate). This is exactly the shape
        // the round-8 absorption targets: the columnar grouped-agg kernel
        // needs no map-side order, so both nodes collapse into
        // GraftColumnarGroupedAggExec (pinned in PlanAssertionSuite).
        // first(p_brand) is deterministic — constant within its group.
        // All agg inputs are plain attributes (the gate's requirement).
        Tables.t(s, dir, "part")
          .groupBy($"p_brand")
          .agg(
            min($"p_name").as("min_name"),
            max($"p_name").as("max_name"),
            min($"p_type").as("min_type"),
            max($"p_type").as("max_type"),
            first($"p_brand").as("fst_brand"),
            min($"p_size").cast("long").as("min_size"),
            count(lit(1)).as("n"))
          .orderBy($"p_brand")
      },
      Some("""SELECT p_brand,
          min(p_name) AS min_name, max(p_name) AS max_name,
          min(p_type) AS min_type, max(p_type) AS max_type,
          first(p_brand) AS fst_brand,
          CAST(min(p_size) AS BIGINT) AS min_size,
          count(*) AS n
        FROM part GROUP BY p_brand ORDER BY p_brand"""),
      doc = "Grouped string min/max + group-constant first: the partial stage that vanilla Spark plans as Sort + SortAggregate, absorbed whole into the columnar grouped-agg kernel (map-side sort eliminated; 0.56-0.58x A/B on low-card keys).")
  )
}
