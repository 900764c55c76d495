package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** TPC-DS archetype queries (BASELINE.md's second benchmark — 103
  * queries, 1.94x reference speedup — previously unrepresented in the
  * inventory while TPC-H was fully covered; VERDICT r12 task #5).
  * Mapped onto the existing TPC-H-ish fixture, these pin the three
  * COMPOSITIONS the TPC-DS suite stresses that no single TPC-H query
  * exercises together:
  *
  *  - q212 (Q67 shape): join -> ROLLUP -> ranking window PARTITIONED BY
  *    THE ROLLUP LEVEL (grouping_id) -> top-k filter. The Expand twin,
  *    grouped partials on both sides, and the rank group-limit probe
  *    compose in one plan.
  *  - q213 (Q14 shape): INTERSECT-driven cross-channel membership
  *    feeding a channel-grouped aggregate (a semi-join against a
  *    set-operation product).
  *  - q214/q215 (Q88 shape): many scalar subqueries over one fact
  *    table in a single SELECT. Spark's MergeScalarSubqueries cannot
  *    fuse differing-filter subqueries (verified on the executed
  *    plan), so the literal shape (q214) runs 8 pruned columnar-count
  *    scans, and q215 is the one-scan conditional-aggregation rewrite
  *    (pinned to a SINGLE FileScan) a scale-aware user should run —
  *    both produce identical values against the same oracle.
  *
  * Determinism: every aggregate lane is exact (decimal sums over 2dp
  * money, counts); the q212 window order is total (sum desc, then both
  * rollup columns ASC NULLS FIRST — spelled explicitly on the DuckDB
  * side, whose ASC default is NULLS LAST, opposite Spark's).
  */
object TpcdsArchetypeQueries {

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q212_tpcds_rollup_topk",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val li = Tables.t(s, dir, "lineitem").select($"l_partkey", $"l_quantity")
        val pt = Tables.t(s, dir, "part").select($"p_partkey", $"p_brand", $"p_type")
        val rolled = li.join(pt, $"l_partkey" === $"p_partkey")
          .rollup($"p_brand", $"p_type")
          .agg(
            sum($"l_quantity".cast("decimal(18,2)")).as("sum_qty"),
            grouping_id().as("gid"))
        val w = Window.partitionBy($"gid")
          .orderBy($"sum_qty".desc, $"p_brand".asc_nulls_first, $"p_type".asc_nulls_first)
        // COST (r14 profile, quiet-box min-of-9 at sf0.1): ~1.35-1.47s,
        // and ENGINE-NEUTRAL — all-columnar-off measures the same 1.47s
        // and wgl-off 1.34-1.46s vs default 1.40-1.67s (within box
        // noise). The time is plan-inherent: the 600k-row join feeds a
        // rollup Expand that doubles it to 1.2M aggregation-input rows
        // across two grouped aggregates plus the exchange and the
        // ranking window — the exact shape TPC-DS Q67 pays at any
        // scale; nothing here regresses or needs a kernel.
        // SURFACE (r14): sums of INTEGER quantities at scale 2 end ".00"
        // on every row — the driver's decimal trailing-zero
        // normalization boundary (red at birth in r13 for exactly this;
        // see ProbeQueries). The window still ranks on the decimal
        // sum_qty (engine lanes unchanged — Expand twin, grouped
        // partials, ranking window group-limit); only the final
        // projection surfaces BIGINT cents. q222 keeps the original
        // decimal surface as the named columnar×decimal canary.
        rolled.withColumn("rk", rank().over(w)).filter($"rk" <= 5)
          .select($"gid", $"p_brand", $"p_type",
            ($"sum_qty" * 100).cast("long").as("sum_qty_c"), $"rk")
          .orderBy($"gid", $"p_brand".asc_nulls_first, $"p_type".asc_nulls_first)
      },
      Some("""WITH rolled AS (
          SELECT GROUPING(p_brand, p_type) AS gid, p_brand, p_type,
            CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS sum_qty
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY ROLLUP(p_brand, p_type)),
        ranked AS (
          SELECT gid, p_brand, p_type, sum_qty,
            rank() OVER (PARTITION BY gid ORDER BY sum_qty DESC,
              p_brand ASC NULLS FIRST, p_type ASC NULLS FIRST) AS rk
          FROM rolled)
        SELECT gid, p_brand, p_type,
          CAST(round(sum_qty * 100, 0) AS BIGINT) AS sum_qty_c, rk
        FROM ranked WHERE rk <= 5
        ORDER BY gid, p_brand NULLS FIRST, p_type NULLS FIRST"""),
      doc = "TPC-DS Q67 archetype: join -> rollup -> rank() partitioned by the rollup level (grouping_id) -> top-5 per level. Expand twin + grouped partials + ranking window compose in one plan; exact decimal sum ranked in-window, surfaced as BIGINT cents per the money convention."),

    QueryDef(
      "q213_tpcds_intersect_channels",
      (s, dir) => {
        import s.implicits._
        // Q14's cross-channel core: items transacted in ALL THREE
        // channels (here: order-priority bands), found by INTERSECT
        // (plans as two-level left-semi joins), then the channel-grouped
        // revenue of exactly those items. The intersect product is
        // corpus-proportional so it is NOT broadcast-hinted — AQE
        // decides (the 100 TB posture; same rule as q74).
        val li = Tables.t(s, dir, "lineitem")
        val ords = Tables.t(s, dir, "orders")
        val chan = li.join(ords, $"l_orderkey" === $"o_orderkey")
          .select($"l_partkey", $"o_orderpriority", $"l_extendedprice")
          .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH", "3-MEDIUM"))
        // r15: all-three-channels membership = ONE distinct-count
        // aggregation (countDistinct(priority) == 3) instead of the
        // stacked INTERSECT of three filtered branches — the r14 plan
        // ran the fact⋈orders join FOUR times (one per channel branch +
        // the revenue pass) and two distinct+semi-join levels; this
        // shape joins once per pass and aggregates once. Set equality is
        // exact (a part is in all three channels iff its distinct
        // priority count over the 3-band filter is 3). The INTERSECT /
        // EXCEPT operators stay covered by q15/q16.
        val crossParts = chan
          .groupBy($"l_partkey")
          .agg(countDistinct($"o_orderpriority").as("nb"))
          .filter($"nb" === 3)
          .select($"l_partkey")
        chan
          .join(crossParts, Seq("l_partkey"), "left_semi")
          .groupBy($"o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            sum($"l_extendedprice".cast("decimal(18,2)")).as("rev"))
          .orderBy($"o_orderpriority")
      },
      Some("""WITH chan AS (
          SELECT l_partkey, o_orderpriority, l_extendedprice
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        cross_parts AS (
          SELECT l_partkey FROM chan WHERE o_orderpriority = '1-URGENT'
          INTERSECT
          SELECT l_partkey FROM chan WHERE o_orderpriority = '2-HIGH'
          INTERSECT
          SELECT l_partkey FROM chan WHERE o_orderpriority = '3-MEDIUM')
        SELECT o_orderpriority, count(*) AS n,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS rev
        FROM chan
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
          AND l_partkey IN (SELECT l_partkey FROM cross_parts)
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      doc = "TPC-DS Q14 archetype: cross-channel membership (all three channels) as ONE countDistinct==3 aggregation — set-identical to the stacked INTERSECT it replaces (r15), with one fact-join pass instead of four — feeding a channel-grouped exact-decimal aggregate; no broadcast hint on the corpus-proportional set. The oracle keeps the verbatim INTERSECT formulation; INTERSECT/EXCEPT operator coverage lives in q15/q16."),

    QueryDef(
      "q214_tpcds_scalar_subqueries",
      (s, dir) => {
        Tables.registerViews(s, dir, Seq("lineitem"))
        // Q88's literal shape: one SELECT of eight scalar band counts
        // over the same fact table. Spark's MergeScalarSubqueries does
        // NOT fuse these (it requires identical plans below the
        // aggregate; the bands differ in their filters — verified on
        // the executed plan), so the literal shape runs 8 subqueries,
        // each a 2-column scan with the band predicate PUSHED to
        // parquet and a fully columnar count (pinned). The one-scan
        // formulation a scale-aware user should write is q215, its
        // exact-value twin.
        s.sql("""SELECT
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10
             AND l_discount < 0.03) AS c1,
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20
             AND l_discount < 0.03) AS c2,
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30
             AND l_discount < 0.03) AS c3,
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40
             AND l_discount < 0.03) AS c4,
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10
             AND l_discount >= 0.07) AS c5,
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20
             AND l_discount >= 0.07) AS c6,
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30
             AND l_discount >= 0.07) AS c7,
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40
             AND l_discount >= 0.07) AS c8""")
      },
      Some("""SELECT
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10
             AND l_discount < 0.03) AS c1,
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20
             AND l_discount < 0.03) AS c2,
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30
             AND l_discount < 0.03) AS c3,
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40
             AND l_discount < 0.03) AS c4,
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10
             AND l_discount >= 0.07) AS c5,
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20
             AND l_discount >= 0.07) AS c6,
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30
             AND l_discount >= 0.07) AS c7,
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40
             AND l_discount >= 0.07) AS c8"""),
      doc = "TPC-DS Q88 archetype, literal shape: eight scalar band-count subqueries over one fact table. Spark cannot fuse differing-filter subqueries, so each runs as a pruned 2-column scan with pushed band predicates and a columnar count; the one-scan rewrite is q215."),

    QueryDef(
      "q215_tpcds_q88_one_scan",
      (s, dir) => {
        import s.implicits._
        // Q88 as it SHOULD be written at 100 TB: ONE scan (pinned in
        // PlanAssertionSuite) with the band envelope pushed to parquet,
        // and the eight bands as conditional counts (the q192 CASE lane
        // — swaps columnar). Identical values to q214's literal shape.
        def band(lo: Double, hi: Double, dlt: Boolean) = {
          val dc = if (dlt) $"l_discount" < 0.03 else $"l_discount" >= 0.07
          count(when($"l_quantity".between(lo, hi) && dc, lit(1)))
        }
        Tables.t(s, dir, "lineitem")
          .filter($"l_quantity".between(1, 40) &&
            ($"l_discount" < 0.03 || $"l_discount" >= 0.07))
          .agg(
            band(1, 10, dlt = true).as("c1"),
            band(11, 20, dlt = true).as("c2"),
            band(21, 30, dlt = true).as("c3"),
            band(31, 40, dlt = true).as("c4"),
            band(1, 10, dlt = false).as("c5"),
            band(11, 20, dlt = false).as("c6"),
            band(21, 30, dlt = false).as("c7"),
            band(31, 40, dlt = false).as("c8"))
      },
      Some("""SELECT
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10
             AND l_discount < 0.03) AS c1,
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20
             AND l_discount < 0.03) AS c2,
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30
             AND l_discount < 0.03) AS c3,
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40
             AND l_discount < 0.03) AS c4,
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10
             AND l_discount >= 0.07) AS c5,
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20
             AND l_discount >= 0.07) AS c6,
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30
             AND l_discount >= 0.07) AS c7,
          (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40
             AND l_discount >= 0.07) AS c8"""),
      doc = "TPC-DS Q88 one-scan rewrite: the band envelope pushes to parquet, eight conditional counts ride the columnar CASE lane over a SINGLE fact scan (pinned) — 1 read instead of 8; oracle is the literal 8-subquery SQL, values identical."),

    QueryDef(
      "q227_tpcds_q51_cumulative",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        // Q51's core: per-channel daily aggregates, FULL OUTER JOIN on
        // (item, period), then CUMULATIVE window sums per item compared
        // channel-vs-channel. Channels here are the two linestatus
        // streams of lineitem; items are bounded partkey buckets,
        // periods are ship months. SURFACES: quantities are integral —
        // sums travel as BIGINT end to end (first-flight discipline:
        // no decimal-typed output anywhere). The cumulative window runs
        // over the post-join frame exactly as Q51 writes it (the
        // cumulative of a FULL OUTER side is null-skipping sum over
        // the channel's column).
        def chan(status: String, out: String) =
          Tables.t(s, dir, "lineitem")
            .filter($"l_linestatus" === status)
            .groupBy(($"l_partkey" % 20).as("item"),
              date_trunc("month", $"l_shipdate").as("d"))
            .agg(sum($"l_quantity".cast("long")).as(out))
        val f = chan("F", "qty_f")
        val o = chan("O", "qty_o")
        val joined = f.join(o, Seq("item", "d"), "full_outer")
        val w = Window.partitionBy($"item").orderBy($"d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        joined
          .select($"item", $"d",
            sum($"qty_f").over(w).as("cum_f"),
            sum($"qty_o").over(w).as("cum_o"))
          .filter($"cum_f" > $"cum_o")
          .orderBy($"item", $"d")
      },
      Some("""WITH f AS (
          SELECT l_partkey % 20 AS item,
            CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS d,
            sum(CAST(l_quantity AS BIGINT)) AS qty_f
          FROM lineitem WHERE l_linestatus = 'F' GROUP BY 1, 2),
        o AS (
          SELECT l_partkey % 20 AS item,
            CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS d,
            sum(CAST(l_quantity AS BIGINT)) AS qty_o
          FROM lineitem WHERE l_linestatus = 'O' GROUP BY 1, 2),
        j AS (
          SELECT coalesce(f.item, o.item) AS item, coalesce(f.d, o.d) AS d,
            qty_f, qty_o
          FROM f FULL OUTER JOIN o ON f.item = o.item AND f.d = o.d),
        c AS (
          SELECT item, d,
            CAST(sum(qty_f) OVER (PARTITION BY item ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_f,
            CAST(sum(qty_o) OVER (PARTITION BY item ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_o
          FROM j)
        SELECT item, d, cum_f, cum_o FROM c WHERE cum_f > cum_o
        ORDER BY item, d"""),
      doc = "TPC-DS Q51 archetype: per-channel grouped aggregates FULL OUTER JOINed on (item, period), cumulative null-skipping window sums per item, channel-vs-channel comparison — grouped agg + full join + running window compose in one plan; BIGINT surfaces throughout."),

    QueryDef(
      "q228_tpcds_q35_exists_gate",
      (s, dir) => {
        import s.implicits._
        // Q35's correlated multi-subquery gate: customers that EXISTS in
        // the primary channel AND (EXISTS in channel 2 OR EXISTS in
        // channel 3), grouped demographics over the survivors. The OR
        // of two EXISTS cannot become two semi joins — Spark plans
        // ExistenceJoins feeding a disjunctive filter (the q154 lane,
        // now composed with a leading semi join). SURFACES: counts +
        // exact BIGINT cents via decimal sum (money convention).
        Tables.t(s, dir, "customer").createOrReplaceTempView("g_q228_cust")
        Tables.t(s, dir, "orders").createOrReplaceTempView("g_q228_ord")
        s.sql("""
          SELECT c_nationkey,
            count(*) AS n_cust,
            CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))) * 100, 0) AS BIGINT)
              AS bal_cents
          FROM g_q228_cust
          WHERE EXISTS (SELECT 1 FROM g_q228_ord
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
            AND (EXISTS (SELECT 1 FROM g_q228_ord
                         WHERE o_custkey = c_custkey
                           AND o_orderpriority = '2-HIGH')
                 OR EXISTS (SELECT 1 FROM g_q228_ord
                            WHERE o_custkey = c_custkey
                              AND o_orderpriority = '3-MEDIUM'))
          GROUP BY c_nationkey ORDER BY c_nationkey""")
      },
      Some("""SELECT c_nationkey,
          count(*) AS n_cust,
          CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))) * 100, 0) AS BIGINT)
            AS bal_cents
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
          AND (EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderpriority = '2-HIGH')
               OR EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderpriority = '3-MEDIUM'))
        GROUP BY c_nationkey ORDER BY c_nationkey"""),
      doc = "TPC-DS Q35 archetype: a correlated EXISTS AND (EXISTS OR EXISTS) gate — one semi join plus two ExistenceJoins feeding a disjunctive filter — over grouped demographics; count + exact BIGINT-cents surfaces per the money convention.")
  )
}
