package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** The rest of the TPC-H suite (q97-q107), completing the BASELINE.md
  * comparison started by q01 (Q1), q03 (Q3-shaped) and q87-q90
  * (Q5/Q13/Q18/Q21). Reference queries: benchmarks/tpc/queries/tpch/.
  *
  * The driver's testdata is TPC-H-shaped but trimmed: there is NO
  * partsupp table, and lineitem lacks commitdate/receiptdate/shipmode/
  * shipinstruct, part lacks container/mfgr, customer lacks phone/address.
  * Consequences, documented per query:
  *  - Q6, Q7, Q8, Q14, Q15, Q17(-container), Q19(-container/shipmode)
  *    are expressible essentially verbatim;
  *  - Q4, Q12, Q22 keep their exact plan shape (EXISTS semi-join,
  *    case-sum agg join, scalar-subquery + anti-join) with a
  *    semantically equivalent predicate swapped in for the missing
  *    column;
  *  - Q2, Q9, Q11, Q16, Q20 need partsupp, which is derived as a
  *    deterministic dimension over part x supplier in
  *    [[TpchPartsuppQueries]] (q118-q122) — completing the 22-query
  *    suite.
  *
  * Scale notes follow the q87-q90 conventions: dimension chains
  * (region→nation→supplier) broadcast end-to-end, fact-fact joins
  * shuffle on natural keys only, money math accumulates in
  * DECIMAL(18,2) so sums are exact and order-independent, and every
  * ORDER BY carries a unique tiebreaker so LIMIT is deterministic.
  */
object TpchQueries {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private val decSql = "DECIMAL(18,2)"
  private def sumDec(c: Column): Column = sum(dec(c)).cast("double")
  private def revenue(l: Column, d: Column): Column =
    dec(l) * (lit(1).cast("decimal(18,2)") - dec(d))
  private val revenueSql =
    s"CAST(l_extendedprice AS $decSql) * (CAST(1 AS $decSql) - CAST(l_discount AS $decSql))"
  private def ts(s: String): Column = lit(s).cast("timestamp")

  def all: Seq[QueryDef] = Seq(

    // ----------------------------------------------------------------
    QueryDef(
      "q97_tpch_q6",
      (s, dir) => {
        import s.implicits._
        // Single-pass scan-agg: both range predicates and the quantity
        // bound push into the parquet scan (PushedFilters), no shuffle
        // at all (global agg = partial + single-partition final).
        Tables.t(s, dir, "lineitem")
          .filter($"l_shipdate" >= ts("1996-01-01") &&
            $"l_shipdate" < ts("1997-01-01") &&
            $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
            $"l_quantity" < 24)
          .agg(sum(dec($"l_extendedprice") * dec($"l_discount"))
            .cast("double").as("revenue"))
      },
      Some(s"""SELECT CAST(sum(CAST(l_extendedprice AS $decSql) * CAST(l_discount AS $decSql)) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""),
      doc = "TPC-H Q6 (forecasting revenue change), verbatim: pure scan-filter-agg, every predicate pushed to parquet, zero shuffles."),

    // ----------------------------------------------------------------
    QueryDef(
      "q98_tpch_q7",
      (s, dir) => {
        import s.implicits._
        // Volume shipping between two nations. Suppliers and customers
        // are pre-filtered to the two nations via broadcast nation
        // joins BEFORE touching the facts, so the nation predicate
        // prunes lineitem/orders as early as possible; the only big
        // shuffles are lineitem⋈orders on orderkey.
        val n = Tables.t(s, dir, "nation")
          .filter($"n_name".isin("NATION_1", "NATION_2"))
        val supp = Tables.t(s, dir, "supplier")
          .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
          .select($"s_suppkey", $"n_name".as("supp_nation"))
        val cust = Tables.t(s, dir, "customer")
          .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .select($"c_custkey", $"n_name".as("cust_nation"))
        Tables.t(s, dir, "lineitem")
          .filter($"l_shipdate" >= ts("1996-01-01") &&
            $"l_shipdate" <= ts("1997-12-31"))
          .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
          .join(Tables.t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
          .join(cust, $"o_custkey" === $"c_custkey")
          .filter(($"supp_nation" === "NATION_1" && $"cust_nation" === "NATION_2") ||
            ($"supp_nation" === "NATION_2" && $"cust_nation" === "NATION_1"))
          .groupBy($"supp_nation", $"cust_nation",
            year($"l_shipdate").as("l_year"))
          .agg(sum(revenue($"l_extendedprice", $"l_discount"))
            .cast("double").as("revenue"))
          .orderBy($"supp_nation", $"cust_nation", $"l_year")
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          year(l_shipdate) AS l_year,
          CAST(sum($revenueSql) AS DOUBLE) AS revenue
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
            AND TIMESTAMP '1997-12-31 00:00:00'
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""),
      doc = "TPC-H Q7 (volume shipping), verbatim: two-nation disjunction, nation dims broadcast-prefiltered onto both fact sides before the orderkey shuffle."),

    // ----------------------------------------------------------------
    QueryDef(
      "q99_tpch_q8",
      (s, dir) => {
        import s.implicits._
        // National market share: share of NATION_3 suppliers in ASIA
        // customers' ECONOMY-part order volume per year. The
        // conditional share is two exact decimal sums divided once in
        // double — deterministic across engines and partitionings.
        val asiaCust = Tables.t(s, dir, "customer")
          .join(broadcast(Tables.t(s, dir, "nation")
              .join(broadcast(Tables.t(s, dir, "region")
                .filter($"r_name" === "ASIA")),
                $"n_regionkey" === $"r_regionkey")),
            $"c_nationkey" === $"n_nationkey")
          .select($"c_custkey")
        val suppNation = Tables.t(s, dir, "supplier")
          .join(broadcast(Tables.t(s, dir, "nation")
            .select($"n_nationkey", $"n_name".as("supp_nation"))),
            $"s_nationkey" === $"n_nationkey")
          .select($"s_suppkey", $"supp_nation")
        val econParts = Tables.t(s, dir, "part")
          .filter($"p_type" === "ECONOMY").select($"p_partkey")
        Tables.t(s, dir, "lineitem")
          .join(broadcast(econParts), $"l_partkey" === $"p_partkey")
          .join(broadcast(suppNation), $"l_suppkey" === $"s_suppkey")
          .join(Tables.t(s, dir, "orders")
            .filter($"o_orderdate" >= ts("1996-01-01") &&
              $"o_orderdate" <= ts("1997-12-31")),
            $"l_orderkey" === $"o_orderkey")
          .join(asiaCust, $"o_custkey" === $"c_custkey", "left_semi")
          .groupBy(year($"o_orderdate").as("o_year"))
          .agg((sum(when($"supp_nation" === "NATION_3",
              revenue($"l_extendedprice", $"l_discount"))
              .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
            sum(revenue($"l_extendedprice", $"l_discount")).cast("double"))
            .as("mkt_share"))
          .orderBy($"o_year")
      },
      Some(s"""SELECT o_year,
          CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE CAST(0 AS $decSql) END) AS DOUBLE)
            / CAST(sum(volume) AS DOUBLE) AS mkt_share
        FROM (
          SELECT year(o_orderdate) AS o_year, $revenueSql AS volume,
            n2.n_name AS supp_nation
          FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
          WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
            AND l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
            AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
            AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
              AND TIMESTAMP '1997-12-31 00:00:00'
            AND p_type = 'ECONOMY') all_nations
        GROUP BY o_year ORDER BY o_year"""),
      doc = "TPC-H Q8 (national market share), verbatim: 8-table join, every dim broadcast, customer side reduced to a semi-join probe, conditional decimal share."),

    // ----------------------------------------------------------------
    QueryDef(
      "q100_tpch_q10",
      (s, dir) => {
        import s.implicits._
        // Returned-item reporting. Testdata customer has no
        // address/phone/comment — those select-list columns are
        // dropped; the plan (fact-fact shuffle + broadcast nation +
        // top-20) is Q10's.
        Tables.t(s, dir, "lineitem")
          .filter($"l_returnflag" === "R")
          .join(Tables.t(s, dir, "orders")
            .filter($"o_orderdate" >= ts("1996-10-01") &&
              $"o_orderdate" < ts("1997-01-01")),
            $"l_orderkey" === $"o_orderkey")
          .join(Tables.t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
          .join(broadcast(Tables.t(s, dir, "nation")),
            $"c_nationkey" === $"n_nationkey")
          .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
          .agg(sum(revenue($"l_extendedprice", $"l_discount"))
            .cast("double").as("revenue"))
          .orderBy($"revenue".desc, $"c_custkey")
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, c_acctbal, n_name,
          CAST(sum($revenueSql) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY 1, 2, 3, 4 ORDER BY revenue DESC, c_custkey LIMIT 20"""),
      doc = "TPC-H Q10 (returned items) minus the absent address/phone columns: quarter of 'R' returns, broadcast nation, deterministic top-20 by revenue."),

    // ----------------------------------------------------------------
    QueryDef(
      "q101_tpch_q14",
      (s, dir) => {
        import s.implicits._
        // Promotion effect: conditional share over one month. part is
        // a broadcast dim at this ratio (2k rows per 60k lineitem); at
        // SF1000 part:lineitem stays ~1:3000 so AQE would still pick
        // broadcast — we pin it.
        Tables.t(s, dir, "lineitem")
          .filter($"l_shipdate" >= ts("1996-09-01") &&
            $"l_shipdate" < ts("1996-10-01"))
          .join(broadcast(Tables.t(s, dir, "part")),
            $"l_partkey" === $"p_partkey")
          .agg((lit(100.0) *
            sum(when($"p_type" === "PROMO",
              revenue($"l_extendedprice", $"l_discount"))
              .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
            sum(revenue($"l_extendedprice", $"l_discount")).cast("double"))
            .as("promo_revenue"))
      },
      Some(s"""SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
            THEN $revenueSql ELSE CAST(0 AS $decSql) END) AS DOUBLE)
          / CAST(sum($revenueSql) AS DOUBLE) AS promo_revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'"""),
      doc = "TPC-H Q14 (promotion effect), verbatim: month slice, broadcast part, conditional decimal share divided once in double."),

    // ----------------------------------------------------------------
    QueryDef(
      "q102_tpch_q15",
      (s, dir) => {
        import s.implicits._
        // Top supplier: revenue0 CTE reused for both the per-supplier
        // revenue and its max — Spark computes it once per branch; the
        // max side collapses to one row and broadcasts, so the "WHERE
        // total_revenue = (SELECT max...)" never shuffles revenue0
        // again. Equality on EXACT decimal sums is safe cross-engine
        // (double sums would tie-break on ulps).
        val revenue0 = Tables.t(s, dir, "lineitem")
          .filter($"l_shipdate" >= ts("1996-01-01") &&
            $"l_shipdate" < ts("1996-04-01"))
          .groupBy($"l_suppkey")
          .agg(sum(revenue($"l_extendedprice", $"l_discount")).as("total_rev"))
        revenue0
          .join(broadcast(revenue0.agg(max($"total_rev").as("max_rev"))),
            $"total_rev" === $"max_rev")
          .join(broadcast(Tables.t(s, dir, "supplier")),
            $"l_suppkey" === $"s_suppkey")
          .select($"s_suppkey", $"s_name",
            $"total_rev".cast("double").as("total_revenue"))
          .orderBy($"s_suppkey")
      },
      Some(s"""WITH revenue0 AS (
          SELECT l_suppkey AS supplier_no, sum($revenueSql) AS total_rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        FROM supplier, revenue0
        WHERE s_suppkey = supplier_no
          AND total_rev = (SELECT max(total_rev) FROM revenue0)
        ORDER BY s_suppkey"""),
      doc = "TPC-H Q15 (top supplier) minus the absent address/phone columns: scalar-max subquery as a broadcast single-row join over an exact decimal revenue CTE."),

    // ----------------------------------------------------------------
    QueryDef(
      "q103_tpch_q17",
      (s, dir) => {
        import s.implicits._
        // Small-quantity-order revenue. p_container doesn't exist in
        // the testdata; p_size = 9 stands in as the second part
        // predicate — the correlated avg-quantity subquery (the point
        // of Q17) is verbatim, decorrelated into a per-part aggregate
        // joined back to lineitem. avg(l_quantity) is an exact integer
        // sum / count, so the double threshold is order-independent.
        val targetParts = Tables.t(s, dir, "part")
          .filter($"p_brand" === "Brand#13" && $"p_size" === 9)
          .select($"p_partkey")
        val avgQty = Tables.t(s, dir, "lineitem")
          .join(broadcast(targetParts), $"l_partkey" === $"p_partkey", "left_semi")
          .groupBy($"l_partkey".as("a_partkey"))
          .agg((avg($"l_quantity") * 0.2).as("qty_cap"))
        Tables.t(s, dir, "lineitem")
          .join(broadcast(targetParts), $"l_partkey" === $"p_partkey", "left_semi")
          .join(broadcast(avgQty), $"l_partkey" === $"a_partkey")
          .filter($"l_quantity" < $"qty_cap")
          .agg((sum(dec($"l_extendedprice")).cast("double") / 7.0)
            .as("avg_yearly"))
      },
      Some(s"""SELECT CAST(sum(CAST(l_extendedprice AS $decSql)) AS DOUBLE) / 7.0 AS avg_yearly
        FROM lineitem, part
        WHERE p_partkey = l_partkey AND p_brand = 'Brand#13' AND p_size = 9
          AND l_quantity < (
            SELECT 0.2 * avg(l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = part.p_partkey)"""),
      doc = "TPC-H Q17 (small-quantity-order revenue), container→size swap: correlated avg subquery decorrelated to a per-part agg, both sides semi-pruned to target parts before any shuffle."),

    // ----------------------------------------------------------------
    QueryDef(
      "q104_tpch_q19",
      (s, dir) => {
        import s.implicits._
        // Discounted revenue: Q19's signature disjunction-of-
        // conjunctions join predicate (container/shipmode clauses
        // dropped with the columns; brand × size-range × quantity-range
        // kept). Catalyst extracts the common l_partkey = p_partkey
        // equi-key so this stays a hash join with a residual OR filter,
        // never a cartesian.
        val l = Tables.t(s, dir, "lineitem")
        val p = Tables.t(s, dir, "part")
        l.join(broadcast(p), $"l_partkey" === $"p_partkey" && (
            ($"p_brand" === "Brand#1" && $"p_size".between(1, 5) &&
              $"l_quantity".between(1, 11)) ||
            ($"p_brand" === "Brand#2" && $"p_size".between(1, 10) &&
              $"l_quantity".between(10, 20)) ||
            ($"p_brand" === "Brand#3" && $"p_size".between(1, 15) &&
              $"l_quantity".between(20, 30))))
          .agg(sum(revenue($"l_extendedprice", $"l_discount"))
            .cast("double").as("revenue"))
      },
      Some(s"""SELECT CAST(sum($revenueSql) AS DOUBLE) AS revenue
        FROM lineitem, part
        WHERE (p_partkey = l_partkey AND p_brand = 'Brand#1'
            AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
          OR (p_partkey = l_partkey AND p_brand = 'Brand#2'
            AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
          OR (p_partkey = l_partkey AND p_brand = 'Brand#3'
            AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)"""),
      doc = "TPC-H Q19 (discounted revenue) minus the absent container/shipmode columns: disjunctive join predicate with extracted equi-key — hash join + residual, not cartesian."),

    // ----------------------------------------------------------------
    QueryDef(
      "q105_tpch_q4",
      (s, dir) => {
        import s.implicits._
        // Order-priority checking. lineitem has no commitdate/
        // receiptdate; "late line" becomes shipped >60 days after the
        // order date — same correlated-EXISTS shape, which Spark plans
        // as a left-semi join with the inequality as a join residual on
        // the orderkey equi-key.
        val orders = Tables.t(s, dir, "orders")
          .filter($"o_orderdate" >= ts("1996-07-01") &&
            $"o_orderdate" < ts("1996-10-01"))
        orders
          .join(Tables.t(s, dir, "lineitem"),
            $"o_orderkey" === $"l_orderkey" &&
              $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      doc = "TPC-H Q4 (order-priority checking), late-shipment predicate swapped for the absent commit/receipt dates: correlated EXISTS → semi-join on orderkey with inequality residual."),

    // ----------------------------------------------------------------
    QueryDef(
      "q106_tpch_q12",
      (s, dir) => {
        import s.implicits._
        // Shipping-mode priority counts. l_shipmode doesn't exist;
        // l_returnflag ∈ {R, A} takes its place as the low-cardinality
        // group key — the plan (fact-fact join + case-sum pivot agg) is
        // Q12's. Counts stay BIGINT in both engines (DuckDB sum(int)
        // widens to HUGEINT, so the oracle casts).
        val high = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
        Tables.t(s, dir, "lineitem")
          .filter($"l_returnflag".isin("R", "A") &&
            $"l_shipdate" >= ts("1996-01-01") &&
            $"l_shipdate" < ts("1997-01-01"))
          .join(Tables.t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
          .groupBy($"l_returnflag")
          .agg(
            sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
          CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders, lineitem
        WHERE o_orderkey = l_orderkey AND l_returnflag IN ('R', 'A')
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "TPC-H Q12 (shipping modes / priority), returnflag standing in for the absent shipmode: fact-fact orderkey join, case-sum pivot aggregation."),

    // ----------------------------------------------------------------
    QueryDef(
      "q107_tpch_q22",
      (s, dir) => {
        import s.implicits._
        // Global sales opportunity. c_phone doesn't exist; the "country
        // code" becomes c_custkey % 7 ∈ {1,3,5} — the plan shape
        // (filtered scan → scalar-avg subquery gate → anti-join to
        // orders → group) is Q22's. Every testdata customer has at
        // least one order, so the anti-join target is narrowed to
        // "urgent orders since 1998" — authentic Q22 semantics would
        // return the empty set here, which verifies nothing. The avg
        // threshold is computed as exact-decimal-sum / count in ONE
        // double division so both engines and any partitioning agree
        // bit-for-bit.
        val vips = Tables.t(s, dir, "customer")
          .withColumn("cntrycode", $"c_custkey" % 7)
          .filter($"cntrycode".isin(1, 3, 5))
        val threshold = vips.filter($"c_acctbal" > 0.0)
          .agg((sum(dec($"c_acctbal")).cast("double") /
            count(lit(1)).cast("double")).as("avg_bal"))
        vips
          .join(broadcast(threshold), $"c_acctbal" > $"avg_bal")
          .join(Tables.t(s, dir, "orders")
            .filter($"o_orderpriority" === "1-URGENT" &&
              $"o_orderdate" >= ts("1998-01-01")),
            $"c_custkey" === $"o_custkey", "left_anti")
          .groupBy($"cntrycode")
          .agg(count(lit(1)).as("numcust"),
            sum(dec($"c_acctbal")).cast("double").as("totacctbal"))
          .orderBy($"cntrycode")
      },
      Some(s"""WITH vips AS (
          SELECT c_custkey, c_acctbal, c_custkey % 7 AS cntrycode
          FROM customer WHERE c_custkey % 7 IN (1, 3, 5))
        SELECT cntrycode, count(*) AS numcust,
          CAST(sum(CAST(c_acctbal AS $decSql)) AS DOUBLE) AS totacctbal
        FROM vips
        WHERE c_acctbal > (
            SELECT CAST(sum(CAST(c_acctbal AS $decSql)) AS DOUBLE) / count(*)
            FROM vips WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
            AND o_orderpriority = '1-URGENT'
            AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
        GROUP BY cntrycode ORDER BY cntrycode"""),
      doc = "TPC-H Q22 (global sales opportunity), custkey-mod standing in for the absent phone country code: scalar-subquery threshold broadcast as a single-row join, then anti-join to orders.")
  )
}
