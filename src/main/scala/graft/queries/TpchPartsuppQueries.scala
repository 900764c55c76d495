package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** The five TPC-H queries that need the partsupp table — Q2, Q9, Q11,
  * Q16, Q20 (reference: benchmarks/tpc/queries/tpch/q{2,9,11,16,20}.sql)
  * — completing the 22-query suite started in RelationalQueries (Q1/Q3),
  * q87-q90 and TpchQueries (q97-q107).
  *
  * The driver's testdata ships no partsupp, so it is DERIVED here as a
  * deterministic dimension over the shipped part x supplier tables,
  * dbgen-style: 4 suppliers per part, spread over the supplier key space
  * by `(p_partkey + i*17) % |supplier|` (offsets {0,17,34,51} are
  * distinct mod any supplier count in the testdata, so each part gets 4
  * DISTINCT suppliers), with availqty/supplycost as pure integer hashes
  * of (partkey, i). The DuckDB oracle derives the SAME rows via an
  * identical CTE, so every query below is checked end to end exactly
  * like the rest of the suite — this tests the engine, not the
  * generator. All money math stays in integer CENTS (exact, order-
  * independent, engine-independent) and converts to double once at the
  * end, per the q107 convention.
  *
  * Substitutions for columns the testdata lacks (documented per query,
  * same policy as TpchQueries): p_mfgr->p_brand (Q2 select list),
  * '%BRASS'->p_type='ECONOMY' (Q2), '%green%'->'%red%' (Q9),
  * 'forest%'->'red%' (Q20), s_comment LIKE '%Complaints%' ->
  * s_acctbal < 0 (Q16's excluded-supplier subquery).
  *
  * Scale notes: partsupp at SF1000 is an 800M-row fact (4 x 200M parts).
  * Every query below therefore treats it as a fact — it is NEVER built
  * by broadcasting part; instead the part-side predicate is applied
  * FIRST and partsupp is derived from (or joined to) the reduced part
  * set, so the derivation work is proportional to the surviving parts,
  * exactly as a partsupp scan with a pushed-down join filter would be.
  * Supplier-side dims (supplier, nation, region) broadcast.
  */
object TpchPartsuppQueries {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private val decSql = "DECIMAL(18,2)"
  private def revenue(l: Column, d: Column): Column =
    dec(l) * (lit(1).cast("decimal(18,2)") - dec(d))
  private val revenueSql =
    s"CAST(l_extendedprice AS $decSql) * (CAST(1 AS $decSql) - CAST(l_discount AS $decSql))"
  private def ts(s: String): Column = lit(s).cast("timestamp")

  /** Derived partsupp over an arbitrary part projection (pre-filtered by
    * the caller for scale). Columns: ps_partkey, ps_suppkey, ps_availqty
    * (1..9999), ps_cost_cents (10000..99999 = $100.00..$999.99).
    */
  private def partsupp(s: SparkSession, dir: String, parts: DataFrame): DataFrame = {
    import s.implicits._
    val sCount = Tables.t(s, dir, "supplier").agg(count(lit(1)).as("s_count"))
    parts.select($"p_partkey")
      .crossJoin(broadcast(sCount))
      .select($"p_partkey", explode(sequence(lit(0L), lit(3L))).as("i"), $"s_count")
      .select(
        $"p_partkey".as("ps_partkey"),
        (($"p_partkey" + $"i" * 17L) % $"s_count").as("ps_suppkey"),
        (($"p_partkey" * 7L + $"i" * 131L) % 9999L + 1L).as("ps_availqty"),
        (($"p_partkey" * 31L + $"i" * 577L) % 90000L + 10000L).as("ps_cost_cents"))
  }

  /** The identical derivation as a DuckDB CTE body (over the `part`
    * relation named by `src`, pre-filtered where the query allows). */
  private def partsuppSql(src: String = "part"): String =
    s"""SELECT p_partkey AS ps_partkey,
        (p_partkey + i * 17) % (SELECT count(*) FROM supplier) AS ps_suppkey,
        (p_partkey * 7 + i * 131) % 9999 + 1 AS ps_availqty,
        (p_partkey * 31 + i * 577) % 90000 + 10000 AS ps_cost_cents
      FROM $src CROSS JOIN (VALUES (0), (1), (2), (3)) AS gen(i)"""

  def all: Seq[QueryDef] = Seq(

    // ----------------------------------------------------------------
    QueryDef(
      "q118_tpch_q2",
      (s, dir) => {
        import s.implicits._
        // Minimum-cost supplier. The correlated min-cost subquery (the
        // point of Q2) is decorrelated into a per-part min joined back
        // on (partkey, exact-cents equality) — cents are integers, so
        // the equality is engine- and order-independent. Part predicate
        // first (7 parts at sf0.01), partsupp derived from the reduced
        // set, supplier/nation/region broadcast end-to-end.
        val target = Tables.t(s, dir, "part")
          .filter($"p_size" === 15 && $"p_type" === "ECONOMY")
          .select($"p_partkey", $"p_brand")
        val euroSupp = Tables.t(s, dir, "supplier")
          .join(broadcast(Tables.t(s, dir, "nation")
              .join(broadcast(Tables.t(s, dir, "region")
                .filter($"r_name" === "EUROPE")),
                $"n_regionkey" === $"r_regionkey")),
            $"s_nationkey" === $"n_nationkey")
          .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
        val cand = partsupp(s, dir, target)
          .join(broadcast(euroSupp), $"ps_suppkey" === $"s_suppkey")
        val minCost = cand.groupBy($"ps_partkey".as("m_partkey"))
          .agg(min($"ps_cost_cents").as("min_cents"))
        cand
          .join(broadcast(minCost),
            $"ps_partkey" === $"m_partkey" && $"ps_cost_cents" === $"min_cents")
          .join(broadcast(target), $"ps_partkey" === $"p_partkey")
          .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_brand",
            ($"ps_cost_cents".cast("double") / 100.0).as("ps_supplycost"))
          .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
          .limit(100)
      },
      Some(s"""WITH partsupp AS (${partsuppSql()}),
          euro AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier, nation, region
            WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'EUROPE')
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
          CAST(ps_cost_cents AS DOUBLE) / 100.0 AS ps_supplycost
        FROM part, partsupp, euro
        WHERE p_partkey = ps_partkey AND ps_suppkey = s_suppkey
          AND p_size = 15 AND p_type = 'ECONOMY'
          AND ps_cost_cents = (
            SELECT min(ps2.ps_cost_cents)
            FROM partsupp ps2, euro e2
            WHERE ps2.ps_partkey = p_partkey AND ps2.ps_suppkey = e2.s_suppkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"""),
      doc = "TPC-H Q2 (minimum-cost supplier) over the derived partsupp; mfgr->brand, '%BRASS'->ECONOMY. Correlated min-cost subquery decorrelated to a per-part min + exact-cents equality join; dims broadcast."),

    // ----------------------------------------------------------------
    QueryDef(
      "q119_tpch_q9",
      (s, dir) => {
        import s.implicits._
        // Product-type profit. profit = revenue - supplycost*qty; the
        // two sums accumulate separately (decimal / bigint-cents, both
        // exact) and combine ONCE in double. partsupp joins lineitem on
        // the composite (partkey, suppkey) key — at SF1000 both are
        // facts and this is the one big shuffle; parts are pre-filtered
        // ('%red%') and broadcast into lineitem first so the shuffle
        // carries only matching lines.
        val redParts = Tables.t(s, dir, "part")
          .filter($"p_name".like("%red%")).select($"p_partkey")
        val ps = partsupp(s, dir, redParts)
        val suppNation = Tables.t(s, dir, "supplier")
          .join(broadcast(Tables.t(s, dir, "nation")),
            $"s_nationkey" === $"n_nationkey")
          .select($"s_suppkey", $"n_name".as("nation"))
        Tables.t(s, dir, "lineitem")
          .join(broadcast(redParts), $"l_partkey" === $"p_partkey", "left_semi")
          .join(ps, $"l_partkey" === $"ps_partkey" && $"l_suppkey" === $"ps_suppkey")
          .join(broadcast(suppNation), $"l_suppkey" === $"s_suppkey")
          .join(Tables.t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
          .groupBy($"nation", year($"o_orderdate").as("o_year"))
          .agg((sum(revenue($"l_extendedprice", $"l_discount")).cast("double") -
            sum($"ps_cost_cents" * $"l_quantity".cast("long")).cast("double") / 100.0)
            .as("sum_profit"))
          .orderBy($"nation", $"o_year".desc)
      },
      Some(s"""WITH red_part AS (SELECT p_partkey FROM part WHERE p_name LIKE '%red%'),
          partsupp AS (${partsuppSql("(SELECT p_partkey FROM red_part) AS rp")})
        SELECT nation, o_year,
          CAST(sum(volume) AS DOUBLE)
            - CAST(sum(cost_cents) AS DOUBLE) / 100.0 AS sum_profit
        FROM (
          SELECT n_name AS nation, year(o_orderdate) AS o_year,
            $revenueSql AS volume,
            ps_cost_cents * CAST(l_quantity AS BIGINT) AS cost_cents
          FROM lineitem, partsupp, supplier, orders, nation
          WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
            AND s_suppkey = l_suppkey AND o_orderkey = l_orderkey
            AND s_nationkey = n_nationkey) profit
        GROUP BY nation, o_year ORDER BY nation, o_year DESC"""),
      doc = "TPC-H Q9 (product-type profit) over the derived partsupp; '%green%'->'%red%'. Revenue (decimal) and cost (bigint cents) sum exactly and subtract once in double; part filter applied before the composite-key fact join."),

    // ----------------------------------------------------------------
    QueryDef(
      "q120_tpch_q11",
      (s, dir) => {
        import s.implicits._
        // Important stock. Per-part inventory value vs a scalar
        // fraction-of-total threshold. Both the per-part values and the
        // grand total are exact bigint cents; the HAVING compares in
        // double against total*0.001 (0.0001 scaled for test SF) — both
        // engines compute identical doubles from identical bigints.
        // The threshold is a single-row broadcast join (q65 pattern).
        val natSupp = Tables.t(s, dir, "supplier")
          .join(broadcast(Tables.t(s, dir, "nation")
            .filter($"n_name" === "NATION_7")),
            $"s_nationkey" === $"n_nationkey")
          .select($"s_suppkey")
        val held = partsupp(s, dir, Tables.t(s, dir, "part"))
          .join(broadcast(natSupp), $"ps_suppkey" === $"s_suppkey", "left_semi")
          .select($"ps_partkey", ($"ps_cost_cents" * $"ps_availqty").as("v_cents"))
        val perPart = held.groupBy($"ps_partkey")
          .agg(sum($"v_cents").as("value_cents"))
        val threshold = held.agg(
          (sum($"v_cents").cast("double") * 0.001).as("cut"))
        perPart
          .join(broadcast(threshold), $"value_cents".cast("double") > $"cut")
          .select($"ps_partkey",
            ($"value_cents".cast("double") / 100.0).as("value"))
          .orderBy($"value".desc, $"ps_partkey")
      },
      Some(s"""WITH partsupp AS (${partsuppSql()}),
          held AS (
            SELECT ps_partkey, ps_cost_cents * ps_availqty AS v_cents
            FROM partsupp, supplier, nation
            WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
              AND n_name = 'NATION_7')
        SELECT ps_partkey,
          CAST(sum(v_cents) AS DOUBLE) / 100.0 AS value
        FROM held
        GROUP BY ps_partkey
        HAVING CAST(sum(v_cents) AS DOUBLE) >
          (SELECT CAST(sum(v_cents) AS DOUBLE) * 0.001 FROM held)
        ORDER BY value DESC, ps_partkey"""),
      doc = "TPC-H Q11 (important stock) over the derived partsupp; fraction 0.001 scaled for test SF. Exact bigint-cents values, scalar threshold as single-row broadcast join, HAVING in double."),

    // ----------------------------------------------------------------
    QueryDef(
      "q121_tpch_q16",
      (s, dir) => {
        import s.implicits._
        // Parts/supplier relationship: COUNT(DISTINCT ps_suppkey) per
        // (brand, type, size) for non-excluded parts, minus suppliers
        // with complaints (s_acctbal < 0 stands in for the absent
        // s_comment). NOT IN over a non-null subquery -> Spark plans
        // the null-aware anti join; the excluded set broadcasts.
        val excluded = Tables.t(s, dir, "supplier")
          .filter($"s_acctbal" < 0).select($"s_suppkey")
        val targetParts = Tables.t(s, dir, "part")
          .filter($"p_brand" =!= "Brand#1" && !$"p_type".like("MEDIUM%") &&
            $"p_size".isin(1, 4, 7, 10, 13, 16, 19, 22))
          .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
        partsupp(s, dir, targetParts)
          .join(broadcast(excluded), $"ps_suppkey" === $"s_suppkey", "left_anti")
          .join(broadcast(targetParts), $"ps_partkey" === $"p_partkey")
          .groupBy($"p_brand", $"p_type", $"p_size")
          .agg(countDistinct($"ps_suppkey").as("supplier_cnt"))
          .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
      },
      Some(s"""WITH tp AS (
            SELECT p_partkey, p_brand, p_type, p_size FROM part
            WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'MEDIUM%'
              AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)),
          partsupp AS (${partsuppSql("tp")})
        SELECT p_brand, p_type, p_size,
          count(DISTINCT ps_suppkey) AS supplier_cnt
        FROM tp, partsupp
        WHERE p_partkey = ps_partkey
          AND ps_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""),
      doc = "TPC-H Q16 (parts/supplier relationship) over the derived partsupp; complaints-comment -> s_acctbal<0. NOT-IN anti join (broadcast), COUNT DISTINCT per brand/type/size."),

    // ----------------------------------------------------------------
    QueryDef(
      "q122_tpch_q20",
      (s, dir) => {
        import s.implicits._
        // Potential part promotion: suppliers in one nation whose stock
        // of 'red' parts exceeds half of what they shipped in 1996. The
        // correlated availqty > 0.5*sum(qty) subquery decorrelates to a
        // per-(part,supplier) shipped-quantity aggregate inner-joined
        // back (inner = authentic semantics: an empty correlated sum is
        // NULL, which fails the comparison). Final supplier list via
        // left-semi, nation broadcast.
        val redParts = Tables.t(s, dir, "part")
          .filter($"p_name".like("red%")).select($"p_partkey")
        val shipped = Tables.t(s, dir, "lineitem")
          .filter($"l_shipdate" >= ts("1996-01-01") &&
            $"l_shipdate" < ts("1997-01-01"))
          .join(broadcast(redParts), $"l_partkey" === $"p_partkey", "left_semi")
          .groupBy($"l_partkey", $"l_suppkey")
          .agg(sum(dec($"l_quantity")).cast("double").as("qty_sum"))
        val bigStock = partsupp(s, dir, redParts)
          .join(shipped,
            $"ps_partkey" === $"l_partkey" && $"ps_suppkey" === $"l_suppkey")
          .filter($"ps_availqty".cast("double") > $"qty_sum" * 0.5)
          .select($"ps_suppkey")
        Tables.t(s, dir, "supplier")
          .join(broadcast(Tables.t(s, dir, "nation")
            .filter($"n_name" === "NATION_3")),
            $"s_nationkey" === $"n_nationkey")
          .join(bigStock, $"s_suppkey" === $"ps_suppkey", "left_semi")
          .select($"s_name", $"s_acctbal")
          .orderBy($"s_name")
      },
      Some(s"""WITH red_part AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
          partsupp AS (${partsuppSql("red_part")})
        SELECT s_name, s_acctbal
        FROM supplier, nation
        WHERE s_suppkey IN (
            SELECT ps_suppkey FROM partsupp
            WHERE ps_availqty > (
              SELECT 0.5 * CAST(sum(CAST(l_quantity AS $decSql)) AS DOUBLE)
              FROM lineitem
              WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'))
          AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
        ORDER BY s_name"""),
      doc = "TPC-H Q20 (potential part promotion) over the derived partsupp; 'forest%'->'red%', minus the absent s_address. Correlated half-shipped-quantity subquery decorrelated to a per-(part,supplier) agg inner join; semi-join supplier list.")
  )
}
