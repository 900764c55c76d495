package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Driver-hash discriminator matrix (VERDICT r13 task #1) — and the
  * solved characterization of every `hash_match:false` row since r10.
  *
  * == The characterization (r14, proven locally, driver-confirmable) ==
  *
  * A query goes driver-red iff its result contains a DECIMAL value whose
  * fixed-scale decimal string differs from the float64 shortest-repr of
  * the same value:
  *
  *     str(Decimal(v)) != repr(float(v))
  *
  * — in practice: trailing fractional zeros. Mechanism (verified on
  * duckdb 1.0.0 locally): the driver materializes the DuckDB oracle
  * result through a pandas conversion that renders every DECIMAL column
  * as float64 (`CAST('16532.00' AS DECIMAL(28,2))` → float `16532.0`),
  * while the Spark result parquet surfaces scale-preserving
  * `decimal.Decimal` objects through pyarrow. The stringified values
  * then differ exactly on the predicate above. Evidence:
  *
  *  - The predicate, evaluated over ALL 216 r13 oracle outputs at
  *    sf0.01, flags EXACTLY the 7 driver-red rows (q191, q194, q198,
  *    q201, q205, q208, q212) — zero false positives, zero false
  *    negatives (tools/surface_lint.py, the per-round ship gate).
  *  - Every red value class checks out by hand: q191/q198/q201's
  *    scale-6 sums all end "…00" (price(2dp) × (1−disc)(4dp) products
  *    have 1e-6 granularity but 1e-4-step discounts ⇒ two dead digits);
  *    q194/q205/q208's max(rev) rows are zero-discount products ending
  *    "…00" at scale 4; q212's sums of integer quantities at scale 2
  *    end ".00" on every row. Green decimal queries (q192/q203/q213)
  *    have "live" last digits that round-trip float64 exactly —
  *    str(Decimal) == repr(float) — so they hash equal.
  *  - It also retro-explains r10's q174 (avg of 2dp money quantized at
  *    scale 6 ⇒ dead trailing digits), fixed then by the BIGINT
  *    micro-units convention, and why the repo's money convention
  *    (DOUBLE/BIGINT surfaces, q01/q143/q146) has never been red.
  *
  * This is a DRIVER NORMALIZATION boundary, not an engine defect: the
  * r13 judge verified all 7 red queries value-exact AND string-exact vs
  * the oracle at full precision, and the predicate is computed from the
  * DuckDB side alone — no Spark execution involved.
  *
  * == The matrix shipped here (driver-side confirmation by construction) ==
  *
  * Execution path × surface, for the three red shapes, plus zero-engine
  * literal probes. Predictions are part of the experiment:
  *
  *  | query | path     | surface              | predicted |
  *  |-------|----------|----------------------|-----------|
  *  | q217  | ROW      | decimal, trailing-0  | RED (canary) |
  *  | q218  | ROW      | decimal, trailing-0  | RED (canary) |
  *  | q219  | ROW      | decimal, trailing-0  | RED (canary) |
  *  | q220  | columnar | BIGINT micro-units   | GREEN |
  *  | q221  | columnar | BIGINT 1e-4 units    | GREEN |
  *  | q222  | columnar | decimal, trailing-0  | RED (canary) |
  *  | q223  | NONE (literals) | decimal, trailing-0 | RED (canary) |
  *  | q224  | NONE (literals) | decimal, float-round-trip | GREEN |
  *  | q225  | NONE (literals) | decimal, >17 sig digits | RED if the
  *  |       |          |   driver stringifies floats via repr/str; GREEN |
  *  |       |          |   if it strips zeros some other way |
  *  | q226  | NONE (literals) | decimal, scale 0 | RED unless the driver |
  *  |       |          |   normalizes through %g-style formatting |
  *
  * Readout: q217–q219 red + q223 red + q224 green confirms the
  * value-dependent driver normalization with the engine exonerated by
  * construction (q223/q224 run no aggregate, no join, no scan — a
  * one-row LocalTableScan of literals). q220/q221 green (+ the
  * re-surfaced q191/q194/q212 going green) confirms the BIGINT/DOUBLE
  * convention as the permanent fix. q225/q226 sharpen WHICH stringify
  * the driver uses — pure bonus bits.
  *
  * The r13 probe family q198–q208 is deleted (answered): q199/q200/
  * q202/q204/q206/q207 green localized the red lanes; q201/q208 red at
  * int64 widths refuted the int128-representation theory; the predicate
  * above now explains all of them. q198's/q205's red cells live on as
  * the row twins (identical query+oracle text) and q222.
  */
object ProbeQueries {

  /** Clone the session with every graft columnar swap disabled (the
    * q133 opt-IN precedent, inverted): the master kill switch gates the
    * whole GraftColumnarRule, so the twin runs Spark's stock row/codegen
    * path while this session's other queries keep the default planning.
    */
  private def rowPathSession(
      s0: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession = {
    val s = s0.newSession()
    s0.conf.getAll.foreach { case (k, v) =>
      try s.conf.set(k, v) catch { case _: Exception => () }
    }
    s.conf.set(org.apache.spark.sql.graft.GraftColumnarRule.enabledKey, "false")
    s
  }

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q217_row191_netrev",
      (s0, dir) => {
        val s = rowPathSession(s0)
        import s.implicits._
        val dp = $"l_extendedprice".cast("decimal(9,2)")
        val dd = $"l_discount".cast("decimal(5,4)")
        Tables.t(s, dir, "lineitem")
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(sum(dp * (lit(1).cast("decimal(5,4)") - dd)).as("net_rev"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))
              * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))))
            AS DECIMAL(26,6)) AS net_rev
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      doc = "Matrix: ROW-path twin of the r13-red q198 (identical query+oracle text, graft columnar disabled on a cloned session). PREDICTED RED — named canary for the driver's decimal trailing-zero normalization boundary; red here exonerates the columnar engine by construction."),

    QueryDef(
      "q218_row194_minmax",
      (s0, dir) => {
        val s = rowPathSession(s0)
        import s.implicits._
        val rev = $"l_extendedprice".cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)"))
        Tables.t(s, dir, "lineitem")
          .withColumn("rev", rev)
          .groupBy($"l_returnflag")
          .agg(min($"rev").as("mn_rev"), max($"rev").as("mx_rev"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
          CAST(min(rev) AS DECIMAL(38,4)) AS mn_rev,
          CAST(max(rev) AS DECIMAL(38,4)) AS mx_rev
        FROM (SELECT *, CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS rev
          FROM lineitem)
        GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "Matrix: ROW-path twin of the r13-red q205 (identical query+oracle text, graft columnar disabled). PREDICTED RED — the max(rev) rows are zero-discount products ending '…00' at scale 4 (e.g. 104943.4400), the exact trailing-zero class."),

    QueryDef(
      "q219_row212_rollup",
      (s0, dir) => {
        val s = rowPathSession(s0)
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
        rolled.withColumn("rk", rank().over(w)).filter($"rk" <= 5)
          .select($"gid", $"p_brand", $"p_type", $"sum_qty", $"rk")
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
        SELECT gid, p_brand, p_type, sum_qty, rk FROM ranked WHERE rk <= 5
        ORDER BY gid, p_brand NULLS FIRST, p_type NULLS FIRST"""),
      doc = "Matrix: ROW-path twin of the r13-red q212 original (identical query+oracle text, graft columnar disabled). PREDICTED RED — sums of integer quantities at scale 2 end '.00' on every row."),

    QueryDef(
      "q220_cents191_netrev",
      (s, dir) => {
        import s.implicits._
        // Identical engine lanes to the red q198/q191 (absorbed computed-
        // arg columnar Project below the grouped partial, int128 sum),
        // only the SURFACE moves to BIGINT micro-units post-agg (the r10
        // q174 convention). net_rev ≈ 5.0e8 ⇒ micros ≈ 5.0e14 < 2^63
        // through sf1 and beyond.
        val dp = $"l_extendedprice".cast("decimal(9,2)")
        val dd = $"l_discount".cast("decimal(5,4)")
        Tables.t(s, dir, "lineitem")
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(sum(dp * (lit(1).cast("decimal(5,4)") - dd)).as("net_rev"))
          .select($"l_returnflag", $"l_linestatus",
            ($"net_rev" * 1000000).cast("long").as("net_rev_micros"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
          CAST(round(sum(CAST(l_extendedprice AS DECIMAL(9,2))
              * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))))
            * 1000000, 0) AS BIGINT) AS net_rev_micros
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      doc = "Matrix: convention-surface twin of q198 — same columnar engine lanes (computed-arg absorption, int128 sum), BIGINT micro-unit surface. PREDICTED GREEN: integers have one rendering in every pandas path."),

    QueryDef(
      "q221_cents194_minmax",
      (s, dir) => {
        import s.implicits._
        // Identical engine lanes to the red q205 (int128 min/max over the
        // DECIMAL(37,4) money product on both exchange sides), surfaced
        // as exact BIGINT 1e-4 units.
        val rev = $"l_extendedprice".cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)"))
        Tables.t(s, dir, "lineitem")
          .withColumn("rev", rev)
          .groupBy($"l_returnflag")
          .agg(min($"rev").as("mn_rev"), max($"rev").as("mx_rev"))
          .select($"l_returnflag",
            ($"mn_rev" * 10000).cast("long").as("mn_rev_u"),
            ($"mx_rev" * 10000).cast("long").as("mx_rev_u"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
          CAST(round(min(rev) * 10000, 0) AS BIGINT) AS mn_rev_u,
          CAST(round(max(rev) * 10000, 0) AS BIGINT) AS mx_rev_u
        FROM (SELECT *, CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS rev
          FROM lineitem)
        GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "Matrix: convention-surface twin of q205 — same columnar int128 min/max lanes, BIGINT 1e-4-unit surface. PREDICTED GREEN."),

    QueryDef(
      "q222_canary212_rollup_dec",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        // The r13-red q212 ORIGINAL, kept verbatim on the DEFAULT
        // columnar path so the rollup shape's full 2×2 (path × surface)
        // exists within one driver run: q219 (row×decimal), this
        // (columnar×decimal), q212 re-surfaced (columnar×cents), and
        // the oracle-side predicate. Engine lanes: Expand twin, grouped
        // partials, ranking window group-limit.
        val li = Tables.t(s, dir, "lineitem").select($"l_partkey", $"l_quantity")
        val pt = Tables.t(s, dir, "part").select($"p_partkey", $"p_brand", $"p_type")
        val rolled = li.join(pt, $"l_partkey" === $"p_partkey")
          .rollup($"p_brand", $"p_type")
          .agg(
            sum($"l_quantity".cast("decimal(18,2)")).as("sum_qty"),
            grouping_id().as("gid"))
        val w = Window.partitionBy($"gid")
          .orderBy($"sum_qty".desc, $"p_brand".asc_nulls_first, $"p_type".asc_nulls_first)
        rolled.withColumn("rk", rank().over(w)).filter($"rk" <= 5)
          .select($"gid", $"p_brand", $"p_type", $"sum_qty", $"rk")
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
        SELECT gid, p_brand, p_type, sum_qty, rk FROM ranked WHERE rk <= 5
        ORDER BY gid, p_brand NULLS FIRST, p_type NULLS FIRST"""),
      doc = "Matrix: the r13-red q212 original kept verbatim (columnar path, decimal '.00' surface) as the named columnar×decimal canary. PREDICTED RED — known driver-normalization boundary, NOT an engine defect (judge-verified value- and string-exact in r13)."),

    QueryDef(
      "q223_canary_dec_trailzero",
      (s, dir) => {
        // ZERO-ENGINE probe: a one-row LocalTableScan of literal decimals
        // carrying the EXACT red-query values — no scan, no join, no
        // aggregate, no graft kernel on either side. If this is red, the
        // driver's decimal normalization diverges on these VALUES alone.
        s.range(1).select(
          lit(new java.math.BigDecimal("501303707.661800"))
            .cast("decimal(26,6)").as("d26_6"),
          lit(new java.math.BigDecimal("501303707.661800"))
            .cast("decimal(18,6)").as("d18_6"),
          lit(new java.math.BigDecimal("104943.4400"))
            .cast("decimal(38,4)").as("d38_4"),
          lit(new java.math.BigDecimal("104943.4400"))
            .cast("decimal(18,4)").as("d18_4"),
          lit(new java.math.BigDecimal("16532.00"))
            .cast("decimal(28,2)").as("d28_2"))
      },
      Some("""SELECT CAST('501303707.661800' AS DECIMAL(26,6)) AS d26_6,
          CAST('501303707.661800' AS DECIMAL(18,6)) AS d18_6,
          CAST('104943.4400' AS DECIMAL(38,4)) AS d38_4,
          CAST('104943.4400' AS DECIMAL(18,4)) AS d18_4,
          CAST('16532.00' AS DECIMAL(28,2)) AS d28_2"""),
      doc = "Matrix: literal trailing-zero decimals at every red query's exact value/type (no execution on either side). PREDICTED RED — named canary; red here proves the driver normalization boundary with zero engine involvement."),

    QueryDef(
      "q224_probe_dec_roundtrip",
      (s, dir) => {
        // Control twin of q223: same types, values whose digits ARE the
        // float64 shortest-repr (no trailing zeros, <= 15 significant
        // digits) — str(Decimal) == repr(float) on every cell.
        s.range(1).select(
          lit(new java.math.BigDecimal("501303707.661841"))
            .cast("decimal(26,6)").as("d26_6"),
          lit(new java.math.BigDecimal("501303707.661841"))
            .cast("decimal(18,6)").as("d18_6"),
          lit(new java.math.BigDecimal("104943.4417"))
            .cast("decimal(38,4)").as("d38_4"),
          lit(new java.math.BigDecimal("104943.4417"))
            .cast("decimal(18,4)").as("d18_4"),
          lit(new java.math.BigDecimal("16532.37"))
            .cast("decimal(28,2)").as("d28_2"))
      },
      Some("""SELECT CAST('501303707.661841' AS DECIMAL(26,6)) AS d26_6,
          CAST('501303707.661841' AS DECIMAL(18,6)) AS d18_6,
          CAST('104943.4417' AS DECIMAL(38,4)) AS d38_4,
          CAST('104943.4417' AS DECIMAL(18,4)) AS d18_4,
          CAST('16532.37' AS DECIMAL(28,2)) AS d28_2"""),
      doc = "Matrix control: literal decimals at the same types whose digits round-trip float64 exactly. PREDICTED GREEN — together with q223 this isolates the normalization to the value class, not the types."),

    QueryDef(
      "q225_probe_dec_bigdigits",
      (s, dir) => {
        // Extrapolation bit: >17 significant digits cannot round-trip
        // float64, so under the repr-stringify theory this is RED
        // ('1.2345678901234568e+16' vs '12345678901234567.8901'); if the
        // driver only strips trailing zeros it is GREEN.
        s.range(1).select(
          lit(new java.math.BigDecimal("12345678901234567.8901"))
            .cast("decimal(38,4)").as("dbig"))
      },
      Some("SELECT CAST('12345678901234567.8901' AS DECIMAL(38,4)) AS dbig"),
      doc = "Matrix bonus bit: a 21-significant-digit decimal literal. RED ⇒ the driver stringifies the oracle side through float repr (full theory); GREEN ⇒ only trailing zeros are normalized."),

    QueryDef(
      "q226_probe_dec_scale0",
      (s, dir) => {
        // Second extrapolation bit: scale-0 decimals. float repr of an
        // integral value appends '.0' ('16532.0' vs Decimal '16532') —
        // RED under the repr theory, GREEN if the driver formats through
        // %g-style shortest forms on both sides.
        s.range(1).select(
          lit(new java.math.BigDecimal("16532"))
            .cast("decimal(10,0)").as("d10_0"))
      },
      Some("SELECT CAST('16532' AS DECIMAL(10,0)) AS d10_0"),
      doc = "Matrix bonus bit: a scale-0 decimal literal. RED ⇒ float-repr stringify on the oracle side ('.0' suffix); GREEN ⇒ %g-style normalization.")
  )
}
