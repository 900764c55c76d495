package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Driver-hash triangulation probes for the two hash_match:false rows
  * (q191_computed_arg_agg, red since r11; q194_filter_agg, red at birth
  * in r12) — VERDICT r12 task #1.
  *
  * Every local replica axis is exhausted (bit-exact full-precision value
  * diff vs the DuckDB oracle, 8-vs-32-CPU partition invariance, DESCRIBE
  * type parity, normal parquet physical encodings, green q192 sharing
  * red q194's type profile), so these probes triangulate THROUGH the
  * driver itself: each ships a single output lane (plus the group keys)
  * with the EXACT expression text of the original query, so
  * CORRECTNESS_r13 localizes the offending column by construction — or,
  * if every probe is green while the originals stay red, proves a
  * multi-column/ordering interaction in the driver's hash.
  *
  * Probe matrix:
  *  - q198/q199/q200: q191's three lanes split (wide-decimal sum /
  *    computed-double min+max / count).
  *  - q201/q202: q191's net_rev re-represented. q201 casts the sum to
  *    DECIMAL(18,6) — the sf0.01 values are 15 significant digits, so
  *    the digits are IDENTICAL and only the backing width class changes
  *    (int128-backed DECIMAL(26,6) → int64-backed DECIMAL(18,6)); q202
  *    casts to DOUBLE (the int128 numerator is < 2^53 at sf0.01, so
  *    decimal→double is a single exact-int load + one correctly-rounded
  *    divide in both engines — bit-deterministic). If q198 is red while
  *    q201/q202 are green, the driver's hash normalization diverges on
  *    wide (>18-precision) decimals specifically, independent of value.
  *  - q203/q204/q205/q206: q194's four lanes split (filtered wide-
  *    decimal sum / filtered counts / wide-decimal min+max / filtered
  *    rounded double avg).
  *  - q207: q194's avg lane in the order-free q117 formulation (exact
  *    decimal sum cast to double, divided by the filtered count — one
  *    IEEE divide of exact operands, no accumulation-order sensitivity,
  *    no cross-engine round()).
  *  - q208: q194's decimal lanes narrowed to DECIMAL(18,4) (values are
  *    ≤13 significant digits at sf0.01 — exact, int64-backed).
  *
  * All probes run the SAME engine lanes as the originals (the absorbed
  * computed-arg columnar Project below the grouped partial, the int128
  * sum/min/max lanes, the FILTER→masked-conditional rewrite), so each is
  * also an independent re-verification of those kernels under the full
  * DualRun axis set. First-flight discipline (VERDICT r12 task #2):
  * single-typed-column outputs, and the only round(avg(double)) lane
  * shipped (q206) is deliberately the original text under test — its
  * order-free twin q207 ships beside it.
  */
object ProbeQueries {

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q198_probe191_netrev",
      (s, dir) => {
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
      doc = "Probe: q191's wide-decimal sum lane alone (DECIMAL(26,6), int128-backed)."),

    QueryDef(
      "q199_probe191_minmax",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "lineitem")
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            min(-$"l_extendedprice").as("min_neg_price"),
            max(abs($"l_discount" - $"l_tax")).as("max_spread"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
          min(-l_extendedprice) AS min_neg_price,
          max(abs(l_discount - l_tax)) AS max_spread
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      doc = "Probe: q191's computed-double min/max lanes alone."),

    QueryDef(
      "q200_probe191_count",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "lineitem")
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      doc = "Probe: q191's count lane alone."),

    QueryDef(
      "q201_probe191_netrev_n18",
      (s, dir) => {
        import s.implicits._
        val dp = $"l_extendedprice".cast("decimal(9,2)")
        val dd = $"l_discount".cast("decimal(5,4)")
        Tables.t(s, dir, "lineitem")
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(sum(dp * (lit(1).cast("decimal(5,4)") - dd))
            .cast("decimal(18,6)").as("net_rev_n"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))
              * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))))
            AS DECIMAL(18,6)) AS net_rev_n
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      doc = "Probe: q191's sum with IDENTICAL digits but int64-backed DECIMAL(18,6) — discriminates wide-decimal hash normalization from value divergence."),

    QueryDef(
      "q202_probe191_netrev_dbl",
      (s, dir) => {
        import s.implicits._
        val dp = $"l_extendedprice".cast("decimal(9,2)")
        val dd = $"l_discount".cast("decimal(5,4)")
        Tables.t(s, dir, "lineitem")
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(sum(dp * (lit(1).cast("decimal(5,4)") - dd))
            .cast("double").as("net_rev_d"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))
              * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))))
            AS DOUBLE) AS net_rev_d
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      doc = "Probe: q191's sum through the DOUBLE representation (exact int128 numerator < 2^53 → single correctly-rounded divide in both engines)."),

    QueryDef(
      "q203_probe194_revsmall",
      (s, dir) => {
        import s.implicits._
        val rev = $"l_extendedprice".cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)"))
        Tables.t(s, dir, "lineitem")
          .withColumn("rev", rev)
          .groupBy($"l_returnflag")
          .agg(expr("sum(rev) FILTER (WHERE l_quantity < 25)").as("rev_small"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
          CAST(sum(rev) FILTER (WHERE l_quantity < 25) AS DECIMAL(38,4)) AS rev_small
        FROM (SELECT *, CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS rev
          FROM lineitem)
        GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "Probe: q194's filtered wide-decimal sum lane alone (DECIMAL(38,4))."),

    QueryDef(
      "q204_probe194_counts",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            expr("count(1) FILTER (WHERE l_linestatus = 'F')").as("n_f"),
            expr("count(l_partkey) FILTER (WHERE l_quantity >= 25)").as("n_big"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
          count(*) FILTER (WHERE l_linestatus = 'F') AS n_f,
          count(l_partkey) FILTER (WHERE l_quantity >= 25) AS n_big
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "Probe: q194's filtered count lanes alone."),

    QueryDef(
      "q205_probe194_minmax",
      (s, dir) => {
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
      doc = "Probe: q194's wide-decimal min/max lanes alone (int128 comparisons)."),

    QueryDef(
      "q206_probe194_avg",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(expr("round(avg(l_extendedprice) FILTER (WHERE l_quantity < 10), 4)")
            .as("avg_small"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
          round(avg(l_extendedprice) FILTER (WHERE l_quantity < 10), 4) AS avg_small
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "Probe: q194's rounded filtered double-avg lane alone — the only order-sensitive lane in either red query (a double mean rounded at 4dp can differ by accumulation order at a rounding boundary)."),

    QueryDef(
      "q207_probe194_avg_decq",
      (s, dir) => {
        import s.implicits._
        // Order-free twin of q206 (the q117 discipline): the price is an
        // exact 2dp quantity, so sum it as DECIMAL (exact, any order),
        // cast to double (values < 2^53 → exact), divide by the filtered
        // count — ONE correctly-rounded IEEE divide, identical in any
        // engine, no round() at a boundary.
        Tables.t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg((expr("sum(CAST(l_extendedprice AS DECIMAL(18,2))) FILTER (WHERE l_quantity < 10)")
            .cast("double") /
            expr("count(1) FILTER (WHERE l_quantity < 10)"))
            .as("avg_small_q"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
              FILTER (WHERE l_quantity < 10) AS DOUBLE)
            / (count(*) FILTER (WHERE l_quantity < 10)) AS avg_small_q
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "Probe: q194's avg lane in the order-free decimal-quantized formulation (exact decimal sum ÷ count, single IEEE divide, no cross-engine round)."),

    QueryDef(
      "q208_probe194_narrow",
      (s, dir) => {
        import s.implicits._
        val rev = $"l_extendedprice".cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)"))
        Tables.t(s, dir, "lineitem")
          .withColumn("rev", rev)
          .groupBy($"l_returnflag")
          .agg(
            expr("sum(rev) FILTER (WHERE l_quantity < 25)")
              .cast("decimal(18,4)").as("rev_small_n"),
            min($"rev").cast("decimal(18,4)").as("mn_rev_n"),
            max($"rev").cast("decimal(18,4)").as("mx_rev_n"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
          CAST(sum(rev) FILTER (WHERE l_quantity < 25) AS DECIMAL(18,4)) AS rev_small_n,
          CAST(min(rev) AS DECIMAL(18,4)) AS mn_rev_n,
          CAST(max(rev) AS DECIMAL(18,4)) AS mx_rev_n
        FROM (SELECT *, CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS rev
          FROM lineitem)
        GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "Probe: q194's decimal lanes narrowed to int64-backed DECIMAL(18,4) (identical digits at sf0.01) — the wide-vs-narrow discriminator for the FILTER-agg family.")
  )
}
