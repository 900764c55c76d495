package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Cast matrix (SURVEY §2.2 "Conversion"; reference
  * expressions/CometCast.scala:33-421 + a 1072-LoC native kernel):
  * numeric↔numeric, numeric↔string, temporal↔string, boolean paths, and
  * try_cast. Spark 4 runs with ANSI mode ON by default — a malformed
  * string cast THROWS; try_cast is the NULL-tolerant path and maps 1:1 to
  * DuckDB's TRY_CAST. ANSI-off legacy semantics are covered by the
  * dual-run test suite, not the oracle.
  *
  * Engine deltas handled: DuckDB CAST(DOUBLE AS BIGINT) rounds, Spark
  * truncates → trunc() first on the oracle side. Spark double→string
  * scientific formatting has no DuckDB twin → not exercised through the
  * oracle (covered by the dual-run suite).
  */
object CastQueries {

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q44_cast_matrix",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "orders").filter($"o_orderkey" < 200)
          .select($"o_orderkey",
            $"o_orderkey".cast("string").as("l2s"),
            $"o_totalprice".cast("long").as("d2l"),
            // double→decimal cast, then →string: the driver's harness can't
            // canonically hash a raw DECIMAL column; the cast stays exercised.
            $"o_totalprice".cast("decimal(12,2)").cast("string").as("d2dec"),
            $"o_totalprice".cast("decimal(12,2)").cast("double").as("dec2d"),
            $"o_orderkey".cast("double").as("l2d"),
            $"o_orderkey".cast("int").cast("short").as("l2short"),
            substring($"o_orderpriority", 1, 1).cast("int").as("s2i"),
            expr("try_cast(o_orderpriority AS INT)").as("try_bad"),
            expr("try_cast(concat(o_orderkey, '7') AS INT)").as("try_good"),
            $"o_orderdate".cast("date").as("ts2date"),
            $"o_orderdate".cast("date").cast("string").as("date2s"),
            $"o_orderdate".cast("string").as("ts2s"),
            lit("1995-03-15").cast("date").as("s2date"),
            lit("1995-03-15 12:30:45").cast("timestamp").as("s2ts"),
            ($"o_orderkey" % 2 === 0).as("bool_"),
            ($"o_orderkey" % 2 === 0).cast("string").as("bool2s"),
            ($"o_orderkey" % 2).cast("boolean").as("l2bool"),
            $"o_orderkey".cast("string").cast("long").as("roundtrip"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
          CAST(o_orderkey AS VARCHAR) AS l2s,
          CAST(trunc(o_totalprice) AS BIGINT) AS d2l,
          CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS d2dec,
          CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS dec2d,
          CAST(o_orderkey AS DOUBLE) AS l2d,
          CAST(o_orderkey AS SMALLINT) AS l2short,
          CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS s2i,
          TRY_CAST(o_orderpriority AS INTEGER) AS try_bad,
          TRY_CAST(o_orderkey || '7' AS INTEGER) AS try_good,
          CAST(o_orderdate AS DATE) AS ts2date,
          CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date2s,
          CAST(o_orderdate AS VARCHAR) AS ts2s,
          DATE '1995-03-15' AS s2date,
          TIMESTAMP '1995-03-15 12:30:45' AS s2ts,
          o_orderkey % 2 = 0 AS bool_,
          CAST(o_orderkey % 2 = 0 AS VARCHAR) AS bool2s,
          CAST(o_orderkey % 2 AS BOOLEAN) AS l2bool,
          CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS roundtrip
        FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey"""),
      doc = "Cast matrix: long/double/decimal/short/string/date/timestamp/boolean paths + try_cast and legacy NULL-on-malformed cast."),

    QueryDef(
      "q79_try_cast_legacy",
      (s, dir) => {
        import s.implicits._
        // The LEGACY-semantics surface (malformed → NULL, overflow →
        // NULL) through try_cast, which maps 1:1 to DuckDB TRY_CAST.
        // ANSI-off behavior of plain CAST is covered by the dual-run
        // axis and the cast_legacy.sql corpus file; this query makes the
        // NULL-tolerant matrix oracle-checked. Reference scope:
        // expressions/CometCast.scala:33-421 (TRY eval mode).
        Tables.t(s, dir, "orders").filter($"o_orderkey" < 300)
          .select($"o_orderkey",
            expr("try_cast(o_orderpriority AS DOUBLE)").as("bad_dbl"),
            expr("try_cast(concat('x', o_orderkey) AS INT)").as("bad_int"),
            expr("try_cast(concat(' ', o_orderkey, ' ') AS INT)").as("pad_int"),
            expr("try_cast('' AS INT)").as("empty_int"),
            expr("try_cast(o_orderkey + 300 AS TINYINT)").cast("int").as("ovf_tiny"),
            expr("try_cast(o_orderkey * 100000000000 AS INT)").as("ovf_int"),
            expr("try_cast('1995-99-99' AS DATE)").as("bad_date"),
            expr("try_cast('1995-03-15' AS DATE)").as("good_date"),
            expr("try_cast('true' AS BOOLEAN)").as("b_true"),
            expr("try_cast('maybe' AS BOOLEAN)").as("b_bad"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
          TRY_CAST(o_orderpriority AS DOUBLE) AS bad_dbl,
          TRY_CAST('x' || o_orderkey AS INTEGER) AS bad_int,
          TRY_CAST(' ' || o_orderkey || ' ' AS INTEGER) AS pad_int,
          TRY_CAST('' AS INTEGER) AS empty_int,
          CAST(TRY_CAST(o_orderkey + 300 AS TINYINT) AS INTEGER) AS ovf_tiny,
          TRY_CAST(o_orderkey * 100000000000 AS INTEGER) AS ovf_int,
          TRY_CAST('1995-99-99' AS DATE) AS bad_date,
          TRY_CAST('1995-03-15' AS DATE) AS good_date,
          TRY_CAST('true' AS BOOLEAN) AS b_true,
          TRY_CAST('maybe' AS BOOLEAN) AS b_bad
        FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey"""),
      doc = "NULL-tolerant cast matrix via try_cast/TRY_CAST: malformed strings, whitespace trim, tinyint/int overflow, impossible dates, boolean strings.")
  )
}
