package graft.queries

import org.apache.spark.sql.{Column}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Math/arithmetic expression surface (SURVEY §2.2 "Arithmetic/Math", 38
  * functions; reference serde/math.scala:28-206 + serde/arithmetic.scala).
  *
  * Transcendental results are rounded to 6 decimals on BOTH sides: JVM
  * libm and DuckDB's C library agree to well under 1e-6 absolute but not
  * bit-for-bit, so exact hashing needs the common rounding. Both engines
  * round doubles half-away-from-zero, so the rounding itself agrees.
  * DuckDB lacks hyperbolics → oracle emulates via exp/ln identities.
  */
object MathQueries {

  private def r6(c: Column): Column = round(c, 6)

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q32_math_rounding",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "lineitem").filter($"l_orderkey" < 100)
          .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
            abs(-$"l_extendedprice").as("av"),
            ceil($"l_extendedprice").as("ce"),
            floor($"l_extendedprice").as("fl"),
            // Round the decimal-quantized price, not the raw double: at a
            // ".45" representation boundary the two engines disagree on
            // the binary double's nearest tenth; on decimal both are exact.
            round($"l_extendedprice".cast("decimal(18,2)"), 1).cast("double").as("rnd1"),
            bround($"l_extendedprice".cast("decimal(18,2)"), 1).cast("double").as("brnd1"),
            signum($"l_discount" - 0.05).as("sg"),
            (-$"l_quantity").as("neg"),
            expr("l_orderkey div 7").as("idiv"),
            ($"l_orderkey" % 7).as("imod"),
            pmod($"l_linenumber" - lit(4), lit(3)).cast("long").as("pm"))
          .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
      },
      Some("""WITH base AS (
          SELECT *, CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM lineitem WHERE l_orderkey < 100)
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
          abs(-l_extendedprice) AS av,
          CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
          CAST(floor(l_extendedprice) AS BIGINT) AS fl,
          CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS rnd1,
          -- DuckDB's round_even breaks ties upward on this data; emulate
          -- true HALF_EVEN over exact integer cents instead.
          CAST((CASE WHEN cents % 10 > 5 THEN cents // 10 + 1
                     WHEN cents % 10 < 5 THEN cents // 10
                     ELSE cents // 10 + (cents // 10) % 2 END) AS DOUBLE) / 10 AS brnd1,
          CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg,
          -l_quantity AS neg,
          l_orderkey // 7 AS idiv,
          l_orderkey % 7 AS imod,
          ((l_linenumber - 4) % 3 + 3) % 3 AS pm
        FROM base ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey"""),
      doc = "abs/ceil/floor/round/signum/unary-minus/integral-divide/remainder/pmod. Spark ceil(double)→long, matched by BIGINT cast."),

    QueryDef(
      "q33_math_exp_log",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "lineitem").filter($"l_orderkey" < 100)
          .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
            r6(sqrt($"l_extendedprice")).as("sq"),
            r6(cbrt($"l_extendedprice")).as("cb"),
            r6(exp($"l_discount")).as("ex"),
            r6(expm1($"l_discount")).as("exm1"),
            r6(log($"l_extendedprice")).as("ln_"),
            r6(log1p($"l_discount")).as("ln1p"),
            r6(log10($"l_extendedprice")).as("l10"),
            r6(log2($"l_extendedprice")).as("l2"),
            r6(log(3.0, $"l_extendedprice")).as("l3"),
            r6(pow($"l_quantity", 2.5)).as("pw"))
          .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
          round(sqrt(l_extendedprice), 6) AS sq,
          round(cbrt(l_extendedprice), 6) AS cb,
          round(exp(l_discount), 6) AS ex,
          round(exp(l_discount) - 1, 6) AS exm1,
          round(ln(l_extendedprice), 6) AS ln_,
          round(ln(1 + l_discount), 6) AS ln1p,
          round(log10(l_extendedprice), 6) AS l10,
          round(log2(l_extendedprice), 6) AS l2,
          round(log(3, l_extendedprice), 6) AS l3,
          round(pow(l_quantity, 2.5), 6) AS pw
        FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey"""),
      doc = "sqrt/cbrt/exp/expm1/log/log1p/log10/log2/log(base,x)/pow, rounded to 6dp for cross-engine float agreement."),

    QueryDef(
      "q34_math_trig",
      (s, dir) => {
        import s.implicits._
        val x = $"l_discount" * 5  // in [0, 0.5] — safe for asin/acos/atanh
        Tables.t(s, dir, "lineitem").filter($"l_orderkey" < 100)
          .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
            r6(sin(x)).as("sn"), r6(cos(x)).as("cs"), r6(tan(x)).as("tn"),
            r6(cot(x + 0.1)).as("ct"),
            r6(asin(x)).as("asn"), r6(acos(x)).as("acs"),
            r6(atan(x)).as("atn"),
            r6(atan2($"l_quantity", $"l_extendedprice")).as("at2"),
            r6(degrees(x)).as("dg"), r6(radians($"l_quantity")).as("rd"),
            round(lit(math.Pi), 6).as("pi_"))
          .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
          round(sin(l_discount*5), 6) AS sn, round(cos(l_discount*5), 6) AS cs,
          round(tan(l_discount*5), 6) AS tn, round(cot(l_discount*5 + 0.1), 6) AS ct,
          round(asin(l_discount*5), 6) AS asn, round(acos(l_discount*5), 6) AS acs,
          round(atan(l_discount*5), 6) AS atn,
          round(atan2(l_quantity, l_extendedprice), 6) AS at2,
          round(degrees(l_discount*5), 6) AS dg, round(radians(l_quantity), 6) AS rd,
          round(pi(), 6) AS pi_
        FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey"""),
      doc = "Trig family: sin/cos/tan/cot/asin/acos/atan/atan2/degrees/radians/pi."),

    QueryDef(
      "q35_math_hyper_hex",
      (s, dir) => {
        import s.implicits._
        val x = $"l_discount" * 5
        Tables.t(s, dir, "lineitem").filter($"l_orderkey" < 100)
          .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
            r6(sinh(x)).as("sh"), r6(cosh(x)).as("ch"), r6(tanh(x)).as("th"),
            r6(asinh(x)).as("ash"), r6(acosh(x + 1)).as("ach"),
            r6(atanh(x)).as("ath"),
            hex($"l_orderkey").as("hx"),
            hex($"l_returnflag").as("hxs"),
            bin($"l_orderkey").as("bn"))
          .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
          round((exp(l_discount*5) - exp(-l_discount*5))/2, 6) AS sh,
          round((exp(l_discount*5) + exp(-l_discount*5))/2, 6) AS ch,
          round((exp(l_discount*5) - exp(-l_discount*5))
              / (exp(l_discount*5) + exp(-l_discount*5)), 6) AS th,
          round(ln(l_discount*5 + sqrt(l_discount*5*l_discount*5 + 1)), 6) AS ash,
          round(ln(l_discount*5 + 1
              + sqrt((l_discount*5 + 1)*(l_discount*5 + 1) - 1)), 6) AS ach,
          round(0.5 * ln((1 + l_discount*5)/(1 - l_discount*5)), 6) AS ath,
          hex(l_orderkey) AS hx, hex(l_returnflag) AS hxs, bin(l_orderkey) AS bn
        FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey"""),
      doc = "Hyperbolics (oracle emulated via exp/ln identities — DuckDB lacks them) + hex(int)/hex(string)/bin.")
  )
}
