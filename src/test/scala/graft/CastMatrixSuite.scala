package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{AnalysisException, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exhaustive cast-pair matrix (reference: CometCast.scala:33-421
  * enumerates every src×dst with Compatible/Incompatible/Unsupported and
  * CometCastSuite tests the full matrix). The graft twin is differential:
  * the engine executes casts through Spark itself, so for EVERY
  * (src, dst, evalMode) triple the planning axes this library adds or
  * relies on — the graft columnar rule and whole-stage codegen — must not
  * change the outcome: same rows when the cast evaluates, same
  * threw-vs-returned behavior when ANSI rejects a value, and an
  * analysis-time rejection (under every axis) when Spark does not support
  * the pair at all.
  *
  * Types covered: bool, all four integral widths, float, double,
  * decimal(10,2), string, binary, date, timestamp, timestamp_ntz —
  * 13 × 13 = 169 ordered pairs, each under ANSI and LEGACY mode with a
  * try_cast column riding along where the pair resolves. Value pools per
  * source include nulls, extremes (min/max, NaN, ±Inf, -0.0), overflow
  * bait (300 into byte, 3e9 into int, 19-digit strings) and malformed
  * strings — ANSI-throwing values are part of the contract being pinned.
  *
  * The per-mode support matrix (which pairs resolve vs reject — Spark's
  * canCast vs canAnsiCast split) is pinned to a golden resource so a
  * Spark upgrade that silently widens or narrows the cast surface fails
  * a test instead of drifting: src/test/resources/cast_support_matrix.txt
  * (regenerate with GRAFT_REGEN_PLANS=1).
  */
class CastMatrixSuite extends GraftTestBase {

  private val types: Seq[(String, DataType, String)] = Seq(
    ("bool", BooleanType, "BOOLEAN"),
    ("byte", ByteType, "TINYINT"),
    ("short", ShortType, "SMALLINT"),
    ("int", IntegerType, "INT"),
    ("long", LongType, "BIGINT"),
    ("float", FloatType, "FLOAT"),
    ("double", DoubleType, "DOUBLE"),
    ("decimal", DecimalType(10, 2), "DECIMAL(10,2)"),
    ("string", StringType, "STRING"),
    ("binary", BinaryType, "BINARY"),
    ("date", DateType, "DATE"),
    ("timestamp", TimestampType, "TIMESTAMP"),
    ("timestamp_ntz", TimestampNTZType, "TIMESTAMP_NTZ"))

  /** Edge-value pool per source type. Values that ANSI rejects for some
    * destination are intentional: the differential contract includes
    * "throws on both paths". */
  private def pool(dt: DataType): Seq[Any] = dt match {
    case BooleanType => Seq(true, false, null)
    case ByteType => Seq(0.toByte, 1.toByte, (-1).toByte, Byte.MaxValue, Byte.MinValue, null)
    case ShortType => Seq(0.toShort, 1.toShort, (-1).toShort, Short.MaxValue, Short.MinValue, 300.toShort, null)
    case IntegerType => Seq(0, 1, -1, Int.MaxValue, Int.MinValue, 70000, null)
    case LongType => Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 3000000000L, null)
    case FloatType => Seq(0f, 1.5f, -1.5f, Float.NaN, Float.PositiveInfinity,
      Float.NegativeInfinity, -0.0f, Float.MaxValue, null)
    case DoubleType => Seq(0d, 1.5d, -1.5d, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, -0.0d, 1.0e308, null)
    case _: DecimalType => Seq(
      new java.math.BigDecimal("0.00"), new java.math.BigDecimal("123.45"),
      new java.math.BigDecimal("-999.99"), new java.math.BigDecimal("12345678.90"), null)
    case StringType => Seq("0", "1", "-1", "1.5", "true", "false", "abc", "",
      " 42 ", "2020-01-02", "2020-01-02 03:04:05", "12345678901234567890", null)
    case BinaryType => Seq("ab".getBytes("UTF-8"), Array.emptyByteArray, null)
    case DateType => Seq(java.sql.Date.valueOf("2020-01-02"),
      java.sql.Date.valueOf("1969-12-31"), null)
    case TimestampType => Seq(java.sql.Timestamp.valueOf("2020-01-02 03:04:05.123"),
      java.sql.Timestamp.valueOf("1969-12-31 23:59:59"), null)
    case TimestampNTZType => Seq(java.time.LocalDateTime.parse("2020-01-02T03:04:05.123"),
      java.time.LocalDateTime.parse("1969-12-31T23:59:59"), null)
    case other => sys.error(s"no pool for $other")
  }

  private def srcDf(dt: DataType): DataFrame = {
    val rows = pool(dt).map(Row(_))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 1),
      StructType(Seq(StructField("v", dt, nullable = true))))
  }

  /** One execution of the pair under the current session confs:
    * Left(analysis) if the pair does not resolve, Left(runtime:<class>)
    * if ANSI rejects a value at execution, Right(rows) otherwise. Binary
    * results go through hex() so the row image is value-stable. */
  private def runPair(src: DataType, dstDdl: String, withTry: Boolean): Either[String, Seq[String]] =
    try {
      val casted = srcDf(src).select(expr(s"CAST(v AS $dstDdl)").as("c"))
      val withTryCol =
        if (withTry) casted.withColumn("t", expr(s"try_cast(v AS $dstDdl)"))
        else casted
      val stable = withTryCol.schema.fields.foldLeft(withTryCol) {
        case (df, f) if f.dataType == BinaryType => df.withColumn(f.name, hex(col(f.name)))
        case (df, _) => df
      }
      Right(canon(stable))
    } catch {
      case _: AnalysisException => Left("analysis")
      case e: Throwable =>
        // unwrap SparkException layers to the root cause class — the
        // stable identity of an ANSI runtime rejection
        var c: Throwable = e
        while (c.getCause != null && (c.getCause ne c)) c = c.getCause
        Left(s"runtime:${c.getClass.getSimpleName}")
    }

  private val axes: Seq[(String, Seq[(String, String)])] = Seq(
    "default" -> Seq.empty,
    "columnar-off" -> Seq(org.apache.spark.sql.graft.GraftColumnarRule.enabledKey -> "false"),
    "codegen-off" -> Seq("spark.sql.codegen.wholeStage" -> "false"))

  types.foreach { case (srcName, srcDt, _) =>
    test(s"cast matrix from $srcName: all 13 destinations x {ANSI, LEGACY, TRY} invariant under columnar/codegen axes") {
      types.foreach { case (dstName, _, dstDdl) =>
        Seq("true", "false").foreach { ansi =>
          // probe resolution once (try_cast shares the ANSI matrix)
          val results = axes.map { case (axisName, confs) =>
            val r = withSQLConf((confs :+ ("spark.sql.ansi.enabled" -> ansi)): _*) {
              val probe =
                try { srcDf(srcDt).select(expr(s"CAST(v AS $dstDdl)")); true }
                catch { case _: AnalysisException => false }
              runPair(srcDt, dstDdl, withTry = probe && ansi == "true")
            }
            axisName -> r
          }
          val (baseAxis, base) = results.head
          results.tail.foreach { case (axisName, r) =>
            assert(r == base,
              s"cast $srcName -> $dstName (ansi=$ansi) diverged: $baseAxis=$base vs $axisName=$r")
          }
        }
      }
    }
  }

  test("complex-type casts (array/struct/map element casts) invariant under axes") {
    // Reference parity: CometCast recurses into ArrayType/StructType/
    // MapType children. Spark casts complex types element-wise when the
    // element pair casts; the engine's invariance contract must hold
    // through the recursion too. Canonical image via to_json (map/array
    // printing is not otherwise stable across code paths).
    import org.apache.spark.sql.Row
    val arrInt = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(Seq(1, 2, 147483647)), Row(Seq.empty[Int]), Row(null)), 1),
      StructType(Seq(StructField("v", ArrayType(IntegerType), nullable = true))))
    val arrStr = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(Seq("1", "2", "abc", null)), Row(null)), 1),
      StructType(Seq(StructField("v", ArrayType(StringType), nullable = true))))
    val struct = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(Row(5, "x")), Row(Row(null, null)), Row(null)), 1),
      StructType(Seq(StructField("v", StructType(Seq(
        StructField("a", IntegerType), StructField("b", StringType))), nullable = true))))
    val mp = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(Map("k1" -> 1, "k2" -> 70000)), Row(Map.empty[String, Int]), Row(null)), 1),
      StructType(Seq(StructField("v", MapType(StringType, IntegerType), nullable = true))))

    val cases: Seq[(String, org.apache.spark.sql.DataFrame, String)] = Seq(
      ("array<int> -> array<bigint>", arrInt, "ARRAY<BIGINT>"),
      ("array<int> -> array<smallint>", arrInt, "ARRAY<SMALLINT>"), // 147483647 overflows
      ("array<int> -> array<string>", arrInt, "ARRAY<STRING>"),
      ("array<string> -> array<int>", arrStr, "ARRAY<INT>"), // 'abc' malformed
      ("struct -> widened struct", struct, "STRUCT<a: BIGINT, b: STRING>"),
      ("struct -> stringified field", struct, "STRUCT<a: STRING, b: STRING>"),
      ("map<string,int> -> map<string,bigint>", mp, "MAP<STRING, BIGINT>"),
      ("map<string,int> -> map<string,tinyint>", mp, "MAP<STRING, TINYINT>")) // 70000 overflows

    def runCase(df: org.apache.spark.sql.DataFrame, dstDdl: String): Either[String, Seq[String]] =
      try {
        val r = df.select(to_json(struct_(expr(s"CAST(v AS $dstDdl)"))).as("j"))
        Right(canon(r))
      } catch {
        case _: AnalysisException => Left("analysis")
        case e: Throwable =>
          var c: Throwable = e
          while (c.getCause != null && (c.getCause ne c)) c = c.getCause
          Left(s"runtime:${c.getClass.getSimpleName}")
      }

    cases.foreach { case (label, df, dst) =>
      Seq("true", "false").foreach { ansi =>
        val results = axes.map { case (axisName, confs) =>
          axisName -> withSQLConf((confs :+ ("spark.sql.ansi.enabled" -> ansi)): _*) {
            runCase(df, dst)
          }
        }
        val (baseAxis, base) = results.head
        results.tail.foreach { case (axisName, r) =>
          assert(r == base, s"$label (ansi=$ansi): $baseAxis=$base vs $axisName=$r")
        }
        // overflow/malformed bait must actually throw somewhere in ANSI
        if (ansi == "true" && (label.contains("smallint") || label.contains("tinyint")
            || label.contains("array<string> -> array<int>"))) {
          assert(base.isLeft && base.swap.exists(_.startsWith("runtime:")),
            s"$label expected an ANSI runtime rejection, got $base")
        }
      }
    }
  }

  // functions.struct is shadowed by the local `struct` DataFrame above
  private def struct_(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.struct(c)

  test("cast support matrix matches the pinned golden (ANSI vs LEGACY resolution surface)") {
    val lines = for ((srcName, srcDt, _) <- types; (dstName, _, dstDdl) <- types) yield {
      val support = Seq("true", "false").map { ansi =>
        withSQLConf("spark.sql.ansi.enabled" -> ansi) {
          try { srcDf(srcDt).select(expr(s"CAST(v AS $dstDdl)")); "yes" }
          catch { case _: AnalysisException => "no" }
        }
      }
      s"$srcName -> $dstName: ansi=${support.head} legacy=${support.last}"
    }
    val actual = lines.mkString("", "\n", "\n")
    val golden = Paths.get("src/test/resources/cast_support_matrix.txt")
    if (sys.env.contains("GRAFT_REGEN_PLANS") || !Files.exists(golden)) {
      Files.createDirectories(golden.getParent)
      Files.writeString(golden, actual,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    }
    val expected = Files.readString(golden)
    assert(actual == expected,
      "cast support matrix drifted (Spark upgrade?) — regenerate with GRAFT_REGEN_PLANS=1 and review")
  }
}
