package graft

import org.apache.spark.sql.functions._

/** Boundary-value semantics the reference treats as its hardest scars
  * (SURVEY §7.4): NaN ordering/equality, -0.0 normalization, null
  * propagation, integer extremes, null-aware anti join with NULLs.
  */
class ExpressionEdgeSuite extends GraftTestBase {
  import GraftTestBase.spark.implicits._

  test("NaN sorts last and equals itself in aggregation") {
    val df = Seq(1.0, Double.NaN, 3.0, Double.NegativeInfinity).toDF("x")
    val sorted = df.orderBy($"x").collect().map(_.getDouble(0))
    assert(sorted(0) == Double.NegativeInfinity && sorted.last.isNaN)
    // NaN forms a single group (Spark semantics: NaN = NaN in grouping)
    val groups = Seq(Double.NaN, Double.NaN, 1.0).toDF("x")
      .groupBy($"x").count().collect()
    assert(groups.length == 2)
  }

  test("-0.0 and 0.0 group together (normalization)") {
    val g = Seq(-0.0, 0.0).toDF("x").groupBy($"x").count().collect()
    assert(g.length == 1 && g.head.getLong(1) == 2)
  }

  test("null propagation through arithmetic and comparisons") {
    val df = Seq[(java.lang.Double, java.lang.Double)]((1.0, null), (null, null))
      .toDF("a", "b")
    val r = df.select(($"a" + $"b").as("s"), ($"a" > $"b").as("c")).collect()
    assert(r.forall(row => row.isNullAt(0) && row.isNullAt(1)))
  }

  test("integer extremes survive sum/min/max without overflow surprise") {
    val df = Seq(Int.MaxValue, Int.MinValue, 0).toDF("x")
    val r = df.agg(sum($"x".cast("long")).as("s"), min($"x"), max($"x")).collect().head
    assert(r.getLong(0) == -1L && r.getInt(1) == Int.MinValue && r.getInt(2) == Int.MaxValue)
  }

  test("NOT IN with null on the subquery side matches nothing (null-aware anti)") {
    Seq(1, 2, 3).toDF("k").createOrReplaceTempView("edge_left")
    Seq[java.lang.Integer](1, null).toDF("k").createOrReplaceTempView("edge_right")
    val n = spark.sql(
      "SELECT * FROM edge_left WHERE k NOT IN (SELECT k FROM edge_right)").count()
    assert(n == 0, "NULL in the NOT IN subquery must void all matches")
  }

  test("decimal sum is exact where double sum would drift") {
    val vals = Seq.fill(1000)(0.1)
    val r = vals.toDF("x")
      .agg(sum($"x".cast("decimal(18,2)")).cast("double")).collect().head.getDouble(0)
    assert(r == 100.0)
  }

  test("division by zero: null in legacy ANSI-off, error under ANSI") {
    withSQLConf("spark.sql.ansi.enabled" -> "false") {
      // Spark's Divide returns NULL on a zero divisor when ANSI is off —
      // even for doubles (SQL semantics, not IEEE Infinity).
      val r = Seq((1.0, 0.0)).toDF("a", "b").select($"a" / $"b").collect().head
      assert(r.isNullAt(0))
      val ri = spark.sql("SELECT 1 / 0").collect().head
      assert(ri.isNullAt(0))
    }
    withSQLConf("spark.sql.ansi.enabled" -> "true") {
      intercept[Exception] { spark.sql("SELECT 1 / 0").collect() }
    }
  }

  test("rand/randn: per-seed determinism given a fixed partitioning") {
    // rand(seed) is seeded per partition (seed + partitionIndex): the same
    // plan with the same partitioning reproduces exactly; a different seed
    // diverges. This partitioning-dependence is WHY the inventory queries
    // never rely on rand for semantics (q73 uses mid/pid instead).
    def draw(seed: Long): Seq[(Long, Double, Double)] =
      spark.range(0, 10000, 1, 8)
        .select($"id", rand(seed).as("u"), randn(seed).as("g"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq.sortBy(_._1)
    val a = draw(42); val b = draw(42); val c = draw(43)
    assert(a == b, "same seed + same partitioning must reproduce exactly")
    assert(a != c, "different seed must diverge")
  }

  test("rand/randn: distribution sanity (mean/variance bounds)") {
    val r = spark.range(0, 200000, 1, 8)
      .select(rand(7).as("u"), randn(7).as("g"))
      .agg(avg($"u"), variance($"u"), min($"u"), max($"u"), avg($"g"), stddev($"g"))
      .collect().head
    assert(math.abs(r.getDouble(0) - 0.5) < 0.01, s"uniform mean ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 1.0 / 12) < 0.005, s"uniform var ${r.getDouble(1)}")
    assert(r.getDouble(2) >= 0.0 && r.getDouble(3) < 1.0, "uniform support [0,1)")
    assert(math.abs(r.getDouble(4)) < 0.02, s"normal mean ${r.getDouble(4)}")
    assert(math.abs(r.getDouble(5) - 1.0) < 0.02, s"normal stddev ${r.getDouble(5)}")
  }
}
