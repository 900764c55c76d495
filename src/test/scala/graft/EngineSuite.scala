package graft

import org.apache.spark.sql.functions._
import graft.engine.{MinHashAggregator, PlanAuditRule}

/** Unit tests for the custom engine layer: the codegen expression (both
  * eval paths), the typed UDAF's algebraic laws, and the plan-audit
  * counters.
  */
class EngineSuite extends GraftTestBase {
  import GraftTestBase.spark.implicits._

  private def cosRows(codegen: Boolean): Seq[Option[Double]] =
    withSQLConf("spark.sql.codegen.wholeStage" -> codegen.toString,
        "spark.sql.codegen.factoryMode" -> (if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN")) {
      Seq(
        (Array(1f, 0f), Array(1f, 0f)),     // identical → 1.0
        (Array(1f, 0f), Array(0f, 1f)),     // orthogonal → 0.0
        (Array(1f, 2f), Array(-1f, -2f)),   // opposite → -1.0
        (Array(0f, 0f), Array(1f, 1f)))     // zero vector → null
        .toDF("a", "b")
        .select(expr("cosine_sim(a, b)").as("c"))
        .collect().toSeq
        .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    }

  test("cosine_sim: codegen and interpreted paths agree on boundary vectors") {
    val cg = cosRows(codegen = true)
    val in = cosRows(codegen = false)
    assert(cg == in, s"codegen=$cg interpreted=$in")
    assert(cg(0).exists(c => math.abs(c - 1.0) < 1e-12))
    assert(cg(1).contains(0.0))
    assert(cg(2).exists(c => math.abs(c + 1.0) < 1e-12))
    assert(cg(3).isEmpty)
  }

  test("cosine_sim: null and length-mismatch inputs → null") {
    val r = spark.sql(
      """SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))),
                cosine_sim(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))""")
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("MinHashAggregator: merge is commutative, reduce matches merge") {
    val a = Array.tabulate(MinHashAggregator.K)(i => (i * 7 + 3).toLong)
    val b = Array.tabulate(MinHashAggregator.K)(i => (i * 5 + 11).toLong)
    val m1 = MinHashAggregator.merge(a.clone(), b.clone()).toSeq
    val m2 = MinHashAggregator.merge(b.clone(), a.clone()).toSeq
    assert(m1 == m2)
    val r = MinHashAggregator.reduce(MinHashAggregator.zero, a).toSeq
    assert(r == a.toSeq)
  }

  test("MinHashAggregator end-to-end: group sketch equals min of row sketches") {
    val mh = udaf(MinHashAggregator)
    val df = Seq(
      ("g1", Array.tabulate(32)(i => (i + 10).toLong)),
      ("g1", Array.tabulate(32)(i => (40 - i).toLong)),
      ("g2", Array.tabulate(32)(_ => 5L)))
      .toDF("g", "sig")
    val out = df.groupBy($"g").agg(mh($"sig").as("sketch"))
      .orderBy($"g").collect()
    val g1 = out(0).getSeq[Long](1)
    assert(g1 == (0 until 32).map(i => math.min(i + 10, 40 - i).toLong))
    assert(out(1).getSeq[Long](1).forall(_ == 5L))
  }

  test("PlanAuditRule records planned operators") {
    PlanAuditRule.reset()
    Tables.t(spark, sfDir, "region").groupBy("r_name").count().collect()
    val snap = PlanAuditRule.snapshot
    assert(snap.keys.exists(_.toLowerCase.contains("aggregate")), s"snapshot=$snap")
    assert(PlanAuditRule.cartesianCount == 0)
  }
}
