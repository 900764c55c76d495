package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.CosineSimilarity

/** Engine plugin (SURVEY §7.1 "custom work": the extension/plugin
  * skeleton mirroring the reference's CometSparkSessionExtensions.scala:
  * 89-100 — ours injects functions and a plan-audit rule instead of
  * swapping execution).
  *
  * Activate with:
  *   .config("spark.sql.extensions", "graft.engine.GraftExtensions")
  *
  * Registers:
  *  - `cosine_sim(array<float>, array<float>)` — native codegen
  *    expression ([[CosineSimilarity]]) usable from SQL and expr().
  *  - [[PlanAuditRule]] — a columnar rule that tags coverage counters
  *    (the moral equivalent of the reference's fallback tagging).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
    ext.injectColumnar(session => PlanAuditRule(session))
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.GraftTopKStrategy)
  }
}

object GraftExtensions {
  /** (name, info, builder) triple for FunctionRegistry injection. */
  val cosineSimDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "cosine_sim takes exactly 2 arguments")
      CosineSimilarity(children.head, children(1))
    })
}
