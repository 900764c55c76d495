package graft.engine

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{ColumnarRule, SparkPlan}
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Physical-plan audit rule (SURVEY §4.2: the shape of CometExecRule,
  * inverted — we don't swap operators, we *observe* them). Injected via
  * [[GraftExtensions]] as a post-columnar-transition rule; counts every
  * physical operator class that executes and flags scale hazards
  * (cartesian products) so a fallback/coverage report is one map away —
  * the moral equivalent of the reference's `withInfo` fallback tagging.
  */
case class PlanAuditRule(session: SparkSession) extends ColumnarRule {

  override def postColumnarTransitions: org.apache.spark.sql.catalyst.rules.Rule[SparkPlan] =
    new org.apache.spark.sql.catalyst.rules.Rule[SparkPlan] {
      override val ruleName: String = "graft.PlanAudit"
      override def apply(plan: SparkPlan): SparkPlan = {
        plan.foreach { node =>
          PlanAuditRule.seen
            .computeIfAbsent(node.nodeName, _ => new LongAdder)
            .increment()
          node match {
            case _: CartesianProductExec =>
              PlanAuditRule.cartesians.increment()
            case _ => ()
          }
        }
        plan
      }
    }
}

object PlanAuditRule {
  /** operator nodeName → times planned (process-wide, test-inspectable) */
  val seen = new ConcurrentHashMap[String, LongAdder]()
  /** cartesian products planned — a 100 TB red flag unless dims-only */
  val cartesians = new LongAdder

  def snapshot: Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    seen.forEach((k, v) => b += k -> v.sum())
    b.result()
  }
  def reset(): Unit = { seen.clear(); cartesians.reset() }
}
