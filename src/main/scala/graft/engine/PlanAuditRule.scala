package graft.engine

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{ColumnarRule, SparkPlan}
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Physical-plan audit rule (SURVEY §4.2: the shape of CometExecRule,
  * inverted — we don't swap operators, we *observe* them). Injected via
  * [[GraftExtensions]] as a post-columnar-transition rule; records which
  * physical operator classes each SQL execution plans and flags scale
  * hazards (cartesian products) so a fallback/coverage report is one map
  * away — the moral equivalent of the reference's `withInfo` tagging.
  *
  * Counts are per-execution, not per-rule-application: under AQE this
  * rule fires once per query stage and re-planning round, so raw
  * application counts would overstate operator usage. Keying by the SQL
  * executionId dedupes those re-fires (ADVICE r2).
  */
case class PlanAuditRule(session: SparkSession) extends ColumnarRule {

  override def postColumnarTransitions: org.apache.spark.sql.catalyst.rules.Rule[SparkPlan] =
    new org.apache.spark.sql.catalyst.rules.Rule[SparkPlan] {
      override val ruleName: String = "graft.PlanAudit"
      override def apply(plan: SparkPlan): SparkPlan = {
        val execId = Option(session.sparkContext
          .getLocalProperty("spark.sql.execution.id")).getOrElse("unknown")
        val ops = PlanAuditRule.seen
          .computeIfAbsent(execId, _ => ConcurrentHashMap.newKeySet[String]())
        plan.foreach { node =>
          ops.add(node.nodeName)
          node match {
            case _: CartesianProductExec => PlanAuditRule.cartesianExecs.add(execId)
            case _ => ()
          }
        }
        plan
      }
    }
}

object PlanAuditRule {
  /** executionId → distinct operator nodeNames planned in that execution */
  private[engine] val seen =
    new ConcurrentHashMap[String, java.util.Set[String]]()
  /** executionIds that planned a cartesian — a 100 TB red flag unless dims-only */
  private val cartesianExecs = ConcurrentHashMap.newKeySet[String]()

  /** operator nodeName → number of SQL executions that planned it */
  def snapshot: Map[String, Long] = {
    val b = collection.mutable.Map.empty[String, Long]
    seen.forEach((_, ops) => ops.forEach(op => b.update(op, b.getOrElse(op, 0L) + 1)))
    b.toMap
  }
  def cartesianCount: Long = cartesianExecs.size.toLong
  def reset(): Unit = { seen.clear(); cartesianExecs.clear() }
}
