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
        PlanAuditRule.evictIfOver()
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
  /** Retention cap: a long-lived session must not leak one map entry per
    * SQL execution forever, so once the map exceeds this many executions
    * the oldest half (by insertion order ≈ executionId order) is folded
    * into `evictedCounts` and dropped. Aggregate counts stay exact;
    * per-execution detail is only kept for the most recent window.
    */
  val maxTrackedExecutions = 1024

  /** executionId → distinct operator nodeNames planned in that execution */
  private[engine] val seen =
    new ConcurrentHashMap[String, java.util.Set[String]]()
  /** nodeName → executions count, folded in from evicted entries */
  private val evictedCounts = new ConcurrentHashMap[String, java.lang.Long]()
  /** executionIds that planned a cartesian — a 100 TB red flag unless dims-only */
  private val cartesianExecs = ConcurrentHashMap.newKeySet[String]()

  /** Fold the oldest half of `seen` into the aggregate and drop it.
    * Called under the class monitor from the rule when over cap; cheap
    * (runs once per maxTrackedExecutions/2 executions).
    */
  private[engine] def evictIfOver(): Unit = synchronized {
    if (seen.size > maxTrackedExecutions) {
      val ids = new java.util.ArrayList(seen.keySet())
      // executionIds are monotonically increasing longs (or "unknown");
      // numeric sort puts the oldest first
      ids.sort((a: String, b: String) =>
        java.lang.Long.compare(a.toLongOption.getOrElse(-1L), b.toLongOption.getOrElse(-1L)))
      ids.subList(0, seen.size - maxTrackedExecutions / 2).forEach { id =>
        val ops = seen.remove(id)
        if (ops != null) ops.forEach(op => evictedCounts.merge(op, 1L, (a, b) => a + b))
        cartesianExecs.remove(id)
      }
    }
  }

  /** operator nodeName → number of SQL executions that planned it
    * (recent window detail + exact counts folded in from evictions) */
  def snapshot: Map[String, Long] = {
    val b = collection.mutable.Map.empty[String, Long]
    evictedCounts.forEach((op, n) => b.update(op, n))
    seen.forEach((_, ops) => ops.forEach(op => b.update(op, b.getOrElse(op, 0L) + 1)))
    b.toMap
  }
  /** Number of executions currently tracked in detail (test hook). */
  def trackedExecutions: Int = seen.size
  def cartesianCount: Long = cartesianExecs.size.toLong
  def reset(): Unit = { seen.clear(); evictedCounts.clear(); cartesianExecs.clear() }
}
