package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.graft.GraftColumnarRule

/** User-facing answer to "why didn't my query use the columnar path" —
  * the reference's ExtendedExplainInfo surface
  * (spark/.../ExtendedExplainInfo.scala + `withInfo`,
  * CometSparkSessionExtensions.scala:283-295) realized over the
  * TreeNodeTag reasons GraftColumnarRule leaves on un-swapped nodes.
  *
  * Executed-plan based: run (or at least plan) the DataFrame first; with
  * AQE the tags live inside materialized query stages, which this
  * walker descends into.
  */
object GraftExplain {

  /** (nodeName, reason) for every candidate node the columnar rule
    * declined to swap, in plan order. Empty = everything eligible was
    * swapped (or the rule is disabled).
    */
  def fallbackReasons(df: DataFrame): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    def walk(n: SparkPlan): Unit = n match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other =>
        other.getTagValue(GraftColumnarRule.fallbackReasonTag)
          .foreach(r => out += other.nodeName -> r)
        other.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    out.result()
  }

  /** One-line-per-node report, "" when nothing fell back. */
  def report(df: DataFrame): String =
    fallbackReasons(df)
      .map { case (node, reason) => s"$node: row path — $reason" }
      .mkString("\n")

  /** The first ROW-side consumer above every columnar→row transition in
    * the executed plan — the operators where columnar coverage ends.
    * Complements [[fallbackReasons]]: reasons cover nodes the rule
    * considered and declined; this maps the row islands it never looks
    * at (Generate, SortMergeJoin, row Windows over computed keys, …).
    */
  def columnarBoundaries(df: DataFrame): Seq[String] = {
    val out = Seq.newBuilder[String]
    def walk(n: SparkPlan, parent: Option[String]): Unit = n match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan, parent)
      case q: QueryStageExec => walk(q.plan, parent)
      case other =>
        if (other.nodeName.contains("ColumnarToRow"))
          out += parent.getOrElse("<result>")
        other.children.foreach(walk(_, Some(other.nodeName)))
    }
    walk(df.queryExecution.executedPlan, None)
    out.result()
  }
}
