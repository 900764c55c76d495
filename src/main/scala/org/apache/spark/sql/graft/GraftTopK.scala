// In the org.apache.spark.sql namespace for access to private[sql]
// surfaces (Dataset.ofRows) — same placement the reference uses for its
// operators (org.apache.spark.sql.comet).
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Custom whole-operator pipeline (SURVEY §7.3 "custom LogicalPlan +
  * Rule/Strategy + SparkPlan" — the one extension mechanism beyond
  * expressions/aggregators): global top-K as a first-class operator.
  *
  * Semantics match `orderBy(order).limit(k)` but execute as two bounded
  * heaps: an O(k)-memory per-partition pass, a single narrow merge task
  * over ≤ k·P rows — never a global sort, never more than k rows per
  * partition crossing stages. At 100 TB this is the only viable top-K
  * shape; Spark's own TakeOrderedAndProject does the same, which makes
  * it the perfect differential target for the custom-operator machinery.
  */
case class GraftTopK(k: Int, order: Seq[SortOrder], child: LogicalPlan)
    extends UnaryNode {
  require(k > 0, s"GraftTopK requires k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = Some(k.toLong)
  override protected def withNewChildInternal(newChild: LogicalPlan): GraftTopK =
    copy(child = newChild)
}

/** Planner strategy: GraftTopK → GraftTopKExec. Injected by
  * GraftExtensions via injectPlannerStrategy.
  */
object GraftTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GraftTopK(k, order, child) =>
      GraftTopKExec(k, order, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class GraftTopKExec(k: Int, order: Seq[SortOrder], child: SparkPlan)
    extends UnaryExecNode {
  import org.apache.spark.sql.execution.metric.SQLMetrics

  override def output: Seq[Attribute] = child.output
  override def outputOrdering: Seq[SortOrder] = order

  /** Per-operator SQLMetrics (reference pattern: CometMetricNode /
    * metric.proto): how many rows each phase saw and kept — on a real
    * cluster this shows the ≤ k·P merge input directly in the UI.
    */
  override lazy val metrics = Map(
    "numInputRows" -> SQLMetrics.createMetric(sparkContext, "number of input rows"),
    "numMergeRows" -> SQLMetrics.createMetric(sparkContext, "rows entering final merge"),
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  /** bounded max-heap: keeps the k smallest rows under `ord` */
  private def localTopK(ord: Ordering[InternalRow],
      inMetric: Option[org.apache.spark.sql.execution.metric.SQLMetric])(
      iter: Iterator[InternalRow]): Iterator[InternalRow] = {
    val heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
    iter.foreach { row =>
      inMetric.foreach(_.add(1))
      if (heap.size < k) heap.enqueue(row.copy())
      else if (ord.lt(row, heap.head)) { heap.dequeue(); heap.enqueue(row.copy()) }
    }
    heap.dequeueAll.reverse.iterator // ascending under ord
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val ord = new LazilyGeneratedOrdering(order, child.output)
    val (inM, mergeM, outM) =
      (metrics("numInputRows"), metrics("numMergeRows"), metrics("numOutputRows"))
    child.execute()
      .mapPartitions(localTopK(ord, Some(inM)))   // ≤ k rows per partition
      .coalesce(1)                                // narrow merge, ≤ k·P rows total
      .mapPartitions(localTopK(ord, Some(mergeM)))// final k, sorted
      .map { r => outM.add(1); r }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GraftTopKExec =
    copy(child = newChild)
}

object GraftTopK {
  /** User API: global top-k of `df` under `cols` ordering through the
    * custom operator. Registers the strategy defensively for sessions
    * built without GraftExtensions.
    */
  def topK(df: DataFrame, k: Int, cols: Column*): DataFrame = {
    require(k > 0, s"topK requires k > 0, got $k")
    val ds = castToImpl(df)
    val spark = ds.sparkSession
    // Synchronized check-and-append: concurrent callers on one session
    // must not lose the update or install the strategy twice.
    GraftTopKStrategy.synchronized {
      if (!spark.experimental.extraStrategies.contains(GraftTopKStrategy) &&
          !spark.sessionState.planner.strategies.contains(GraftTopKStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ GraftTopKStrategy
    }
    val sortOrder = cols.map { c =>
      org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node) match {
        case so: SortOrder => so
        case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    Dataset.ofRows(spark, GraftTopK(k, sortOrder.toSeq, ds.logicalPlan))
  }
}
