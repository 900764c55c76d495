package org.apache.spark.sql.execution.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.execution.vectorized.ConstantColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

/** One output column of one Expand projection: a zero-copy reference to
  * an input column, or a constant (null-grouping column / grouping-id
  * literal).
  */
sealed trait ExpandCol extends Serializable
final case class InputCol(ord: Int) extends ExpandCol
final case class ConstCol(value: Any, dt: DataType) extends ExpandCol

/** Columnar Expand: emits each input batch N times, once per
  * projection — input columns pass through zero-copy, null/literal
  * columns are O(1) [[ConstantColumnVector]]s. This is the
  * rollup/cube/grouping-sets fan-out (reference: a dedicated native
  * kernel, native/core/src/execution/operators/expand.rs, serde
  * operators.scala:1143-1207); with it, the Expand → partial grouped
  * agg pipeline stays on ColumnarBatch from the scan to the exchange.
  *
  * Row Expand evaluates P projections × R rows with per-row copies;
  * this node does P × C column references with NO per-row work at all
  * — the per-row cost moves to the consumer, which for the columnar
  * grouped agg is the same accumulate loop it would run anyway.
  *
  * Scale note: like Spark's ExpandExec, output partitioning is unknown
  * (each input row yields N rows) and output volume is N× the input —
  * the partial aggregation directly above absorbs it before the
  * shuffle, which is why this pairing matters.
  */
case class GraftColumnarExpandExec(
    output: Seq[Attribute], projections: Seq[Seq[ExpandCol]], child: SparkPlan)
    extends UnaryExecNode {

  override def supportsColumnar: Boolean = true
  override def outputPartitioning: Partitioning = UnknownPartitioning(0)

  override lazy val metrics = Map(
    "numInputBatches" -> SQLMetrics.createMetric(sparkContext, "number of input batches"),
    "numOutputBatches" -> SQLMetrics.createMetric(sparkContext, "number of output batches"),
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def doExecuteColumnar(): RDD[ColumnarBatch] = {
    val projs = projections.map(_.toArray).toArray
    val (inB, outB, outR) = (metrics("numInputBatches"),
      metrics("numOutputBatches"), metrics("numOutputRows"))

    child.executeColumnar().mapPartitionsInternal { iter =>
      iter.flatMap { batch =>
        inB.add(1)
        val n = batch.numRows()
        projs.iterator.map { proj =>
          val cols = new Array[ColumnVector](proj.length)
          var c = 0
          while (c < proj.length) {
            cols(c) = proj(c) match {
              case InputCol(ord) => batch.column(ord)
              case ConstCol(v, dt) => GraftColumnarExpandExec.constVector(n, v, dt)
            }
            c += 1
          }
          outB.add(1); outR.add(n)
          new ColumnarBatch(cols, n)
        }
      }
    }
  }

  /** Row fallback — unreachable: the rule only swaps over columnar
    * children and supportsColumnar routes planning to the batch path. */
  override protected def doExecute(): RDD[InternalRow] =
    throw new IllegalStateException("GraftColumnarExpand row path not implemented")

  override protected def withNewChildInternal(newChild: SparkPlan): GraftColumnarExpandExec =
    copy(child = newChild)
}

object GraftColumnarExpandExec {
  /** Constant-vector-representable literal types (null is fine for ANY
    * type — setNull covers it). */
  def supportedConstType(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | DateType | TimestampType |
         TimestampNTZType => true
    case _ => false
  }

  private[graft] def constVector(n: Int, v: Any, dt: DataType): ConstantColumnVector = {
    val c = new ConstantColumnVector(n, dt)
    if (v == null) c.setNull()
    else dt match {
      case BooleanType => c.setBoolean(v.asInstanceOf[Boolean])
      case ByteType => c.setByte(v.asInstanceOf[Byte])
      case ShortType => c.setShort(v.asInstanceOf[Short])
      case IntegerType | DateType => c.setInt(v.asInstanceOf[Int])
      case LongType | TimestampType | TimestampNTZType => c.setLong(v.asInstanceOf[Long])
      case FloatType => c.setFloat(v.asInstanceOf[Float])
      case DoubleType => c.setDouble(v.asInstanceOf[Double])
      case StringType => c.setUtf8String(v.asInstanceOf[UTF8String])
      case other => throw new IllegalStateException(s"bad const type $other")
    }
    c
  }
}
