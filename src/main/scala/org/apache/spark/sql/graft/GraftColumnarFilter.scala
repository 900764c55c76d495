// In the org.apache.spark.sql namespace alongside GraftTopK /
// GraftColumnarSelect — same placement the reference uses for its
// operators (org.apache.spark.sql.comet).
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarArray, ColumnarBatch, ColumnarMap, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

/** Zero-copy selection-vector wrapper: presents `sel.length` rows of
  * `base`, where output row i is base row `sel(i)`. The same idea as
  * DuckDB/Velox selection vectors; Spark's ColumnarBatch has no native
  * selection concept, so the indirection lives in the vector.
  *
  * Nested children (struct fields) are wrapped with the same selection
  * because ColumnarRow/getStruct address children by the parent's rowId.
  */
final class SelectedColumnVector(base: ColumnVector, sel: Array[Int])
    extends ColumnVector(base.dataType) {

  private[this] var children: java.util.HashMap[Integer, ColumnVector] = _

  override def close(): Unit = base.close()

  // CRITICAL: ColumnarToRowExec calls closeIfFreeable() on every consumed
  // batch. The default implementation closes the vector — which would free
  // the parquet reader's reused WritableColumnVectors mid-stream (NPE on
  // the next readBatch). Delegate, so the base's own reuse policy decides
  // (WritableColumnVector's override is a no-op).
  override def closeIfFreeable(): Unit = base.closeIfFreeable()

  // May overstate (base nulls outside the selection) — consumers only use
  // hasNull as a skip-null-checks fast path, so overstating is safe.
  override def hasNull: Boolean = base.hasNull
  override def numNulls: Int = {
    var c = 0; var i = 0
    while (i < sel.length) { if (base.isNullAt(sel(i))) c += 1; i += 1 }
    c
  }
  override def isNullAt(rowId: Int): Boolean = base.isNullAt(sel(rowId))
  override def getBoolean(rowId: Int): Boolean = base.getBoolean(sel(rowId))
  override def getByte(rowId: Int): Byte = base.getByte(sel(rowId))
  override def getShort(rowId: Int): Short = base.getShort(sel(rowId))
  override def getInt(rowId: Int): Int = base.getInt(sel(rowId))
  override def getLong(rowId: Int): Long = base.getLong(sel(rowId))
  override def getFloat(rowId: Int): Float = base.getFloat(sel(rowId))
  override def getDouble(rowId: Int): Double = base.getDouble(sel(rowId))
  override def getArray(rowId: Int): ColumnarArray = base.getArray(sel(rowId))
  override def getMap(rowId: Int): ColumnarMap = base.getMap(sel(rowId))
  override def getDecimal(rowId: Int, p: Int, s: Int): Decimal = base.getDecimal(sel(rowId), p, s)
  override def getUTF8String(rowId: Int): UTF8String = base.getUTF8String(sel(rowId))
  override def getBinary(rowId: Int): Array[Byte] = base.getBinary(sel(rowId))
  override def getChild(ordinal: Int): ColumnVector = {
    if (children == null) children = new java.util.HashMap[Integer, ColumnVector]()
    var c = children.get(ordinal)
    if (c == null) { c = new SelectedColumnVector(base.getChild(ordinal), sel); children.put(ordinal, c) }
    c
  }
}

/** Vectorized predicate kernels over ColumnarBatch with SQL three-valued
  * (Kleene) logic: eval fills `value`/`isNull` arrays column-at-a-time.
  * Compiled on the driver from a Catalyst Expression by
  * [[VecPredicate.compile]]; kernels are serializable case classes holding
  * column ordinals + literals, so executors re-bind per batch.
  *
  * Reference analogue: the native engine's vectorized filter
  * (datafusion-comet native/core/src/execution/operators/filter.rs) — here
  * the kernel layer is small because everything else IS Spark.
  */
sealed trait VecPredicate extends Serializable {
  /** Fill value(i)/isNull(i) for i < n. isNull(i)=true means SQL NULL. */
  def eval(b: ColumnarBatch, n: Int, value: Array[Boolean], isNull: Array[Boolean]): Unit
}

object VecPredicate {
  // op codes for comparisons
  final val EQ = 0; final val LT = 1; final val LE = 2; final val GT = 3; final val GE = 4

  private def cmpL(l: Long, r: Long, op: Int): Boolean = op match {
    case EQ => l == r; case LT => l < r; case LE => l <= r; case GT => l > r; case GE => l >= r
  }
  private def cmpD(l: Double, r: Double, op: Int): Boolean = op match {
    case EQ => l == r; case LT => l < r; case LE => l <= r; case GT => l > r; case GE => l >= r
  }
  private def cmpS(l: UTF8String, r: UTF8String, op: Int): Boolean = op match {
    case EQ => l.equals(r)
    case LT => l.compareTo(r) < 0; case LE => l.compareTo(r) <= 0
    case GT => l.compareTo(r) > 0; case GE => l.compareTo(r) >= 0
  }

  private def longGetter(v: ColumnVector, dt: DataType): Int => Long = dt match {
    case BooleanType => i => if (v.getBoolean(i)) 1L else 0L
    case ByteType => i => v.getByte(i).toLong
    case ShortType => i => v.getShort(i).toLong
    case IntegerType | DateType => i => v.getInt(i).toLong
    case LongType | TimestampType | TimestampNTZType => v.getLong
    case other => throw new IllegalStateException(s"not a long-family type: $other")
  }
  private def doubleGetter(v: ColumnVector, dt: DataType): Int => Double = dt match {
    case FloatType => i => v.getFloat(i).toDouble
    case DoubleType => v.getDouble
    case other => throw new IllegalStateException(s"not a double-family type: $other")
  }

  /** col-vs-col or col-vs-literal comparison over the integral/date/time/
    * boolean family, widened to Long. `r` < 0 means compare against `lit`.
    */
  final case class LongCmp(l: Int, ldt: DataType, r: Int, rdt: DataType, lit: Long, op: Int)
      extends VecPredicate {
    override def eval(b: ColumnarBatch, n: Int, value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val lv = b.column(l); val lg = longGetter(lv, ldt)
      if (r >= 0) {
        val rv = b.column(r); val rg = longGetter(rv, rdt)
        var i = 0
        while (i < n) {
          if (lv.isNullAt(i) || rv.isNullAt(i)) { isNull(i) = true; value(i) = false }
          else { isNull(i) = false; value(i) = cmpL(lg(i), rg(i), op) }
          i += 1
        }
      } else {
        var i = 0
        while (i < n) {
          if (lv.isNullAt(i)) { isNull(i) = true; value(i) = false }
          else { isNull(i) = false; value(i) = cmpL(lg(i), lit, op) }
          i += 1
        }
      }
    }
  }

  final case class DoubleCmp(l: Int, ldt: DataType, r: Int, rdt: DataType, lit: Double, op: Int)
      extends VecPredicate {
    override def eval(b: ColumnarBatch, n: Int, value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val lv = b.column(l); val lg = doubleGetter(lv, ldt)
      if (r >= 0) {
        val rv = b.column(r); val rg = doubleGetter(rv, rdt)
        var i = 0
        while (i < n) {
          if (lv.isNullAt(i) || rv.isNullAt(i)) { isNull(i) = true; value(i) = false }
          else { isNull(i) = false; value(i) = cmpD(lg(i), rg(i), op) }
          i += 1
        }
      } else {
        var i = 0
        while (i < n) {
          if (lv.isNullAt(i)) { isNull(i) = true; value(i) = false }
          else { isNull(i) = false; value(i) = cmpD(lg(i), lit, op) }
          i += 1
        }
      }
    }
  }

  final case class StringCmp(l: Int, r: Int, litBytes: Array[Byte], op: Int)
      extends VecPredicate {
    @transient private lazy val lit: UTF8String =
      if (litBytes == null) null else UTF8String.fromBytes(litBytes)
    override def eval(b: ColumnarBatch, n: Int, value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val lv = b.column(l)
      if (r >= 0) {
        val rv = b.column(r)
        var i = 0
        while (i < n) {
          if (lv.isNullAt(i) || rv.isNullAt(i)) { isNull(i) = true; value(i) = false }
          else { isNull(i) = false; value(i) = cmpS(lv.getUTF8String(i), rv.getUTF8String(i), op) }
          i += 1
        }
      } else {
        var i = 0
        while (i < n) {
          if (lv.isNullAt(i)) { isNull(i) = true; value(i) = false }
          else { isNull(i) = false; value(i) = cmpS(lv.getUTF8String(i), lit, op) }
          i += 1
        }
      }
    }
  }

  /** string col StartsWith/EndsWith/Contains literal (mode 0/1/2). */
  final case class StringMatch(l: Int, litBytes: Array[Byte], mode: Int) extends VecPredicate {
    @transient private lazy val lit: UTF8String = UTF8String.fromBytes(litBytes)
    override def eval(b: ColumnarBatch, n: Int, value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val lv = b.column(l)
      var i = 0
      while (i < n) {
        if (lv.isNullAt(i)) { isNull(i) = true; value(i) = false }
        else {
          isNull(i) = false
          val s = lv.getUTF8String(i)
          value(i) = mode match {
            case 0 => s.startsWith(lit); case 1 => s.endsWith(lit); case _ => s.contains(lit)
          }
        }
        i += 1
      }
    }
  }

  final case class IsNullP(col: Int, negate: Boolean) extends VecPredicate {
    override def eval(b: ColumnarBatch, n: Int, value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val v = b.column(col)
      var i = 0
      while (i < n) { isNull(i) = false; value(i) = v.isNullAt(i) != negate; i += 1 }
    }
  }

  final case class NotP(c: VecPredicate) extends VecPredicate {
    override def eval(b: ColumnarBatch, n: Int, value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      c.eval(b, n, value, isNull)
      var i = 0
      while (i < n) { if (!isNull(i)) value(i) = !value(i); i += 1 }
    }
  }

  /** Kleene AND: F∧x=F, T∧T=T, otherwise NULL. */
  final case class AndP(l: VecPredicate, r: VecPredicate) extends VecPredicate {
    override def eval(b: ColumnarBatch, n: Int, value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      l.eval(b, n, value, isNull)
      val rv = new Array[Boolean](n); val rn = new Array[Boolean](n)
      r.eval(b, n, rv, rn)
      var i = 0
      while (i < n) {
        if (!isNull(i) && !value(i)) () // F ∧ x = F
        else if (!rn(i) && !rv(i)) { value(i) = false; isNull(i) = false } // x ∧ F = F
        else if (isNull(i) || rn(i)) { isNull(i) = true; value(i) = false }
        else value(i) = true
        i += 1
      }
    }
  }

  /** Kleene OR: T∨x=T, F∨F=F, otherwise NULL. */
  final case class OrP(l: VecPredicate, r: VecPredicate) extends VecPredicate {
    override def eval(b: ColumnarBatch, n: Int, value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      l.eval(b, n, value, isNull)
      val rv = new Array[Boolean](n); val rn = new Array[Boolean](n)
      r.eval(b, n, rv, rn)
      var i = 0
      while (i < n) {
        if (!isNull(i) && value(i)) () // T ∨ x = T
        else if (!rn(i) && rv(i)) { value(i) = true; isNull(i) = false } // x ∨ T = T
        else if (isNull(i) || rn(i)) { isNull(i) = true; value(i) = false }
        else value(i) = false
        i += 1
      }
    }
  }

  /** bare boolean column used as a predicate */
  final case class BoolCol(col: Int) extends VecPredicate {
    override def eval(b: ColumnarBatch, n: Int, value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val v = b.column(col)
      var i = 0
      while (i < n) {
        if (v.isNullAt(i)) { isNull(i) = true; value(i) = false }
        else { isNull(i) = false; value(i) = v.getBoolean(i) }
        i += 1
      }
    }
  }

  private val longFamily: Set[DataType] =
    Set(BooleanType, ByteType, ShortType, IntegerType, LongType, DateType,
      TimestampType, TimestampNTZType)
  private val doubleFamily: Set[DataType] = Set(FloatType, DoubleType)

  private def litToLong(v: Any): Option[Long] = v match {
    case b: Boolean => Some(if (b) 1L else 0L)
    case b: Byte => Some(b.toLong); case s: Short => Some(s.toLong)
    case i: Int => Some(i.toLong); case l: Long => Some(l)
    case _ => None
  }
  private def litToDouble(v: Any): Option[Double] = v match {
    case f: Float => Some(f.toDouble); case d: Double => Some(d)
    case _ => None
  }

  private def flip(op: Int): Int = op match {
    case LT => GT; case LE => GE; case GT => LT; case GE => LE; case EQ => EQ
  }

  /** Compile a Catalyst predicate to a vectorized kernel tree, or return
    * a human-readable fallback reason (the reference's `withInfo`
    * pattern, CometSparkSessionExtensions.scala:283-295).
    */
  def compile(e: Expression, output: Seq[Attribute]): Either[String, VecPredicate] = {
    def ord(a: AttributeReference): Int = output.indexWhere(_.exprId == a.exprId)

    def cmp(left: Expression, right: Expression, op: Int): Either[String, VecPredicate] =
      (left, right) match {
        case (la: AttributeReference, ra: AttributeReference)
            if ord(la) >= 0 && ord(ra) >= 0 =>
          (la.dataType, ra.dataType) match {
            case (lt, rt) if longFamily(lt) && longFamily(rt) =>
              scala.Right(LongCmp(ord(la), lt, ord(ra), rt, 0L, op))
            case (lt, rt) if doubleFamily(lt) && doubleFamily(rt) =>
              scala.Right(DoubleCmp(ord(la), lt, ord(ra), rt, 0d, op))
            case (StringType, StringType) =>
              scala.Right(StringCmp(ord(la), ord(ra), null, op))
            case (lt, rt) => scala.Left(s"unsupported comparison types $lt vs $rt")
          }
        case (la: AttributeReference, Literal(v, dt)) if ord(la) >= 0 && v != null =>
          (la.dataType, dt) match {
            case (lt, rt) if longFamily(lt) && longFamily(rt) =>
              litToLong(v).toRight(s"non-integral literal $v")
                .map(l => LongCmp(ord(la), lt, -1, rt, l, op))
            case (lt, rt) if doubleFamily(lt) && doubleFamily(rt) =>
              litToDouble(v).toRight(s"non-double literal $v")
                .map(d => DoubleCmp(ord(la), lt, -1, rt, d, op))
            case (StringType, StringType) =>
              scala.Right(StringCmp(ord(la), -1, v.asInstanceOf[UTF8String].getBytes, op))
            case (lt, rt) => scala.Left(s"unsupported comparison types $lt vs $rt")
          }
        case (l: Literal, r: AttributeReference) => cmp(r, l, flip(op))
        case _ =>
          scala.Left(s"unsupported comparison operands: ${left.getClass.getSimpleName} vs " +
            s"${right.getClass.getSimpleName}")
      }

    e match {
      case And(l, r) => for { lp <- compile(l, output); rp <- compile(r, output) } yield AndP(lp, rp)
      case Or(l, r) => for { lp <- compile(l, output); rp <- compile(r, output) } yield OrP(lp, rp)
      case Not(c) => compile(c, output).map(NotP)
      case IsNull(a: AttributeReference) if output.exists(_.exprId == a.exprId) =>
        scala.Right(IsNullP(output.indexWhere(_.exprId == a.exprId), negate = false))
      case IsNotNull(a: AttributeReference) if output.exists(_.exprId == a.exprId) =>
        scala.Right(IsNullP(output.indexWhere(_.exprId == a.exprId), negate = true))
      case EqualTo(l, r) => cmp(l, r, EQ)
      case LessThan(l, r) => cmp(l, r, LT)
      case LessThanOrEqual(l, r) => cmp(l, r, LE)
      case GreaterThan(l, r) => cmp(l, r, GT)
      case GreaterThanOrEqual(l, r) => cmp(l, r, GE)
      case StartsWith(a: AttributeReference, Literal(v, StringType))
          if a.dataType == StringType && output.exists(_.exprId == a.exprId) && v != null =>
        scala.Right(StringMatch(output.indexWhere(_.exprId == a.exprId),
          v.asInstanceOf[UTF8String].getBytes, 0))
      case EndsWith(a: AttributeReference, Literal(v, StringType))
          if a.dataType == StringType && output.exists(_.exprId == a.exprId) && v != null =>
        scala.Right(StringMatch(output.indexWhere(_.exprId == a.exprId),
          v.asInstanceOf[UTF8String].getBytes, 1))
      case Contains(a: AttributeReference, Literal(v, StringType))
          if a.dataType == StringType && output.exists(_.exprId == a.exprId) && v != null =>
        scala.Right(StringMatch(output.indexWhere(_.exprId == a.exprId),
          v.asInstanceOf[UTF8String].getBytes, 2))
      case a: AttributeReference if a.dataType == BooleanType && output.exists(_.exprId == a.exprId) =>
        scala.Right(BoolCol(output.indexWhere(_.exprId == a.exprId)))
      case other => scala.Left(s"unsupported expression: ${other.getClass.getSimpleName}")
    }
  }
}

/** Columnar Filter: vectorized predicate evaluation directly on the
  * scan's ColumnarBatches (SURVEY §7.1's columnar-runtime deliverable
  * beyond attribute selection; reference JVM gate pattern:
  * spark/sql/comet/operators.scala:872-938 + rules/CometExecRule.scala:
  * 258-393, native kernel: core/src/execution/operators/filter.rs).
  *
  * Three per-batch outcomes: all rows pass → the input batch flows
  * through untouched (zero work); none pass → the batch is dropped
  * (downstream never sees it); partial → a selection vector wraps each
  * column ([[SelectedColumnVector]]) with zero data copied. Spark
  * inserts ColumnarToRow above automatically.
  */
case class GraftColumnarFilterExec(condition: Expression, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def supportsColumnar: Boolean = true
  override def outputPartitioning = child.outputPartitioning
  override def outputOrdering = child.outputOrdering

  override lazy val metrics = Map(
    "numInputRows" -> SQLMetrics.createMetric(sparkContext, "number of input rows"),
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numBatches" -> SQLMetrics.createMetric(sparkContext, "number of batches"))

  override def doExecuteColumnar(): RDD[ColumnarBatch] = {
    val pred = VecPredicate.compile(condition, child.output) match {
      case scala.Right(p) => p
      case scala.Left(reason) =>
        // The rule only builds this node for compilable predicates; an AQE
        // re-plan can't widen the predicate, so this is unreachable.
        throw new IllegalStateException(s"uncompilable columnar predicate: $reason")
    }
    val (inM, outM, batchM) = (metrics("numInputRows"), metrics("numOutputRows"), metrics("numBatches"))
    child.executeColumnar().mapPartitionsInternal { iter =>
      iter.flatMap { batch =>
        val n = batch.numRows()
        batchM.add(1); inM.add(n)
        if (n == 0) None
        else {
          val value = new Array[Boolean](n); val isNull = new Array[Boolean](n)
          pred.eval(batch, n, value, isNull)
          var count = 0; var i = 0
          while (i < n) { if (value(i) && !isNull(i)) count += 1; i += 1 }
          outM.add(count)
          if (count == 0) None
          else if (count == n) Some(batch)
          else {
            val sel = new Array[Int](count)
            var j = 0; i = 0
            while (i < n) { if (value(i) && !isNull(i)) { sel(j) = i; j += 1 }; i += 1 }
            val cols = new Array[ColumnVector](batch.numCols())
            var c = 0
            while (c < cols.length) { cols(c) = new SelectedColumnVector(batch.column(c), sel); c += 1 }
            Some(new ColumnarBatch(cols, count))
          }
        }
      }
    }
  }

  /** Row fallback (planner routes columnar since supportsColumnar). */
  override protected def doExecute(): RDD[InternalRow] = {
    val cond = condition
    val attrs = child.output
    child.execute().mapPartitionsWithIndexInternal { (index, iter) =>
      val predicate = Predicate.create(cond, attrs)
      predicate.initialize(index)
      iter.filter(predicate.eval)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GraftColumnarFilterExec =
    copy(child = newChild)
}
