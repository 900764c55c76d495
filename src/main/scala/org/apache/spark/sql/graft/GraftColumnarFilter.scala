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
  * (Kleene) logic. `eval` runs over a POSITION domain 0..len: position j
  * addresses batch row `sel(j)` (or j itself when `sel` is null — the
  * identity selection), writing value/isNull at position j. The filter
  * splits the top-level conjunction and evaluates conjunct-by-conjunct
  * over a shrinking selection (short-circuit: later conjuncts only touch
  * rows that survived earlier ones) — valid because a filter keeps only
  * rows where every conjunct is TRUE, so FALSE and NULL drop alike at
  * the top level; full Kleene logic still applies INSIDE any OR/NOT
  * subtree. Kernels are serializable case classes holding column
  * ordinals + literals, compiled on the driver by
  * [[VecPredicate.compile]].
  *
  * Reference analogue: the native engine's vectorized filter
  * (datafusion-comet native/core/src/execution/operators/filter.rs) — here
  * the kernel layer is small because everything else IS Spark.
  */
sealed trait VecPredicate extends Serializable {
  /** Fill value(j)/isNull(j) for positions j < len, where position j is
    * batch row sel(j) (identity if sel is null). isNull = SQL NULL.
    */
  def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
      value: Array[Boolean], isNull: Array[Boolean]): Unit
}

object VecPredicate {
  // op codes for comparisons
  final val EQ = 0; final val LT = 1; final val LE = 2; final val GT = 3; final val GE = 4

  @inline private def row(sel: Array[Int], j: Int): Int = if (sel == null) j else sel(j)

  private def cmpL(l: Long, r: Long, op: Int): Boolean = op match {
    case EQ => l == r; case LT => l < r; case LE => l <= r; case GT => l > r; case GE => l >= r
  }
  private def cmpD(l: Double, r: Double, op: Int): Boolean = {
    // Spark SQL double semantics, NOT raw IEEE: NaN equals itself and is
    // GREATER than any other value (BinaryComparison compares through
    // the type's ordering), -0.0 == 0.0. Plain `<`/`==` would silently
    // drop NaN rows where the row path keeps them — caught by the
    // CaseWhenL parity test, latent since the filter's first version.
    val c = org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(l, r)
    op match {
      case EQ => c == 0; case LT => c < 0; case LE => c <= 0; case GT => c > 0; case GE => c >= 0
    }
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
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val lv = b.column(l); val lg = longGetter(lv, ldt)
      if (r >= 0) {
        val rv = b.column(r); val rg = longGetter(rv, rdt)
        var j = 0
        while (j < len) {
          val i = row(sel, j)
          if (lv.isNullAt(i) || rv.isNullAt(i)) { isNull(j) = true; value(j) = false }
          else { isNull(j) = false; value(j) = cmpL(lg(i), rg(i), op) }
          j += 1
        }
      } else {
        var j = 0
        while (j < len) {
          val i = row(sel, j)
          if (lv.isNullAt(i)) { isNull(j) = true; value(j) = false }
          else { isNull(j) = false; value(j) = cmpL(lg(i), lit, op) }
          j += 1
        }
      }
    }
  }

  final case class DoubleCmp(l: Int, ldt: DataType, r: Int, rdt: DataType, lit: Double, op: Int)
      extends VecPredicate {
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val lv = b.column(l); val lg = doubleGetter(lv, ldt)
      if (r >= 0) {
        val rv = b.column(r); val rg = doubleGetter(rv, rdt)
        var j = 0
        while (j < len) {
          val i = row(sel, j)
          if (lv.isNullAt(i) || rv.isNullAt(i)) { isNull(j) = true; value(j) = false }
          else { isNull(j) = false; value(j) = cmpD(lg(i), rg(i), op) }
          j += 1
        }
      } else {
        var j = 0
        while (j < len) {
          val i = row(sel, j)
          if (lv.isNullAt(i)) { isNull(j) = true; value(j) = false }
          else { isNull(j) = false; value(j) = cmpD(lg(i), lit, op) }
          j += 1
        }
      }
    }
  }

  final case class StringCmp(l: Int, r: Int, litBytes: Array[Byte], op: Int)
      extends VecPredicate {
    @transient private lazy val lit: UTF8String =
      if (litBytes == null) null else UTF8String.fromBytes(litBytes)
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val lv = b.column(l)
      if (r >= 0) {
        val rv = b.column(r)
        var j = 0
        while (j < len) {
          val i = row(sel, j)
          if (lv.isNullAt(i) || rv.isNullAt(i)) { isNull(j) = true; value(j) = false }
          else { isNull(j) = false; value(j) = cmpS(lv.getUTF8String(i), rv.getUTF8String(i), op) }
          j += 1
        }
      } else {
        val litLocal = lit
        var j = 0
        while (j < len) {
          val i = row(sel, j)
          if (lv.isNullAt(i)) { isNull(j) = true; value(j) = false }
          else { isNull(j) = false; value(j) = cmpS(lv.getUTF8String(i), litLocal, op) }
          j += 1
        }
      }
    }
  }

  /** Comparison over COMPUTED string operands: both sides compile through
    * the projection's [[VecStrExpr]] kernel language (substring, case
    * mapping, trim, concat, integral→string cast, md5 — the
    * hash-threshold sampling predicate `substring(md5(key),1,n) < '...'`
    * lands here). The kernels evaluate rows 0..numRows of the batch (no
    * selection view), so this predicate computes the full batch and then
    * reads results through the selection — exact when it is the only /
    * first conjunct (the sampling shape); under a pre-shrunk selection it
    * does bounded extra work but stays correct.
    */
  final case class ComputedStrCmp(lk: VecStrExpr, rk: VecStrExpr, op: Int)
      extends VecPredicate {
    @transient private lazy val scratch = new StrScratch
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val n = b.numRows()
      scratch.reset()
      val lv = scratch.s(n); val ln = scratch.b(n)
      val rv = scratch.s(n); val rn = scratch.b(n)
      lk.eval(b, n, lv, ln, scratch)
      rk.eval(b, n, rv, rn, scratch)
      var j = 0
      while (j < len) {
        val i = row(sel, j)
        if (ln(i) || rn(i)) { isNull(j) = true; value(j) = false }
        else { isNull(j) = false; value(j) = cmpS(lv(i), rv(i), op) }
        j += 1
      }
    }
  }

  /** IN over a COMPUTED string operand (substring(c_phone,1,2) IN
    * ('13','31',…) — the TPC-H Q22 country-code gate, census: 3 hits).
    * Full-batch kernel eval + hash-set membership per selected row;
    * non-null literals only, so the Kleene result is NULL iff the
    * operand is NULL — same contract as [[StringIn]]. The same
    * totality + allocation-profile gates as [[ComputedStrCmp]] apply at
    * compile. */
  final case class ComputedStrIn(k: VecStrExpr, litBytes: Array[Array[Byte]])
      extends VecPredicate {
    @transient private lazy val scratch = new StrScratch
    @transient private lazy val set: java.util.HashSet[UTF8String] = {
      val s = new java.util.HashSet[UTF8String](litBytes.length * 2)
      litBytes.foreach(bs => s.add(UTF8String.fromBytes(bs)))
      s
    }
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val n = b.numRows()
      scratch.reset()
      val lv = scratch.s(n); val ln = scratch.b(n)
      k.eval(b, n, lv, ln, scratch)
      val setLocal = set
      var j = 0
      while (j < len) {
        val i = row(sel, j)
        if (ln(i)) { isNull(j) = true; value(j) = false }
        else { isNull(j) = false; value(j) = setLocal.contains(lv(i)) }
        j += 1
      }
    }
  }

  /** IN over a COMPUTED long/int operand ((c_custkey % 7) IN (1,3,5) —
    * the Q22 country-code gate on the integral lane). Full-batch total
    * kernel eval + sorted-array binary search per selected row. */
  final case class ComputedLongIn(k: VecLongExpr, sorted: Array[Long])
      extends VecPredicate {
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val n = b.numRows()
      val lv = new Array[Long](n); val ln = new Array[Boolean](n)
      k.eval(b, n, lv, ln)
      var j = 0
      while (j < len) {
        val i = row(sel, j)
        if (ln(i)) { isNull(j) = true; value(j) = false }
        else {
          isNull(j) = false
          value(j) = java.util.Arrays.binarySearch(sorted, lv(i)) >= 0
        }
        j += 1
      }
    }
  }

  /** is(not)null over a COMPUTED operand that the null-chain rewrite
    * cannot reduce (conditional shapes, non-chain math): evaluate the
    * operand through its TOTAL lane kernel and read the null flags —
    * full-batch eval, so the totality gate is mandatory (the compile
    * sites enforce it). One wrapper per lane. */
  final case class LongNullProbeP(k: VecLongExpr, negate: Boolean) extends VecPredicate {
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val n = b.numRows()
      val lv = new Array[Long](n); val ln = new Array[Boolean](n)
      k.eval(b, n, lv, ln)
      var j = 0
      while (j < len) {
        isNull(j) = false
        value(j) = ln(row(sel, j)) != negate
        j += 1
      }
    }
  }
  final case class DblNullProbeP(k: VecNumExpr, negate: Boolean) extends VecPredicate {
    @transient private lazy val scratch = new VecScratch
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val n = b.numRows()
      scratch.reset()
      val lv = scratch.d(n); val ln = scratch.b(n)
      k.eval(b, n, lv, ln, scratch)
      var j = 0
      while (j < len) {
        isNull(j) = false
        value(j) = ln(row(sel, j)) != negate
        j += 1
      }
    }
  }
  final case class StrNullProbeP(k: VecStrExpr, negate: Boolean) extends VecPredicate {
    @transient private lazy val scratch = new StrScratch
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val n = b.numRows()
      scratch.reset()
      val lv = scratch.s(n); val ln = scratch.b(n)
      k.eval(b, n, lv, ln, scratch)
      var j = 0
      while (j < len) {
        isNull(j) = false
        value(j) = ln(row(sel, j)) != negate
        j += 1
      }
    }
  }

  /** Comparison over COMPUTED long/int operands compiled through the
    * long-lane kernel language (size(array), size(split(text, ' ')) token
    * counts, conditional flags) — the quality-gate predicate shape.
    * Full-batch eval + selection-indexed compare, like [[ComputedStrCmp]].
    * Every long-lane kernel is total and allocation-free, so no extra
    * swap gate is needed. */
  final case class ComputedLongCmp(lk: VecLongExpr, rk: VecLongExpr, op: Int)
      extends VecPredicate {
    @transient private[this] var lv: Array[Long] = null
    @transient private[this] var ln: Array[Boolean] = null
    @transient private[this] var rv: Array[Long] = null
    @transient private[this] var rn: Array[Boolean] = null
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val n = b.numRows()
      if (lv == null || lv.length < n) {
        lv = new Array[Long](n); ln = new Array[Boolean](n)
        rv = new Array[Long](n); rn = new Array[Boolean](n)
      }
      lk.eval(b, n, lv, ln)
      rk.eval(b, n, rv, rn)
      var j = 0
      while (j < len) {
        val i = row(sel, j)
        if (ln(i) || rn(i)) { isNull(j) = true; value(j) = false }
        else { isNull(j) = false; value(j) = cmpL(lv(i), rv(i), op) }
        j += 1
      }
    }
  }

  /** Comparison over COMPUTED double operands compiled through the
    * double kernel lane (ratios, math functions, decimal-as-double) —
    * the quality-gate predicate shape (chars/tokens ratio > 0.1).
    * Full-batch eval + selection-indexed compare like
    * [[ComputedLongCmp]]; the compile gate admits only TOTAL double
    * kernels (the full batch includes rows earlier conjuncts excluded),
    * and the compare itself is [[cmpD]] — Spark's SQL double ordering
    * (NaN greatest, -0.0 == 0.0), not raw IEEE. A/B sf0.1 interleaved
    * min-of-9: ratio gate 0.98x, sqrt gate 0.98x. */
  final case class ComputedDblCmp(lk: VecNumExpr, rk: VecNumExpr, op: Int)
      extends VecPredicate {
    @transient private[this] var lv: Array[Double] = null
    @transient private[this] var ln: Array[Boolean] = null
    @transient private[this] var rv: Array[Double] = null
    @transient private[this] var rn: Array[Boolean] = null
    @transient private[this] var scratch: VecScratch = null
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val n = b.numRows()
      if (lv == null || lv.length < n) {
        lv = new Array[Double](n); ln = new Array[Boolean](n)
        rv = new Array[Double](n); rn = new Array[Boolean](n)
      }
      if (scratch == null) scratch = new VecScratch
      scratch.reset()
      lk.eval(b, n, lv, ln, scratch)
      scratch.reset()
      rk.eval(b, n, rv, rn, scratch)
      var j = 0
      while (j < len) {
        val i = row(sel, j)
        if (ln(i) || rn(i)) { isNull(j) = true; value(j) = false }
        else { isNull(j) = false; value(j) = cmpD(lv(i), rv(i), op) }
        j += 1
      }
    }
  }

  /** string col StartsWith/EndsWith/Contains literal (mode 0/1/2). */
  final case class StringMatch(l: Int, litBytes: Array[Byte], mode: Int) extends VecPredicate {
    @transient private lazy val lit: UTF8String = UTF8String.fromBytes(litBytes)
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val lv = b.column(l)
      val litLocal = lit
      var j = 0
      while (j < len) {
        val i = row(sel, j)
        if (lv.isNullAt(i)) { isNull(j) = true; value(j) = false }
        else {
          isNull(j) = false
          val s = lv.getUTF8String(i)
          value(j) = mode match {
            case 0 => s.startsWith(litLocal); case 1 => s.endsWith(litLocal); case _ => s.contains(litLocal)
          }
        }
        j += 1
      }
    }
  }

  /** col IN (non-null literals), long family. Sorted array + binary
    * search: O(log k) per row, no boxing. A null value yields NULL
    * (Spark's In with an all-non-null list); rows where no element
    * matches yield FALSE.
    */
  final case class LongIn(col: Int, dt: DataType, sorted: Array[Long]) extends VecPredicate {
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val v = b.column(col); val g = longGetter(v, dt)
      var j = 0
      while (j < len) {
        val i = row(sel, j)
        if (v.isNullAt(i)) { isNull(j) = true; value(j) = false }
        else { isNull(j) = false; value(j) = java.util.Arrays.binarySearch(sorted, g(i)) >= 0 }
        j += 1
      }
    }
  }

  /** col IN (non-null literals), string. Hash set of UTF8String. */
  final case class StringIn(col: Int, litBytes: Array[Array[Byte]]) extends VecPredicate {
    @transient private lazy val set: java.util.HashSet[UTF8String] = {
      val s = new java.util.HashSet[UTF8String](litBytes.length * 2)
      litBytes.foreach(bs => s.add(UTF8String.fromBytes(bs)))
      s
    }
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val v = b.column(col)
      val setLocal = set
      var j = 0
      while (j < len) {
        val i = row(sel, j)
        if (v.isNullAt(i)) { isNull(j) = true; value(j) = false }
        else { isNull(j) = false; value(j) = setLocal.contains(v.getUTF8String(i)) }
        j += 1
      }
    }
  }

  /** might_contain(bloomBytes, xxhash64(key)) — the 100 TB pre-join
    * probe, both the explicit q76 shape and Spark's own
    * InjectRuntimeFilter product on shuffle joins. The bloom bytes come
    * from a scalar subquery expression: the exec's executeQuery has
    * already waited for subqueries before doExecuteColumnar, and the
    * serialized expression carries the updated result to executors —
    * the same contract the row FilterExec relies on — so the filter
    * deserializes ONCE per task at first batch. The probe itself runs
    * Spark's own statics (XXH64.hashLong/hashInt with the expression's
    * seed, BloomFilter.readFrom/mightContainLong), bit-exact by
    * construction. Replicates BloomFilterMightContain.eval: null bloom
    * bytes → NULL for every row; a NULL key hashes to the bare seed
    * (HashExpression skips null children), so the value lane is
    * never null.
    */
  final case class BloomContainsP(bloomExpr: Expression, keyOrd: Int,
      keyIsInt: Boolean, seed: Long) extends VecPredicate {
    @transient private var inited = false
    @transient private var bloom: org.apache.spark.util.sketch.BloomFilter = _
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      if (!inited) {
        val bytes = bloomExpr.eval(InternalRow.empty)
        bloom = if (bytes == null) null
          else org.apache.spark.util.sketch.BloomFilter.readFrom(
            bytes.asInstanceOf[Array[Byte]])
        inited = true
      }
      val bl = bloom
      if (bl == null) {
        java.util.Arrays.fill(isNull, 0, len, true)
        java.util.Arrays.fill(value, 0, len, false)
        return
      }
      val v = b.column(keyOrd)
      var j = 0
      while (j < len) {
        val i = row(sel, j)
        val h =
          if (v.isNullAt(i)) seed
          else if (keyIsInt) XXH64.hashInt(v.getInt(i), seed)
          else XXH64.hashLong(v.getLong(i), seed)
        isNull(j) = false
        value(j) = bl.mightContainLong(h)
        j += 1
      }
    }
  }

  final case class IsNullP(col: Int, negate: Boolean) extends VecPredicate {
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val v = b.column(col)
      var j = 0
      while (j < len) { isNull(j) = false; value(j) = v.isNullAt(row(sel, j)) != negate; j += 1 }
    }
  }

  final case class NotP(c: VecPredicate) extends VecPredicate {
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      c.eval(b, sel, len, value, isNull)
      var j = 0
      while (j < len) { if (!isNull(j)) value(j) = !value(j); j += 1 }
    }
  }

  /** Kleene AND: F∧x=F, T∧T=T, otherwise NULL. (Non-top-level; the
    * top-level conjunction is short-circuited by the exec instead.) */
  final case class AndP(l: VecPredicate, r: VecPredicate) extends VecPredicate {
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      l.eval(b, sel, len, value, isNull)
      val rv = new Array[Boolean](len); val rn = new Array[Boolean](len)
      r.eval(b, sel, len, rv, rn)
      var j = 0
      while (j < len) {
        if (!isNull(j) && !value(j)) () // F ∧ x = F
        else if (!rn(j) && !rv(j)) { value(j) = false; isNull(j) = false } // x ∧ F = F
        else if (isNull(j) || rn(j)) { isNull(j) = true; value(j) = false }
        else value(j) = true
        j += 1
      }
    }
  }

  /** Kleene OR: T∨x=T, F∨F=F, otherwise NULL. */
  final case class OrP(l: VecPredicate, r: VecPredicate) extends VecPredicate {
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      l.eval(b, sel, len, value, isNull)
      val rv = new Array[Boolean](len); val rn = new Array[Boolean](len)
      r.eval(b, sel, len, rv, rn)
      var j = 0
      while (j < len) {
        if (!isNull(j) && value(j)) () // T ∨ x = T
        else if (!rn(j) && rv(j)) { value(j) = true; isNull(j) = false } // x ∨ T = T
        else if (isNull(j) || rn(j)) { isNull(j) = true; value(j) = false }
        else value(j) = false
        j += 1
      }
    }
  }

  /** rlike against a LITERAL pattern: the same java.util.regex Pattern
    * the row expression compiles (find(0) partial-match semantics).
    * Compiled once on the driver and shipped — Pattern is serializable.
    * Allocation note: matching reads through UTF8String.toString like
    * the row path does; regex cost dominates the copy either way. */
  final case class RegexFindP(col: Int, pattern: java.util.regex.Pattern)
      extends VecPredicate {
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val v = b.column(col)
      var j = 0
      while (j < len) {
        val i = row(sel, j)
        if (v.isNullAt(i)) { isNull(j) = true; value(j) = false }
        else {
          isNull(j) = false
          value(j) = pattern.matcher(v.getUTF8String(i).toString).find(0)
        }
        j += 1
      }
    }
  }

  /** IF(c, t, f) with a BOOLEAN result: Spark's If takes the true
    * branch only when the condition is exactly TRUE (NULL routes to the
    * false branch, unlike Kleene AND/OR), then the chosen branch's
    * value/null flows through. Branches evaluate eagerly — the
    * predicate language is throw-free, so the unselected branch's
    * evaluation is unobservable. */
  final case class IfP(c: VecPredicate, t: VecPredicate, f: VecPredicate)
      extends VecPredicate {
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val cv = new Array[Boolean](len); val cn = new Array[Boolean](len)
      c.eval(b, sel, len, cv, cn)
      t.eval(b, sel, len, value, isNull)
      val fv = new Array[Boolean](len); val fn = new Array[Boolean](len)
      f.eval(b, sel, len, fv, fn)
      var j = 0
      while (j < len) {
        if (!(cv(j) && !cn(j))) { value(j) = fv(j); isNull(j) = fn(j) }
        j += 1
      }
    }
  }

  /** CASE WHEN with BOOLEAN branch values: first condition that is
    * exactly TRUE selects its branch; none → else (or NULL). */
  final case class CaseWhenP(branches: Seq[(VecPredicate, VecPredicate)],
      els: Option[VecPredicate]) extends VecPredicate {
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      java.util.Arrays.fill(value, 0, len, false)
      java.util.Arrays.fill(isNull, 0, len, true)
      val undecided = new Array[Boolean](len)
      java.util.Arrays.fill(undecided, 0, len, true)
      val tv = new Array[Boolean](len); val tn = new Array[Boolean](len)
      branches.foreach { case (p, v) =>
        val pv = new Array[Boolean](len); val pn = new Array[Boolean](len)
        p.eval(b, sel, len, pv, pn)
        v.eval(b, sel, len, tv, tn)
        var j = 0
        while (j < len) {
          if (undecided(j) && pv(j) && !pn(j)) {
            undecided(j) = false; value(j) = tv(j); isNull(j) = tn(j)
          }
          j += 1
        }
      }
      els.foreach { e =>
        e.eval(b, sel, len, tv, tn)
        var j = 0
        while (j < len) {
          if (undecided(j)) { value(j) = tv(j); isNull(j) = tn(j) }
          j += 1
        }
      }
    }
  }

  /** null-safe equality (`<=>`) over computed lane kernels — never
    * NULL: both-null is TRUE, one-null FALSE, else the lane's equality
    * (doubles through Spark's ordering: NaN <=> NaN is TRUE). */
  final case class NullSafeEqL(lk: VecLongExpr, rk: VecLongExpr) extends VecPredicate {
    @transient private[this] var lv: Array[Long] = null
    @transient private[this] var ln: Array[Boolean] = null
    @transient private[this] var rv: Array[Long] = null
    @transient private[this] var rn: Array[Boolean] = null
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val n = b.numRows()
      if (lv == null || lv.length < n) {
        lv = new Array[Long](n); ln = new Array[Boolean](n)
        rv = new Array[Long](n); rn = new Array[Boolean](n)
      }
      lk.eval(b, n, lv, ln)
      rk.eval(b, n, rv, rn)
      var j = 0
      while (j < len) {
        val i = row(sel, j)
        isNull(j) = false
        value(j) = if (ln(i) || rn(i)) ln(i) && rn(i) else lv(i) == rv(i)
        j += 1
      }
    }
  }

  final case class NullSafeEqD(lk: VecNumExpr, rk: VecNumExpr) extends VecPredicate {
    @transient private[this] var scratch: VecScratch = null
    @transient private[this] var lv: Array[Double] = null
    @transient private[this] var ln: Array[Boolean] = null
    @transient private[this] var rv: Array[Double] = null
    @transient private[this] var rn: Array[Boolean] = null
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val n = b.numRows()
      if (scratch == null) scratch = new VecScratch
      if (lv == null || lv.length < n) {
        lv = new Array[Double](n); ln = new Array[Boolean](n)
        rv = new Array[Double](n); rn = new Array[Boolean](n)
      }
      scratch.reset(); lk.eval(b, n, lv, ln, scratch)
      scratch.reset(); rk.eval(b, n, rv, rn, scratch)
      var j = 0
      while (j < len) {
        val i = row(sel, j)
        isNull(j) = false
        value(j) = if (ln(i) || rn(i)) ln(i) && rn(i)
          else org.apache.spark.sql.catalyst.util.SQLOrderingUtil
            .compareDoubles(lv(i), rv(i)) == 0
        j += 1
      }
    }
  }

  final case class NullSafeEqS(lk: VecStrExpr, rk: VecStrExpr) extends VecPredicate {
    @transient private[this] var scratch: StrScratch = null
    @transient private[this] var lv: Array[UTF8String] = null
    @transient private[this] var ln: Array[Boolean] = null
    @transient private[this] var rv: Array[UTF8String] = null
    @transient private[this] var rn: Array[Boolean] = null
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val n = b.numRows()
      if (scratch == null) scratch = new StrScratch
      if (lv == null || lv.length < n) {
        lv = new Array[UTF8String](n); ln = new Array[Boolean](n)
        rv = new Array[UTF8String](n); rn = new Array[Boolean](n)
      }
      scratch.reset(); lk.eval(b, n, lv, ln, scratch)
      scratch.reset(); rk.eval(b, n, rv, rn, scratch)
      var j = 0
      while (j < len) {
        val i = row(sel, j)
        isNull(j) = false
        value(j) = if (ln(i) || rn(i)) ln(i) && rn(i) else lv(i).equals(rv(i))
        j += 1
      }
    }
  }

  /** boolean literal (CASE branch values, constant-folded guards) */
  final case class BoolLitP(v: Option[Boolean]) extends VecPredicate {
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      java.util.Arrays.fill(value, 0, len, v.getOrElse(false))
      java.util.Arrays.fill(isNull, 0, len, v.isEmpty)
    }
  }

  /** bare boolean column used as a predicate */
  final case class BoolCol(col: Int) extends VecPredicate {
    override def eval(b: ColumnarBatch, sel: Array[Int], len: Int,
        value: Array[Boolean], isNull: Array[Boolean]): Unit = {
      val v = b.column(col)
      var j = 0
      while (j < len) {
        val i = row(sel, j)
        if (v.isNullAt(i)) { isNull(j) = true; value(j) = false }
        else { isNull(j) = false; value(j) = v.getBoolean(i) }
        j += 1
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

  /** types the long-lane kernel computes in (int family; the compare is
    * exact because every lane value is a widened long) */
  private def intLike(dt: DataType): Boolean =
    dt == LongType || dt == IntegerType || dt == ShortType || dt == ByteType

  /** Attribute inputs of a TOTAL null-chain expression — one that (a)
    * can never throw on any input in its eval mode and (b) is null iff
    * at least one input attribute is null. For such expressions,
    * is(not)null(e) reduces to the inputs' null masks with zero
    * evaluation. Conservative whitelist; None = not provable.
    *
    * Cast admissibility by mode: numeric WIDENING and temporal-family
    * casts are total and null-preserving in every eval mode; numeric
    * NARROWING only under LEGACY (wraps/truncates — ANSI throws on
    * overflow, and skipping a throw the row path would raise changes
    * semantics; TRY yields null on failure, breaking (b)). Integral
    * +,-,* only under LEGACY (ANSI overflow throws; TRY nulls); double
    * arithmetic is total IEEE in every mode. Remainder/Pmod need a
    * non-zero literal divisor (zero divisor is the only throw/null
    * site).
    */
  private def nullChainAttrs(e: Expression)
      : Option[Seq[AttributeReference]] = {
    def integralT(t: DataType) =
      t == ByteType || t == ShortType || t == IntegerType || t == LongType
    def numericT(t: DataType) =
      integralT(t) || t == FloatType || t == DoubleType
    def widens(f: DataType, t: DataType): Boolean = {
      val order = Seq(ByteType, ShortType, IntegerType, LongType)
      val fi = order.indexOf(f); val ti = order.indexOf(t)
      (fi >= 0 && ti >= 0 && fi <= ti) ||
        (numericT(f) && (t == DoubleType || t == FloatType) && f != DoubleType) ||
        (f == FloatType && t == DoubleType) || f == t
    }
    def castSafe(c: Cast): Boolean = {
      val from = c.child.dataType; val to = c.dataType
      (from, to) match {
        case (f, t) if f == t => true
        case (f, t) if numericT(f) && numericT(t) =>
          widens(f, t) || c.evalMode == EvalMode.LEGACY
        case (TimestampType, TimestampNTZType) | (TimestampNTZType, TimestampType) |
             (DateType, TimestampType) | (DateType, TimestampNTZType) |
             (TimestampType, DateType) | (TimestampNTZType, DateType) => true
        case _ => false
      }
    }
    def nonZeroLit(x: Expression): Boolean = x match {
      case Literal(v, _) if v != null => v match {
        case b: Byte => b != 0; case s: Short => s != 0
        case i: Int => i != 0; case l: Long => l != 0L
        case f: Float => f != 0f; case d: Double => d != 0d
        case dec: org.apache.spark.sql.types.Decimal => !dec.isZero
        case _ => false
      }
      case _ => false
    }
    // range proof for the planner-injected salt-key guard shape
    // cast((x % d) as int): a remainder by literal d lies in
    // (-|d|, |d|), so the narrowing cast can never overflow — total in
    // EVERY eval mode, including ANSI.
    def remainderFits(c: Cast): Boolean = {
      def litAbs(x: Expression): Option[Long] = x match {
        case Literal(v, _) => v match {
          case b: Byte => Some(math.abs(b.toLong)); case s: Short => Some(math.abs(s.toLong))
          case i: Int => Some(math.abs(i.toLong)); case l: Long if l != Long.MinValue => Some(math.abs(l))
          case _ => None
        }
        case _ => None
      }
      val bound = c.dataType match {
        case ByteType => Byte.MaxValue.toLong; case ShortType => Short.MaxValue.toLong
        case IntegerType => Int.MaxValue.toLong; case LongType => Long.MaxValue
        case _ => -1L
      }
      bound >= 0 && integralT(c.child.dataType) && (c.child match {
        case r: Remainder => litAbs(r.right).exists(d => d > 0 && d - 1 <= bound)
        case p: Pmod => litAbs(p.right).exists(d => d > 0 && d - 1 <= bound)
        case _ => false
      })
    }
    e match {
      case a: AttributeReference => Some(Seq(a))
      case Literal(v, _) if v != null => Some(Nil)
      case c: Cast if castSafe(c) || remainderFits(c) => nullChainAttrs(c.child)
      case r: Remainder if nonZeroLit(r.right) && numericT(r.dataType) =>
        nullChainAttrs(r.left)
      case p: Pmod if nonZeroLit(p.right) && numericT(p.dataType) =>
        nullChainAttrs(p.left)
      case b: BinaryArithmetic
          if (b.isInstanceOf[Add] || b.isInstanceOf[Subtract] ||
            b.isInstanceOf[Multiply]) &&
            (b.dataType == DoubleType || b.dataType == FloatType ||
              (integralT(b.dataType) && b.evalMode == EvalMode.LEGACY)) =>
        for (l <- nullChainAttrs(b.left); r <- nullChainAttrs(b.right))
          yield l ++ r
      // double division: Spark's Divide is DivModLike, which returns NULL
      // on a zero divisor in EVERY eval mode (LEGACY/TRY yield null, ANSI
      // throws) — it is NOT bare IEEE x/0 = ±Inf. So x/y is a null-chain
      // only when the divisor is a provably non-zero literal, exactly as
      // Remainder/Pmod already require (the DivD kernel,
      // GraftColumnarProject DivD, documents the same null-on-zero rule).
      case d: Divide
          if (d.dataType == DoubleType || d.dataType == FloatType) &&
            nonZeroLit(d.right) =>
        for (l <- nullChainAttrs(d.left); r <- nullChainAttrs(d.right))
          yield l ++ r
      case u: UnaryMinus
          if u.dataType == DoubleType || u.dataType == FloatType ||
            (integralT(u.dataType) && !u.failOnError) =>
        nullChainAttrs(u.child)
      case ab: Abs if ab.dataType == DoubleType || ab.dataType == FloatType ||
          (integralT(ab.dataType) && !ab.failOnError) =>
        nullChainAttrs(ab.child)
      case _ => None
    }
  }

  /** Compile a Catalyst predicate to a vectorized kernel tree, or return
    * a human-readable fallback reason (the reference's `withInfo`
    * pattern, CometSparkSessionExtensions.scala:283-295).
    */
  /** is(not)null over a computed operand: compile through the operand's
    * TOTAL lane kernel (full-batch eval — a throw-site kernel would
    * fault on rows the row path never evaluates) and read the null
    * flags. String operands carry the same allocation-profile gate as
    * the computed string compares (the probe discards the values, so an
    * allocating kernel is pure waste). */
  private def compileNullProbe(e: Expression, output: Seq[Attribute],
      negate: Boolean): Either[String, VecPredicate] = e.dataType match {
    case dt if intLike(dt) =>
      for {
        k <- VecLongExpr.compile(e, output)
        _ <- if (VecLongExpr.total(k)) scala.Right(())
          else scala.Left("non-total long kernel in null probe")
      } yield LongNullProbeP(k, negate)
    case DoubleType =>
      for {
        k <- VecNumExpr.compile(e, output)
        _ <- if (VecNumExpr.total(k)) scala.Right(())
          else scala.Left("non-total double kernel in null probe")
      } yield DblNullProbeP(k, negate)
    case StringType =>
      for {
        k <- VecStrExpr.compile(e, output)
        _ <- if (VecStrExpr.total(k)) scala.Right(())
          else scala.Left("non-total string kernel in null probe")
        _ <- if (VecStrExpr.hashHeavy(k) || VecStrExpr.allocFree(k)) scala.Right(())
          else scala.Left("allocating computed string null probe")
      } yield StrNullProbeP(k, negate)
    case dt => scala.Left(s"unsupported null-probe operand type $dt")
  }

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
        // computed long/int operands (size, token counts, conditional
        // flags): compile both sides through the long lane. The compare
        // evaluates the FULL batch (including rows earlier conjuncts
        // excluded), so both kernels must pass the explicit totality
        // whitelist — a future throw-site kernel (ANSI overflow,
        // narrowing cast) falls back to the row path instead of faulting
        // on rows the row path never evaluates.
        case (l, r) if intLike(l.dataType) && intLike(r.dataType) &&
            l.deterministic && r.deterministic =>
          for {
            lk <- VecLongExpr.compile(l, output)
            rk <- VecLongExpr.compile(r, output)
            _ <- if (VecLongExpr.total(lk) && VecLongExpr.total(rk)) scala.Right(())
            else scala.Left("non-total long kernel in full-batch filter compare")
          } yield ComputedLongCmp(lk, rk, op)
        // computed string operands (at least one side non-trivial):
        // delegate both sides to the projection's string kernel compiler.
        // A/B gate (sf0.1 min-of-N, FilterMicroBench): hash-heavy shapes
        // (md5 thresholds) win 0.92-1.02x and allocation-free view
        // compositions (substring/trim over columns) win 0.84-0.99x, but
        // allocation-bearing cheap kernels (concat/upper/lower) LOSE
        // 1.05-1.09x to the fused codegen row path — those stay row
        // with a tagged reason.
        // computed double operands (ratios, math, decimal-as-double):
        // compile both sides through the double lane — TOTAL kernels
        // only (full-batch eval), compare via Spark's double ordering
        case (l, r) if l.dataType == DoubleType && r.dataType == DoubleType &&
            l.deterministic && r.deterministic =>
          for {
            lk <- VecNumExpr.compile(l, output)
            rk <- VecNumExpr.compile(r, output)
            _ <- if (VecNumExpr.total(lk) && VecNumExpr.total(rk)) scala.Right(())
            else scala.Left("non-total double kernel in full-batch filter compare")
          } yield ComputedDblCmp(lk, rk, op)
        case (l, r) if l.dataType == StringType && r.dataType == StringType &&
            l.deterministic && r.deterministic =>
          for {
            lk <- VecStrExpr.compile(l, output)
            rk <- VecStrExpr.compile(r, output)
            _ <- if (VecStrExpr.total(lk) && VecStrExpr.total(rk)) scala.Right(())
            else scala.Left("non-total string kernel in full-batch filter compare")
            _ <- if (VecStrExpr.hashHeavy(lk) || VecStrExpr.hashHeavy(rk) ||
                (VecStrExpr.allocFree(lk) && VecStrExpr.allocFree(rk)))
              scala.Right(())
            else scala.Left("allocating computed string compare (concat/case-map) " +
              "measured slower than the codegen row path")
          } yield ComputedStrCmp(lk, rk, op)
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
      // is(not)null over a COMPUTED operand whose nullness provably
      // equals "any input attribute null" (total, never-throwing
      // null-chain: safe casts, literal-divisor remainder, double
      // arithmetic — see nullChainAttrs): the predicate reduces to the
      // inputs' null masks, no expression evaluation at all. Covers the
      // planner-injected isnotnull(cast(salt-key)) / isnotnull(cast(ts))
      // join-key guards (census: 10 hits / 7 queries).
      case IsNull(e) if nullChainAttrs(e).exists(as =>
          as.nonEmpty && as.forall(a => output.exists(_.exprId == a.exprId))) =>
        scala.Right(nullChainAttrs(e).get
          .map(a => IsNullP(output.indexWhere(_.exprId == a.exprId),
            negate = false): VecPredicate)
          .reduce(OrP))
      case IsNotNull(e) if nullChainAttrs(e).exists(as =>
          as.nonEmpty && as.forall(a => output.exists(_.exprId == a.exprId))) =>
        scala.Right(nullChainAttrs(e).get
          .map(a => IsNullP(output.indexWhere(_.exprId == a.exprId),
            negate = true): VecPredicate)
          .reduce(AndP))
      // is(not)null over operands the null-chain can't reduce: evaluate
      // the TOTAL lane kernel and read its null flags (full-batch)
      case IsNull(e) if e.deterministic => compileNullProbe(e, output, negate = false)
      case IsNotNull(e) if e.deterministic => compileNullProbe(e, output, negate = true)
      case EqualTo(l, r) => cmp(l, r, EQ)
      case ens: EqualNullSafe =>
        val (l, r) = (ens.left, ens.right)
        if (intLike(l.dataType) && intLike(r.dataType) &&
            l.deterministic && r.deterministic) {
          for {
            lk <- VecLongExpr.compile(l, output)
            rk <- VecLongExpr.compile(r, output)
            _ <- if (VecLongExpr.total(lk) && VecLongExpr.total(rk)) scala.Right(())
            else scala.Left("non-total long kernel in full-batch null-safe eq")
          } yield NullSafeEqL(lk, rk)
        } else if (l.dataType == DoubleType && r.dataType == DoubleType &&
            l.deterministic && r.deterministic) {
          for {
            lk <- VecNumExpr.compile(l, output)
            rk <- VecNumExpr.compile(r, output)
            _ <- if (VecNumExpr.total(lk) && VecNumExpr.total(rk)) scala.Right(())
            else scala.Left("non-total double kernel in full-batch null-safe eq")
          } yield NullSafeEqD(lk, rk)
        } else if (l.dataType == StringType && r.dataType == StringType &&
            l.deterministic && r.deterministic) {
          for {
            lk <- VecStrExpr.compile(l, output)
            rk <- VecStrExpr.compile(r, output)
            _ <- if (VecStrExpr.total(lk) && VecStrExpr.total(rk)) scala.Right(())
            else scala.Left("non-total string kernel in full-batch null-safe eq")
            _ <- if (VecStrExpr.hashHeavy(lk) || VecStrExpr.hashHeavy(rk) ||
                (VecStrExpr.allocFree(lk) && VecStrExpr.allocFree(rk)))
              scala.Right(())
            else scala.Left("allocating computed string null-safe eq " +
              "measured slower than the codegen row path")
          } yield NullSafeEqS(lk, rk)
        } else scala.Left(s"unsupported null-safe eq types ${l.dataType} vs ${r.dataType}")
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
      case iff: If if iff.dataType == BooleanType =>
        for {
          c <- compile(iff.predicate, output)
          t <- compile(iff.trueValue, output)
          f <- compile(iff.falseValue, output)
        } yield IfP(c, t, f)
      case cw: CaseWhen if cw.dataType == BooleanType =>
        val bs = cw.branches.foldRight(
          scala.Right(Nil): Either[String, List[(VecPredicate, VecPredicate)]]) { (be, acc) =>
          for {
            t <- acc
            p <- compile(be._1, output)
            v <- compile(be._2, output)
          } yield (p, v) :: t
        }
        val ev = cw.elseValue match {
          case None => scala.Right(None)
          case Some(x) => compile(x, output).map(Some(_))
        }
        for { b <- bs; e <- ev } yield CaseWhenP(b, e)
      case Literal(v, BooleanType) =>
        scala.Right(BoolLitP(if (v == null) None else Some(v.asInstanceOf[Boolean])))
      case r: org.apache.spark.sql.catalyst.expressions.RLike =>
        (r.left, r.right) match {
          case (a: AttributeReference, Literal(p: UTF8String, StringType))
              if a.dataType == StringType && output.exists(_.exprId == a.exprId) &&
                p != null =>
            try scala.Right(RegexFindP(output.indexWhere(_.exprId == a.exprId),
              java.util.regex.Pattern.compile(p.toString)))
            catch { case _: java.util.regex.PatternSyntaxException =>
              scala.Left("invalid rlike pattern stays on the row path") }
          case _ => scala.Left("rlike needs a string attribute and a literal pattern")
        }
      case In(a: AttributeReference, list)
          if output.exists(_.exprId == a.exprId) &&
            list.forall { case Literal(v, _) => v != null; case _ => false } =>
        val idx = output.indexWhere(_.exprId == a.exprId)
        a.dataType match {
          case dt if longFamily(dt) && dt != BooleanType =>
            val vals = list.map(l => litToLong(l.asInstanceOf[Literal].value))
            if (vals.forall(_.isDefined))
              scala.Right(LongIn(idx, dt, vals.flatten.toArray.sorted))
            else scala.Left("IN list with non-integral literals")
          case StringType =>
            scala.Right(StringIn(idx,
              list.map(_.asInstanceOf[Literal].value.asInstanceOf[UTF8String].getBytes).toArray))
          case dt => scala.Left(s"unsupported IN column type $dt")
        }
      case InSet(a: AttributeReference, hset)
          if output.exists(_.exprId == a.exprId) && !hset.contains(null) =>
        val idx = output.indexWhere(_.exprId == a.exprId)
        a.dataType match {
          case dt if longFamily(dt) && dt != BooleanType =>
            val vals = hset.toSeq.map(litToLong)
            if (vals.forall(_.isDefined))
              scala.Right(LongIn(idx, dt, vals.flatten.toArray.sorted))
            else scala.Left("IN set with non-integral values")
          case StringType =>
            scala.Right(StringIn(idx,
              hset.toSeq.map(_.asInstanceOf[UTF8String].getBytes).toArray))
          case dt => scala.Left(s"unsupported IN column type $dt")
        }
      // IN over a COMPUTED long/int operand ((key % 7) IN (1,3,5))
      case In(e, list) if intLike(e.dataType) && e.deterministic &&
          list.forall { case Literal(v, _) => v != null; case _ => false } =>
        val vals = list.map(l => litToLong(l.asInstanceOf[Literal].value))
        if (!vals.forall(_.isDefined)) scala.Left("IN list with non-integral literals")
        else for {
          k <- VecLongExpr.compile(e, output)
          _ <- if (VecLongExpr.total(k)) scala.Right(())
            else scala.Left("non-total long kernel in full-batch IN")
        } yield ComputedLongIn(k, vals.flatten.toArray.sorted)
      case InSet(e, hset) if intLike(e.dataType) && e.deterministic &&
          !hset.contains(null) =>
        val vals = hset.toSeq.map(litToLong)
        if (!vals.forall(_.isDefined)) scala.Left("IN set with non-integral values")
        else for {
          k <- VecLongExpr.compile(e, output)
          _ <- if (VecLongExpr.total(k)) scala.Right(())
            else scala.Left("non-total long kernel in full-batch IN")
        } yield ComputedLongIn(k, vals.flatten.toArray.sorted)
      // IN over a COMPUTED string operand (the Q22 substring-prefix
      // gate) — same totality/allocation-profile gates as the computed
      // string compares
      case In(e, list) if e.dataType == StringType && e.deterministic &&
          list.forall { case Literal(v, StringType) => v != null; case _ => false } =>
        for {
          k <- VecStrExpr.compile(e, output)
          _ <- if (VecStrExpr.total(k)) scala.Right(())
            else scala.Left("non-total string kernel in full-batch IN")
          _ <- if (VecStrExpr.hashHeavy(k) || VecStrExpr.allocFree(k)) scala.Right(())
            else scala.Left("allocating computed string IN (concat/case-map) " +
              "measured slower than the codegen row path")
        } yield ComputedStrIn(k,
          list.map(_.asInstanceOf[Literal].value.asInstanceOf[UTF8String].getBytes).toArray)
      case InSet(e, hset) if e.dataType == StringType && e.deterministic &&
          !hset.contains(null) && hset.forall(_.isInstanceOf[UTF8String]) =>
        for {
          k <- VecStrExpr.compile(e, output)
          _ <- if (VecStrExpr.total(k)) scala.Right(())
            else scala.Left("non-total string kernel in full-batch IN")
          _ <- if (VecStrExpr.hashHeavy(k) || VecStrExpr.allocFree(k)) scala.Right(())
            else scala.Left("allocating computed string IN (concat/case-map) " +
              "measured slower than the codegen row path")
        } yield ComputedStrIn(k,
          hset.toSeq.map(_.asInstanceOf[UTF8String].getBytes).toArray)
      // might_contain(scalar-subquery bloom, xxhash64(key attr)) — both
      // the explicit q76 shape and InjectRuntimeFilter's join probes
      case bf: BloomFilterMightContain =>
        bf.valueExpression match {
          case xx: XxHash64 if xx.children.size == 1 =>
            xx.children.head match {
              case a: AttributeReference if output.exists(_.exprId == a.exprId) &&
                  (a.dataType == LongType || a.dataType == IntegerType ||
                    a.dataType == DateType) =>
                scala.Right(BloomContainsP(bf.bloomFilterExpression,
                  output.indexWhere(_.exprId == a.exprId),
                  keyIsInt = a.dataType != LongType, seed = xx.seed))
              case other => scala.Left("bloom probe key is not a long/int attribute: " +
                other.getClass.getSimpleName)
            }
          case other => scala.Left("bloom probe value is not a single-key xxhash64: " +
            other.getClass.getSimpleName)
        }
      case other => scala.Left(s"unsupported expression: ${other.getClass.getSimpleName}")
    }
  }

  /** Attributes a conjunct null-rejects at the top level: if the conjunct
    * is NULL whenever `a` is NULL, an `IsNotNull(a)` sibling is redundant
    * for filtering (NULL and FALSE both drop the row). Only direct
    * null-intolerant leaves qualify — an OR/NOT subtree does not.
    */
  private def nullRejected(e: Expression): Set[ExprId] = e match {
    case c: BinaryComparison =>
      c.children.collect { case a: AttributeReference => a.exprId }.toSet
    case StartsWith(a: AttributeReference, _: Literal) => Set(a.exprId)
    case EndsWith(a: AttributeReference, _: Literal) => Set(a.exprId)
    case Contains(a: AttributeReference, _: Literal) => Set(a.exprId)
    case a: AttributeReference if a.dataType == BooleanType => Set(a.exprId)
    case In(a: AttributeReference, list)
        if list.forall { case Literal(v, _) => v != null; case _ => false } => Set(a.exprId)
    case InSet(a: AttributeReference, hset) if !hset.contains(null) => Set(a.exprId)
    case _ => Set.empty
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case x => Seq(x)
  }

  /** Compile the top-level conjunction for short-circuit evaluation:
    * redundant IsNotNull conjuncts pruned, cheap null/bool checks first.
    * All conjuncts must compile or the whole predicate falls back.
    */
  def compileConjuncts(e: Expression, output: Seq[Attribute]): Either[String, Seq[VecPredicate]] = {
    val conjuncts = splitConjuncts(e)
    val rejected = conjuncts.flatMap(nullRejected).toSet
    val pruned = conjuncts.filter {
      case IsNotNull(a: AttributeReference) => !rejected.contains(a.exprId)
      case _ => true
    }
    val kept = if (pruned.nonEmpty) pruned else conjuncts.take(1)
    kept.foldLeft[Either[String, Vector[VecPredicate]]](scala.Right(Vector.empty)) {
      case (acc, c) => for { ps <- acc; p <- compile(c, output) } yield ps :+ p
    }
  }
}

/** Columnar Filter: vectorized predicate evaluation directly on the
  * scan's ColumnarBatches (SURVEY §7.1's columnar-runtime deliverable
  * beyond attribute selection; reference JVM gate pattern:
  * spark/sql/comet/operators.scala:872-938 + rules/CometExecRule.scala:
  * 258-393, native kernel: core/src/execution/operators/filter.rs).
  *
  * The top-level conjunction short-circuits: conjunct k+1 is evaluated
  * only over the positions conjunct k kept, so an `isnotnull AND cmp
  * AND cmp` chain does ~one full pass plus shrinking partial passes
  * instead of len(chain) full passes.
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
    val conjuncts = VecPredicate.compileConjuncts(condition, child.output) match {
      case scala.Right(ps) => ps
      case scala.Left(reason) =>
        // The rule only builds this node for compilable predicates; an AQE
        // re-plan can't widen the predicate, so this is unreachable.
        throw new IllegalStateException(s"uncompilable columnar predicate: $reason")
    }
    val (inM, outM, batchM) = (metrics("numInputRows"), metrics("numOutputRows"), metrics("numBatches"))
    child.executeColumnar().mapPartitionsInternal { iter =>
      // per-partition scratch, reallocated only when a batch is larger
      var value: Array[Boolean] = Array.emptyBooleanArray
      var isNull: Array[Boolean] = Array.emptyBooleanArray
      var selBuf: Array[Int] = Array.emptyIntArray
      iter.flatMap { batch =>
        val n = batch.numRows()
        batchM.add(1); inM.add(n)
        if (n == 0) None
        else {
          if (value.length < n) {
            value = new Array[Boolean](n); isNull = new Array[Boolean](n)
            selBuf = new Array[Int](n)
          }
          var sel: Array[Int] = null // identity over n
          var len = n
          var ci = 0
          while (ci < conjuncts.length && len > 0) {
            conjuncts(ci).eval(batch, sel, len, value, isNull)
            // compact surviving row ids into selBuf
            var j = 0; var k = 0
            while (j < len) {
              if (value(j) && !isNull(j)) { selBuf(k) = if (sel == null) j else sel(j); k += 1 }
              j += 1
            }
            if (k < len) {
              if (sel == null) sel = new Array[Int](n)
              System.arraycopy(selBuf, 0, sel, 0, k)
            }
            len = k
            ci += 1
          }
          outM.add(len)
          if (len == 0) None
          else if (len == n) Some(batch)
          else {
            val selOut = java.util.Arrays.copyOf(sel, len)
            val cols = new Array[ColumnVector](batch.numCols())
            var c = 0
            while (c < cols.length) { cols(c) = new SelectedColumnVector(batch.column(c), selOut); c += 1 }
            Some(new ColumnarBatch(cols, len))
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
