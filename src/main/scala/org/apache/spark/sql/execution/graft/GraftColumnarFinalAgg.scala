// Placed with the other graft physical operators under
// org.apache.spark.sql.execution.graft (the reference's placement
// pattern for its exec nodes, org.apache.spark.sql.comet).
package org.apache.spark.sql.execution.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.graft.{AggSpec, GraftColumnarAgg, GroupAggState, GroupKeySpec}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

/** Columnar FINAL-mode grouped aggregation: merges the shuffled
  * partial-buffer rows (keys ++ buffers — what the columnar or row
  * partial stage emitted) and evaluates the final values, emitting
  * ColumnarBatches. Completes the aggregation pipeline the reference
  * executes natively in both modes (operator.proto:282-294,
  * planner.rs:1007-1176 incl. Final/PartialMerge) — with this node, a
  * grouped aggregation is columnar on BOTH sides of its exchange.
  *
  * The input is the exchange's ROW stream (Spark's Tungsten shuffle is
  * row-oriented — SURVEY §7.1 keeps it; the reference replaces the
  * whole shuffle data plane instead). So this operator reads rows and
  * emits batches: the win is the column-major merge loop + vector
  * output feeding downstream columnar consumers, not a row-to-columnar
  * conversion dodge.
  *
  * Memory: unlike the partial stage (which flushes at maxGroups), the
  * final stage MUST hold every group of its partition — emitting a key
  * twice would duplicate result rows. That residency equals Spark's
  * own final HashAggregate (sans its spill path), and the shuffle has
  * already partitioned groups across the cluster, so per-partition
  * cardinality is total-groups/shuffle-partitions — the same bound the
  * row operator lives with.
  *
  * `outMap` routes each output column to a key (Left(keyIdx)) or a
  * finalized aggregate (Right(specIdx)) — the planning rule only swaps
  * when every result expression is such a direct reference.
  *
  * `emitBuffers` = PartialMerge mode: the same merge machinery, but the
  * flush RE-EMITS the merged buffers in the row HashAggregate's
  * keys ++ buffer-attributes layout instead of finalizing (outMap is
  * unused). This is the post-exchange buffer re-merge Spark plans in
  * value-distinct and multi-level aggregations. A/B sf0.1 interleaved
  * min-of-9: mixed distinct+plain 0.92x, distinct + decimal money
  * re-merge 0.68x vs the row path.
  */
case class GraftColumnarFinalAggExec(
    output: Seq[Attribute], keys: Seq[GroupKeySpec], specs: Seq[AggSpec],
    outMap: Seq[Either[Int, Int]], child: SparkPlan,
    emitBuffers: Boolean = false)
    extends UnaryExecNode {

  override def supportsColumnar: Boolean = true
  override def outputPartitioning = child.outputPartitioning

  override lazy val metrics = Map(
    "numInputRows" -> SQLMetrics.createMetric(sparkContext, "number of input (buffer) rows"),
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output (group) rows"))

  /** The exchange below produces rows; if the transition inserter
    * wrapped it in RowToColumnarExec (it assumes columnar parents eat
    * batches), bypass it — this operator consumes the row stream.
    */
  private def rowChild: SparkPlan = child match {
    case r: org.apache.spark.sql.execution.RowToColumnarExec => r.child
    case p => p
  }

  /** shared regr_slope/regr_intercept buffer merge: CovPopulation's
    * (dblAcc = n, arr 0..2 = xAvg/yAvg/ck) followed by VariancePop's
    * order-2 moments combine (arr 3..5 = n/avg/m2). */
  private def mergeRegr(st: org.apache.spark.sql.graft.GroupAggState, si: Int,
      gid: Int, r: InternalRow, col: Int): Unit = {
    var arr = st.objAcc(si)(gid).asInstanceOf[Array[Double]]
    if (arr == null) {
      arr = new Array[Double](6); st.objAcc(si)(gid) = arr
    }
    val n1 = st.dblAcc(si)(gid)
    val n2 = r.getDouble(col)
    val newN = n1 + n2
    val dx = r.getDouble(col + 1) - arr(0)
    val dxN = if (newN == 0.0) 0.0 else dx / newN
    val dy = r.getDouble(col + 2) - arr(1)
    val dyN = if (newN == 0.0) 0.0 else dy / newN
    arr(0) = arr(0) + dxN * n2
    arr(1) = arr(1) + dyN * n2
    arr(2) = arr(2) + r.getDouble(col + 3) + dx * dyN * n1 * n2
    st.dblAcc(si)(gid) = newN
    val vn1 = arr(3)
    val vn2 = r.getDouble(col + 4)
    val vAvg2 = r.getDouble(col + 5)
    val vM2r = r.getDouble(col + 6)
    val vNewN = vn1 + vn2
    val vDelta = vAvg2 - arr(4)
    val vDeltaN = if (vNewN == 0.0) 0.0 else vDelta / vNewN
    arr(4) = arr(4) + vDeltaN * vn2
    arr(5) = arr(5) + vM2r + vDelta * vDeltaN * vn1 * vn2
    arr(3) = vNewN
  }

  private def rowLongGetter(dt: DataType): (InternalRow, Int) => Long = dt match {
    case ByteType => (r, o) => r.getByte(o).toLong
    case ShortType => (r, o) => r.getShort(o).toLong
    case IntegerType | DateType => (r, o) => r.getInt(o).toLong
    case DoubleType => (r, o) => {
      // double keys travel as NORMALIZED bits (see GroupedAgg's getter);
      // partial-side keys arrive already normalized, re-normalizing is
      // idempotent and keeps bit-equality == Spark grouping equality.
      val b = java.lang.Double.doubleToLongBits(r.getDouble(o))
      if (b == java.lang.Long.MIN_VALUE) 0L else b
    }
    case _ => (r, o) => r.getLong(o)
  }

  override def doExecuteColumnar(): RDD[ColumnarBatch] = {
    import AggSpec._
    val (inM, outM) = (metrics("numInputRows"), metrics("numOutputRows"))
    val schema = StructType(output.map(a => StructField(a.name, a.dataType, a.nullable)))
    val nKeys = keys.length
    val nSpecs = specs.length
    val keysLocal = keys
    val specsLocal = specs
    val outMapLocal = outMap
    val emitBuffersLocal = emitBuffers

    rowChild.execute().mapPartitionsInternal { rows =>
      // Accounting only: the final stage must hold one row per group of
      // its hash partition, so a reservation shortfall cannot flush —
      // GraftMemoryReservation logs it and the state proceeds (bounded
      // by the post-shuffle distinct-key count either way).
      val res = org.apache.spark.sql.graft.GraftMemoryReservation.forTask()
      val st = new GroupAggState(nSpecs, nKeys,
        bytes => res.forall(_.reserve(bytes)))
      val keyGetters = keysLocal.map(k => rowLongGetter(k.dt)).toArray

      // per-row scratch for the multi-key / string-key hash-probe path
      // (same scheme as the partial stage: 64-bit mixed hash probed
      // through the open-addressing table, verified against the cloned
      // per-group key columns — no boxed composite keys)
      val pNull = new Array[Boolean](nKeys)
      val pLong = new Array[Long](nKeys)
      val pStr = new Array[UTF8String](nKeys)
      val eqFn: Int => Boolean = { gid =>
        var p = 0
        var same = true
        while (same && p < nKeys) {
          same =
            if (pNull(p) || st.keyNull(p)(gid)) pNull(p) == st.keyNull(p)(gid)
            else if (pStr(p) ne null) pStr(p).equals(st.keyStr(p)(gid))
            else pLong(p) == st.keyLong(p)(gid)
          p += 1
        }
        same
      }

      /** register/lookup the group of one buffer row. Key values are
        * CLONED (UnsafeRow memory is reused by the shuffle iterator).
        */
      def groupId(r: InternalRow): Int = {
        var h = -3750763034362895579L
        var p = 0
        while (p < nKeys) {
          val ks = keysLocal(p)
          var x = 0L
          if (r.isNullAt(ks.col)) { pNull(p) = true; pStr(p) = null; x = 0x9E3779B97F4A7C15L }
          else {
            pNull(p) = false
            if (ks.dt == StringType) {
              val s = r.getUTF8String(ks.col); pStr(p) = s; x = s.hashCode.toLong
            } else { pStr(p) = null; val l = keyGetters(p)(r, ks.col); pLong(p) = l; x = l }
          }
          h = (h ^ x) * 0xff51afd7ed558ccdL
          h ^= h >>> 29
          p += 1
        }
        val slot = st.probeGetVerified(h, eqFn)
        if (slot >= 0) slot
        else {
          if (st.nGroups == st.capacity) st.grow()
          val gid = st.nGroups
          var i = 0
          while (i < nKeys) {
            st.keyNull(i)(gid) = pNull(i)
            if (!pNull(i)) {
              if (pStr(i) ne null) st.keyStr(i)(gid) = pStr(i).clone()
              else st.keyLong(i)(gid) = pLong(i)
            }
            i += 1
          }
          st.nGroups += 1
          st.probePut(slot, h, gid)
          gid
        }
      }

      // single long-family key → primitive open-addressing fast path
      val fastKey: GroupKeySpec =
        if (nKeys == 1 && keysLocal(0).dt != StringType) keysLocal(0) else null

      def allocLongGroup(k: Long, isNull: Boolean): Int = {
        if (st.nGroups == st.capacity) st.grow()
        val gid = st.nGroups
        if (isNull) st.keyNull(0)(gid) = true else st.keyLong(0)(gid) = k
        st.nGroups += 1
        gid
      }

      /** MERGE one partial-buffer row into the table (Spark's
        * DeclarativeAggregate mergeExpressions semantics per spec).
        */
      def merge(r: InternalRow): Unit = {
        val gid =
          if (fastKey != null) {
            if (r.isNullAt(fastKey.col)) {
              if (st.nullGid < 0) st.nullGid = allocLongGroup(0L, isNull = true)
              st.nullGid
            } else {
              val k = keyGetters(0)(r, fastKey.col)
              val slot = st.probeGet(k)
              if (slot >= 0) slot
              else {
                val gid = allocLongGroup(k, isNull = false)
                st.probePut(slot, k, gid)
                gid
              }
            }
          } else groupId(r)
        var si = 0
        while (si < nSpecs) {
          specsLocal(si) match {
            case CountSpec(col) =>
              // count buffer is a non-nullable long
              st.longAcc(si)(gid) += r.getLong(col)
            case SumDoubleSpec(col, _) =>
              if (!r.isNullAt(col)) {
                st.dblAcc(si)(gid) += r.getDouble(col)
                st.seen(si)(gid) = true
              }
            case MinMaxLongSpec(col, dt, isMin) =>
              if (!r.isNullAt(col)) {
                val x = rowLongGetter(dt)(r, col)
                if (!st.seen(si)(gid) ||
                    (if (isMin) x < st.longAcc(si)(gid) else x > st.longAcc(si)(gid)))
                  st.longAcc(si)(gid) = x
                st.seen(si)(gid) = true
              }
            case MinMaxDoubleSpec(col, dt, isMin) =>
              if (!r.isNullAt(col)) {
                val x = if (dt == FloatType) r.getFloat(col).toDouble else r.getDouble(col)
                val better =
                  if (!st.seen(si)(gid)) true
                  else if (isMin) GraftColumnarAgg.nanSafeLt(x, st.dblAcc(si)(gid))
                  else GraftColumnarAgg.nanSafeLt(st.dblAcc(si)(gid), x)
                if (better) st.dblAcc(si)(gid) = x
                st.seen(si)(gid) = true
              }
            case MinMaxStringSpec(col, isMin) =>
              if (!r.isNullAt(col)) {
                val s = r.getUTF8String(col)
                if (!st.seen(si)(gid) ||
                    (if (isMin) s.compareTo(st.strAcc(si)(gid)) < 0
                     else s.compareTo(st.strAcc(si)(gid)) > 0))
                  st.strAcc(si)(gid) = s.clone()
                st.seen(si)(gid) = true
              }
            case AvgSpec(col, _) =>
              // avg buffer = (sum: non-null double, count: non-null long)
              st.dblAcc(si)(gid) += r.getDouble(col)
              st.longAcc(si)(gid) += r.getLong(col + 1)
            case DecSumSpec(col, buf, _) =>
              // buffer = (sum, isEmpty) for BOTH decimal-sum widths
              // (the getDecimal read below is width-agnostic).
              // Sum.mergeExpressions: an empty buffer leaves the
              // accumulator; a non-empty NULL sum is an upstream
              // overflow and poisons the group (null propagates
              // through the merge Add).
              if (!r.getBoolean(col + 1)) {
                st.seen(si)(gid) = true
                val cur = st.objAcc(si)(gid)
                if (cur ne GraftColumnarAgg.DecPoison) {
                  if (r.isNullAt(col)) st.objAcc(si)(gid) = GraftColumnarAgg.DecPoison
                  else GraftColumnarAgg.mergeDecSumValue(st.longAcc(si), st.objAcc(si),
                    gid, r.getDecimal(col, buf.precision, buf.scale))
                }
              }
            case MinMaxDec64Spec(col, dt, isMin) =>
              if (!r.isNullAt(col)) {
                val x = r.getDecimal(col, dt.precision, dt.scale).toUnscaledLong
                if (!st.seen(si)(gid) ||
                    (if (isMin) x < st.longAcc(si)(gid) else x > st.longAcc(si)(gid)))
                  st.longAcc(si)(gid) = x
                st.seen(si)(gid) = true
              }
            case MinMaxDec128Spec(col, dt, isMin) =>
              // wide-decimal buffer: a null partial means "no input on
              // that map task" — the row merge's greatest/least skips it
              if (!r.isNullAt(col)) {
                val bi = r.getDecimal(col, dt.precision, dt.scale)
                  .toJavaBigDecimal.unscaledValue()
                GraftColumnarAgg.minMaxDec128(st.objAcc(si), gid,
                  org.apache.spark.sql.graft.VecDec128Expr.hiOf(bi),
                  org.apache.spark.sql.graft.VecDec128Expr.loOf(bi), isMin,
                  st.seen(si)(gid))
                st.seen(si)(gid) = true
              }
            case SumLongSpec(col, _, ansi) =>
              if (!r.isNullAt(col)) {
                st.longAcc(si)(gid) =
                  GraftColumnarAgg.addLong(st.longAcc(si)(gid), r.getLong(col), ansi)
                st.seen(si)(gid) = true
              }
            case MomentsFinalSpec(col, order, _, _) =>
              // CentralMomentAgg.mergeExpressions term-for-term (same
              // textual operation order — bit-identical combine for the
              // same arrival order). Buffers are non-nullable doubles:
              // (n, avg, m2[, m3[, m4]]). State: n in dblAcc, the
              // moment lanes in a per-group double[order].
              var arr = st.objAcc(si)(gid).asInstanceOf[Array[Double]]
              if (arr == null) {
                arr = new Array[Double](order); st.objAcc(si)(gid) = arr
              }
              val n1 = st.dblAcc(si)(gid)
              val n2 = r.getDouble(col)
              val avg2 = r.getDouble(col + 1)
              val m2r = r.getDouble(col + 2)
              val newN = n1 + n2
              val delta = avg2 - arr(0)
              val deltaN = if (newN == 0.0) 0.0 else delta / newN
              val newAvg = arr(0) + deltaN * n2
              val newM2 = arr(1) + m2r + delta * deltaN * n1 * n2
              if (order >= 3) {
                val m3r = r.getDouble(col + 3)
                val newM3 = arr(2) + m3r +
                  deltaN * deltaN * delta * n1 * n2 * (n1 - n2) +
                  3.0 * deltaN * (n1 * m2r - n2 * arr(1))
                if (order >= 4) {
                  val m4r = r.getDouble(col + 4)
                  arr(3) = arr(3) + m4r +
                    deltaN * deltaN * deltaN * delta * n1 * n2 *
                      (n1 * n1 - n1 * n2 + n2 * n2) +
                    6.0 * deltaN * deltaN * (n1 * n1 * m2r + n2 * n2 * arr(1)) +
                    4.0 * deltaN * (n1 * m3r - n2 * arr(2))
                }
                arr(2) = newM3
              }
              arr(0) = newAvg
              arr(1) = newM2
              st.dblAcc(si)(gid) = newN
            case HllMergeSpec(col, numWords, _) =>
              // HyperLogLogPlusPlusHelper.merge's exact word loop:
              // register-wise max of 10 six-bit registers per word,
              // masked in place. Buffer words are non-nullable longs.
              var arr = st.objAcc(si)(gid).asInstanceOf[Array[Long]]
              if (arr == null) {
                arr = new Array[Long](numWords); st.objAcc(si)(gid) = arr
              }
              var w = 0
              while (w < numWords) {
                val w1 = arr(w)
                val w2 = r.getLong(col + w)
                var word = 0L
                var k = 0
                var mask = 0x3FL // REGISTER_WORD_MASK
                while (k < 10) { // REGISTERS_PER_WORD
                  word |= Math.max(w1 & mask, w2 & mask)
                  mask <<= 6 // REGISTER_SIZE
                  k += 1
                }
                arr(w) = word
                w += 1
              }
            case CovFinalSpec(col, _, _) =>
              // Covariance.mergeExpressions: (n, xAvg, yAvg, ck)
              var arr = st.objAcc(si)(gid).asInstanceOf[Array[Double]]
              if (arr == null) {
                arr = new Array[Double](3); st.objAcc(si)(gid) = arr
              }
              val n1 = st.dblAcc(si)(gid)
              val n2 = r.getDouble(col)
              val newN = n1 + n2
              val dx = r.getDouble(col + 1) - arr(0)
              val dxN = if (newN == 0.0) 0.0 else dx / newN
              val dy = r.getDouble(col + 2) - arr(1)
              val dyN = if (newN == 0.0) 0.0 else dy / newN
              arr(0) = arr(0) + dxN * n2
              arr(1) = arr(1) + dyN * n2
              arr(2) = arr(2) + r.getDouble(col + 3) + dx * dyN * n1 * n2
              st.dblAcc(si)(gid) = newN
            case CorrFinalSpec(col, _, _) =>
              // PearsonCorrelation.mergeExpressions: the Covariance
              // merge plus the per-axis m2 lanes (xMk, yMk)
              var arr = st.objAcc(si)(gid).asInstanceOf[Array[Double]]
              if (arr == null) {
                arr = new Array[Double](5); st.objAcc(si)(gid) = arr
              }
              val n1 = st.dblAcc(si)(gid)
              val n2 = r.getDouble(col)
              val newN = n1 + n2
              val dx = r.getDouble(col + 1) - arr(0)
              val dxN = if (newN == 0.0) 0.0 else dx / newN
              val dy = r.getDouble(col + 2) - arr(1)
              val dyN = if (newN == 0.0) 0.0 else dy / newN
              arr(0) = arr(0) + dxN * n2
              arr(1) = arr(1) + dyN * n2
              arr(2) = arr(2) + r.getDouble(col + 3) + dx * dyN * n1 * n2
              arr(3) = arr(3) + r.getDouble(col + 4) + dx * dxN * n1 * n2
              arr(4) = arr(4) + r.getDouble(col + 5) + dy * dyN * n1 * n2
              st.dblAcc(si)(gid) = newN
            case AggSpec.RegrSlopeFinalSpec(col) =>
              mergeRegr(st, si, gid, r, col)
            case AggSpec.RegrInterceptFinalSpec(col) =>
              mergeRegr(st, si, gid, r, col)
            case AggSpec.MomentsSpec(_, _) | AggSpec.CovSpec(_, _) | AggSpec.CorrSpec(_, _) |
                AggSpec.AvgDec64Spec(_, _, _) |
                AggSpec.FirstLastSpec(_, _, _, _) =>
              // unreachable: compileFinal emits the *FinalSpec twins,
              // never the partial moment-family specs
              throw new IllegalStateException("partial moment specs have no final merge")
          }
          si += 1
        }
      }

      var n = 0L
      while (rows.hasNext) { merge(rows.next()); n += 1 }
      inM.add(n)

      if (st.nGroups == 0) Iterator.empty
      else if (emitBuffersLocal) {
        // PartialMerge mode: one merged BUFFER row per group, in the row
        // HashAggregate's keys ++ buffer-attributes layout (the shared
        // writer also serves the partial exec; mergeState routes the
        // decimal sums through the merge-side accumulator conventions).
        val g = st.nGroups
        outM.add(g)
        val cols = OnHeapColumnVector.allocateColumns(g, schema)
        var ki = 0
        while (ki < nKeys) {
          val dt = keysLocal(ki).dt
          var i = 0
          while (i < g) {
            if (st.keyNull(ki)(i)) cols(ki).putNull(i)
            else dt match {
              case StringType => cols(ki).putByteArray(i, st.keyStr(ki)(i).getBytes)
              case ByteType => cols(ki).putByte(i, st.keyLong(ki)(i).toByte)
              case ShortType => cols(ki).putShort(i, st.keyLong(ki)(i).toShort)
              case IntegerType | DateType => cols(ki).putInt(i, st.keyLong(ki)(i).toInt)
              case DoubleType => cols(ki).putDouble(i,
                java.lang.Double.longBitsToDouble(st.keyLong(ki)(i)))
              case _ => cols(ki).putLong(i, st.keyLong(ki)(i))
            }
            i += 1
          }
          ki += 1
        }
        org.apache.spark.sql.graft.GraftColumnarGroupedAggExec.writeBufferColumns(
          specsLocal.toIndexedSeq, st, cols, nKeys, g, mergeState = _ => true)
        Iterator.single(new ColumnarBatch(cols.toArray[ColumnVector], g))
      }
      else {
        val g = st.nGroups
        outM.add(g)
        val cols = OnHeapColumnVector.allocateColumns(g, schema)
        var c = 0
        while (c < outMapLocal.length) {
          outMapLocal(c) match {
            case scala.Left(ki) =>
              val dt = keysLocal(ki).dt
              var i = 0
              while (i < g) {
                if (st.keyNull(ki)(i)) cols(c).putNull(i)
                else dt match {
                  case StringType => cols(c).putByteArray(i, st.keyStr(ki)(i).getBytes)
                  case ByteType => cols(c).putByte(i, st.keyLong(ki)(i).toByte)
                  case ShortType => cols(c).putShort(i, st.keyLong(ki)(i).toShort)
                  case IntegerType | DateType => cols(c).putInt(i, st.keyLong(ki)(i).toInt)
                  case DoubleType => cols(c).putDouble(i,
                    java.lang.Double.longBitsToDouble(st.keyLong(ki)(i)))
                  case _ => cols(c).putLong(i, st.keyLong(ki)(i))
                }
                i += 1
              }
            case scala.Right(si) =>
              specsLocal(si) match {
                case CountSpec(_) =>
                  var i = 0
                  while (i < g) { cols(c).putLong(i, st.longAcc(si)(i)); i += 1 }
                case SumDoubleSpec(_, _) =>
                  var i = 0
                  while (i < g) {
                    if (st.seen(si)(i)) cols(c).putDouble(i, st.dblAcc(si)(i))
                    else cols(c).putNull(i)
                    i += 1
                  }
                case MinMaxLongSpec(_, dt, _) =>
                  var i = 0
                  while (i < g) {
                    if (!st.seen(si)(i)) cols(c).putNull(i)
                    else dt match {
                      case ByteType => cols(c).putByte(i, st.longAcc(si)(i).toByte)
                      case ShortType => cols(c).putShort(i, st.longAcc(si)(i).toShort)
                      case IntegerType | DateType => cols(c).putInt(i, st.longAcc(si)(i).toInt)
                      case _ => cols(c).putLong(i, st.longAcc(si)(i))
                    }
                    i += 1
                  }
                case MinMaxDoubleSpec(_, dt, _) =>
                  var i = 0
                  while (i < g) {
                    if (!st.seen(si)(i)) cols(c).putNull(i)
                    else if (dt == FloatType) cols(c).putFloat(i, st.dblAcc(si)(i).toFloat)
                    else cols(c).putDouble(i, st.dblAcc(si)(i))
                    i += 1
                  }
                case MinMaxStringSpec(_, _) =>
                  var i = 0
                  while (i < g) {
                    if (st.seen(si)(i)) cols(c).putByteArray(i, st.strAcc(si)(i).getBytes)
                    else cols(c).putNull(i)
                    i += 1
                  }
                case AvgSpec(_, _) =>
                  // Average.evaluateExpression: null when count == 0
                  var i = 0
                  while (i < g) {
                    val cnt = st.longAcc(si)(i)
                    if (cnt == 0L) cols(c).putNull(i)
                    else cols(c).putDouble(i, st.dblAcc(si)(i) / cnt)
                    i += 1
                  }
                case DecSumSpec(_, buf, ansi) =>
                  // CheckOverflowInSum: empty group → null; overflow →
                  // throw (ANSI) or null (LEGACY). try_sum never
                  // compiles to either decimal-sum spec.
                  def overflow(): Unit =
                    if (ansi) throw org.apache.spark.sql.errors.QueryExecutionErrors
                      .overflowInSumOfDecimalError(null, "try_sum")
                  var i = 0
                  while (i < g) {
                    if (!st.seen(si)(i)) cols(c).putNull(i)
                    else {
                      val o = st.objAcc(si)(i)
                      if (o eq GraftColumnarAgg.DecPoison) { overflow(); cols(c).putNull(i) }
                      else if (o == null) {
                        if (GraftColumnarAgg.fitsPrecision(st.longAcc(si)(i), buf.precision))
                          cols(c).putDecimal(i,
                            Decimal.createUnsafe(st.longAcc(si)(i), buf.precision, buf.scale),
                            buf.precision)
                        else { overflow(); cols(c).putNull(i) }
                      } else {
                        val bi = o.asInstanceOf[java.math.BigInteger]
                        if (GraftColumnarAgg.fitsPrecision(bi, buf.precision))
                          cols(c).putDecimal(i,
                            Decimal(new java.math.BigDecimal(bi, buf.scale)), buf.precision)
                        else { overflow(); cols(c).putNull(i) }
                      }
                    }
                    i += 1
                  }
                case MinMaxDec64Spec(_, dt, _) =>
                  var i = 0
                  while (i < g) {
                    if (st.seen(si)(i))
                      cols(c).putDecimal(i,
                        Decimal.createUnsafe(st.longAcc(si)(i), dt.precision, dt.scale),
                        dt.precision)
                    else cols(c).putNull(i)
                    i += 1
                  }
                case MinMaxDec128Spec(_, dt, _) =>
                  var i = 0
                  while (i < g) {
                    st.objAcc(si)(i) match {
                      case a: Array[Long] if st.seen(si)(i) =>
                        cols(c).putDecimal(i,
                          GraftColumnarAgg.dec128Value(a(0), a(1), dt), dt.precision)
                      case _ => cols(c).putNull(i)
                    }
                    i += 1
                  }
                case SumLongSpec(_, _, _) =>
                  var i = 0
                  while (i < g) {
                    if (st.seen(si)(i)) cols(c).putLong(i, st.longAcc(si)(i))
                    else cols(c).putNull(i)
                    i += 1
                  }
                case MomentsFinalSpec(_, order, kind, nullOnDiv) =>
                  // each function's evaluateExpression: n=0 → null;
                  // sample divisors at n=1 and skew/kurt at m2=0 emit
                  // the divide-by-zero result (null by default, NaN
                  // under spark.sql.legacy.statisticalAggregate)
                  def dbz(i: Int): Unit =
                    if (nullOnDiv) cols(c).putNull(i)
                    else cols(c).putDouble(i, Double.NaN)
                  var i = 0
                  while (i < g) {
                    val n = st.dblAcc(si)(i)
                    val arr = st.objAcc(si)(i).asInstanceOf[Array[Double]]
                    val m2 = arr(1)
                    if (n == 0.0) cols(c).putNull(i)
                    else kind match {
                      case 0 => // stddev_samp
                        if (n == 1.0) dbz(i)
                        else cols(c).putDouble(i, math.sqrt(m2 / (n - 1.0)))
                      case 1 => // stddev_pop
                        cols(c).putDouble(i, math.sqrt(m2 / n))
                      case 2 => // var_samp
                        if (n == 1.0) dbz(i)
                        else cols(c).putDouble(i, m2 / (n - 1.0))
                      case 3 => // var_pop
                        cols(c).putDouble(i, m2 / n)
                      case 4 => // skewness
                        if (m2 == 0.0) dbz(i)
                        else cols(c).putDouble(i,
                          math.sqrt(n) * arr(2) / math.sqrt(m2 * m2 * m2))
                      case _ => // kurtosis
                        if (m2 == 0.0) dbz(i)
                        else cols(c).putDouble(i, n * arr(3) / (m2 * m2) - 3.0)
                    }
                    i += 1
                  }
                case HllMergeSpec(_, numWords, rsd) =>
                  // HyperLogLogPlusPlus.eval == helper.query: raw HLL
                  // estimate + the published bias correction — call
                  // Spark's own helper on the merged words
                  val helper =
                    new org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper(rsd)
                  var i = 0
                  while (i < g) {
                    val arr = st.objAcc(si)(i).asInstanceOf[Array[Long]]
                    val vals: Array[Any] =
                      if (arr == null) Array.fill[Any](numWords)(0L)
                      else arr.map(x => x: Any)
                    cols(c).putLong(i, helper.query(
                      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals), 0))
                    i += 1
                  }
                case CovFinalSpec(_, isSample, nullOnDiv) =>
                  var i = 0
                  while (i < g) {
                    val n = st.dblAcc(si)(i)
                    if (n == 0.0) cols(c).putNull(i)
                    else if (isSample && n == 1.0) {
                      if (nullOnDiv) cols(c).putNull(i)
                      else cols(c).putDouble(i, Double.NaN)
                    } else {
                      val ck = st.objAcc(si)(i).asInstanceOf[Array[Double]](2)
                      cols(c).putDouble(i, if (isSample) ck / (n - 1.0) else ck / n)
                    }
                    i += 1
                  }
                case CorrFinalSpec(_, nullOnDiv, ansi) =>
                  var i = 0
                  while (i < g) {
                    val n = st.dblAcc(si)(i)
                    if (n == 0.0) cols(c).putNull(i)
                    else if (n == 1.0) {
                      if (nullOnDiv) cols(c).putNull(i)
                      else cols(c).putDouble(i, Double.NaN)
                    } else {
                      val arr = st.objAcc(si)(i).asInstanceOf[Array[Double]]
                      val div = math.sqrt(arr(3) * arr(4))
                      // Corr's evaluate has no zero-divisor guard: on a
                      // zero divisor (constant inputs) the row path's
                      // Divide THROWS under ANSI and returns NULL in
                      // LEGACY mode (SQL division, not IEEE)
                      if (div == 0.0) {
                        if (ansi)
                          throw org.apache.spark.sql.errors.QueryExecutionErrors
                            .divideByZeroError(org.apache.spark.sql.catalyst.trees.Origin().context)
                        cols(c).putNull(i)
                      } else cols(c).putDouble(i, arr(2) / div)
                    }
                    i += 1
                  }
                case AggSpec.RegrSlopeFinalSpec(_) =>
                  var i = 0
                  while (i < g) {
                    val arr = st.objAcc(si)(i).asInstanceOf[Array[Double]]
                    if (arr == null) cols(c).putNull(i)
                    else {
                      // If(varPop.n === 0 || varPop.m2 === 0, null,
                      //    ck / m2) — RegrSlope.evaluateExpression
                      val vn = arr(3); val m2 = arr(5)
                      if (vn == 0.0 || m2 == 0.0) cols(c).putNull(i)
                      else cols(c).putDouble(i, arr(2) / m2)
                    }
                    i += 1
                  }
                case AggSpec.RegrInterceptFinalSpec(_) =>
                  var i = 0
                  while (i < g) {
                    val arr = st.objAcc(si)(i).asInstanceOf[Array[Double]]
                    if (arr == null) cols(c).putNull(i)
                    else {
                      // yAvg - ck / m2 * xAvg, NULL on the same guard
                      val vn = arr(3); val m2 = arr(5)
                      if (vn == 0.0 || m2 == 0.0) cols(c).putNull(i)
                      else cols(c).putDouble(i, arr(1) - arr(2) / m2 * arr(0))
                    }
                    i += 1
                  }
                case AggSpec.MomentsSpec(_, _) | AggSpec.CovSpec(_, _) | AggSpec.CorrSpec(_, _) |
                AggSpec.AvgDec64Spec(_, _, _) |
                AggSpec.FirstLastSpec(_, _, _, _) =>
                  throw new IllegalStateException("partial moment specs have no final emission")
              }
          }
          c += 1
        }
        Iterator.single(new ColumnarBatch(cols.toArray[ColumnVector], g))
      }
    }
  }

  /** Row fallback — unreachable: supportsColumnar routes planning to
    * the batch path and the rule is the only instantiation site. */
  override protected def doExecute(): RDD[InternalRow] =
    throw new IllegalStateException("GraftColumnarFinalAgg row path not implemented")

  override protected def withNewChildInternal(newChild: SparkPlan): GraftColumnarFinalAggExec =
    copy(child = newChild)
}
