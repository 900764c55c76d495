// In the org.apache.spark.sql namespace alongside the other graft
// operators — same placement the reference uses (org.apache.spark.sql.comet).
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

/** One grouping key column: long family (stored widened to Long) or
  * string (stored as cloned UTF8String). NULL is a valid group value.
  */
final case class GroupKeySpec(col: Int, dt: DataType) extends Serializable

/** Growable per-group accumulator state for one hash-table epoch —
  * shared by the partial ([[GraftColumnarGroupedAggExec]]) and final
  * ([[org.apache.spark.sql.execution.graft.GraftColumnarFinalAggExec]])
  * grouped aggregation operators.
  */
private[sql] final class GroupAggState(nSpecs: Int, nKeys: Int,
    onAlloc: Long => Boolean = _ => true) {
    var capacity = 1024

    // Coarse per-entry footprint of the column-major state: primitive
    // lanes exactly, reference lanes at 8 bytes/slot (cloned UTF8String
    // content is NOT counted — coarse-grained accounting, see
    // GraftMemoryReservation). onAlloc is called with every array-growth
    // delta; a false return marks memory pressure and the PARTIAL stage
    // flushes at the next batch boundary (the final stage logs and
    // proceeds — it must hold one row per group).
    private val entryBytes: Long = nKeys.toLong * (8 + 8 + 1) + nSpecs.toLong * (8 + 8 + 8 + 8 + 1)
    var pressure = false
    private def alloc(bytes: Long): Unit = if (!onAlloc(bytes)) pressure = true
    alloc(capacity * entryBytes)
    var nGroups = 0
    // group key storage: one column-major array per key
    var keyLong = Array.ofDim[Long](nKeys, capacity)
    var keyStr = Array.ofDim[UTF8String](nKeys, capacity)
    var keyNull = Array.ofDim[Boolean](nKeys, capacity)
    // accumulators: column-major [spec][group]
    var longAcc = Array.ofDim[Long](nSpecs, capacity)
    var dblAcc = Array.ofDim[Double](nSpecs, capacity)
    var strAcc = Array.ofDim[UTF8String](nSpecs, capacity)
    // object escape slot: BigInteger overflow continuation for decimal
    // sums; GraftColumnarAgg.DecPoison for final-merge overflow nulls
    var objAcc = Array.ofDim[AnyRef](nSpecs, capacity)
    var seen = Array.ofDim[Boolean](nSpecs, capacity)

    // Open-addressing fast path for a single long-family key: linear
    // probing over primitive arrays, no boxing per row. Load factor
    // <= 0.5, power-of-two size. NULL key held out-of-table.
    var probeKeys: Array[Long] = new Array[Long](4096)
    var probeGids: Array[Int] = { val a = new Array[Int](4096); java.util.Arrays.fill(a, -1); a }
    var probeMask: Int = 4095
    var nullGid: Int = -1
    alloc(4096L * 12)

    def probeReset(): Unit = {
      java.util.Arrays.fill(probeGids, -1)
      nullGid = -1
    }

    private def probeRehash(): Unit = {
      val newSize = (probeMask + 1) * 2
      alloc((probeMask + 1) * 12L)
      val nk = new Array[Long](newSize)
      val ng = new Array[Int](newSize)
      java.util.Arrays.fill(ng, -1)
      val mask = newSize - 1
      var i = 0
      while (i <= probeMask) {
        if (probeGids(i) >= 0) {
          var j = (java.lang.Long.hashCode(probeKeys(i)) * 0x9E3779B9) & mask
          while (ng(j) >= 0) j = (j + 1) & mask
          nk(j) = probeKeys(i); ng(j) = probeGids(i)
        }
        i += 1
      }
      probeKeys = nk; probeGids = ng; probeMask = mask
    }

    /** Lookup a long key: the gid if present, else -(slot+1) for the
      * empty slot where it belongs — the caller assigns a gid and calls
      * probePut before any other probe (single-threaded row loop).
      */
    def probeGet(k: Long): Int = {
      if (nGroups * 2 > probeMask) probeRehash()
      var j = (java.lang.Long.hashCode(k) * 0x9E3779B9) & probeMask
      var g = probeGids(j)
      while (g >= 0 && probeKeys(j) != k) { j = (j + 1) & probeMask; g = probeGids(j) }
      if (g >= 0) g else -(j + 1)
    }

    def probePut(slot: Int, k: Long, gid: Int): Unit = {
      val j = -slot - 1
      probeKeys(j) = k; probeGids(j) = gid
    }

    /** Multi-key / string-key variant: probeKeys holds a 64-bit hash of
      * the key parts and `eq` confirms a candidate gid's stored parts
      * equal the probing row's (hash collisions keep probing). Same
      * arrays and rehash as the single-long-key path — rehash buckets
      * by the stored long, which here IS the hash.
      */
    def probeGetVerified(h: Long, eq: Int => Boolean): Int = {
      if (nGroups * 2 > probeMask) probeRehash()
      var j = (java.lang.Long.hashCode(h) * 0x9E3779B9) & probeMask
      var g = probeGids(j)
      while (g >= 0 && !(probeKeys(j) == h && eq(g))) { j = (j + 1) & probeMask; g = probeGids(j) }
      if (g >= 0) g else -(j + 1)
    }

    def grow(): Unit = {
      val nc = capacity * 2
      alloc(capacity * entryBytes)
      keyLong = keyLong.map(x => java.util.Arrays.copyOf(x, nc))
      keyStr = keyStr.map(x => java.util.Arrays.copyOf(x, nc))
      keyNull = keyNull.map(x => java.util.Arrays.copyOf(x, nc))
      longAcc = longAcc.map(x => java.util.Arrays.copyOf(x, nc))
      dblAcc = dblAcc.map(x => java.util.Arrays.copyOf(x, nc))
      strAcc = strAcc.map(x => java.util.Arrays.copyOf(x, nc))
      objAcc = objAcc.map(x => java.util.Arrays.copyOf(x, nc))
      seen = seen.map(x => java.util.Arrays.copyOf(x, nc))
      capacity = nc
    }

    def reset(): Unit = {
      nGroups = 0
      probeReset()
      var s = 0
      while (s < seen.length) { java.util.Arrays.fill(seen(s), false); s += 1 }
      s = 0
      while (s < longAcc.length) {
        java.util.Arrays.fill(longAcc(s), 0L)
        java.util.Arrays.fill(dblAcc(s), 0d)
        java.util.Arrays.fill(strAcc(s).asInstanceOf[Array[AnyRef]], null)
        java.util.Arrays.fill(objAcc(s), null)
        s += 1
      }
    }
}

/** Columnar partial HashAggregate WITH grouping keys: accumulates
  * per-group buffers directly on the scan's ColumnarBatches and emits
  * one row per group per partition in Spark's partial-buffer layout —
  * the final HashAggregate (row, or [[org.apache.spark.sql.execution.graft.GraftColumnarFinalAggExec]])
  * merges them after the shuffle on the keys.
  *
  * Memory bound (the part that makes this 100 TB-safe on
  * high-cardinality keys): when a partition's hash table exceeds
  * `maxGroups`, the current groups are FLUSHED as a batch and the table
  * resets — partial aggregation is allowed to emit multiple buffer rows
  * per key, the final merge is unaffected. This mirrors Spark's own
  * partial-agg behavior of falling back to emitting unmerged rows when
  * its map fills (spark.sql.aggregate.skipPartialAggregate heuristics)
  * — bounded memory, no spill file needed at the partial stage.
  *
  * Reference analogue: native grouped HashAggregate partial mode
  * (planner.rs agg serde; JVM wiring operators.scala:386-776).
  *
  * `mergeIdx` marks the MERGE-input specs of a mixed PartialMerge +
  * Partial node (Spark's value-distinct plans put merge_count/merge_max
  * beside the distinct partial): those specs read partial-buffer
  * columns through dedicated merge variants (count/avg/decimal-sum/
  * long-sum/double-sum; min/max merges are their own updates), making
  * ALL FOUR aggregate levels of a mixed-distinct plan columnar. A/B
  * sf0.1 interleaved min-of-9: mixed distinct+plain 0.94x, distinct +
  * money sum + avg 0.66x vs the row path.
  */
case class GraftColumnarGroupedAggExec(
    output: Seq[Attribute], keys: Seq[GroupKeySpec], specs: Seq[AggSpec],
    child: SparkPlan, maxGroups: Int,
    mergeIdx: Set[Int] = Set.empty,
    keyOut: Seq[Int] = Nil)
    extends UnaryExecNode {
  // keyOut (keys-only nodes): output column c emits grouping key
  // keyOut(c) — the pruned/reordered/aliased resultExpressions of a
  // re-dedup above an already-distinct stage (Spark merges the
  // downstream projection into the agg's result). Empty = natural
  // keys ++ buffers layout. Only valid when specs is empty: buffer
  // columns keep their positional layout.

  override def supportsColumnar: Boolean = true
  override def outputPartitioning = child.outputPartitioning

  override lazy val metrics = Map(
    "numInputRows" -> SQLMetrics.createMetric(sparkContext, "number of input rows"),
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output (group) rows"),
    "numFlushes" -> SQLMetrics.createMetric(sparkContext, "hash-table flushes (incl. final)"))

  private def longGetter(v: ColumnVector, dt: DataType): Int => Long = dt match {
    case ByteType => v.getByte(_).toLong
    case ShortType => v.getShort(_).toLong
    case IntegerType | DateType => v.getInt(_).toLong
    case DoubleType => i => {
      // key representation = NORMALIZED IEEE bits (NormalizeNaNAndZero
      // semantics: every NaN to the canonical quiet NaN, -0.0 to +0.0).
      // doubleToLongBits already canonicalizes NaN; collapse the zero.
      // Idempotent, so re-normalizing already-normalized upper-level
      // keys is harmless, and it makes bit-equality == Spark's grouping
      // equality for doubles.
      val b = java.lang.Double.doubleToLongBits(v.getDouble(i))
      if (b == java.lang.Long.MIN_VALUE) 0L else b // 0x8000... = -0.0
    }
    case _ => v.getLong
  }

  override def doExecuteColumnar(): RDD[ColumnarBatch] = {
    val (inM, outM, flushM) =
      (metrics("numInputRows"), metrics("numOutputRows"), metrics("numFlushes"))
    val mergeIdxLocal = mergeIdx
    val schema = StructType(output.map(a => StructField(a.name, a.dataType, a.nullable)))
    val nKeys = keys.length
    val nSpecs = specs.length
    val maxG = maxGroups
    val keysLocal = keys
    val specsLocal = specs
    val keyOutLocal: Array[Int] = keyOut.toArray

    child.executeColumnar().mapPartitionsInternal { iter =>
      import AggSpec._
      val res = GraftMemoryReservation.forTask()
      val st = new GroupAggState(nSpecs, nKeys,
        bytes => res.forall(_.reserve(bytes)))

      /** drain the current hash table into one output batch. */
      def flush(): ColumnarBatch = {
        val g = st.nGroups
        val cols = OnHeapColumnVector.allocateColumns(g, schema)
        // key columns first (partial layout: keys ++ buffers); with a
        // keyOut mapping, output column c sources key keyOut(c) instead
        val nOutCols = if (keyOutLocal.isEmpty) nKeys else keyOutLocal.length
        var c = 0
        while (c < nOutCols) {
          val k = if (keyOutLocal.isEmpty) c else keyOutLocal(c)
          val dt = keysLocal(k).dt
          var i = 0
          while (i < g) {
            if (st.keyNull(k)(i)) cols(c).putNull(i)
            else dt match {
              case StringType => cols(c).putByteArray(i, st.keyStr(k)(i).getBytes)
              case ByteType => cols(c).putByte(i, st.keyLong(k)(i).toByte)
              case ShortType => cols(c).putShort(i, st.keyLong(k)(i).toShort)
              case IntegerType | DateType => cols(c).putInt(i, st.keyLong(k)(i).toInt)
              case DoubleType => cols(c).putDouble(i,
                java.lang.Double.longBitsToDouble(st.keyLong(k)(i)))
              case _ => cols(c).putLong(i, st.keyLong(k)(i))
            }
            i += 1
          }
          c += 1
        }
        GraftColumnarGroupedAggExec.writeBufferColumns(
          specsLocal.toIndexedSeq, st, cols, nKeys, g, mergeIdxLocal)
        outM.add(g); flushM.add(1)
        val out = new ColumnarBatch(cols.toArray[ColumnVector], g)
        st.reset()
        out
      }

      // single non-string key? → primitive open-addressing path
      val fastKey: GroupKeySpec =
        if (nKeys == 1 && keysLocal(0).dt != StringType) keysLocal(0) else null

      /** allocate group storage for a long key (or NULL when isNull). */
      def allocLongGroup(k: Long, isNull: Boolean): Int = {
        if (st.nGroups == st.capacity) st.grow()
        val gid = st.nGroups
        // write the null flag unconditionally: gid slots are reused
        // after a maxGroups flush and reset() does not clear key arrays
        st.keyNull(0)(gid) = isNull
        if (!isNull) st.keyLong(0)(gid) = k
        st.nGroups += 1
        gid
      }

      /** column-at-a-time accumulation of one input batch into the table. */
      def accumulate(batch: ColumnarBatch): Unit = {
        val m = batch.numRows()
        inM.add(m)
        val gids = new Array[Int](m)
        var i = 0
        if (fastKey != null) {
          val v = batch.column(fastKey.col)
          val get = longGetter(v, fastKey.dt)
          while (i < m) {
            if (v.isNullAt(i)) {
              if (st.nullGid < 0) st.nullGid = allocLongGroup(0L, isNull = true)
              gids(i) = st.nullGid
            } else {
              val k = get(i)
              val r = st.probeGet(k)
              if (r >= 0) gids(i) = r
              else {
                val gid = allocLongGroup(k, isNull = false)
                st.probePut(r, k, gid)
                gids(i) = gid
              }
            }
            i += 1
          }
        } else {
          // Multi-key / string-key path: decode each row's key parts
          // into reusable scratch arrays, mix a 64-bit hash, and probe
          // the same open-addressing table (probeKeys holds the hash)
          // with verification against the cloned per-group key columns.
          // Typed getters resolve once per BATCH — the per-row work is
          // vector reads + mixing, no boxing and no composite-key
          // allocation (a HashMap-of-boxed-parts version of this loop
          // measured ~25% behind row codegen on the 8-way cube fan-out;
          // this one is at parity).
          val vecs = new Array[ColumnVector](nKeys)
          val getters = new Array[Int => Long](nKeys) // null for string keys
          var c = 0
          while (c < nKeys) {
            val ks = keysLocal(c)
            vecs(c) = batch.column(ks.col)
            if (ks.dt != StringType) getters(c) = longGetter(vecs(c), ks.dt)
            c += 1
          }
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
          def allocMultiGroup(): Int = {
            if (st.nGroups == st.capacity) st.grow()
            val gid = st.nGroups
            var p = 0
            while (p < nKeys) {
              st.keyNull(p)(gid) = pNull(p) // unconditional: slots reused after flush
              if (!pNull(p)) {
                if (pStr(p) ne null) st.keyStr(p)(gid) = pStr(p).clone()
                else st.keyLong(p)(gid) = pLong(p)
              }
              p += 1
            }
            st.nGroups += 1
            gid
          }
          while (i < m) {
            var h = -3750763034362895579L
            var p = 0
            while (p < nKeys) {
              val v = vecs(p)
              var x = 0L
              if (v.isNullAt(i)) { pNull(p) = true; pStr(p) = null; x = 0x9E3779B97F4A7C15L }
              else {
                pNull(p) = false
                val g = getters(p)
                if (g eq null) { val s = v.getUTF8String(i); pStr(p) = s; x = s.hashCode.toLong }
                else { pStr(p) = null; val l = g(i); pLong(p) = l; x = l }
              }
              h = (h ^ x) * 0xff51afd7ed558ccdL
              h ^= h >>> 29
              p += 1
            }
            val r = st.probeGetVerified(h, eqFn)
            if (r >= 0) gids(i) = r
            else {
              val gid = allocMultiGroup()
              st.probePut(r, h, gid)
              gids(i) = gid
            }
            i += 1
          }
        }
        i = 0
        var si = 0
        while (si < nSpecs) {
          specsLocal(si) match {
            // ---- MERGE-input specs (mixed PartialMerge+Partial nodes):
            // read PARTIAL BUFFER columns instead of raw inputs. Only
            // the specs whose merge op differs from the update op need
            // a variant here — sum/min/max merges are the same read-and-
            // combine as their updates and fall through to those cases.
            case CountSpec(col) if mergeIdxLocal(si) =>
              // merge_count = sum of partial counts (non-null buffer)
              val v = batch.column(col)
              var j = 0
              while (j < m) { st.longAcc(si)(gids(j)) += v.getLong(j); j += 1 }
            case AvgSpec(col, _) if mergeIdxLocal(si) =>
              // buffer = (sum: non-null double, count: non-null long)
              val v = batch.column(col); val cnt = batch.column(col + 1)
              var j = 0
              while (j < m) {
                val gid = gids(j)
                st.dblAcc(si)(gid) += v.getDouble(j)
                st.longAcc(si)(gid) += cnt.getLong(j)
                j += 1
              }
            case SumLongSpec(col, _, ansi) if mergeIdxLocal(si) =>
              // buffer column is LONG regardless of the original input
              // width — bypass the input-typed getter
              val v = batch.column(col)
              var j = 0
              while (j < m) {
                if (!v.isNullAt(j)) {
                  val gid = gids(j)
                  st.longAcc(si)(gid) =
                    GraftColumnarAgg.addLong(st.longAcc(si)(gid), v.getLong(j), ansi)
                  st.seen(si)(gid) = true
                }
                j += 1
              }
            case SumDoubleSpec(col, _) if mergeIdxLocal(si) =>
              // buffer is DOUBLE even for float inputs
              val v = batch.column(col)
              var j = 0
              while (j < m) {
                if (!v.isNullAt(j)) {
                  val gid = gids(j)
                  st.dblAcc(si)(gid) += v.getDouble(j)
                  st.seen(si)(gid) = true
                }
                j += 1
              }
            case AggSpec.DecSumSpec(col, buf, _) if mergeIdxLocal(si) =>
              // (sum, isEmpty) with upstream-overflow poison — the same
              // conventions as the row-input merge exec
              val v = batch.column(col); val e = batch.column(col + 1)
              var j = 0
              while (j < m) {
                if (!e.getBoolean(j)) {
                  val gid = gids(j)
                  st.seen(si)(gid) = true
                  val cur = st.objAcc(si)(gid)
                  if (cur ne GraftColumnarAgg.DecPoison) {
                    if (v.isNullAt(j)) st.objAcc(si)(gid) = GraftColumnarAgg.DecPoison
                    else GraftColumnarAgg.mergeDecSumValue(st.longAcc(si), st.objAcc(si),
                      gid, v.getDecimal(j, buf.precision, buf.scale))
                  }
                }
                j += 1
              }
            case CountSpec(col) =>
              if (col < 0) { var j = 0; while (j < m) { st.longAcc(si)(gids(j)) += 1; j += 1 } }
              else {
                val v = batch.column(col)
                var j = 0
                while (j < m) { if (!v.isNullAt(j)) st.longAcc(si)(gids(j)) += 1; j += 1 }
              }
            case SumDoubleSpec(col, dt) =>
              val v = batch.column(col)
              val isFloat = dt == FloatType
              var j = 0
              while (j < m) {
                if (!v.isNullAt(j)) {
                  val gid = gids(j)
                  st.dblAcc(si)(gid) += (if (isFloat) v.getFloat(j).toDouble else v.getDouble(j))
                  st.seen(si)(gid) = true
                }
                j += 1
              }
            case MinMaxLongSpec(col, dt, isMin) =>
              val v = batch.column(col)
              val get = longGetter(v, dt)
              var j = 0
              while (j < m) {
                if (!v.isNullAt(j)) {
                  val gid = gids(j); val x = get(j)
                  if (!st.seen(si)(gid) ||
                      (if (isMin) x < st.longAcc(si)(gid) else x > st.longAcc(si)(gid)))
                    st.longAcc(si)(gid) = x
                  st.seen(si)(gid) = true
                }
                j += 1
              }
            case MinMaxDoubleSpec(col, dt, isMin) =>
              val v = batch.column(col)
              val isFloat = dt == FloatType
              var j = 0
              while (j < m) {
                if (!v.isNullAt(j)) {
                  val gid = gids(j)
                  val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
                  val better =
                    if (!st.seen(si)(gid)) true
                    else if (isMin) GraftColumnarAgg.nanSafeLt(x, st.dblAcc(si)(gid))
                    else GraftColumnarAgg.nanSafeLt(st.dblAcc(si)(gid), x)
                  if (better) st.dblAcc(si)(gid) = x
                  st.seen(si)(gid) = true
                }
                j += 1
              }
            case MinMaxStringSpec(col, isMin) =>
              val v = batch.column(col)
              var j = 0
              while (j < m) {
                if (!v.isNullAt(j)) {
                  val gid = gids(j)
                  val s = v.getUTF8String(j)
                  if (!st.seen(si)(gid) ||
                      (if (isMin) s.compareTo(st.strAcc(si)(gid)) < 0
                       else s.compareTo(st.strAcc(si)(gid)) > 0))
                    st.strAcc(si)(gid) = s.clone()
                  st.seen(si)(gid) = true
                }
                j += 1
              }
            case AvgSpec(col, dt) =>
              val v = batch.column(col)
              val get: Int => Double = dt match {
                case ByteType => v.getByte(_).toDouble
                case ShortType => v.getShort(_).toDouble
                case IntegerType => v.getInt(_).toDouble
                case LongType => v.getLong(_).toDouble
                case FloatType => v.getFloat(_).toDouble
                case _ => v.getDouble
              }
              var j = 0
              while (j < m) {
                if (!v.isNullAt(j)) {
                  val gid = gids(j)
                  st.dblAcc(si)(gid) += get(j); st.longAcc(si)(gid) += 1
                }
                j += 1
              }
            case SumDec64Spec(col, in, _, _) =>
              val v = batch.column(col)
              val get = GraftColumnarAgg.dec64VecGetter(v, in)
              var j = 0
              while (j < m) {
                if (!v.isNullAt(j)) {
                  val gid = gids(j)
                  val x = get(j)
                  val big = st.objAcc(si)(gid)
                  if (big == null) {
                    val s0 = st.longAcc(si)(gid); val r = s0 + x
                    if (((s0 ^ r) & (x ^ r)) < 0L) // overflow → BigInteger escape
                      st.objAcc(si)(gid) = java.math.BigInteger.valueOf(s0)
                        .add(java.math.BigInteger.valueOf(x))
                    else st.longAcc(si)(gid) = r
                  } else st.objAcc(si)(gid) = big.asInstanceOf[java.math.BigInteger]
                    .add(java.math.BigInteger.valueOf(x))
                  st.seen(si)(gid) = true
                }
                j += 1
              }
            case SumDec128Spec(col, in, _, _) =>
              val v = batch.column(col)
              v match {
                case dv: Dec128ArrayVector =>
                  var j = 0
                  while (j < m) {
                    if (!dv.isNullAt(j)) {
                      val gid = gids(j)
                      GraftColumnarAgg.addDec128(st.objAcc(si), gid, dv.hiAt(j), dv.loAt(j))
                      st.seen(si)(gid) = true
                    }
                    j += 1
                  }
                case _ =>
                  var j = 0
                  while (j < m) {
                    if (!v.isNullAt(j)) {
                      val gid = gids(j)
                      val bi = v.getDecimal(j, in.precision, in.scale)
                        .toJavaBigDecimal.unscaledValue()
                      GraftColumnarAgg.addDec128(st.objAcc(si), gid,
                        VecDec128Expr.hiOf(bi), VecDec128Expr.loOf(bi))
                      st.seen(si)(gid) = true
                    }
                    j += 1
                  }
              }
            case MinMaxDec64Spec(col, dt, isMin) =>
              val v = batch.column(col)
              val get = GraftColumnarAgg.dec64VecGetter(v, dt)
              var j = 0
              while (j < m) {
                if (!v.isNullAt(j)) {
                  val gid = gids(j); val x = get(j)
                  if (!st.seen(si)(gid) ||
                      (if (isMin) x < st.longAcc(si)(gid) else x > st.longAcc(si)(gid)))
                    st.longAcc(si)(gid) = x
                  st.seen(si)(gid) = true
                }
                j += 1
              }
            case MinMaxDec128Spec(col, dt, isMin) =>
              val v = batch.column(col)
              v match {
                case dv: Dec128ArrayVector =>
                  var j = 0
                  while (j < m) {
                    if (!dv.isNullAt(j)) {
                      val gid = gids(j)
                      GraftColumnarAgg.minMaxDec128(st.objAcc(si), gid, dv.hiAt(j),
                        dv.loAt(j), isMin, st.seen(si)(gid))
                      st.seen(si)(gid) = true
                    }
                    j += 1
                  }
                case _ =>
                  var j = 0
                  while (j < m) {
                    if (!v.isNullAt(j)) {
                      val gid = gids(j)
                      val bi = v.getDecimal(j, dt.precision, dt.scale)
                        .toJavaBigDecimal.unscaledValue()
                      GraftColumnarAgg.minMaxDec128(st.objAcc(si), gid,
                        VecDec128Expr.hiOf(bi), VecDec128Expr.loOf(bi), isMin,
                        st.seen(si)(gid))
                      st.seen(si)(gid) = true
                    }
                    j += 1
                  }
              }
            case SumLongSpec(col, in, ansi) =>
              val v = batch.column(col)
              val get = GraftColumnarAgg.longSumGetter(v, in)
              var j = 0
              while (j < m) {
                if (!v.isNullAt(j)) {
                  val gid = gids(j)
                  st.longAcc(si)(gid) =
                    GraftColumnarAgg.addLong(st.longAcc(si)(gid), get(j), ansi)
                  st.seen(si)(gid) = true
                }
                j += 1
              }
            case MomentsSpec(col, order) =>
              // CentralMomentAgg per group: n in the long lane (exact),
              // (avg, m2[, m3[, m4]]) in a per-group double[order] in
              // the object lane — allocated on the group's first
              // non-null input, cleared by reset()
              val v = batch.column(col)
              var j = 0
              while (j < m) {
                if (!v.isNullAt(j)) {
                  val gid = gids(j)
                  var arr = st.objAcc(si)(gid).asInstanceOf[Array[Double]]
                  if (arr == null) {
                    arr = new Array[Double](order)
                    st.objAcc(si)(gid) = arr
                  }
                  st.longAcc(si)(gid) = GraftColumnarAgg.momUpdate(
                    arr, st.longAcc(si)(gid), v.getDouble(j), order)
                }
                j += 1
              }
            case CovSpec(xCol, yCol) =>
              val vx = batch.column(xCol)
              val vy = batch.column(yCol)
              var j = 0
              while (j < m) {
                if (!vx.isNullAt(j) && !vy.isNullAt(j)) {
                  val gid = gids(j)
                  var arr = st.objAcc(si)(gid).asInstanceOf[Array[Double]]
                  if (arr == null) {
                    arr = new Array[Double](3)
                    st.objAcc(si)(gid) = arr
                  }
                  st.longAcc(si)(gid) = GraftColumnarAgg.covUpdate(
                    arr, st.longAcc(si)(gid), vx.getDouble(j), vy.getDouble(j), corr = false)
                }
                j += 1
              }
            case CorrSpec(xCol, yCol) =>
              val vx = batch.column(xCol)
              val vy = batch.column(yCol)
              var j = 0
              while (j < m) {
                if (!vx.isNullAt(j) && !vy.isNullAt(j)) {
                  val gid = gids(j)
                  var arr = st.objAcc(si)(gid).asInstanceOf[Array[Double]]
                  if (arr == null) {
                    arr = new Array[Double](5)
                    st.objAcc(si)(gid) = arr
                  }
                  st.longAcc(si)(gid) = GraftColumnarAgg.covUpdate(
                    arr, st.longAcc(si)(gid), vx.getDouble(j), vy.getDouble(j), corr = true)
                }
                j += 1
              }
            case AvgDec64Spec(col, in, _) =>
              // SumDec64's add-with-escape on the sum lane; count rides
              // the double lane (exact below 2^53)
              val v = batch.column(col)
              val get = GraftColumnarAgg.dec64VecGetter(v, in)
              var j = 0
              while (j < m) {
                if (!v.isNullAt(j)) {
                  val gid = gids(j)
                  val x = get(j)
                  val big = st.objAcc(si)(gid)
                  if (big == null) {
                    val s0 = st.longAcc(si)(gid); val r = s0 + x
                    if (((s0 ^ r) & (x ^ r)) < 0L)
                      st.objAcc(si)(gid) = java.math.BigInteger.valueOf(s0)
                        .add(java.math.BigInteger.valueOf(x))
                    else st.longAcc(si)(gid) = r
                  } else st.objAcc(si)(gid) = big.asInstanceOf[java.math.BigInteger]
                    .add(java.math.BigInteger.valueOf(x))
                  st.dblAcc(si)(gid) += 1
                }
                j += 1
              }
            case AvgDec128Spec(col, in, _) =>
              // SumDec128's int128 add in the object lane; count in the
              // (free) long lane
              val v = batch.column(col)
              v match {
                case dv: Dec128ArrayVector =>
                  var j = 0
                  while (j < m) {
                    if (!dv.isNullAt(j)) {
                      val gid = gids(j)
                      GraftColumnarAgg.addDec128(st.objAcc(si), gid, dv.hiAt(j), dv.loAt(j))
                      st.longAcc(si)(gid) += 1
                    }
                    j += 1
                  }
                case _ =>
                  var j = 0
                  while (j < m) {
                    if (!v.isNullAt(j)) {
                      val gid = gids(j)
                      val bi = v.getDecimal(j, in.precision, in.scale)
                        .toJavaBigDecimal.unscaledValue()
                      GraftColumnarAgg.addDec128(st.objAcc(si), gid,
                        VecDec128Expr.hiOf(bi), VecDec128Expr.loOf(bi))
                      st.longAcc(si)(gid) += 1
                    }
                    j += 1
                  }
              }
            case FirstLastSpec(col, dt, isFirst, ignoreNulls) =>
              val v = batch.column(col)
              var j = 0
              while (j < m) {
                val gid = gids(j)
                if (!(isFirst && st.seen(si)(gid))) {
                  val isNull = v.isNullAt(j)
                  if (!ignoreNulls || !isNull) {
                    if (isNull) st.objAcc(si)(gid) = java.lang.Boolean.TRUE
                    else {
                      st.objAcc(si)(gid) = null
                      dt match {
                        case DoubleType => st.dblAcc(si)(gid) = v.getDouble(j)
                        case FloatType => st.dblAcc(si)(gid) = v.getFloat(j).toDouble
                        case StringType => st.strAcc(si)(gid) = v.getUTF8String(j).clone()
                        case d: DecimalType =>
                          st.longAcc(si)(gid) =
                            v.getDecimal(j, d.precision, d.scale).toUnscaledLong
                        case IntegerType | DateType => st.longAcc(si)(gid) = v.getInt(j).toLong
                        case ShortType => st.longAcc(si)(gid) = v.getShort(j).toLong
                        case ByteType => st.longAcc(si)(gid) = v.getByte(j).toLong
                        case BooleanType =>
                          st.longAcc(si)(gid) = if (v.getBoolean(j)) 1L else 0L
                        case _ => st.longAcc(si)(gid) = v.getLong(j)
                      }
                    }
                    st.seen(si)(gid) = true
                  }
                }
                j += 1
              }
          }
          si += 1
        }
      }

      // stream: accumulate until the table passes maxGroups → flush a
      // batch; final flush on input exhaustion (even if 0 groups: an
      // empty partition emits nothing — grouped partial agg has no
      // initial row, unlike the global variant).
      new Iterator[ColumnarBatch] {
        private var finished = false
        private var pending: ColumnarBatch = _
        private def advance(): Unit = {
          while (pending == null && !finished) {
            if (iter.hasNext) {
              accumulate(iter.next())
              // flush on the structural cap OR on memory pressure (a
              // grow the task memory manager could not fully grant):
              // partial rows may always be emitted early, the final
              // merge combines duplicates.
              if (st.nGroups >= maxG || st.pressure) {
                st.pressure = false
                pending = flush()
              }
            } else {
              finished = true
              if (st.nGroups > 0) pending = flush()
            }
          }
        }
        override def hasNext: Boolean = { advance(); pending != null }
        override def next(): ColumnarBatch = {
          advance()
          val b = pending; pending = null; b
        }
      }
    }
  }

  /** Row fallback — unreachable: the rule only swaps over columnar
    * children and supportsColumnar routes planning to the batch path. */
  override protected def doExecute(): RDD[InternalRow] =
    throw new IllegalStateException("GraftColumnarGroupedAgg row path not implemented")

  override protected def withNewChildInternal(newChild: SparkPlan): GraftColumnarGroupedAggExec =
    copy(child = newChild)
}

object GraftColumnarGroupedAggExec {
  /** conf key bounding the per-partition hash table; exceeding it
    * flushes partial rows early (correct: final agg merges duplicates). */
  val maxGroupsKey = "spark.graft.columnar.agg.maxGroups"
  val defaultMaxGroups = 1 << 16


  /** Write every spec's PARTIAL-BUFFER columns for `g` groups starting
    * at column `startSlot` — shared by the partial exec's flush and the
    * PartialMerge exec's buffer-emitting flush (both emit the exact
    * keys-plus-buffer-attributes layout the row HashAggregate emits).
    */
  def writeBufferColumns(specs: IndexedSeq[AggSpec], st: GroupAggState,
      cols: Array[org.apache.spark.sql.execution.vectorized.OnHeapColumnVector],
      startSlot: Int, g: Int, mergeState: Int => Boolean = _ => false): Unit = {
    import AggSpec._
    var slot = startSlot
    var si = 0
    while (si < specs.length) {
      specs(si) match {
        case CountSpec(_) =>
          var i = 0
          while (i < g) { cols(slot).putLong(i, st.longAcc(si)(i)); i += 1 }
          slot += 1
        case SumDoubleSpec(_, _) =>
          var i = 0
          while (i < g) {
            if (st.seen(si)(i)) cols(slot).putDouble(i, st.dblAcc(si)(i))
            else cols(slot).putNull(i)
            i += 1
          }
          slot += 1
        case MinMaxLongSpec(_, dt, _) =>
          var i = 0
          while (i < g) {
            if (!st.seen(si)(i)) cols(slot).putNull(i)
            else dt match {
              case ByteType => cols(slot).putByte(i, st.longAcc(si)(i).toByte)
              case ShortType => cols(slot).putShort(i, st.longAcc(si)(i).toShort)
              case IntegerType | DateType => cols(slot).putInt(i, st.longAcc(si)(i).toInt)
              case _ => cols(slot).putLong(i, st.longAcc(si)(i))
            }
            i += 1
          }
          slot += 1
        case MinMaxDoubleSpec(_, dt, _) =>
          var i = 0
          while (i < g) {
            if (!st.seen(si)(i)) cols(slot).putNull(i)
            else if (dt == FloatType) cols(slot).putFloat(i, st.dblAcc(si)(i).toFloat)
            else cols(slot).putDouble(i, st.dblAcc(si)(i))
            i += 1
          }
          slot += 1
        case MinMaxStringSpec(_, _) =>
          var i = 0
          while (i < g) {
            if (st.seen(si)(i)) cols(slot).putByteArray(i, st.strAcc(si)(i).getBytes)
            else cols(slot).putNull(i)
            i += 1
          }
          slot += 1
        case AvgSpec(_, _) =>
          var i = 0
          while (i < g) {
            cols(slot).putDouble(i, st.dblAcc(si)(i))
            cols(slot + 1).putLong(i, st.longAcc(si)(i))
            i += 1
          }
          slot += 2
        case SumDec64Spec(_, _, buf, _) =>
          // empty → (ZERO, true): the row merge adds
          // KnownNotNull(sum) unconditionally; null sum means
          // overflow, nothing else
          var i = 0
          while (i < g) {
            if (st.seen(si)(i))
              GraftColumnarAgg.putPartialDecSum(
                cols(slot), i, st.longAcc(si)(i), st.objAcc(si)(i), buf)
            else cols(slot).putDecimal(i,
              Decimal.createUnsafe(0L, buf.precision, buf.scale), buf.precision)
            cols(slot + 1).putBoolean(i, !st.seen(si)(i))
            i += 1
          }
          slot += 2
        case SumDec128Spec(_, _, buf, _) =>
          // same (sum, isEmpty) contract as the Dec64 case above.
          // mergeState: the MERGE exec accumulates both widths in the
          // Dec64 conventions (longAcc + BigInteger escape + poison),
          // not the partial's int128 limb array — write through the
          // width-agnostic Dec64 writer (poison lands on its null arm).
          var i = 0
          while (i < g) {
            if (st.seen(si)(i)) {
              if (mergeState(si))
                GraftColumnarAgg.putPartialDecSum(
                  cols(slot), i, st.longAcc(si)(i), st.objAcc(si)(i), buf)
              else
                GraftColumnarAgg.putPartialDec128Sum(cols(slot), i, st.objAcc(si)(i), buf)
            } else cols(slot).putDecimal(i,
              Decimal.createUnsafe(0L, buf.precision, buf.scale), buf.precision)
            cols(slot + 1).putBoolean(i, !st.seen(si)(i))
            i += 1
          }
          slot += 2
        case MinMaxDec64Spec(_, dt, _) =>
          var i = 0
          while (i < g) {
            if (st.seen(si)(i))
              cols(slot).putDecimal(i,
                Decimal.createUnsafe(st.longAcc(si)(i), dt.precision, dt.scale),
                dt.precision)
            else cols(slot).putNull(i)
            i += 1
          }
          slot += 1
        case MinMaxDec128Spec(_, dt, _) =>
          var i = 0
          while (i < g) {
            st.objAcc(si)(i) match {
              case a: Array[Long] if st.seen(si)(i) =>
                cols(slot).putDecimal(i,
                  GraftColumnarAgg.dec128Value(a(0), a(1), dt), dt.precision)
              case _ => cols(slot).putNull(i)
            }
            i += 1
          }
          slot += 1
        case SumLongSpec(_, _, _) =>
          var i = 0
          while (i < g) {
            if (st.seen(si)(i)) cols(slot).putLong(i, st.longAcc(si)(i))
            else cols(slot).putNull(i)
            i += 1
          }
          slot += 1
        case MomentsSpec(_, order) =>
          // CentralMomentAgg buffers are non-nullable, init 0.0 —
          // a group exists only after ≥1 input row, but that row's
          // value may have been NULL (arr stays unallocated)
          var i = 0
          while (i < g) {
            val arr = st.objAcc(si)(i).asInstanceOf[Array[Double]]
            cols(slot).putDouble(i, st.longAcc(si)(i).toDouble)
            var k = 0
            while (k < order) {
              cols(slot + 1 + k).putDouble(i, if (arr == null) 0.0 else arr(k))
              k += 1
            }
            i += 1
          }
          slot += order + 1
        case s @ (CovSpec(_, _) | CorrSpec(_, _)) =>
          var i = 0
          while (i < g) {
            val arr = st.objAcc(si)(i).asInstanceOf[Array[Double]]
            cols(slot).putDouble(i, st.longAcc(si)(i).toDouble)
            var k = 1
            while (k < s.slots) {
              cols(slot + k).putDouble(i, if (arr == null) 0.0 else arr(k - 1))
              k += 1
            }
            i += 1
          }
          slot += s.slots
        case AvgDec64Spec(_, _, buf) =>
          // buffer = (sum starting at ZERO, count) — null sum means
          // overflow past the buffer precision, nothing else
          var i = 0
          while (i < g) {
            GraftColumnarAgg.putPartialDecSum(
              cols(slot), i, st.longAcc(si)(i), st.objAcc(si)(i), buf)
            cols(slot + 1).putLong(i, st.dblAcc(si)(i).toLong)
            i += 1
          }
          slot += 2
        case AvgDec128Spec(_, _, buf) =>
          var i = 0
          while (i < g) {
            st.objAcc(si)(i) match {
              case null => cols(slot).putDecimal(i,
                Decimal.createUnsafe(0L, buf.precision, buf.scale), buf.precision)
              case acc => GraftColumnarAgg.putPartialDec128Sum(cols(slot), i, acc, buf)
            }
            cols(slot + 1).putLong(i, st.longAcc(si)(i))
            i += 1
          }
          slot += 2
        case FirstLastSpec(_, dt, _, _) =>
          // buffer = (value — may be a captured NULL when
          // ignoreNulls=false (object-lane marker), valueSet)
          var i = 0
          while (i < g) {
            if (!st.seen(si)(i) || (st.objAcc(si)(i) ne null)) cols(slot).putNull(i)
            else dt match {
              case StringType =>
                cols(slot).putByteArray(i, st.strAcc(si)(i).getBytes)
              case DoubleType => cols(slot).putDouble(i, st.dblAcc(si)(i))
              case FloatType => cols(slot).putFloat(i, st.dblAcc(si)(i).toFloat)
              case d: DecimalType => cols(slot).putDecimal(i,
                Decimal.createUnsafe(st.longAcc(si)(i), d.precision, d.scale),
                d.precision)
              case ByteType => cols(slot).putByte(i, st.longAcc(si)(i).toByte)
              case ShortType => cols(slot).putShort(i, st.longAcc(si)(i).toShort)
              case IntegerType | DateType => cols(slot).putInt(i, st.longAcc(si)(i).toInt)
              case BooleanType => cols(slot).putBoolean(i, st.longAcc(si)(i) != 0L)
              case _ => cols(slot).putLong(i, st.longAcc(si)(i))
            }
            cols(slot + 1).putBoolean(i, st.seen(si)(i))
            i += 1
          }
          slot += 2
      }
      si += 1
    }
  }

  val supportedKeyTypes: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType, DateType,
      TimestampType, TimestampNTZType, StringType,
      // doubles group on NORMALIZED bits (NaN canonical, -0.0 -> 0.0),
      // matching Spark's NormalizeFloatingNumbers grouping semantics —
      // the value-distinct dedup levels key on the aggregated column.
      // (FloatType would need an int-bits lane; none of the inventory's
      // tables carry floats, so it stays row-path for now.)
      DoubleType)
}
