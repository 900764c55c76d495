// In org.apache.spark.sql.execution.graft alongside the other columnar
// operators — same placement as the reference's org.apache.spark.sql.comet.
package org.apache.spark.sql.execution.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.catalyst.util.SQLOrderingUtil
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graft.{SelectedColumnVector, StringArrayVector}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

/** Columnar per-partition sort (reference analogue: DataFusion SortExec,
  * native/core/src/execution/planner.rs:1211-1245; serde
  * spark/src/main/scala/org/apache/spark/sql/comet/serde/operator/CometSort.scala).
  *
  * OPT-IN (spark.graft.columnar.sort.enabled, default off). The sort
  * itself is a HYBRID: LSD radix on the bit-mapped first key for
  * numeric keys (the algorithm class Tungsten's prefix sort wins with)
  * + comparison sort only inside first-key tie runs; strings take the
  * pure comparison path over a CONCATENATED byte buffer (one shared
  * byte[] + offset/length lanes per string column — a poor-JVM's arena:
  * no per-row UTF8String clone at buffering, Arrays.compareUnsigned
  * intrinsic comparisons, zero-copy fromBytes views at emission).
  * Refreshed sf0.1 A/B medians (3 session runs) after that rework:
  * narrow numeric rows WIN (sort-narrow-3col 0.86-0.94x), string key
  * 1.15-1.21x (was 2.6x with cloned strings), 2key-mixed 1.01-1.06x
  * (was 1.46x), wide 16-col rows still lose (sort-1key-long 1.38-1.40x)
  * — the residual cost is buffering every output column of a wide row,
  * which the reference escapes with native arena allocation + SIMD
  * (DataFusion SortExec). Narrow all-numeric outputs (<= 4 columns)
  * swap by DEFAULT (winning 0.55-0.87x A/B — sort.narrow.enabled, q164
  * pins the plan); wide or string outputs remain opt-in via
  * sort.enabled.
  *
  * Replaces `ColumnarToRow + SortExec` above a columnar block: input
  * batches are decomposed COLUMN-WISE into typed primitive arrays (the
  * parquet reader reuses its vectors, so a copy is mandatory for any
  * sort — Tungsten pays the same copy row-wise into UnsafeRows), an
  * index array is sorted by comparing the key arrays directly (no row
  * objects, no per-comparison virtual dispatch beyond one call per key
  * column), and output batches are zero-copy [[SelectedColumnVector]]
  * gathers of the sorted index over the buffered columns.
  *
  * Memory/scale: NO disk spill (unlike Tungsten's UnsafeExternalSorter
  * or DataFusion's spilling SortExec) — the planning rule only swaps
  * sorts whose child is a columnar scan block, where the partition is
  * bounded by `spark.sql.files.maxPartitionBytes` (128 MiB default), so
  * peak memory ≈ one scan split in primitive arrays per task — the same
  * order as Tungsten's pre-spill working set. Sorts above exchanges
  * (row children, unbounded per-partition after skew) never swap.
  *
  * `global=true` instances keep their contract through the planner: the
  * required OrderedDistribution was enforced by EnsureRequirements
  * before this rule runs, and per-partition sorting is all SortExec
  * itself does at execution time.
  */
case class GraftColumnarSortExec(
    keys: Seq[TopKKeySpec],
    sortOrder: Seq[SortOrder],
    global: Boolean,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def supportsColumnar: Boolean = true
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = sortOrder

  override lazy val metrics = Map(
    "numInputRows" -> SQLMetrics.createMetric(sparkContext, "number of input rows"),
    "numBatches" -> SQLMetrics.createMetric(sparkContext, "number of output batches"),
    "sortTime" -> SQLMetrics.createTimingMetric(sparkContext, "index sort time"))

  import GraftColumnarSortExec._

  override def doExecuteColumnar(): RDD[ColumnarBatch] = {
    val colTypes = child.output.map(_.dataType).toArray
    val specs = keys.toArray
    val (inM, batchM, timeM) =
      (metrics("numInputRows"), metrics("numBatches"), metrics("sortTime"))
    child.executeColumnar().mapPartitionsInternal { batches =>
      val bufs: Array[ColBuf] = colTypes.map(newBuf)
      // Coarse per-batch task-memory accounting: the buffers cannot
      // spill mid-sort, so a shortfall only logs (once) — the planning
      // gate bounds the partition to one scan split, so the overshoot
      // is bounded; the point of reserving anyway is that Tungsten
      // consumers on the same executor SEE this memory and spill
      // earlier instead of OOMing blind. Released at task end.
      val res = org.apache.spark.sql.graft.GraftMemoryReservation.forTask()
      var reserved = 0L
      var n = 0
      batches.foreach { batch =>
        val rows = batch.numRows()
        inM.add(rows)
        var c = 0
        while (c < bufs.length) { bufs(c).append(batch.column(c), rows); c += 1 }
        n += rows
        var held = 0L
        c = 0
        while (c < bufs.length) { held += bufs(c).trackedBytes; c += 1 }
        if (held > reserved) { res.foreach(_.reserve(held - reserved)); reserved = held }
      }
      if (n == 0) Iterator.empty
      else {
        val keyBufs = specs.map(s => bufs(s.col))
        res.foreach(_.reserve(4L * n)) // the sort index itself
        val idx = new Array[Int](n)
        var i = 0
        while (i < n) { idx(i) = i; i += 1 }
        val t0 = System.nanoTime()
        sortIndices(idx, n, specs, keyBufs)
        timeM.add((System.nanoTime() - t0) / 1000000)
        val baseVectors = bufs.map(_.vector())
        // emit in bounded chunks: each batch gathers a slice of the
        // sorted index over the shared buffered columns
        new Iterator[ColumnarBatch] {
          private var off = 0
          override def hasNext: Boolean = off < n
          override def next(): ColumnarBatch = {
            val len = math.min(batchRows, n - off)
            val sel = java.util.Arrays.copyOfRange(idx, off, off + len)
            off += len
            val cols = new Array[ColumnVector](baseVectors.length)
            var c = 0
            while (c < cols.length) {
              cols(c) = new SelectedColumnVector(baseVectors(c), sel)
              c += 1
            }
            batchM.add(1)
            new ColumnarBatch(cols, len)
          }
        }
      }
    }
  }

  /** Row fallback — present for completeness; the planner routes through
    * columnar (supportsColumnar).
    */
  override protected def doExecute(): RDD[InternalRow] = {
    val ord = new org.apache.spark.sql.catalyst.expressions.codegen
      .LazilyGeneratedOrdering(sortOrder, child.output)
    child.execute().mapPartitionsInternal { iter =>
      val proj = UnsafeProjection.create(output, output)
      iter.map(_.copy()).toArray.sortWith((a, b) => ord.compare(a, b) < 0)
        .iterator.map(proj)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GraftColumnarSortExec =
    copy(child = newChild)
}

object GraftColumnarSortExec {
  /** Output batch chunk size for the sorted gather. */
  val batchRows = 4096

  /** The narrow default-ON shape: numeric/temporal only — string
    * columns push the A/B above parity (buffer + compare cost). */
  def numericColType(dt: DataType): Boolean =
    dt != StringType && supportedColType(dt)

  def supportedColType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | BooleanType |
         DateType | TimestampType | TimestampNTZType |
         DoubleType | FloatType => true
    case StringType => dt == StringType // default collation only
    case _ => false
  }

  /** Growable column buffer: copies vector slots in (the scan reuses its
    * vectors batch-to-batch, so references cannot be retained), compares
    * by buffered index, re-emits as a ColumnVector for the gather.
    */
  sealed trait ColBuf {
    def append(v: ColumnVector, rows: Int): Unit
    def isNull(i: Int): Boolean
    def cmpRaw(a: Int, b: Int): Int
    def vector(): ColumnVector
    /** Approximate bytes held: primitive lanes exactly, string content
      * at clone size + per-object overhead — read after each append for
      * the coarse task-memory accounting (GraftMemoryReservation). */
    def trackedBytes: Long
  }

  private final class LongBuf(dt: DataType) extends ColBuf {
    private var values = new Array[Long](1 << 12)
    private var nulls = new Array[Boolean](1 << 12)
    private var n = 0
    override def trackedBytes: Long = values.length * 9L
    private val get: (ColumnVector, Int) => Long = dt match {
      case LongType | TimestampType | TimestampNTZType => (v, i) => v.getLong(i)
      case IntegerType | DateType => (v, i) => v.getInt(i).toLong
      case ShortType => (v, i) => v.getShort(i).toLong
      case ByteType => (v, i) => v.getByte(i).toLong
      case BooleanType => (v, i) => if (v.getBoolean(i)) 1L else 0L
      case other => throw new IllegalStateException(s"not a long-family type $other")
    }
    override def append(v: ColumnVector, rows: Int): Unit = {
      if (n + rows > values.length) {
        val cap = math.max(values.length * 2, n + rows)
        values = java.util.Arrays.copyOf(values, cap)
        nulls = java.util.Arrays.copyOf(nulls, cap)
      }
      var i = 0
      while (i < rows) {
        if (v.isNullAt(i)) nulls(n) = true else values(n) = get(v, i)
        n += 1; i += 1
      }
    }
    override def isNull(i: Int): Boolean = nulls(i)
    override def cmpRaw(a: Int, b: Int): Int = java.lang.Long.compare(values(a), values(b))
    override def vector(): ColumnVector = new LongBuildVector(dt, values, nulls, n)
    def raw(i: Int): Long = values(i)
  }

  private final class DoubleBuf(dt: DataType) extends ColBuf {
    private var values = new Array[Double](1 << 12)
    private var nulls = new Array[Boolean](1 << 12)
    private var n = 0
    private val isFloat = dt == FloatType
    override def trackedBytes: Long = values.length * 9L
    override def append(v: ColumnVector, rows: Int): Unit = {
      if (n + rows > values.length) {
        val cap = math.max(values.length * 2, n + rows)
        values = java.util.Arrays.copyOf(values, cap)
        nulls = java.util.Arrays.copyOf(nulls, cap)
      }
      var i = 0
      while (i < rows) {
        if (v.isNullAt(i)) nulls(n) = true
        else values(n) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        n += 1; i += 1
      }
    }
    override def isNull(i: Int): Boolean = nulls(i)
    // compareDoubles = Spark sort semantics: NaN largest, NaN==NaN, -0.0==0.0.
    // Safe for the float lane too: the float→double widening is exact and
    // order-preserving, including NaN handling.
    override def cmpRaw(a: Int, b: Int): Int = SQLOrderingUtil.compareDoubles(values(a), values(b))
    override def vector(): ColumnVector = new DoubleBuildVector(dt, values, nulls, n)
    def raw(i: Int): Double = values(i)
  }

  /** String column buffer over ONE concatenated byte array + offset/
    * length lanes — not one cloned UTF8String object per row. Copying in
    * is a single bulk writeToMemory per cell (no per-row object + byte[]
    * allocation), comparisons run through the
    * java.util.Arrays.compareUnsigned(byte[],...) intrinsic (UTF8_BINARY
    * order == unsigned byte order; the planning rule only swaps
    * default-collation strings), and emission wraps zero-copy
    * UTF8String.fromBytes views over the shared buffer.
    */
  private final class StringBuf extends ColBuf {
    private var bytes = new Array[Byte](1 << 16)
    private var used = 0
    private var offs = new Array[Int](1 << 12)
    private var lens = new Array[Int](1 << 12)
    private var nulls = new Array[Boolean](1 << 12)
    private var n = 0
    override def trackedBytes: Long = bytes.length.toLong + offs.length * 9L
    override def append(v: ColumnVector, rows: Int): Unit = {
      if (n + rows > offs.length) {
        val cap = math.max(offs.length * 2, n + rows)
        offs = java.util.Arrays.copyOf(offs, cap)
        lens = java.util.Arrays.copyOf(lens, cap)
        nulls = java.util.Arrays.copyOf(nulls, cap)
      }
      var i = 0
      while (i < rows) {
        if (v.isNullAt(i)) nulls(n) = true
        else {
          val s = v.getUTF8String(i)
          val len = s.numBytes()
          if (used.toLong + len > bytes.length) {
            // partition content is scan-block-bounded (planning gate),
            // so the 2 GiB byte[] ceiling is never the binding limit
            val cap = math.min(math.max(bytes.length * 2L, used.toLong + len),
              Int.MaxValue.toLong - 16).toInt
            bytes = java.util.Arrays.copyOf(bytes, cap)
          }
          s.writeToMemory(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + used)
          offs(n) = used
          lens(n) = len
          used += len
        }
        n += 1; i += 1
      }
    }
    override def isNull(i: Int): Boolean = nulls(i)
    override def cmpRaw(a: Int, b: Int): Int =
      java.util.Arrays.compareUnsigned(
        bytes, offs(a), offs(a) + lens(a),
        bytes, offs(b), offs(b) + lens(b))
    override def vector(): ColumnVector = new ByteSliceStringVector(bytes, offs, lens, nulls, n)
  }

  def newBuf(dt: DataType): ColBuf = dt match {
    case DoubleType | FloatType => new DoubleBuf(dt)
    case StringType => new StringBuf
    case _ => new LongBuf(dt)
  }

  /** Full key compare of buffered rows a vs b: direction and null
    * placement per spec, tie falls to the next key. */
  private def cmpKeys(specs: Array[TopKKeySpec], keyBufs: Array[ColBuf], a: Int, b: Int): Int = {
    var k = 0
    while (k < specs.length) {
      val s = specs(k)
      val buf = keyBufs(k)
      val an = buf.isNull(a)
      val bn = buf.isNull(b)
      val c =
        if (an && bn) 0
        else if (an) { if (s.nullsFirst) -1 else 1 }
        else if (bn) { if (s.nullsFirst) 1 else -1 }
        else { val r = buf.cmpRaw(a, b); if (s.desc) -r else r }
      if (c != 0) return c
      k += 1
    }
    0
  }

  /** Compare on the key suffix specs(from..): the radix path resolved
    * specs(0..from-1) already. */
  private def cmpKeysFrom(
      specs: Array[TopKKeySpec], keyBufs: Array[ColBuf], from: Int, a: Int, b: Int): Int = {
    var k = from
    while (k < specs.length) {
      val s = specs(k)
      val buf = keyBufs(k)
      val an = buf.isNull(a)
      val bn = buf.isNull(b)
      val c =
        if (an && bn) 0
        else if (an) { if (s.nullsFirst) -1 else 1 }
        else if (bn) { if (s.nullsFirst) 1 else -1 }
        else { val r = buf.cmpRaw(a, b); if (s.desc) -r else r }
      if (c != 0) return c
      k += 1
    }
    0
  }

  /** Map a first-key slot to an unsigned-radix-sortable long preserving
    * Spark's sort semantics. Longs: flip the sign bit. Doubles: Spark
    * equality canonicalization FIRST (-0.0 → 0.0 so the pair forms ONE
    * tie-run for secondary keys; any NaN → the canonical NaN, which
    * maps above +Inf = NaN-largest), then the IEEE total-order bit
    * trick (negative → flip all bits, positive → flip sign bit).
    */
  private trait RadixKey { def map(buf: ColBuf, i: Int): Long }
  private object LongRadix extends RadixKey {
    def map(buf: ColBuf, i: Int): Long =
      buf.asInstanceOf[LongBuf].raw(i) ^ java.lang.Long.MIN_VALUE
  }
  private object DoubleRadix extends RadixKey {
    def map(buf: ColBuf, i: Int): Long = {
      var d = buf.asInstanceOf[DoubleBuf].raw(i)
      if (d == 0.0) d = 0.0 // collapses -0.0
      else if (java.lang.Double.isNaN(d)) d = java.lang.Double.NaN
      val bits = java.lang.Double.doubleToRawLongBits(d)
      if (bits < 0) ~bits else bits ^ java.lang.Long.MIN_VALUE
    }
  }

  private def radixKeyFor(buf: ColBuf): Option[RadixKey] = buf match {
    case _: LongBuf => Some(LongRadix)
    case _: DoubleBuf => Some(DoubleRadix)
    case _ => None
  }

  /** LSD radix sort (8 passes x 8 bits) of `keys`+`idx` in tandem over
    * [0, n). Skips passes whose byte is constant (common for
    * small-domain keys). */
  private def radixSortRange(keys: Array[Long], idx: Array[Int], n: Int): Unit = {
    var src = keys
    var srcIdx = idx
    var dst = new Array[Long](n)
    var dstIdx = new Array[Int](n)
    val counts = new Array[Int](256)
    var shift = 0
    while (shift < 64) {
      java.util.Arrays.fill(counts, 0)
      var i = 0
      while (i < n) { counts(((src(i) >>> shift) & 0xff).toInt) += 1; i += 1 }
      // constant byte -> pass is a no-op
      var nonZero = 0
      var b = 0
      while (b < 256 && nonZero <= 1) { if (counts(b) > 0) nonZero += 1; b += 1 }
      if (nonZero > 1) {
        var sum = 0
        b = 0
        while (b < 256) { val c = counts(b); counts(b) = sum; sum += c; b += 1 }
        i = 0
        while (i < n) {
          val slot = counts(((src(i) >>> shift) & 0xff).toInt)
          dst(slot) = src(i)
          dstIdx(slot) = srcIdx(i)
          counts(((src(i) >>> shift) & 0xff).toInt) += 1
          i += 1
        }
        val tk = src; src = dst; dst = tk
        val ti = srcIdx; srcIdx = dstIdx; dstIdx = ti
      }
      shift += 8
    }
    if (src ne keys) {
      System.arraycopy(src, 0, keys, 0, n)
      System.arraycopy(srcIdx, 0, idx, 0, n)
    }
  }

  /** In-place median-of-three quicksort of idx[lo..hi] under `cmp`,
    * insertion sort below 32. SQL sort is not stability-sensitive (ties
    * are unspecified), so quicksort's instability is fine.
    */
  private def qsortRange(idx: Array[Int], lo0: Int, hi0: Int, cmp: (Int, Int) => Int): Unit = {
    def swap(i: Int, j: Int): Unit = { val t = idx(i); idx(i) = idx(j); idx(j) = t }
    def insertion(lo: Int, hi: Int): Unit = {
      var i = lo + 1
      while (i <= hi) {
        val v = idx(i)
        var j = i - 1
        while (j >= lo && cmp(idx(j), v) > 0) { idx(j + 1) = idx(j); j -= 1 }
        idx(j + 1) = v
        i += 1
      }
    }
    def qsort(lo1: Int, hi1: Int): Unit = {
      var lo = lo1
      var hi = hi1
      while (hi - lo > 31) {
        val mid = lo + (hi - lo) / 2
        // median-of-three pivot to idx(mid)
        if (cmp(idx(lo), idx(mid)) > 0) swap(lo, mid)
        if (cmp(idx(lo), idx(hi)) > 0) swap(lo, hi)
        if (cmp(idx(mid), idx(hi)) > 0) swap(mid, hi)
        val pivot = idx(mid)
        var i = lo
        var j = hi
        while (i <= j) {
          while (cmp(idx(i), pivot) < 0) i += 1
          while (cmp(idx(j), pivot) > 0) j -= 1
          if (i <= j) { swap(i, j); i += 1; j -= 1 }
        }
        // recurse on the smaller side, loop on the larger (O(log n) stack)
        if (j - lo < hi - i) { qsort(lo, j); lo = i }
        else { qsort(i, hi); hi = j }
      }
      if (hi > lo) insertion(lo, hi)
    }
    qsort(lo0, hi0)
  }

  /** Sort the index array by the key specs. Numeric first keys take the
    * HYBRID path — LSD radix on the bit-mapped first key (the algorithm
    * class Tungsten's prefix sort wins with), then comparison sort only
    * inside first-key tie runs and the null segment; everything else
    * (string first key) takes the pure comparison path.
    */
  private[graft] def sortIndices(
      idx: Array[Int], n: Int, specs: Array[TopKKeySpec], keyBufs: Array[ColBuf]): Unit = {
    val first = keyBufs(0)
    radixKeyFor(first) match {
      case Some(rk) => hybridSort(idx, n, specs, keyBufs, rk)
      case None =>
        qsortRange(idx, 0, n - 1, (a, b) => cmpKeys(specs, keyBufs, a, b))
    }
  }

  private def hybridSort(
      idx: Array[Int], n: Int, specs: Array[TopKKeySpec],
      keyBufs: Array[ColBuf], rk: RadixKey): Unit = {
    val s0 = specs(0)
    val first = keyBufs(0)
    // split null / non-null first keys (stable not required)
    val nonNull = new Array[Int](n)
    val nullIdx = new Array[Int](n)
    var nn = 0
    var nv = 0
    var i = 0
    while (i < n) {
      val r = idx(i)
      if (first.isNull(r)) { nullIdx(nv) = r; nv += 1 }
      else { nonNull(nn) = r; nn += 1 }
      i += 1
    }
    // radix-sort the non-null segment ascending on the mapped key
    val keys = new Array[Long](nn)
    i = 0
    while (i < nn) { keys(i) = rk.map(first, nonNull(i)); i += 1 }
    radixSortRange(keys, nonNull, nn)
    if (s0.desc) {
      // reverse values AND keys: tie runs stay contiguous for the
      // secondary pass
      var a = 0
      var b = nn - 1
      while (a < b) {
        val t = nonNull(a); nonNull(a) = nonNull(b); nonNull(b) = t
        val tk = keys(a); keys(a) = keys(b); keys(b) = tk
        a += 1; b -= 1
      }
    }
    // stitch: nulls first or last
    val nullStart = if (s0.nullsFirst) 0 else nn
    if (s0.nullsFirst) {
      System.arraycopy(nullIdx, 0, idx, 0, nv)
      System.arraycopy(nonNull, 0, idx, nv, nn)
    } else {
      System.arraycopy(nonNull, 0, idx, 0, nn)
      System.arraycopy(nullIdx, 0, idx, nn, nv)
    }
    if (specs.length > 1) {
      val cmpRest: (Int, Int) => Int = (a, b) => cmpKeysFrom(specs, keyBufs, 1, a, b)
      // null segment: first key is all-tie, sort by the rest
      if (nv > 1) qsortRange(idx, nullStart, nullStart + nv - 1, cmpRest)
      // non-null segment: comparison-sort each first-key tie run
      val base = if (s0.nullsFirst) nv else 0
      var runStart = 0
      i = 1
      while (i <= nn) {
        if (i == nn || keys(i) != keys(runStart)) {
          if (i - runStart > 1) {
            qsortRange(idx, base + runStart, base + i - 1, cmpRest)
          }
          runStart = i
        }
        i += 1
      }
    }
  }
}

/** Zero-copy string views over [[GraftColumnarSortExec]]'s concatenated
  * string buffer: getUTF8String wraps a (offset, length) slice of the
  * shared byte array — no per-row copy at emission; the downstream
  * ColumnarToRow (or next kernel) copies what it keeps, same contract as
  * [[org.apache.spark.sql.graft.StringArrayVector]].
  */
final class ByteSliceStringVector(
    bytes: Array[Byte], offs: Array[Int], lens: Array[Int],
    nulls: Array[Boolean], n: Int)
    extends ColumnVector(StringType) {
  override def close(): Unit = ()
  override def closeIfFreeable(): Unit = ()
  override def hasNull: Boolean = {
    var i = 0
    while (i < n) { if (nulls(i)) return true; i += 1 }
    false
  }
  override def numNulls: Int = {
    var c = 0; var i = 0
    while (i < n) { if (nulls(i)) c += 1; i += 1 }
    c
  }
  override def isNullAt(rowId: Int): Boolean = nulls(rowId)
  override def getUTF8String(rowId: Int): UTF8String =
    UTF8String.fromBytes(bytes, offs(rowId), lens(rowId))
  private def nope = throw new UnsupportedOperationException("string-only vector")
  override def getBoolean(rowId: Int): Boolean = nope
  override def getByte(rowId: Int): Byte = nope
  override def getShort(rowId: Int): Short = nope
  override def getInt(rowId: Int): Int = nope
  override def getLong(rowId: Int): Long = nope
  override def getFloat(rowId: Int): Float = nope
  override def getDouble(rowId: Int): Double = nope
  override def getArray(rowId: Int): org.apache.spark.sql.vectorized.ColumnarArray = nope
  override def getMap(rowId: Int): org.apache.spark.sql.vectorized.ColumnarMap = nope
  override def getDecimal(rowId: Int, p: Int, s: Int): org.apache.spark.sql.types.Decimal = nope
  override def getBinary(rowId: Int): Array[Byte] = nope
  override def getChild(ordinal: Int): ColumnVector = nope
}
