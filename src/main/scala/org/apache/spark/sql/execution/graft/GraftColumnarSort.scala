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
      var n = 0
      batches.foreach { batch =>
        val rows = batch.numRows()
        inM.add(rows)
        var c = 0
        while (c < bufs.length) { bufs(c).append(batch.column(c), rows); c += 1 }
        n += rows
      }
      if (n == 0) Iterator.empty
      else {
        val keyBufs = specs.map(s => bufs(s.col))
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
  }

  private final class LongBuf(dt: DataType) extends ColBuf {
    private var values = new Array[Long](1 << 12)
    private var nulls = new Array[Boolean](1 << 12)
    private var n = 0
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
  }

  private final class DoubleBuf(dt: DataType) extends ColBuf {
    private var values = new Array[Double](1 << 12)
    private var nulls = new Array[Boolean](1 << 12)
    private var n = 0
    private val isFloat = dt == FloatType
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
  }

  private final class StringBuf extends ColBuf {
    private var values = new Array[UTF8String](1 << 12)
    private var nulls = new Array[Boolean](1 << 12)
    private var n = 0
    override def append(v: ColumnVector, rows: Int): Unit = {
      if (n + rows > values.length) {
        val cap = math.max(values.length * 2, n + rows)
        values = java.util.Arrays.copyOf(values, cap)
        nulls = java.util.Arrays.copyOf(nulls, cap)
      }
      var i = 0
      while (i < rows) {
        // clone: the vector's UTF8String views alias reused batch memory
        if (v.isNullAt(i)) nulls(n) = true else values(n) = v.getUTF8String(i).clone()
        n += 1; i += 1
      }
    }
    override def isNull(i: Int): Boolean = nulls(i)
    override def cmpRaw(a: Int, b: Int): Int = values(a).compareTo(values(b))
    override def vector(): ColumnVector = new StringArrayVector(values, nulls, n)
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

  /** In-place median-of-three quicksort of the index array with
    * insertion sort below 32 — comparisons read the typed key buffers
    * directly. SQL sort is not stability-sensitive (ties are
    * unspecified), so quicksort's instability is fine.
    */
  private[graft] def sortIndices(
      idx: Array[Int], n: Int, specs: Array[TopKKeySpec], keyBufs: Array[ColBuf]): Unit = {
    def cmp(a: Int, b: Int): Int = cmpKeys(specs, keyBufs, a, b)
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
    def qsort(lo0: Int, hi0: Int): Unit = {
      var lo = lo0
      var hi = hi0
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
      insertion(lo, hi)
    }
    qsort(0, n - 1)
  }
}
