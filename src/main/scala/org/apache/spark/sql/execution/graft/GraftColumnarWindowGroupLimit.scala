// In org.apache.spark.sql.execution.graft alongside the other columnar
// operators (RowToColumnConverter access; the reference's placement is
// org.apache.spark.sql.comet).
package org.apache.spark.sql.execution.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{RowToColumnConverter, SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

/** Columnar PARTIAL WindowGroupLimit (the rank-1/top-k-per-key pre-filter
  * Spark pushes below the shuffle for `row_number() ... WHERE rn <= k`;
  * reference analogue: CometWindowExec is disabled, but DataFusion's
  * planner has the same limit pushdown for window ranks).
  *
  * Spark's own partial operator REQUIRES SORTED INPUT — EnsureRequirements
  * plants a map-side SortExec over the full scan just so the pre-filter
  * can walk group runs. This probe replaces Sort + WindowGroupLimit with
  * a hash map of bounded per-group heaps over the scan's ColumnarBatches:
  * NO map-side sort of the corpus, losers cost one threshold compare
  * against their group's current k-th row, and only heap-entering winners
  * are materialized. Memory is bounded by `maxGroups` live groups; on
  * overflow the probe BAILS OUT ADAPTIVELY: it drains the collected
  * candidates and passes every remaining batch through zero-copy.
  * Emitting extra candidate rows is always correct for the Partial mode
  * because the exchange above re-groups and the final WindowGroupLimit
  * re-filters — and when group cardinality approaches the row count the
  * pre-filter prunes ~nothing anyway (the row operator ships ~all rows
  * too), so the bailout matches its informativeness while still
  * skipping the sort. A/B at sf0.1 (FilterMicroBench): 0.18x on
  * 1000-group keys, 0.90x CDC, 0.94-0.96x on ~150k-group keys via the
  * bailout (1.3-1.4x without it — the bailout is what makes default-ON
  * honest).
  * The rule only swaps under a ShuffleExchange parent, so no downstream
  * operator can rely on the sorted-run order the row operator emits.
  *
  * At 100 TB this is the CDC-compaction map stage: the row path sorts
  * every input partition of the change log; this path touches each
  * change once and ships ≤ (#keys x k) candidates per partition.
  */
case class GraftColumnarWindowGroupLimitExec(
    partIdx: Seq[Int],
    partTypes: Seq[DataType],
    keys: Seq[TopKKeySpec],
    limit: Int,
    maxGroups: Int,
    child: SparkPlan)
    extends UnaryExecNode {

  require(partIdx.nonEmpty && partIdx.size <= 2, "1 or 2 partition keys")

  override def output: Seq[Attribute] = child.output
  override def supportsColumnar: Boolean = true
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override lazy val metrics = Map(
    "numInputRows" -> SQLMetrics.createMetric(sparkContext, "number of input rows"),
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "candidate rows emitted"),
    "numBailouts" -> SQLMetrics.createMetric(sparkContext, "group-map overflow bailouts"))

  import GraftColumnarTopKExec.{cmpBoxed, cmpCandidate, keyOps, Entry, KeyOps}

  private class GroupHeap(entryOrd: Ordering[Entry]) {
    val heap = new scala.collection.mutable.PriorityQueue[Entry]()(entryOrd)
  }

  private def compiled = {
    val specs = keys.toArray
    (specs, specs.map(s => keyOps(s.dt)), partIdx.toArray, partTypes.map(keyOps).toArray)
  }

  /** Candidate rows re-emitted as ColumnarBatches (no transition below;
    * the exchange's ColumnarToRow above touches ≤ #groups x k candidate
    * rows). After an overflow bailout the child's remaining batches pass
    * through ZERO-COPY — the probe stops pruning, never stops flowing.
    */
  override def doExecuteColumnar(): RDD[ColumnarBatch] = {
    val (specs, ops, pIdx, pOps) = compiled
    val (inM, outM, bailM) =
      (metrics("numInputRows"), metrics("numOutputRows"), metrics("numBailouts"))
    val (lim, maxG) = (limit, maxGroups)
    val schema = StructType(output.map(a => StructField(a.name, a.dataType, a.nullable)))
    child.executeColumnar().mapPartitionsInternal { batches =>
      val entryOrd = new Ordering[Entry] {
        override def compare(a: Entry, b: Entry): Int = {
          var i = 0
          while (i < specs.length) {
            val c = cmpBoxed(specs(i), ops(i), a.keys(i), b.keys(i))
            if (c != 0) return c
            i += 1
          }
          0
        }
      }
      new Iterator[ColumnarBatch] {
        private val map = new java.util.HashMap[AnyRef, GroupHeap]()
        private var passthrough = false
        private var pendingRows: Iterator[InternalRow] = Iterator.empty
        private var done = false
        private val converter = new RowToColumnConverter(schema)

        private def drain(): Iterator[InternalRow] = {
          val rows = new scala.collection.mutable.ArrayBuffer[InternalRow]()
          map.values.forEach(g => g.heap.foreach(e => rows += e.row))
          map.clear()
          rows.iterator
        }

        private def groupKey(pcols: Array[ColumnVector], i: Int): AnyRef = {
          val k0 = if (pcols(0).isNullAt(i)) null else pOps(0).extract(pcols(0), i)
          if (pIdx.length == 1) k0
          else {
            val k1 = if (pcols(1).isNullAt(i)) null else pOps(1).extract(pcols(1), i)
            (k0, k1)
          }
        }

        /** Returns -1 when the batch was fully absorbed, else the row
          * index at which the group map overflowed. Rows before the
          * overflow index are represented by their heaps; ONLY the
          * remainder may be re-emitted (a whole-batch replay would ship
          * heap-held rows twice, and duplicate candidates corrupt the
          * final row_number for k > 1).
          */
        private def insertBatch(batch: ColumnarBatch): Int = {
          val n = batch.numRows()
          val pcols = pIdx.map(batch.column)
          val ocols = specs.map(s => batch.column(s.col))
          var i = 0
          while (i < n) {
            val gk = groupKey(pcols, i)
            var g = map.get(gk)
            if (g == null) {
              if (map.size >= maxG) return i
              g = new GroupHeap(entryOrd)
              map.put(gk, g)
            }
            val accept =
              if (g.heap.size < lim) true
              else cmpCandidate(specs, ops, ocols, i, g.heap.head.keys) < 0
            if (accept) {
              val ks = new Array[AnyRef](specs.length)
              var j = 0
              while (j < specs.length) {
                ks(j) = if (ocols(j).isNullAt(i)) null else ops(j).extract(ocols(j), i)
                j += 1
              }
              g.heap.enqueue(new Entry(ks, batch.getRow(i).copy()))
              if (g.heap.size > lim) g.heap.dequeue()
            }
            i += 1
          }
          -1
        }

        private def rowsToBatch(rows: Iterator[InternalRow]): ColumnarBatch = {
          val vectors = OnHeapColumnVector.allocateColumns(GraftColumnarTopKExec.batchRows, schema)
          var n = 0
          while (n < GraftColumnarTopKExec.batchRows && rows.hasNext) {
            converter.convert(rows.next(),
              vectors.toArray[org.apache.spark.sql.execution.vectorized.WritableColumnVector])
            n += 1
            outM.add(1)
          }
          new ColumnarBatch(vectors.toArray[ColumnVector], n)
        }

        private var carry: ColumnarBatch = null

        @scala.annotation.tailrec
        private def advance(): Unit =
          if (!pendingRows.hasNext && carry == null && !done) {
            if (passthrough) {
              if (batches.hasNext) { carry = batches.next(); inM.add(carry.numRows()); outM.add(carry.numRows()) }
              else done = true
            } else if (batches.hasNext) {
              val b = batches.next()
              inM.add(b.numRows())
              val ovf = insertBatch(b)
              if (ovf < 0) advance()
              else {
                // overflow: drain candidates + the unprocessed remainder
                // of THIS batch (copied — the buffer is reused), then
                // pass later batches through zero-copy.
                bailM.add(1)
                passthrough = true
                val rest = (ovf until b.numRows()).map(b.getRow(_).copy())
                pendingRows = drain() ++ rest.iterator
              }
            } else { done = true; pendingRows = drain() }
          }

        override def hasNext: Boolean = {
          advance(); pendingRows.hasNext || carry != null
        }
        override def next(): ColumnarBatch = {
          advance()
          if (pendingRows.hasNext) rowsToBatch(pendingRows)
          else { val b = carry; carry = null; b }
        }
      }
    }
  }

  /** Row fallback: the same bounded-heap algorithm with boxed keys read
    * from InternalRows — present for completeness; the planner routes
    * through the columnar path.
    */
  override protected def doExecute(): RDD[InternalRow] = {
    val (specs, ops, pIdx, pOps) = compiled
    val pTypes = partTypes.toArray
    val oTypes = keys.map(_.dt).toArray
    val (lim, maxG) = (limit, maxGroups)
    val entryOrdSpecs = specs
    child.execute().mapPartitionsInternal { rows =>
      val entryOrd = new Ordering[Entry] {
        override def compare(a: Entry, b: Entry): Int = {
          var i = 0
          while (i < entryOrdSpecs.length) {
            val c = cmpBoxed(entryOrdSpecs(i), ops(i), a.keys(i), b.keys(i))
            if (c != 0) return c
            i += 1
          }
          0
        }
      }
      val map = new java.util.HashMap[AnyRef, scala.collection.mutable.PriorityQueue[Entry]]()
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      def boxed(r: InternalRow, ord: Int, dt: DataType): AnyRef = {
        if (r.isNullAt(ord)) null
        else dt match {
          case StringType => r.getUTF8String(ord).clone()
          case _ => r.get(ord, dt).asInstanceOf[AnyRef]
        }
      }
      var passthrough = false
      val tail = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      rows.foreach { r =>
        if (passthrough) tail += r.copy()
        else {
        val k0 = boxed(r, pIdx(0), pTypes(0))
        val gk: AnyRef = if (pIdx.length == 1) k0 else (k0, boxed(r, pIdx(1), pTypes(1)))
        var g = map.get(gk)
        if (g == null) {
          if (map.size >= maxG) {
            // adaptive bailout, mirroring the columnar path
            map.values.forEach(h => h.foreach(e => out += e.row)); map.clear()
            passthrough = true
            tail += r.copy()
          } else {
          g = new scala.collection.mutable.PriorityQueue[Entry]()(entryOrd)
          map.put(gk, g)
          }
        }
        if (!passthrough) {
        val ks = Array.tabulate[AnyRef](specs.length)(j => boxed(r, specs(j).col, oTypes(j)))
        val accept =
          if (g.size < lim) true
          else {
            var c = 0; var j = 0
            while (c == 0 && j < specs.length) {
              c = cmpBoxed(specs(j), ops(j), ks(j), g.head.keys(j)); j += 1
            }
            c < 0
          }
        if (accept) {
          g.enqueue(new Entry(ks, r.copy()))
          if (g.size > lim) g.dequeue()
        }
        }
        }
      }
      map.values.forEach(h => h.foreach(e => out += e.row))
      out.iterator ++ tail.iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GraftColumnarWindowGroupLimitExec =
    copy(child = newChild)
}

object GraftColumnarWindowGroupLimitExec {
  /** Partition-key and order-key types the probe supports (the TopK set). */
  def supportedKeyType(dt: DataType): Boolean = GraftColumnarTopKExec.supportedKeyType(dt)
}
