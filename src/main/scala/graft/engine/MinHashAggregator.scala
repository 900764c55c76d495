package graft.engine

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY §2.4 / §7.3 "new aggregates (sketches)"): merges
  * per-row 32-slot MinHash signatures into a group signature by
  * element-wise min — the streaming/distributive form of MinHash, the
  * pattern the reference uses for its bloom_filter_agg
  * (serde/aggregates.scala:629-686 in /root/reference).
  *
  * Distributive + commutative → Spark plans partial aggregation before
  * the shuffle: at 100 TB only 32 longs per group cross the wire, never
  * the shingle sets. Usage: group shingle-level rows by a coarser key
  * (e.g. source/domain) to sketch each group's content for cross-group
  * similarity without pairwise comparison.
  */
object MinHashAggregator extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  val K = 32
  private def empty: Array[Long] = Array.fill(K)(Long.MaxValue)

  override def zero: Array[Long] = empty

  override def reduce(buf: Array[Long], sig: Array[Long]): Array[Long] = {
    var i = 0
    while (i < K) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < K) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
