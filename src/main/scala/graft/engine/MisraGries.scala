package graft.engine

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed Aggregator (SURVEY §2.4
  * "new aggregates (sketches)"; the reference's moral family is its
  * bloom_filter_agg, serde/aggregates.scala:629-686 in /root/reference).
  *
  * State is a counter map bounded at `m` entries. Inserting a new key
  * into a full sketch decrements every counter (dropping zeros) — the
  * classic MG step; merging sums two sketches then subtracts the
  * (m+1)-th largest counter from all (Agarwal et al.'s mergeable
  * summaries construction), keeping the bound.
  *
  * Guarantee (what makes this a 100 TB operator): any item with true
  * frequency > n/m SURVIVES in the sketch regardless of processing
  * order, and its counter underestimates by at most n/m. Counter
  * VALUES are order-dependent, so a production query never reports
  * them — it uses the sketch as a CANDIDATE set and exactly recounts
  * only those candidates (one semi-join), which is deterministic.
  * Partial aggregation means only ≤ m counters per partition cross the
  * wire, never the corpus' distinct keys. FuzzProps differential-tests
  * the survival + error bound against brute-force counts.
  */
final case class MisraGries(m: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], key: String): Map[String, Long] =
    buf.get(key) match {
      case Some(c) => buf.updated(key, c + 1L)
      case None if buf.size < m => buf.updated(key, 1L)
      case None =>
        // full: decrement all (the new key's +1 cancels against one
        // decrement, so it is not inserted), drop exhausted counters
        buf.iterator.map { case (k, c) => k -> (c - 1L) }
          .filter(_._2 > 0L).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (combined.size <= m) combined
    else {
      // subtract the (m+1)-th largest counter value from everything
      val cut = combined.valuesIterator.toArray.sortInPlaceWith(_ > _).apply(m)
      combined.iterator.map { case (k, c) => k -> (c - cut) }
        .filter(_._2 > 0L).toMap
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
