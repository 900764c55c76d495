package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues,
  TTLConfig}

/** One event of the stream — same shape as the events table. */
final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** A closed user session emitted by the stateful sessionizer. */
final case class Session(user_id: Long, n_events: Long,
    session_start: Timestamp, session_end: Timestamp, session_value: Double)

/** Structured Streaming operators (builder brief "Structured Streaming
  * for streams"; the reference rejects streaming plans wholesale —
  * SURVEY §2.5 — so this is beyond-reference surface, built on the
  * engine Spark gives us).
  *
  * Each op is a pure Dataset→Dataset transform so the same code runs on
  * `readStream` (micro-batch) and on a batch DataFrame — tested both
  * ways in StreamingSuite via MemoryStream. At scale the state store is
  * partitioned by the grouping key across executors; watermarks bound
  * state size (droppable-late-data contract), which is what makes a
  * 100 TB/day stream sustainable.
  */
object StreamingOps {

  /** Tumbling-window counts with a watermark: late events beyond 1 hour
    * are dropped and window state is evicted — bounded state. Batch twin:
    * q68_time_window_agg.
    */
  def windowedCounts(events: DataFrame, windowLen: String = "6 hours",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("total"))

  /** Streaming exact dedup with bounded state: duplicate `event_id`s
    * arriving within the watermark delay of the first occurrence are
    * dropped; key state older than the watermark is evicted. This is the
    * streaming twin of q45's batch exact dedup — the operator a 100 TB/
    * day ingest runs to make delivery effectively-once before
    * downstream aggregation.
    */
  def dedupeStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream inner join with an event-time range condition: each
    * left event pairs with right events of the same user from the
    * preceding `windowSeconds`. Both sides carry watermarks and the join
    * condition bounds event time on both sides, so each side's buffered
    * state is evictable once the other side's watermark passes — the
    * only shape under which an unbounded stream-stream join has bounded
    * state.
    */
  def joinWithinWindow(left: Dataset[Event], right: Dataset[Event],
      windowSeconds: Long = 3600): DataFrame = {
    val l = left.toDF().select(col("event_id").as("l_id"),
        col("user_id").as("l_user"), col("ts").as("l_ts"))
      .withWatermark("l_ts", s"$windowSeconds seconds")
    val r = right.toDF().select(col("event_id").as("r_id"),
        col("user_id").as("r_user"), col("ts").as("r_ts"), col("value").as("r_value"))
      .withWatermark("r_ts", s"${2 * windowSeconds} seconds")
    l.join(r, expr(
      s"l_user = r_user AND r_ts BETWEEN l_ts - INTERVAL $windowSeconds SECOND AND l_ts"))
  }

  /** Stream-stream LEFT OUTER join with the same event-time range
    * condition as [[joinWithinWindow]]. Matches emit eagerly like the
    * inner join; an UNMATCHED left event emits with null right columns
    * only once the right side's watermark passes its event time — the
    * moment Spark can prove no qualifying right row (r_ts ≤ l_ts) can
    * still arrive — and the same watermark bound is what lets the state
    * store evict the buffered left row. This is the streaming
    * "attribution with a timeout" shape (click with no impression in
    * the lookback window → emit as organic): correctness and state
    * bounds both hang off the two-sided watermark, exactly as in the
    * inner variant, plus the null-emission barrier the outer join adds.
    */
  def leftOuterJoinWithinWindow(left: Dataset[Event], right: Dataset[Event],
      windowSeconds: Long = 3600): DataFrame = {
    val l = left.toDF().select(col("event_id").as("l_id"),
        col("user_id").as("l_user"), col("ts").as("l_ts"))
      .withWatermark("l_ts", s"$windowSeconds seconds")
    val r = right.toDF().select(col("event_id").as("r_id"),
        col("user_id").as("r_user"), col("ts").as("r_ts"), col("value").as("r_value"))
      .withWatermark("r_ts", s"${2 * windowSeconds} seconds")
    l.join(r, expr(
      s"l_user = r_user AND r_ts BETWEEN l_ts - INTERVAL $windowSeconds SECOND AND l_ts"),
      "left_outer")
  }

  /** Deterministic hash sampling on a stream: the q109 md5-threshold
    * predicate applied per micro-batch. Stateless — no watermark, no
    * state store — and the chosen set is a pure function of event_id,
    * so a replayed/reordered stream, the batch run over the same data,
    * and every engine agree on EXACTLY which rows are in the sample
    * (rand()-based stream sampling can't offer any of that). This is
    * how a 100 TB/day ingest keeps a reproducible N% eval holdout.
    */
  def sampleStream(events: DataFrame, hexBound: String = "2"): DataFrame =
    events.filter(substring(md5(col("event_id").cast("string")), 1, 1) < hexBound)

  /** Stream-static enrichment join: every micro-batch joins the static
    * dimension, broadcast so the stream side never shuffles and no
    * streaming state exists (stream-static joins are stateless by
    * construction — only stream-stream joins buffer). This is the
    * streaming twin of the inventory's fact-dim joins and the shape a
    * 100 TB/day ingest uses to attach dimensions at write time; with a
    * file-backed dimension, Spark re-lists it per batch, so slowly-
    * changing dims are picked up without restarting the query.
    */
  def enrichStream(events: DataFrame, dim: DataFrame,
      eventKey: String = "user_id", dimKey: String = "c_custkey"): DataFrame =
    events.join(broadcast(dim), events(eventKey) === dim(dimKey), "left_outer")
      .drop(dimKey)

  /** Per-user running totals via groupBy on an unbounded key set —
    * complete/update-mode aggregation (state grows with distinct users;
    * use only with a bounded key domain or TTL'd state at scale).
    */
  def runningUserTotals(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))

  /** One compacted CDC row: the latest change seen per key. */
  final case class LatestRow(user_id: Long, event_type: String,
      last_ts: Timestamp, last_event_id: Long, last_value: Double)

  /** Streaming CDC apply-latest — the stream twin of q131's batch
    * compaction: mapGroupsWithState keeps ONE row per (user_id,
    * event_type), replacing it whenever a newer (ts, event_id) change
    * arrives, and emits the key's current row each micro-batch it
    * changes (update mode). Out-of-order deliveries lose to the
    * stored row's timestamp — replay-deterministic regardless of
    * arrival order. State is keyed by the DIMENSION's key domain (one
    * row per key, not per event), the same bound a batch compaction's
    * output has; there is nothing to watermark away because the latest
    * row per key must live forever by definition.
    */
  def latestState(events: Dataset[Event]): Dataset[LatestRow] = {
    import events.sparkSession.implicits._

    def newer(aTs: Timestamp, aId: Long, bTs: Timestamp, bId: Long): Boolean =
      aTs.getTime > bTs.getTime || (aTs.getTime == bTs.getTime && aId > bId)

    def update(key: (Long, String), rows: Iterator[Event],
        state: GroupState[LatestRow]): LatestRow = {
      var cur = state.getOption.orNull
      rows.foreach { e =>
        if (cur == null || newer(e.ts, e.event_id, cur.last_ts, cur.last_event_id))
          cur = LatestRow(key._1, key._2, e.ts, e.event_id, e.value)
      }
      state.update(cur)
      cur
    }

    events.groupByKey(e => (e.user_id, e.event_type))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }

  /** Stateful sessionization with flatMapGroupsWithState: a session
    * closes when a newer event arrives more than `gapSeconds` after the
    * last, OR when the event-time watermark passes session_end + gap —
    * the timeout path emits the final open session and evicts the
    * user's state, so per-user state is genuinely bounded (removed, not
    * just O(1) while the user is active). Event-time (not
    * processing-time) timeouts keep the semantics replay-deterministic
    * and let the no-interval test trigger quiesce. Batch twin:
    * q67_sessionization (batch runs have no watermark, so no timeouts
    * fire and only gap-closed sessions are emitted).
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000

    def updateState(userId: Long, rows: Iterator[Event],
        state: GroupState[Session]): Iterator[Session] = {
      if (state.hasTimedOut) {
        // Watermark passed session_end + gap: the open session is now
        // closed; emit it and evict the user's state entirely.
        val finished = state.getOption.iterator.toList
        state.remove()
        return finished.iterator
      }
      var closed = List.empty[Session]
      var open = state.getOption
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        open match {
          case Some(sess)
              if e.ts.getTime - sess.session_end.getTime <= gapMs =>
            open = Some(sess.copy(
              n_events = sess.n_events + 1,
              session_end = e.ts,
              session_value = sess.session_value + e.value))
          case other =>
            closed = closed ++ other
            open = Some(Session(userId, 1, e.ts, e.ts, e.value))
        }
      }
      open.foreach { sess =>
        state.update(sess)
        // Timeout timestamps must sit above the current watermark; in
        // batch mode there is no watermark (and no timeouts fire).
        val wm = try state.getCurrentWatermarkMs()
          catch { case _: UnsupportedOperationException => Long.MinValue }
        state.setTimeoutTimestamp(math.max(sess.session_end.getTime + gapMs, wm + 1))
      }
      closed.iterator
    }

    events.withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(updateState)
  }

  /** One rolling-window output row: the aggregates over the user's last
    * `n` events (including this one) at this event's arrival. */
  final case class RollingRow(user_id: Long, event_id: Long, ts: Timestamp,
      roll_sum: Double, roll_min: Double, roll_n: Long)

  /** Streaming rolling last-`n`-events aggregates per key — the
    * incremental twin of the batch sliding ROWS frame (and of
    * GraftWindowSlidingExec's O(n) ring kernels on the batch side): for
    * every event, sum/min/count over the user's trailing `n` events.
    * The rate/health metric shape (rolling request value, rolling
    * floor) a 100 TB/day ingest runs per key.
    *
    * State is ONE ≤(n-1)-entry ring per active key — O(active keys x
    * n), never the event history — and an event-time timer evicts a key
    * idle past the watermark delay entirely, so state is bounded by
    * RECENTLY-active keys. Within a micro-batch, rows process in
    * (ts, event_id) order; the window follows event order, so with all
    * data in one batch the output equals the batch twin
    * `agg OVER (PARTITION BY user ORDER BY ts, event_id
    *            ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW)`
    * exactly — double sums fold oldest→newest, the same ascending
    * association as both Spark's frame recompute and the graft sliding
    * kernels (StreamingSuite pins the agreement and the cross-batch
    * ring carry). A cross-batch LATE row (older than a later batch's
    * emitted rows) appends in its arrival batch — the standard
    * streaming compromise, documented rather than hidden.
    */
  def rollingPerKeyStream(events: Dataset[Event], n: Int,
      idleEvictSeconds: Long = 3600): Dataset[RollingRow] = {
    import events.sparkSession.implicits._
    require(n >= 1, s"window must hold at least 1 row, got $n")
    val evictMs = idleEvictSeconds * 1000L

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[Seq[(Long, Long, Double)]]): Iterator[RollingRow] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      // ring: oldest..newest (tsMs, event_id, value), ≤ n-1 entries
      var ring = state.getOption.getOrElse(Seq.empty)
      var lastTs = 0L
      val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
        ring = (ring :+ ((e.ts.getTime, e.event_id, e.value))).takeRight(n)
        lastTs = math.max(lastTs, e.ts.getTime)
        // fold oldest→newest: the ascending association every batch
        // evaluator uses, so doubles are bit-identical; min keeps the
        // FIRST minimal under compareDoubles (-0.0/NaN ties) like the
        // batch evaluators' strict compare
        var s = 0.0
        var mn = 0.0
        var seen = false
        ring.foreach { r =>
          s += r._3
          if (!seen || org.apache.spark.sql.catalyst.util.SQLOrderingUtil
            .compareDoubles(r._3, mn) < 0) { mn = r._3; seen = true }
        }
        RollingRow(userId, e.event_id, e.ts, s, mn, ring.length.toLong)
      }
      state.update(ring.takeRight(math.max(0, n - 1)))
      val wm = try state.getCurrentWatermarkMs()
        catch { case _: UnsupportedOperationException => Long.MinValue }
      state.setTimeoutTimestamp(math.max(lastTs + evictMs, wm + 1))
      out.iterator
    }

    events.withWatermark("ts", s"$idleEvictSeconds seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** One entry of a user's live top-k leaderboard. */
  final case class TopKEntry(event_id: Long, tsMs: Long, value: Double)

  /** A user's current top-k snapshot (descending by value), re-emitted
    * whenever it changes. */
  final case class TopKSnapshot(user_id: Long, top: Seq[TopKEntry])

  /** Streaming top-k-per-key: every user's k highest-value events seen
    * so far, re-emitted on change (Update mode) — the incremental twin
    * of the batch `row_number()/rank()` group-limit shapes (and of the
    * columnar WindowGroupLimit probes on the batch side). State is the
    * SORTED ≤k-entry list per key — O(active keys x k), never the
    * event history — so a 100 TB/day stream holds leaderboards, not
    * data. Ties break on (ts, event_id) ascending, which also makes
    * the result replay-deterministic regardless of micro-batch
    * boundaries: merging is associative and order-insensitive over the
    * event multiset, so the final snapshot equals the batch twin
    * row_number() <= k (StreamingSuite pins that agreement).
    */
  def topKPerKeyStream(events: Dataset[Event], k: Int): Dataset[TopKSnapshot] = {
    import events.sparkSession.implicits._
    def better(a: TopKEntry, b: TopKEntry): Boolean =
      a.value > b.value ||
        (a.value == b.value &&
          (a.tsMs < b.tsMs || (a.tsMs == b.tsMs && a.event_id < b.event_id)))
    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[Seq[TopKEntry]]): Iterator[TopKSnapshot] = {
      val cur = state.getOption.getOrElse(Seq.empty)
      val merged = (cur ++ rows.map(e => TopKEntry(e.event_id, e.ts.getTime, e.value)))
        .distinct.sortWith(better).take(k)
      if (merged == cur) Iterator.empty
      else {
        state.update(merged)
        Iterator.single(TopKSnapshot(userId, merged))
      }
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** An event admitted by the per-key quota, tagged with its admission
    * ordinal inside its (user, window). */
  final case class Admitted(user_id: Long, event_id: Long, ts: Timestamp,
      n_in_window: Long)

  /** (windowStart epoch-ms, events admitted so far in that window). */
  final case class QuotaWin(winStart: Long, n: Long)

  /** Per-key event-time admission quota on Spark 4's arbitrary-state
    * API v2 (`transformWithState`, requires the RocksDB state store):
    * each user may emit at most `limit` events per tumbling
    * `windowSeconds` window; excess and window-late events are dropped.
    * This is the ingest-side rate limiter a 100 TB/day pipeline runs to
    * stop a hot key (bot, repost storm) from flooding downstream state.
    *
    * State is ONE QuotaWin per active key — the typed ValueState rolls
    * forward when a newer window arrives, and an event-time timer at
    * window end + `windowSeconds` EVICTS idle keys' state entirely
    * (fires once the watermark passes it), so state is bounded by keys
    * active in the last ~2 windows, not by all keys ever seen.
    * Within a micro-batch, rows are processed in (ts, event_id) order,
    * so admission is replay-deterministic given the batch sequence;
    * with all data in one batch it matches the batch twin exactly:
    * row_number() over (user, window ordered by ts, event_id) <= limit
    * (StreamingSuite pins that agreement).
    */
  def quotaLimitStream(events: Dataset[Event], limit: Int,
      windowSeconds: Long = 3600): Dataset[Admitted] = {
    import events.sparkSession.implicits._
    val windowMs = windowSeconds * 1000L

    class QuotaProcessor extends StatefulProcessor[Long, Event, Admitted] {
      @transient private var win: org.apache.spark.sql.streaming.ValueState[QuotaWin] = _

      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        win = getHandle.getValueState[QuotaWin]("win",
          Encoders.product[QuotaWin], TTLConfig.NONE)

      override def handleInputRows(key: Long, rows: Iterator[Event],
          timerValues: TimerValues): Iterator[Admitted] = {
        val out = List.newBuilder[Admitted]
        var cur = if (win.exists()) win.get() else null
        rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
          val w = Math.floorDiv(e.ts.getTime, windowMs) * windowMs
          if (cur == null || w > cur.winStart) {
            cur = QuotaWin(w, 0L)
            // evict this key's state once the watermark clears the
            // window by a full window's slack (idle-key cleanup)
            getHandle.registerTimer(w + 2 * windowMs)
          }
          // w < cur.winStart (late past an already-started newer
          // window): quota accounting for that window is gone — drop
          if (w == cur.winStart && cur.n < limit) {
            cur = QuotaWin(cur.winStart, cur.n + 1)
            out += Admitted(key, e.event_id, e.ts, cur.n)
          }
        }
        if (cur != null) win.update(cur)
        out.result().iterator
      }

      override def handleExpiredTimer(key: Long, timerValues: TimerValues,
          expiredTimerInfo: ExpiredTimerInfo): Iterator[Admitted] = {
        // clear only if no newer window superseded the timer's
        if (win.exists() &&
            win.get().winStart + 2 * windowMs <= expiredTimerInfo.getExpiryTimeInMs)
          win.clear()
        Iterator.empty
      }
    }

    events.withWatermark("ts", s"$windowSeconds seconds")
      .groupByKey(_.user_id)
      .transformWithState(new QuotaProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** MinHash-LSH band keys for a (doc_id, text) DataFrame — q47's exact
    * scheme (32 minhashes h_i = m3 + i*xx over distinct word trigrams,
    * banded 16 x 2) as a reusable batch transform: one shuffle
    * (groupBy doc_id), everything else whole-stage codegen.
    */
  def lshBands(docs: DataFrame): DataFrame = {
    val tri = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), expr(
        "explode(transform(slice(ws, 1, greatest(size(ws) - 2, 0)), " +
          "(w, i) -> concat_ws(' ', w, ws[i + 1], ws[i + 2])))").as("t3"))
      .select(col("doc_id"), hash(col("t3")).as("m3"), xxhash64(col("t3")).as("xx"))
      .distinct()
      .select(col("doc_id"),
        col("m3").cast("long").bitwiseAND(lit(0xffffffffL)).as("h1"),
        col("xx").bitwiseAND(lit(0xffffffffL)).as("h2"))
    val sigCols = (0 until 32).map(i =>
      min(col("h1") + lit(i.toLong) * col("h2")).as(s"s$i"))
    val sig = tri.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    val bandCols = (0 until 16).map(b =>
      concat_ws(":", lit(b), col(s"s${2 * b}"), col(s"s${2 * b + 1}")))
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
  }

  /** One micro-batch of incremental near-dup ingest: band the incoming
    * docs, reject any doc sharing a band with the HISTORICAL index OR
    * with a smaller-doc_id doc of the same batch (transitive
    * suppression: the earlier doc rejects later collisions even when
    * it is itself rejected — deterministic without chasing acceptance
    * chains), and return (accepted docs, their bands for the index).
    *
    * This is the production shape for dedup-at-ingest over an
    * ever-growing corpus: each arriving batch joins the persistent
    * band index on the band key (at 100 TB: a bucketed table on
    * `band`, so the join is co-located and touches only matching
    * buckets), never re-scans history, and appends only accepted
    * docs' bands. In-batch ordering by doc_id keeps acceptance
    * replay-deterministic. The wiring (versioned index dirs via
    * foreachBatch, exactly-once on replay) is pinned in StreamingSuite.
    */
  def lshIngestBatch(batch: DataFrame, index: DataFrame)
      : (DataFrame, DataFrame) = {
    val bands = lshBands(batch).localCheckpoint()
    // vs history: any shared band rejects the doc
    val vsHist = bands.join(index.select(col("band")), Seq("band"), "left_semi")
      .select(col("doc_id")).distinct()
    // vs this batch: earlier doc_id wins a shared band
    val first = bands.groupBy(col("band")).agg(min(col("doc_id")).as("keeper"))
    val vsBatch = bands.join(first, Seq("band"))
      .filter(col("doc_id") > col("keeper"))
      .select(col("doc_id")).distinct()
    val rejected = vsHist.unionByName(vsBatch).distinct()
    val accepted = batch.join(rejected, Seq("doc_id"), "left_anti")
    val newBands = bands.join(rejected, Seq("doc_id"), "left_anti")
    (accepted, newBands)
  }
}
