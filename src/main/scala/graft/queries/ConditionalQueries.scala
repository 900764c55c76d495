package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Conditional + predicate surface (SURVEY §2.2 "Conditional" — If,
  * CaseWhen, Coalesce — and the predicate rows In/InSet/IsNull/
  * EqualNullSafe not yet pinned by the relational queries), plus the
  * events sessionization pattern every event-stream user writes.
  */
object ConditionalQueries {

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q66_conditional",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "orders").filter($"o_orderkey" < 500)
          .select($"o_orderkey",
            when($"o_totalprice" > 200000, "big")
              .when($"o_totalprice" > 100000, "mid")
              .otherwise("small").as("bucket"),
            expr("if(o_orderstatus = 'F', 'final', 'open')").as("st"),
            coalesce(nullif($"o_orderstatus", lit("O")), lit("open")).as("nz"),
            $"o_orderpriority".isin("1-URGENT", "2-HIGH").as("urgent"),
            nullif($"o_orderstatus", lit("O")).isNull.as("was_o"),
            nullif($"o_orderstatus", lit("O")).isNotNull.as("not_o"),
            ($"o_orderstatus" <=> lit("O")).as("nullsafe_eq"),
            nvl(nullif($"o_orderstatus", lit("O")), lit("-")).as("nvl_"),
            expr("nvl2(nullif(o_orderstatus, 'O'), 'nonnull', 'isnull')").as("nvl2_"),
            greatest($"o_orderkey" % 7, $"o_orderkey" % 5, lit(2L)).as("gr"),
            least($"o_orderkey" % 7, $"o_orderkey" % 5, lit(3L)).as("ls"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
          CASE WHEN o_totalprice > 200000 THEN 'big'
               WHEN o_totalprice > 100000 THEN 'mid'
               ELSE 'small' END AS bucket,
          CASE WHEN o_orderstatus = 'F' THEN 'final' ELSE 'open' END AS st,
          coalesce(nullif(o_orderstatus, 'O'), 'open') AS nz,
          o_orderpriority IN ('1-URGENT', '2-HIGH') AS urgent,
          nullif(o_orderstatus, 'O') IS NULL AS was_o,
          nullif(o_orderstatus, 'O') IS NOT NULL AS not_o,
          o_orderstatus IS NOT DISTINCT FROM 'O' AS nullsafe_eq,
          coalesce(nullif(o_orderstatus, 'O'), '-') AS nvl_,
          CASE WHEN nullif(o_orderstatus, 'O') IS NOT NULL THEN 'nonnull' ELSE 'isnull' END AS nvl2_,
          greatest(o_orderkey % 7, o_orderkey % 5, 2) AS gr,
          least(o_orderkey % 7, o_orderkey % 5, 3) AS ls
        FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey"""),
      doc = "Conditionals + predicates: when/case, if, coalesce/nullif/nvl/nvl2, IN, IS [NOT] NULL, null-safe equality, greatest/least."),

    QueryDef(
      "q67_sessionization",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        // Event sessionization in batch: a session breaks after a >30 min
        // gap per user. lag over (user, time) marks boundaries; a running
        // sum assigns session ids — one shuffle on user_id, the session
        // logic is window-local. (The streaming twin lives in
        // graft.streaming.StreamingOps using flatMapGroupsWithState.)
        val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val sessions = Tables.t(s, dir, "events")
          .filter($"user_id" < 100)
          .withColumn("prev_ts", lag($"ts", 1).over(byUser))
          .withColumn("new_session",
            when($"prev_ts".isNull ||
              unix_micros($"ts") - unix_micros($"prev_ts") > 1800L * 1000000L, 1L)
              .otherwise(0L))
          .withColumn("session_seq", sum($"new_session").over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        sessions.groupBy($"user_id", $"session_seq")
          .agg(count(lit(1)).as("n_events"),
            min($"ts").as("session_start"),
            max($"ts").as("session_end"),
            sum($"value".cast("decimal(18,2)")).cast("double").as("session_value"))
          .orderBy($"user_id", $"session_seq")
      },
      Some("""WITH marked AS (
          SELECT user_id, event_id, ts, value,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                 THEN 1 ELSE 0 END AS new_session
          FROM events WHERE user_id < 100
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        numbered AS (
          SELECT user_id, ts, value,
            CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
          FROM marked)
        SELECT user_id, session_seq, count(*) AS n_events,
          min(ts) AS session_start, max(ts) AS session_end,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        FROM numbered GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq"""),
      doc = "Batch sessionization over the events table: 30-min-gap sessions via lag + running sum, per-session aggregates."),

    QueryDef(
      "q68_time_window_agg",
      (s, dir) => {
        import s.implicits._
        // Tumbling-window aggregation — the batch twin of the streaming
        // windowed agg (StreamingOps.windowedCounts shares the shape).
        Tables.t(s, dir, "events")
          .groupBy(window($"ts", "6 hours").as("w"), $"event_type")
          .agg(count(lit(1)).as("n"),
            sum($"value".cast("decimal(18,2)")).cast("double").as("total"))
          .select($"w.start".as("w_start"), $"event_type", $"n", $"total")
          .orderBy($"w_start", $"event_type")
      },
      Some("""SELECT make_timestamp(CAST(floor(epoch(ts) / 21600) AS BIGINT) * 21600 * 1000000) AS w_start,
          event_type, count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM events GROUP BY 1, 2 ORDER BY w_start, event_type"""),
      doc = "Tumbling 6h time-window aggregation over events (window() → struct start/end)."),

    QueryDef(
      "q190_datetrunc_agg",
      (s, dir) => {
        import s.implicits._
        // Time-bucketed aggregation — the most common pipeline agg shape
        // (`GROUP BY date_trunc('DAY', ts)`). Spark pulls the computed
        // key into a Project below the partial agg
        // (PullOutGroupingExpressions); the date_trunc long kernel
        // (floor-to-multiple micros under UTC) compiles that Project
        // columnar, so the whole map side runs GraftColumnarProject →
        // GraftColumnarGroupedAgg (pinned in PlanAssertionSuite). The
        // decimal cast is pre-projected so the collapsed Project stays
        // fully kernel-compilable; the sum surfaces as exact cents.
        Tables.t(s, dir, "events")
          .select($"ts", $"event_type", $"user_id",
            $"value".cast("decimal(18,2)").as("dv"))
          .groupBy(date_trunc("DAY", $"ts").as("day"), $"event_type")
          .agg(count(lit(1)).as("n"), sum($"dv").as("sv"),
            min($"user_id").as("min_user"), max($"user_id").as("max_user"))
          // surface the bucket as DATE: DuckDB's date_trunc('day')
          // result type is version/renderer-ambiguous (DATE vs midnight
          // TIMESTAMP) — an explicit DATE cast on BOTH sides is stable
          .select($"day".cast("date").as("day"), $"event_type", $"n",
            ($"sv" * 100).cast("long").as("cents_sum"),
            $"min_user", $"max_user")
          .orderBy($"day", $"event_type")
      },
      Some("""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, count(*) AS n,
          CAST(round(sum(CAST(value AS DECIMAL(18,2))) * 100, 0) AS BIGINT) AS cents_sum,
          min(user_id) AS min_user, max(user_id) AS max_user
        FROM events GROUP BY 1, 2 ORDER BY day, event_type"""),
      doc = "Time-bucketed aggregation (GROUP BY date_trunc) — the computed grouping key compiles onto the columnar long kernel (floor-to-multiple micros), keeping the whole map side columnar; exact cents + count + long min/max check lanes."),

    QueryDef(
      "q138_session_window",
      (s, dir) => {
        import s.implicits._
        // Spark's NATIVE session window (SessionWindowing +
        // MergingSessionsExec) — the built-in twin of q67's manual
        // lag/running-sum sessionization: groupBy(user, session_window)
        // merges rows into gap-separated sessions in one shuffle, the
        // same operator streaming session aggregation uses. Window end
        // = last event + gap by definition, so the oracle derives it as
        // max(ts) + 30 min over the same gaps-and-islands grouping.
        Tables.t(s, dir, "events")
          .filter($"user_id" < 100)
          .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"),
            sum($"value".cast("decimal(18,2)")).cast("double").as("session_value"))
          .select($"user_id", $"w.start".as("w_start"), $"w.end".as("w_end"),
            $"n_events", $"session_value")
          .orderBy($"user_id", $"w_start")
      },
      Some("""WITH marked AS (
          SELECT user_id, event_id, ts, value,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                 THEN 1 ELSE 0 END AS new_session
          FROM events WHERE user_id < 100
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        numbered AS (
          SELECT user_id, ts, value,
            sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
          FROM marked)
        SELECT user_id, min(ts) AS w_start,
          max(ts) + INTERVAL 30 MINUTE AS w_end,
          count(*) AS n_events,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        FROM numbered GROUP BY user_id, session_seq
        ORDER BY user_id, w_start"""),
      doc = "Native session_window sessionization (SessionWindowing/MergingSessions — the operator streaming session aggregation uses); oracle derives identical sessions via gaps-and-islands with end = last event + gap.")
  )
}
