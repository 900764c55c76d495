package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Sequential event analytics over the `events` table — the funnel /
  * cohort shapes every product-analytics warehouse runs at scale (and a
  * natural fit for the engine's window + conditional-aggregation
  * surface).
  *
  * 100 TB design notes: both queries aggregate the raw event stream to
  * per-user skinny rows FIRST (map-side partials, one shuffle on
  * user_id), then operate on the ~#users-sized intermediate — the raw
  * corpus is scanned exactly once per query and never self-joined at
  * event granularity.
  */
object EventAnalyticsQueries {

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q160_event_funnel",
      (s, dir) => {
        import s.implicits._
        // Ordered funnel view → click → purchase: each stage counts
        // users whose first qualifying event happens strictly AFTER
        // their previous stage's first event. One pass builds per-user
        // first-view timestamps; clicks/purchases re-aggregate against
        // the (broadcastable, #users-sized) stage table — never an
        // event-granularity self-join. Exact timestamps, exact counts.
        val e = Tables.events(s, dir).select($"user_id", $"event_type", $"ts")
        val v = e.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min($"ts").as("v_ts"))
        val c = e.filter($"event_type" === "click")
          .join(v, Seq("user_id")).filter($"ts" > $"v_ts")
          .groupBy($"user_id").agg(min($"ts").as("c_ts"))
        val p = e.filter($"event_type" === "purchase")
          .join(c, Seq("user_id")).filter($"ts" > $"c_ts")
          .groupBy($"user_id").agg(min($"ts").as("p_ts"))
        val counts = v.agg(count(lit(1)).as("n")).select(lit(1).as("stage"), lit("view").as("step"), $"n")
          .unionAll(c.agg(count(lit(1)).as("n")).select(lit(2).as("stage"), lit("click_after_view").as("step"), $"n"))
          .unionAll(p.agg(count(lit(1)).as("n")).select(lit(3).as("stage"), lit("purchase_after_click").as("step"), $"n"))
        counts.orderBy($"stage")
      },
      Some("""WITH v AS (
          SELECT user_id, min(ts) AS v_ts FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        c AS (
          SELECT e.user_id, min(e.ts) AS c_ts FROM events e
          JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY e.user_id),
        p AS (
          SELECT e.user_id, min(e.ts) AS p_ts FROM events e
          JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id)
        SELECT stage, step, n FROM (
          SELECT 1 AS stage, 'view' AS step, CAST(count(*) AS BIGINT) AS n FROM v
          UNION ALL
          SELECT 2, 'click_after_view', CAST(count(*) AS BIGINT) FROM c
          UNION ALL
          SELECT 3, 'purchase_after_click', CAST(count(*) AS BIGINT) FROM p)
        ORDER BY stage"""),
      doc = "Ordered conversion funnel (view -> click -> purchase, strict event-time ordering): per-user first-qualifying-event aggregation per stage; stage tables are #users-sized, the event corpus is never self-joined."),

    QueryDef(
      "q161_retention_cohorts",
      (s, dir) => {
        import s.implicits._
        // Weekly retention matrix: cohort = ISO week of the user's
        // FIRST event; a (cohort_week, offset) cell counts users active
        // in cohort_week + offset. Weeks via date_trunc('week') (Monday
        // in both engines); offsets as exact integer day-diffs / 7. Two
        // aggregations over per-user skinny rows; distinct (user, week)
        // activity is computed once.
        val e = Tables.events(s, dir).select($"user_id", $"ts")
        val weekly = e.select($"user_id", date_trunc("week", $"ts").as("w")).distinct()
        val first = weekly.groupBy($"user_id").agg(min($"w").as("cw"))
        weekly.join(first, Seq("user_id"))
          .select($"cw", (datediff($"w", $"cw") / 7).cast("long").as("offset"))
          .groupBy($"cw", $"offset")
          .agg(count(lit(1)).as("n_active"))
          .orderBy($"cw", $"offset")
      },
      Some("""WITH weekly AS (
          SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS w
          FROM events),
        first AS (
          SELECT user_id, min(w) AS cw FROM weekly GROUP BY user_id)
        SELECT cw, CAST(date_diff('day', CAST(cw AS DATE), CAST(w AS DATE)) / 7 AS BIGINT) AS offset,
          CAST(count(*) AS BIGINT) AS n_active
        FROM weekly JOIN first USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2"""),
      doc = "Weekly retention cohort matrix: cohort = week of first activity, cells = users active at each week offset; distinct (user, week) computed once, all counts exact integers.")
  )
}
