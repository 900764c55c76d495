package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Change-data-capture shapes over the events stream — the two
  * compactions every warehouse ingestion pipeline runs on a CDC feed:
  *
  *  - q131 apply-latest (CDC compaction / "upsert view"): reduce a
  *    change log to one current row per key. The classic wrong way at
  *    100 TB is a self-join against max(ts); the right way is one
  *    shuffle on the key + a rank-1 filter, which Spark executes with
  *    partial WindowGroupLimit pushdown — only ≤1 candidate row per key
  *    per input partition reaches the shuffle (same mechanism q110
  *    pins).
  *  - q132 SCD2 intervals (slowly-changing-dimension history): order
  *    each key's changes by event time and derive [valid_from,
  *    valid_to) with lead(); the open interval (valid_to NULL) is the
  *    current version. Same single-shuffle shape; lead's NULL default
  *    matches DuckDB's.
  *
  * Both orderings carry event_id as the unique tiebreaker so results
  * are deterministic even if two changes ever shared a timestamp.
  */
object ChangeDataQueries {

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q131_cdc_latest",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id", $"event_type")
          .orderBy($"ts".desc, $"event_id".desc)
        Tables.events(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"user_id", $"event_type", $"ts".as("last_ts"),
            $"value".as("last_value"))
          .orderBy($"user_id", $"event_type")
      },
      Some("""SELECT user_id, event_type, ts AS last_ts, value AS last_value
        FROM (SELECT user_id, event_type, ts, value, row_number() OVER (
            PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1 ORDER BY user_id, event_type"""),
      doc = "CDC apply-latest compaction: one current row per (user_id, event_type) via rank-1 over the change log — one key shuffle with partial WindowGroupLimit pushdown, never a max(ts) self-join."),

    QueryDef(
      "q132_scd2_intervals",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
          .orderBy($"ts", $"event_id")
        Tables.events(s, dir)
          .filter($"event_type" === "purchase")
          .select($"user_id", $"ts", $"value",
            row_number().over(w).as("version"),
            lead($"ts", 1).over(w).as("valid_to"))
          .withColumnRenamed("ts", "valid_from")
          .select($"user_id", $"version", $"value", $"valid_from", $"valid_to")
          .orderBy($"user_id", $"version")
      },
      Some("""SELECT user_id, version, value, valid_from, valid_to FROM (
          SELECT user_id, ts AS valid_from, value,
            row_number() OVER w AS version,
            lead(ts, 1) OVER w AS valid_to
          FROM events WHERE event_type = 'purchase'
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        ORDER BY user_id, version"""),
      doc = "SCD2 history build: per-key versions with [valid_from, valid_to) derived by lead(); the open interval is the current version. One shuffle on the key, event_id tiebreak for determinism.")
  )
}
