package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Temporal join operators Spark lacks as built-ins (builder brief:
  * "as-of join, range join" — the named examples of operators to
  * compose Spark-first rather than port).
  *
  * Both are built WITHOUT inequality joins: a naive `t1.ts >= t2.ts`
  * join condition plans a per-key cartesian that dies at scale. Instead:
  *
  *  - as-of join = union both sides, one window over (key, time) with
  *    last-observation-carried-forward: ONE shuffle on the key, linear
  *    work, no join operator at all in the plan.
  *  - range join = band the time axis into buckets sized to the range
  *    predicate, replicate each probe into the (two) covering buckets,
  *    equi-join on (key, bucket), post-filter the exact range: shuffle
  *    volume is |data| × 2, never |data|².
  */
object TemporalJoinQueries {

  /** As-of join: for each probe row, the latest quote row of the same
    * key with quote time <= probe time (inclusive). Quotes must be
    * unique per (key, time) — pre-aggregate if not.
    */
  def asofJoin(probes: DataFrame, quotes: DataFrame, key: String,
      pTime: String, qTime: String, valueCol: String): DataFrame = {
    val p = probes.withColumn("__side", lit(1))
      .withColumn("__t", col(pTime))
      .withColumn("__qt", lit(null).cast(quotes.schema(qTime).dataType))
      .withColumn("__v", lit(null).cast(quotes.schema(valueCol).dataType))
    val q = quotes.select(col(key), col(qTime).as("__t"),
        col(qTime).as("__qt"), col(valueCol).as("__v"))
      .withColumn("__side", lit(0))
    // quotes sort before probes at equal time → ties are inclusive
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.select((col(key) +: p.columns.filterNot(c => c == key).map(col)): _*)
      .unionByName(q, allowMissingColumns = true)
      .withColumn("__asof_t", last(col("__qt"), ignoreNulls = true).over(w))
      .withColumn("__asof_v", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__t", "__qt", "__v")
  }

  /** Banded range self-join kernel: all ordered pairs (a, b) of rows
    * sharing `key` with 0 <= time(b) - time(a) <= windowUnits. Public so
    * the fuzz suite can differential-test the banding construction
    * against an in-memory brute force. `time` is any integral column in
    * the same units as `windowUnits`.
    */
  def rangePairs(rows: DataFrame, key: String, id: String, time: String,
      windowUnits: Long): DataFrame = {
    val leaders = rows
      .withColumn("__bucket", explode(array(
        floor(col(time) / windowUnits),
        floor(col(time) / windowUnits) + 1)))
      .select(col(key), col(id).as("a_id"), col(time).as("a_t"), col("__bucket"))
    val followers = rows
      .withColumn("__bucket", floor(col(time) / windowUnits))
      .select(col(key), col(id).as("b_id"), col(time).as("b_t"), col("__bucket"))
    leaders.join(followers, Seq(key, "__bucket"))
      .filter(col("b_t") - col("a_t") >= 0L &&
        col("b_t") - col("a_t") <= windowUnits &&
        col("a_id") =!= col("b_id"))
      .select(col(key), col("a_id"), col("b_id")).distinct()
  }

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q82_asof_join",
      (s, dir) => {
        import s.implicits._
        // Each event matched with the user's most recent order at or
        // before the event time. Quotes deduped to one row per
        // (customer, order time) so "latest" is well-defined on both
        // engines. DuckDB's native ASOF LEFT JOIN is the oracle.
        val probes = Tables.t(s, dir, "events")
          .filter($"user_id" < 50)
          .select($"user_id", $"event_id", $"ts")
        val quotes = Tables.t(s, dir, "orders")
          .groupBy($"o_custkey".as("user_id"), $"o_orderdate")
          .agg(max($"o_totalprice").as("price"))
        asofJoin(probes, quotes, "user_id", "ts", "o_orderdate", "price")
          .select($"user_id", $"event_id", $"ts",
            $"__asof_t".as("order_ts"), $"__asof_v".as("price"))
          .orderBy($"user_id", $"event_id")
      },
      Some("""WITH quotes AS (
          SELECT o_custkey AS user_id, o_orderdate AS qts, max(o_totalprice) AS price
          FROM orders GROUP BY 1, 2),
        probes AS (SELECT user_id, event_id, ts FROM events WHERE user_id < 50)
        SELECT p.user_id, p.event_id, p.ts, q.qts AS order_ts, q.price
        FROM probes p ASOF LEFT JOIN quotes q
          ON p.user_id = q.user_id AND p.ts >= q.qts
        ORDER BY p.user_id, p.event_id"""),
      doc = "As-of join via union + windowed LOCF (one shuffle on the key, no join operator, no per-key cartesian) vs DuckDB's native ASOF LEFT JOIN."),

    QueryDef(
      "q83_range_join_banded",
      (s, dir) => {
        import s.implicits._
        // Self range-join: pairs of events of the same user within
        // [0, 30 min] of each other, counted per user. The 1800 s band
        // equals the range width, so a follower is always in the
        // leader's bucket or the next one — two candidate buckets,
        // equi-join on (user, bucket), exact post-filter.
        val ev = Tables.t(s, dir, "events")
          .filter($"user_id" < 30)
          .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
        rangePairs(ev, "user_id", "event_id", "us", 1800L * 1000000L)
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy($"user_id")
      },
      Some("""SELECT a.user_id, count(*) AS n_pairs
        FROM (SELECT user_id, event_id, ts FROM events WHERE user_id < 30) a
        JOIN (SELECT user_id, event_id, ts FROM events WHERE user_id < 30) b
          ON a.user_id = b.user_id AND a.event_id <> b.event_id
         AND epoch_us(b.ts) - epoch_us(a.ts) BETWEEN 0 AND 1800 * 1000000
        GROUP BY a.user_id ORDER BY a.user_id"""),
      doc = "Range join via time-axis banding: 2x replication + equi-join on (key, bucket) + exact post-filter — never an inequality-join cartesian. Oracle runs the naive inequality join.")
  )
}
