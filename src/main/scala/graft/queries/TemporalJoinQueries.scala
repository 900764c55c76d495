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
        val leaders = ev
          .withColumn("bucket", explode(array(
            floor($"us" / (1800L * 1000000L)),
            floor($"us" / (1800L * 1000000L)) + 1)))
          .select($"user_id", $"event_id".as("a_id"), $"us".as("a_us"), $"bucket")
        val followers = ev
          .withColumn("bucket", floor($"us" / (1800L * 1000000L)))
          .select($"user_id", $"event_id".as("b_id"), $"us".as("b_us"), $"bucket")
        leaders.join(followers, Seq("user_id", "bucket"))
          .filter($"b_us" - $"a_us" >= 0L &&
            $"b_us" - $"a_us" <= 1800L * 1000000L &&
            $"a_id" =!= $"b_id")
          // a follower equal in time to its leader pairs in both bucket
          // branches of the leader → count distinct pairs
          .select($"user_id", $"a_id", $"b_id").distinct()
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
