package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the TPC-H-ish testdata layout (TESTDATA.md).
  *
  * At cluster scale the same API points at a directory of many parquet
  * files per table; `spark.read.parquet` parallelizes splits via
  * `spark.sql.files.maxPartitionBytes`, so nothing here is local-mode
  * specific. Filter/projection pushdown is preserved because we return the
  * raw scan DataFrame and let Catalyst push predicates into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Conf the session MUST carry to read events.parquet — set it in the
    * SparkSession builder (Verify/Bench/tests all do). It is deliberately
    * NOT set inside [[events]]: the conf is re-read at execution time, so
    * save-and-restore around the read breaks lazy execution, and setting
    * it permanently would silently change how unrelated nanos-parquet
    * reads behave for the rest of the session (ADVICE r2).
    */
  val eventsReadConf: (String, String) = "spark.sql.legacy.parquet.nanosAsLong" -> "true"

  /** `events.parquet` stores `ts` as parquet INT64 TIMESTAMP(NANOS), which
    * Spark 4.x rejects outright (PARQUET_TYPE_ILLEGAL). Read the raw nanos
    * as a long via the legacy conf, then truncate to micros — identical to
    * what DuckDB does on read (its TIMESTAMP is micros), so oracle SQL can
    * use `ts` directly. All values are post-epoch, so integer division
    * truncation == cast truncation.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.getOption(eventsReadConf._1).contains(eventsReadConf._2),
      s"reading events.parquet (nanos timestamps) requires the session to set " +
        s"${eventsReadConf._1}=${eventsReadConf._2} in its builder")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  /** Register tables of `dir` as temp views so queries can use
    * `spark.sql` — the same names the DuckDB oracle uses. Register only
    * what the query needs: an unreadable table must not poison unrelated
    * SQL (ADVICE r1).
    */
  def registerViews(spark: SparkSession, dir: String,
      only: Seq[String] = names): Unit =
    only.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}

/** One inventory entry: a Spark implementation plus (when SQL-expressible)
  * a DuckDB oracle over the same tables. Column names must match exactly —
  * the driver sorts columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryDef {
  /** Load a golden VALUES-table oracle from the classpath
    * (src/main/resources/golden/, generated once from the sf0.01 output
    * via tools/make_golden.py — the q80 literal-oracle pattern). Used for
    * queries whose values are Spark-defined (xxhash64/murmur3/sha1) and
    * so have no computable DuckDB twin: the pinned snapshot makes them
    * regression-checked rather than rows-only. Tied to sf0.01, the
    * driver's correctness scale.
    */
  def golden(name: String): String = {
    val in = getClass.getResourceAsStream(s"/golden/$name.sql")
    require(in != null, s"missing golden oracle resource: $name")
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }
}
