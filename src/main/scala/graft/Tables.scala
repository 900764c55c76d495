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
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register all tables of `dir` as temp views so queries can use
    * `spark.sql` — the same names the DuckDB oracle uses.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
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
