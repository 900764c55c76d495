package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Source/sink format breadth beyond parquet (q60) and CSV (q61): JSON
  * lines and ORC, each as a write + schema'd re-scan roundtrip whose
  * result must equal querying the parquet source directly — which is
  * exactly what the DuckDB oracle does, so the roundtrip (serializer,
  * scanner, type mapping) is what's under test. spark-avro is NOT in
  * /opt/spark/jars (zero egress), so Avro is environment-blocked — the
  * pattern here is format-agnostic and an avro roundtrip would be these
  * same ~10 lines.
  *
  * Scale notes: JSON/ORC scans split and parallelize like parquet
  * (FileSourceScan over maxPartitionBytes); ORC carries min/max stripe
  * statistics so the re-scan filter pushes down (pinned in
  * PlanAssertionSuite); JSON is schema'd explicitly — schema inference
  * would be a second full pass over 100 TB.
  */
object SourceFormatQueries {

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q123_json_roundtrip",
      (s, dir) => {
        import s.implicits._
        // JSON-lines write + explicit-schema scan. Timestamps stay
        // ISO-8601 strings in the file; the read schema restores them,
        // and the aggregation checks values survived (date_trunc'd
        // month boundaries + exact decimal money sums).
        val out = s"/tmp/graft_json/${java.util.UUID.randomUUID()}"
        Tables.t(s, dir, "orders")
          .filter($"o_orderstatus" === "F")
          .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderdate")
          .write.mode("overwrite").json(out)
        s.read.schema(
            "o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE, o_orderdate TIMESTAMP")
          .json(out)
          .groupBy(date_trunc("month", $"o_orderdate").as("month"))
          .agg(count(lit(1)).as("n"),
            sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("total"))
          .orderBy($"month")
      },
      Some("""SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, count(*) AS n,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders WHERE o_orderstatus = 'F'
        GROUP BY 1 ORDER BY 1"""),
      doc = "JSON-lines write + explicit-schema scan roundtrip (no inference pass); timestamp and money values must survive the text encoding exactly."),

    QueryDef(
      "q124_orc_roundtrip",
      (s, dir) => {
        import s.implicits._
        // ORC write + filtered re-scan: the l_quantity predicate pushes
        // into the ORC scan (stripe min/max stats), pinned in
        // PlanAssertionSuite.
        val out = s"/tmp/graft_orc/${java.util.UUID.randomUUID()}"
        Tables.t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_partkey", $"l_quantity",
            $"l_extendedprice", $"l_returnflag")
          .write.mode("overwrite").orc(out)
        s.read.orc(out)
          .filter($"l_quantity" >= 45)
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("volume"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS volume
        FROM lineitem WHERE l_quantity >= 45
        GROUP BY 1 ORDER BY 1"""),
      doc = "ORC write + filtered re-scan roundtrip; the quantity predicate pushes down to ORC stripe statistics."),

    QueryDef(
      "q125_text_roundtrip",
      (s, dir) => {
        import s.implicits._
        // Whole-line text format (spark.read.text): one string column
        // per line — the raw-corpus ingestion shape for LLM pipelines
        // (each line a document). Tab-joined fields survive because the
        // source text has no tabs (asserted by the oracle equality).
        val out = s"/tmp/graft_text/${java.util.UUID.randomUUID()}"
        Tables.t(s, dir, "documents")
          .select(concat_ws("\t", $"doc_id", $"lang", $"text").as("value"))
          .write.mode("overwrite").text(out)
        val parts = split($"value", "\t", 3)
        s.read.text(out)
          .select(parts.getItem(0).cast("long").as("doc_id"),
            parts.getItem(1).as("lang"),
            length(parts.getItem(2)).as("text_len"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n"), sum($"text_len").as("chars"))
          .orderBy($"lang")
      },
      Some("""SELECT lang, count(*) AS n,
          CAST(sum(length(text)) AS BIGINT) AS chars
        FROM documents
        GROUP BY lang ORDER BY lang"""),
      doc = "Line-oriented text write + scan (raw-corpus ingestion shape): TSV-packed fields split back, per-language char totals must match the parquet source.")
    ,

    QueryDef(
      "q159_merge_schema_scan",
      (s, dir) => {
        import s.implicits._
        // Schema evolution (the long-lived-table reality at 100 TB): an
        // old partition written WITHOUT a column, a new partition WITH
        // it, one scan over both via mergeSchema — the missing column
        // reads as NULL for old files. Parquet remains the source of
        // truth for per-file schemas; the merged read must neither drop
        // the new column nor invent values. Money sums through exact
        // decimal (the q123 convention).
        val out = s"/tmp/graft_evo/${java.util.UUID.randomUUID()}"
        val o = Tables.t(s, dir, "orders")
        o.filter($"o_orderkey" % 2 === 0)
          .select($"o_orderkey", $"o_totalprice")
          .write.mode("overwrite").parquet(s"$out/v=1")
        o.filter($"o_orderkey" % 2 === 1)
          .select($"o_orderkey", $"o_totalprice", $"o_orderpriority")
          .write.mode("overwrite").parquet(s"$out/v=2")
        s.read.option("mergeSchema", "true").parquet(s"$out/v=1", s"$out/v=2")
          .groupBy(coalesce($"o_orderpriority", lit("<pre-schema>")).as("prio"))
          .agg(count(lit(1)).as("n"),
            sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("total"))
          .orderBy($"prio")
      },
      Some("""SELECT coalesce(CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END,
            '<pre-schema>') AS prio,
          count(*) AS n,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY 1 ORDER BY 1"""),
      doc = "mergeSchema scan over partitions written before/after a column was added: old files surface NULL for the new column, values and exact money sums survive the merged read.")
  )
}
