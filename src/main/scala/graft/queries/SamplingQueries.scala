package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Deterministic sampling for training-data pipelines. `TABLESAMPLE` /
  * `rand()` samples are irreproducible across runs, engines, and
  * partitionings — useless for a dataset you must be able to rebuild
  * bit-for-bit. The reproducible pattern is HASH-based selection:
  * h(key) defines a fixed pseudo-random permutation, so "h(key) below a
  * threshold" is a stable p-sample and "rank of h(key) within a
  * stratum" is a stable per-stratum quota — the same rows come back on
  * every engine, every run, every cluster size. md5 is used as the hash
  * because both Spark and DuckDB compute the identical RFC-1321 hex
  * digest, making the sample itself oracle-checkable.
  *
  * 100 TB notes:
  *  - q109 is a pure scan-filter: no shuffle, fully parallel, and the
  *    sample of a 100 TB corpus streams out without any coordination.
  *    (The md5 predicate can't push to parquet, but it evaluates
  *    codegen'd per row and the scan itself prunes columns.)
  *  - q110's per-stratum quota needs one shuffle on the stratum key +
  *    a window rank. Skew caution: a stratum = a language here, and
  *    one language can be half the corpus; for heavy strata, pre-filter
  *    with the q109 threshold trick at a generous multiple of the
  *    quota, THEN rank the survivors — bounded per-partition work.
  */
object SamplingQueries {

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q109_sample_hash",
      (s, dir) => {
        import s.implicits._
        // ~1/8 deterministic sample: first 3 hex nibbles of
        // md5(doc_id) < 0x200. Selectivity is exact in expectation and
        // the chosen set is a pure function of doc_id.
        Tables.t(s, dir, "documents")
          .filter(substring(md5($"doc_id".cast("string")), 1, 3) < "200")
          .select($"doc_id", $"lang", $"source")
      },
      Some("""SELECT doc_id, lang, source FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 3) < '200'"""),
      doc = "Deterministic hash sampling: md5(key) threshold — reproducible p-sample, zero shuffles, engine-checkable because md5 is standardized."),

    QueryDef(
      "q110_sample_stratified",
      (s, dir) => {
        import s.implicits._
        // Exact per-language quota (20 docs/lang), deterministic: rank
        // docs within each language by md5(doc_id) (doc_id tiebreak is
        // theoretical — md5 collisions — but makes determinism
        // unconditional) and keep the first 20.
        val w = Window.partitionBy($"lang")
          .orderBy(md5($"doc_id".cast("string")), $"doc_id")
        Tables.t(s, dir, "documents")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 20)
          .select($"doc_id", $"lang", $"rn")
      },
      Some("""SELECT doc_id, lang, rn FROM (
          SELECT doc_id, lang, row_number() OVER (
            PARTITION BY lang
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM documents) WHERE rn <= 20"""),
      doc = "Deterministic stratified sampling: fixed per-stratum quota via rank of md5(key) within the stratum — one shuffle on the stratum key.")
  )
}
