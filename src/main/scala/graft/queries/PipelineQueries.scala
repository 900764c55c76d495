package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** End-to-end LLM data-prep pipeline — the composite flow a training-data
  * user actually runs, as ONE query: quality gate → near-dup removal →
  * per-language corpus stats. Every stage is the scale-shaped variant
  * proven by its standalone query (q53 gate, q46 inverted-index near-dup,
  * q54 token counts).
  */
object PipelineQueries {

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q74_llm_prep_pipeline",
      (s, dir) => {
        import s.implicits._

        val docs = Tables.t(s, dir, "documents")
        val w = split($"text", " ")

        // Stage 1 — quality gate (per-row, codegen, no shuffle)
        val passed = docs
          .withColumn("n_words", size(w))
          .withColumn("distinct_ratio",
            size(array_distinct(w)).cast("double") / size(w))
          .filter($"n_words".between(20, 1000) && $"distinct_ratio" > 0.3)

        // Stage 2 — near-dup removal: inverted-index trigram Jaccard
        // (>= 0.8), drop the non-minimal doc of every pair. r15 shape
        // (the q46 kernel's): per-row trigram/distinct/size generation —
        // no word-table shuffle, no global distinct — and per-doc sizes
        // riding the single pair aggregation, so the pair table is
        // shuffled once instead of three times (guide §2.3/§2.4).
        val inv = DedupQueries.hashedIndex(passed).repartition($"shingle")
        val drops = inv.as("x").join(inv.as("y"),
            col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
          .groupBy(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
          .agg(count(lit(1)).as("shared"),
            max(col("x.n")).as("n1"), max(col("y.n")).as("n2"))
          .filter($"shared".cast("double") / ($"n1" + $"n2" - $"shared") >= 0.8)
          .select($"d2".as("doc_id")).distinct()
        val kept = passed.join(drops, Seq("doc_id"), "left_anti")

        // Stage 3 — per-language corpus stats
        val kw = split($"text", " ")
        kept
          .withColumn("tokens", size(kw).cast("long"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum($"tokens").as("total_tokens"),
            round(sum($"distinct_ratio".cast("decimal(18,9)")).cast("double")
              / count(lit(1)), 6).as("mean_distinct_ratio"))
          .orderBy($"lang")
      },
      Some("""WITH passed AS (
          SELECT doc_id, text, lang,
            len(string_split(text, ' ')) AS n_words,
            len(list_distinct(string_split(text, ' ')))::DOUBLE
              / len(string_split(text, ' ')) AS distinct_ratio
          FROM documents
          WHERE len(string_split(text, ' ')) BETWEEN 20 AND 1000
            AND len(list_distinct(string_split(text, ' ')))::DOUBLE
                / len(string_split(text, ' ')) > 0.3),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, len(string_split(text, ' ')) - 1),
            i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
                 || ' ' || string_split(text, ' ')[i+2])) AS s
          FROM passed),
        drops AS (
          SELECT DISTINCT b.doc_id
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.s, b.s))::DOUBLE
                / len(list_distinct(list_concat(a.s, b.s))) >= 0.8)
        SELECT lang, count(*) AS n_docs,
          CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
          round(CAST(sum(CAST(distinct_ratio AS DECIMAL(18,9))) AS DOUBLE)
            / count(*), 6) AS mean_distinct_ratio
        FROM passed WHERE doc_id NOT IN (SELECT doc_id FROM drops)
        GROUP BY lang ORDER BY lang"""),
      doc = "End-to-end LLM data prep: quality gate → trigram-Jaccard near-dup removal (drop non-minimal) → per-language corpus stats."),

    QueryDef(
      "q112_sequence_packing",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        // Pack documents (in doc_id order) into fixed 4096-token
        // training sequences: seq_id = floor(exclusive-cumsum / 4096) —
        // the standard contiguous concat-then-split packing. The global
        // cumsum is computed as a DISTRIBUTED TWO-PHASE SCAN, not a
        // single-partition window: (1) range-partition by doc_id and
        // cumsum WITHIN each partition in parallel; (2) per-partition
        // totals (one row per partition) get an exclusive prefix-sum on
        // a single tiny partition; (3) broadcast-join the offsets back.
        // At 100 TB phase 2 touches #partitions rows — nothing global
        // ever sorts or sits on one executor. Result is independent of
        // the (sampled, nondeterministic) range boundaries because
        // offsets are exact.
        val C = 4096L
        val toks = Tables.t(s, dir, "documents")
          .select($"doc_id", size(split($"text", " ")).cast("long").as("toks"))
        val nPart = 8
        val parted = toks.repartitionByRange(nPart, $"doc_id")
          .withColumn("pid", spark_partition_id())
        val local = parted.withColumn("lcum",
          sum($"toks").over(Window.partitionBy($"pid").orderBy($"doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)))
        val offsets = parted.groupBy($"pid").agg(sum($"toks").as("psum"))
          .withColumn("offset",
            sum($"psum").over(Window.orderBy($"pid")
              .rowsBetween(Window.unboundedPreceding, -1)))
          .select($"pid".as("opid"), coalesce($"offset", lit(0L)).as("offset"))
        local
          .join(broadcast(offsets), $"pid" === $"opid")
          .withColumn("cum", coalesce($"lcum", lit(0L)) + $"offset")
          // integer division: exact at any token count (a double divide
          // would wobble past 2^53 total tokens — reachable at 100 TB)
          .withColumn("seq_id", expr(s"cum div $C"))
          .groupBy($"seq_id")
          .agg(count(lit(1)).as("n_docs"), sum($"toks").as("seq_tokens"))
          .orderBy($"seq_id")
      },
      Some("""WITH t AS (
          SELECT doc_id, len(string_split(text, ' ')) AS toks FROM documents),
        c AS (
          SELECT doc_id, toks,
            COALESCE(sum(toks) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
          FROM t)
        SELECT CAST(cum // 4096 AS BIGINT) AS seq_id,
          count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS seq_tokens
        FROM c GROUP BY 1 ORDER BY 1"""),
      doc = "Sequence packing for training: contiguous 4096-token chunking via a distributed two-phase prefix-sum (parallel per-partition cumsum + tiny offsets join) — no global sort, no single-partition window on the data."),

    QueryDef(
      "q195_chunk_overlap",
      (s, dir) => {
        import s.implicits._
        // Sliding-window document chunking (the RAG / context-window
        // prep op): W=32-token chunks at stride S=24 (8-token overlap),
        // chunk_id = start/S. Pure map-side — tokenize, generate the
        // per-doc start offsets with sequence(), posexplode, slice: the
        // explode factor is ceil(n_tokens/S) and NOTHING shuffles until
        // the presentation orderBy, so a 100 TB corpus chunks at scan
        // speed with zero coordination. slice() is a view into the
        // token array (no per-chunk re-tokenize).
        val W = 32
        val S = 24
        Tables.t(s, dir, "documents")
          .select($"doc_id", split(trim($"text"), "\\s+").as("tk"))
          .withColumn("n", size($"tk"))
          .select($"doc_id", $"tk", $"n",
            posexplode(sequence(lit(0), $"n" - 1, lit(S))).as(Seq("chunk_id", "st")))
          .select($"doc_id",
            $"chunk_id".cast("long").as("chunk_id"),
            array_join(slice($"tk", $"st" + 1, lit(W)), " ").as("chunk_text"),
            least(lit(W), $"n" - $"st").cast("long").as("n_tokens"))
          .orderBy($"doc_id", $"chunk_id")
      },
      Some("""WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        starts AS (
          SELECT doc_id, tk, len(tk) AS n, unnest(range(0, len(tk), 24)) AS st
          FROM toks)
        SELECT doc_id, CAST(st / 24 AS BIGINT) AS chunk_id,
          array_to_string(tk[st+1 : st+32], ' ') AS chunk_text,
          least(32, n - st) AS n_tokens
        FROM starts ORDER BY doc_id, chunk_id"""),
      doc = "Sliding-window chunking with overlap (32-token windows, stride 24): tokenize → sequence() of start offsets → posexplode → array slice — zero-shuffle map-side explode, the RAG/context-prep shape.")
  )
}
