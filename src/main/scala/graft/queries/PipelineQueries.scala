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
        import org.apache.spark.sql.expressions.Window

        val docs = Tables.t(s, dir, "documents")
        val w = split($"text", " ")

        // Stage 1 — quality gate (per-row, codegen, no shuffle)
        val passed = docs
          .withColumn("n_words", size(w))
          .withColumn("distinct_ratio",
            size(array_distinct(w)).cast("double") / size(w))
          .filter($"n_words".between(20, 1000) && $"distinct_ratio" > 0.3)

        // Stage 2 — near-dup removal: inverted-index trigram Jaccard
        // (>= 0.8), drop the non-minimal doc of every pair. Skinny-row
        // count-based J, ReuseExchange on the self-join.
        val wspec = Window.partitionBy($"doc_id").orderBy($"pos")
        val inv = passed
          .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "wd")))
          .select($"doc_id",
            concat_ws(" ", $"wd", lead($"wd", 1).over(wspec), lead($"wd", 2).over(wspec)).as("t3"),
            lead($"wd", 2).over(wspec).isNotNull.as("full"))
          .filter($"full")
          .select($"doc_id", xxhash64($"t3").as("shingle"))
          .distinct()
          .repartition($"shingle")
        val sizes = inv.groupBy($"doc_id").agg(count(lit(1)).as("n"))
        val drops = inv.as("x").join(inv.as("y"),
            col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
          .groupBy(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
          .agg(count(lit(1)).as("shared"))
          .join(broadcast(sizes.select($"doc_id".as("d1"), $"n".as("n1"))), "d1")
          .join(broadcast(sizes.select($"doc_id".as("d2"), $"n".as("n2"))), "d2")
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
      doc = "End-to-end LLM data prep: quality gate → trigram-Jaccard near-dup removal (drop non-minimal) → per-language corpus stats.")
  )
}
