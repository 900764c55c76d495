package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Two more training-data pipeline passes (builder brief "Beyond the
  * reference", continuing CorpusCleanQueries):
  *
  *  - q126 Gopher-style repetition gate: per-document duplicate-word
  *    fraction and most-common-bigram fraction (Gopher's "fraction of
  *    characters in the most common n-gram" family, realized on word
  *    counts so the statistic is exactly integer-derived). Documents
  *    failing either bound are dropped by downstream passes; the query
  *    emits the stats + verdict so the gate itself is oracle-checked.
  *  - q127 weighted domain-mixture resampling (the Pile/DoReMi shape):
  *    given per-source target weights, deterministically subsample each
  *    source at rate w_s*N/(W*n_s) using the md5-threshold trick
  *    (q109), so the output corpus approaches the target mixture and
  *    the SAME document set comes back on any engine, run, or cluster
  *    size. All rate arithmetic is exact-integer (thresholds in
  *    4096ths, integer DIV) — no float boundary can flip a document in
  *    or out between engines.
  *
  * 100 TB notes: q126 is one explode + two grouped aggregations, all
  * keyed by doc_id (bigram counts never shuffle raw text — the group
  * key is (doc_id, bigram) and partial aggregation collapses repeats
  * map-side). q127's per-source rate table is dimension-sized
  * (broadcast); the corpus side is a pure scan-filter like q109 — zero
  * shuffles of document rows.
  */
object QualityMixQueries {

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q126_gopher_repetition",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.t(s, dir, "documents")
        val base = docs.select($"doc_id", split($"text", " ").as("ws"))
        val words = base.select($"doc_id", explode($"ws").as("w"))
        val wstats = words.groupBy($"doc_id")
          .agg(count(lit(1)).as("n_words"), countDistinct($"w").as("d_words"))
        // adjacent-bigram multiset per doc; count the most common one.
        val bigr = base.select($"doc_id",
          explode(expr("transform(sequence(1, size(ws)-1), " +
            "i -> concat(element_at(ws, i), ' ', element_at(ws, i+1)))")).as("bg"))
        val bgTop = bigr.groupBy($"doc_id", $"bg").agg(count(lit(1)).as("c"))
          .groupBy($"doc_id").agg(max($"c").as("top_bg"), sum($"c").as("n_bg"))
        wstats.join(bgTop, Seq("doc_id"))
          .select($"doc_id", $"n_words",
            round($"d_words".cast("double") / $"n_words", 6).as("distinct_frac"),
            round($"top_bg".cast("double") / $"n_bg", 6).as("top_bigram_frac"),
            ($"d_words".cast("double") / $"n_words" >= 0.5 &&
              $"top_bg".cast("double") / $"n_bg" <= 0.08).as("keep"))
          .orderBy($"doc_id")
      },
      Some("""WITH w AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        ws AS (
          SELECT doc_id, count(*) AS n, count(DISTINCT word) AS dw
          FROM w GROUP BY doc_id),
        bgl AS (
          SELECT doc_id, unnest(list_transform(
            range(1, len(string_split(text, ' '))),
            i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS bg
          FROM documents),
        bgc AS (SELECT doc_id, bg, count(*) AS c FROM bgl GROUP BY doc_id, bg),
        bgt AS (SELECT doc_id, max(c) AS top_bg, sum(c) AS n_bg FROM bgc GROUP BY doc_id)
        SELECT ws.doc_id, CAST(n AS BIGINT) AS n_words,
          round(dw * 1.0 / n, 6) AS distinct_frac,
          round(top_bg * 1.0 / n_bg, 6) AS top_bigram_frac,
          (dw * 1.0 / n >= 0.5 AND top_bg * 1.0 / n_bg <= 0.08) AS keep
        FROM ws JOIN bgt ON ws.doc_id = bgt.doc_id
        ORDER BY ws.doc_id"""),
      doc = "Gopher-style repetition gate: duplicate-word fraction + most-common-bigram fraction per document, with the keep verdict; bigram counts shuffle (doc_id,bigram) keys with map-side partial aggregation."),

    QueryDef(
      "q127_domain_mixture",
      (s, dir) => {
        import s.implicits._
        // Target mixture: source srcK gets weight (K mod 4)+1 — a
        // deterministic non-uniform target over the 20 uniform sources.
        // rate_s = w_s*N/(W*n_s) capped at 1, expressed as an exact
        // threshold in 4096ths: thr = (4096*w_s*N) DIV (W*n_s), and a
        // doc survives iff the first 3 hex nibbles of md5(doc_id) sort
        // below the threshold's hex form. Everything before the final
        // filter is integer arithmetic — engine-exact.
        val docs = Tables.t(s, dir, "documents")
        val wts = docs.groupBy($"source").agg(count(lit(1)).as("n_s"))
          .withColumn("w_s",
            expr("CAST(substring(source, 4) AS BIGINT) % 4 + 1"))
        val tot = wts.agg(sum($"n_s").as("n_tot"), sum($"w_s").as("w_tot"))
        val rates = wts.crossJoin(broadcast(tot))
          .select($"source", $"n_s",
            least(expr("(4096 * w_s * n_tot) DIV (w_tot * n_s)"), lit(4096L))
              .as("thr"))
        docs
          .join(broadcast(rates), Seq("source"))
          .filter($"thr" === 4096L ||
            substring(md5($"doc_id".cast("string")), 1, 3) <
              lpad(lower(hex($"thr")), 3, "0"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_kept"), max($"n_s").as("n_in"),
            max($"thr").as("thr"))
          .orderBy($"source")
      },
      Some("""WITH wts AS (
          SELECT source, count(*) AS n_s,
            CAST(substring(source, 4) AS BIGINT) % 4 + 1 AS w_s
          FROM documents GROUP BY source),
        tot AS (SELECT sum(n_s) AS n_tot, sum(w_s) AS w_tot FROM wts),
        rates AS (
          SELECT source, n_s,
            least((4096 * w_s * n_tot) // (w_tot * n_s), 4096) AS thr
          FROM wts, tot)
        SELECT source, count(*) AS n_kept,
          CAST(max(n_s) AS BIGINT) AS n_in, CAST(max(thr) AS BIGINT) AS thr
        FROM documents JOIN rates USING (source)
        WHERE thr = 4096
          OR substring(md5(CAST(doc_id AS VARCHAR)), 1, 3) <
             lpad(lower(hex(thr)), 3, '0')
        GROUP BY source ORDER BY source"""),
      doc = "Weighted domain-mixture resampling: per-source deterministic md5-threshold subsampling toward target weights; exact-integer thresholds in 4096ths, broadcast rate table, zero corpus shuffles before the final per-source count.")
  )
}
