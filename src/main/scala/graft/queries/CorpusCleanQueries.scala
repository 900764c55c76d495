package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Corpus-hygiene operators — the three classic cleaning passes every
  * large-scale LLM training-data pipeline runs between raw crawl and
  * tokenization (builder brief "Beyond the reference"):
  *
  *  - q115 corpus-level span dedup (the C4/RefinedWeb "line dedup"
  *    pass): drop text spans that repeat across >= K documents
  *    (boilerplate, navigation chrome), reassembling each document from
  *    its surviving spans. The testdata has no newlines, so "line" =
  *    fixed 8-word segment — the algorithm is byte-identical to the
  *    newline version with a different splitter.
  *  - q116 benchmark decontamination (GPT-3 appendix-C style): flag
  *    training documents sharing >= T word-n-grams with any document of
  *    a held-out benchmark set. The benchmark side is always tiny →
  *    broadcast; the corpus side shuffles only (hash, doc_id) longs.
  *  - q117 unigram-LM scoring (the CCNet/Gopher perplexity gate,
  *    realized with an exactly-reproducible unigram model): score(doc) =
  *    -mean log p(token) under a Laplace-smoothed unigram model fitted
  *    on the corpus itself. Per-token log-probs are rounded to 7
  *    decimals and summed as DECIMAL so the per-doc mean is
  *    order-independent — bit-stable under any partitioning, and
  *    comparable across engines.
  *
  * 100 TB shapes: q115 shuffles segments once by 16-byte md5 and once
  * by doc_id; the hot-segment list is NOT broadcast-hinted — at web
  * scale boilerplate grows with the corpus, so the anti-join shuffles
  * on the digest (AQE broadcasts when it genuinely fits). q116
  * broadcasts the benchmark index — that side is genuinely bounded.
  * q117's unigram model is likewise unhinted (web vocabularies are
  * unbounded); the token side joins on xxhash64 longs so the corpus
  * shuffle carries (doc_id, hash), and the corpus is touched by
  * exactly one explode + one equi-join + one groupBy.
  */
object CorpusCleanQueries {

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q115_corpus_span_dedup",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.t(s, dir, "documents")
        val w = docs.select($"doc_id",
          posexplode(split($"text", " ")).as(Seq("pos", "word")))
        // 8-word segments, order restored by sorting (pos, word) structs
        val seg = w.groupBy($"doc_id", expr("pos DIV 8").as("grp"))
          .agg(array_join(
            transform(array_sort(collect_list(struct($"pos", $"word"))),
              x => x.getField("word")), " ").as("seg"))
        // boilerplate = a segment appearing in >= 3 distinct docs. NO
        // broadcast hint on the hot list: at web scale the C4-style
        // boilerplate set grows with the corpus (billions of lines) and
        // a hinted broadcast would OOM the driver. The anti-join keys
        // are 16-byte md5 digests, so the shuffle is cheap, and both
        // sides hash-partition on the same key — the hot side reuses
        // the exchange its own groupBy already created. AQE still
        // broadcasts when the list genuinely fits.
        val hot = seg.groupBy(md5($"seg".cast("binary")).as("h"))
          .agg(countDistinct($"doc_id").as("df"))
          .filter($"df" >= 3).select($"h")
        val kept = seg.join(hot,
          md5($"seg".cast("binary")) === $"h", "left_anti")
        val clean = kept.groupBy($"doc_id")
          .agg(array_join(
            transform(array_sort(collect_list(struct($"grp", $"seg"))),
              x => x.getField("seg")), " ").as("cleaned"),
            count(lit(1)).as("n_seg"))
        docs.select($"doc_id").join(clean, Seq("doc_id"), "left_outer")
          .select($"doc_id",
            coalesce($"cleaned", lit("")).as("cleaned"),
            coalesce($"n_seg", lit(0L)).as("n_seg"))
          .orderBy($"doc_id")
      },
      Some("""WITH w AS (
          SELECT doc_id, unnest(ws) AS word, unnest(range(1, len(ws)+1)) AS ord
          FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
        seg AS (
          SELECT doc_id, (ord-1)//8 AS grp, string_agg(word, ' ' ORDER BY ord) AS seg
          FROM w GROUP BY doc_id, (ord-1)//8),
        hot AS (
          SELECT md5(seg) AS h FROM seg
          GROUP BY md5(seg) HAVING count(DISTINCT doc_id) >= 3),
        clean AS (
          SELECT doc_id, string_agg(seg, ' ' ORDER BY grp) AS cleaned,
                 count(*) AS n_seg
          FROM seg WHERE md5(seg) NOT IN (SELECT h FROM hot)
          GROUP BY doc_id)
        SELECT d.doc_id, coalesce(c.cleaned, '') AS cleaned,
               coalesce(c.n_seg, 0) AS n_seg
        FROM documents d LEFT JOIN clean c USING (doc_id)
        ORDER BY d.doc_id"""),
      doc = "C4-style corpus-level span dedup: 8-word segments repeated in >= 3 docs are dropped (unhinted anti-join on 16-byte md5 keys — the hot set grows with the corpus, so no driver broadcast), documents reassembled from surviving segments in order."),

    QueryDef(
      "q116_decontamination",
      (s, dir) => {
        import s.implicits._
        // Benchmark set = every 50th doc (stand-in for a held-out eval
        // suite). Contamination = sharing >= 2 distinct word-trigrams.
        // The trigram index reuses the q46 kernel's hashed form: only
        // (hash, doc_id) longs shuffle. No broadcast hint on the probe
        // index: a REAL benchmark suite is fixed-size and would be
        // broadcast by AQE anyway, but this fixture's "every 50th doc"
        // stand-in is 1/50 of ALL corpus trigrams — corpus-proportional,
        // so a hint would force an unbounded driver collect at 100 TB.
        // The equi-join on the hashed trigram stays skew-safe either way.
        val tri = DedupQueries.trigramsOf(Tables.t(s, dir, "documents"))
          .select($"doc_id", xxhash64($"t3").as("sh")).distinct()
        val probes = tri.filter($"doc_id" % 50 === 0)
          .select($"doc_id".as("probe_id"), $"sh")
        tri.join(probes, Seq("sh"))
          .filter($"doc_id" =!= $"probe_id")
          .groupBy($"doc_id", $"probe_id")
          .agg(count(lit(1)).as("n_shared"))
          .filter($"n_shared" >= 2)
          .orderBy($"doc_id", $"probe_id")
      },
      Some("""WITH sh AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, len(string_split(text,' ')) - 1),
            i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
                 || ' ' || string_split(text,' ')[i+2])) AS s
          FROM documents WHERE len(string_split(text,' ')) >= 3),
        probes AS (SELECT doc_id AS probe_id, s AS ps FROM sh WHERE doc_id % 50 = 0)
        SELECT doc_id, probe_id, n_shared FROM (
          SELECT c.doc_id, p.probe_id,
                 CAST(len(list_intersect(c.s, p.ps)) AS BIGINT) AS n_shared
          FROM sh c JOIN probes p ON c.doc_id <> p.probe_id)
        WHERE n_shared >= 2 ORDER BY doc_id, probe_id"""),
      doc = "Benchmark decontamination: flag corpus docs sharing >= 2 distinct word-trigrams with any benchmark doc; hashed trigram equi-join against the benchmark index (AQE broadcasts iff the suite genuinely fits)."),

    QueryDef(
      "q117_unigram_lm_score",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.t(s, dir, "documents")
        val tok = docs.select($"doc_id", explode(split($"text", " ")).as("w"))
        val cnt = tok.groupBy($"w").agg(count(lit(1)).as("c"))
        val tot = cnt.agg(sum($"c").as("n"), count(lit(1)).as("v"))
        // per-token log-prob quantized to DECIMAL(12,7): the per-doc sum
        // is then exact and order-independent (a raw double sum would be
        // partitioning-dependent and could flip the 6th decimal)
        // NO broadcast hint on the model table: lp has one row per
        // DISTINCT corpus token, which at web scale (typos, URLs,
        // numbers) is unbounded — a hinted broadcast OOMs the driver.
        // Join on xxhash64(w) longs instead so the token side shuffles
        // (doc_id, hash) pairs, not strings; w is kept in the key to
        // make the join exact under hash collisions (the hash is first
        // in the key list, so partitioning is still hash-led). AQE
        // still broadcasts when the vocabulary genuinely fits.
        val lp = cnt.crossJoin(broadcast(tot))
          .select(xxhash64($"w").as("wh"), $"w",
            round(log(($"c" + lit(1.0)) / ($"n" + $"v")), 7)
              .cast("decimal(12,7)").as("lp"))
        tok.withColumn("wh", xxhash64($"w"))
          .join(lp, Seq("wh", "w"))
          .groupBy($"doc_id")
          .agg(round(-(sum($"lp").cast("double") / count(lit(1))), 6).as("nll"),
            count(lit(1)).as("n_tok"))
          .orderBy($"doc_id")
      },
      Some("""WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM cnt),
        lp AS (SELECT w, CAST(round(ln((c + 1.0) / (n + v)), 7) AS DECIMAL(12,7)) AS lp
               FROM cnt, tot)
        SELECT doc_id, round(-(CAST(sum(lp) AS DOUBLE) / count(*)), 6) AS nll,
               count(*) AS n_tok
        FROM tok JOIN lp USING (w) GROUP BY doc_id ORDER BY doc_id"""),
      doc = "CCNet-style LM quality gate on an exactly-reproducible model: Laplace-smoothed corpus unigram LM, score = -mean log p(token); decimal-quantized log-probs make the mean order-independent; unhinted hash-led join (web vocabularies are unbounded).")
  ,

    QueryDef(
      "q166_repetition_gate",
      (s, dir) => {
        import s.implicits._
        // Repetition gate, ZERO-SHUFFLE formulation: q126 computes the
        // Gopher statistics by exploding to (doc_id, bigram) rows and
        // re-grouping — correct, but the corpus is shuffled once per
        // n-gram order. Here the same family of ratios (unigram/bigram
        // 1 - distinct/total) is computed INSIDE each row with array
        // kernels (split / transform / array_distinct), so 100 TB of
        // text is never exploded or shuffled at all; the only exchange
        // is the final per-lang rollup (a handful of rows). Per-doc
        // ratios are exact rationals in IEEE doubles, and the lang
        // means sum decimal-quantized ratios (the q117 discipline) so
        // they are partitioning-independent.
        val docs = Tables.t(s, dir, "documents")
          .select($"doc_id", $"lang", split($"text", " ").as("ws"))
          .filter(size($"ws") >= 1)
          .select($"doc_id", $"lang",
            (lit(1.0) - size(array_distinct($"ws")).cast("double") / size($"ws"))
              .as("rep1"),
            when(size($"ws") >= 2,
              lit(1.0) - size(array_distinct(expr(
                "transform(sequence(1, size(ws) - 1), i -> concat_ws(' ', ws[i-1], ws[i]))")))
                .cast("double") / (size($"ws") - 1).cast("double"))
              .otherwise(lit(0.0)).as("rep2"))
        docs.groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(when($"rep1" > 0.5 || $"rep2" > 0.2, 1L).otherwise(0L)).as("n_flagged"),
            round(sum(round($"rep1", 9).cast("decimal(18,9)")).cast("double")
              / count(lit(1)), 6).as("mean_rep1"),
            round(sum(round($"rep2", 9).cast("decimal(18,9)")).cast("double")
              / count(lit(1)), 6).as("mean_rep2"))
          .orderBy($"lang")
      },
      Some("""WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
        r AS (SELECT doc_id, lang,
                1.0 - len(list_distinct(ws))::DOUBLE / len(ws) AS rep1,
                CASE WHEN len(ws) >= 2 THEN
                  1.0 - len(list_distinct([ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))]))::DOUBLE
                    / (len(ws) - 1)
                ELSE 0.0 END AS rep2
              FROM w WHERE len(ws) >= 1)
        SELECT lang, count(*) AS n_docs,
               CAST(sum(CASE WHEN rep1 > 0.5 OR rep2 > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
               round(CAST(sum(CAST(round(rep1, 9) AS DECIMAL(18,9))) AS DOUBLE) / count(*), 6) AS mean_rep1,
               round(CAST(sum(CAST(round(rep2, 9) AS DECIMAL(18,9))) AS DOUBLE) / count(*), 6) AS mean_rep2
        FROM r GROUP BY lang ORDER BY lang"""),
      doc = "Repetition gate, zero-shuffle formulation (complements q126's per-doc explode+groupBy verdict): unigram/bigram repetition ratios computed inside each row with array kernels — no explode, no corpus shuffle, only the tiny per-lang rollup exchanges; means over decimal-quantized ratios are partitioning-independent."),

    QueryDef(
      "q167_length_outlier_gate",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        // Robust per-lang length-outlier gate (median/MAD): the
        // distribution-free winsorization pass that drops truncated and
        // concatenated crawl documents. The medians are EXACT and
        // 100 TB-safe: n_chars is an integer domain, so median =
        // counting aggregate + cumulative-sum window over (lang, value)
        // counts — no per-group value buffer anywhere (Spark's
        // median()/percentile() aggregates collect every group value
        // into one buffer, which OOMs at corpus scale; this formulation
        // shuffles only distinct (lang, value) pairs). Same machinery
        // reused for the MAD (deviations are exact multiples of 0.5).
        val d = Tables.t(s, dir, "documents").select($"lang", $"n_chars")
        def medianOf(df: org.apache.spark.sql.DataFrame, col: String) = {
          val byVal = Window.partitionBy($"lang").orderBy(org.apache.spark.sql.functions.col(col))
          val whole = Window.partitionBy($"lang")
          df.groupBy($"lang", org.apache.spark.sql.functions.col(col))
            .agg(count(lit(1)).as("c"))
            .withColumn("cum", sum($"c").over(byVal))
            .withColumn("n", sum($"c").over(whole))
            // k1 = floor((n+1)/2), k2 = n/2 + 1: the two middle order
            // statistics (equal when n is odd)
            .withColumn("k1", (($"n" + 1) / 2).cast("long"))
            .withColumn("k2", ($"n" / 2 + 1).cast("long"))
            .groupBy($"lang")
            .agg(((min(when($"cum" >= $"k1", org.apache.spark.sql.functions.col(col)))
              + min(when($"cum" >= $"k2", org.apache.spark.sql.functions.col(col)))) / 2.0)
              .as("m"))
        }
        val med = medianOf(d, "n_chars").withColumnRenamed("m", "med")
        val dev = d.join(med, "lang")
          .select($"lang", $"med", abs($"n_chars" - $"med").as("ad"))
        val mad = medianOf(dev.select($"lang", $"ad"), "ad").withColumnRenamed("m", "mad")
        d.join(med, "lang").join(mad, "lang")
          .groupBy($"lang", $"med", $"mad")
          .agg(sum(when(abs($"n_chars" - $"med") > lit(1.5) * $"mad", 1L).otherwise(0L))
            .as("n_outliers"),
            count(lit(1)).as("n_docs"))
          .select($"lang", round($"med", 6).as("med"), round($"mad", 6).as("mad"),
            $"n_outliers", $"n_docs")
          .orderBy($"lang")
      },
      Some("""WITH st AS (SELECT lang, median(n_chars) AS med FROM documents GROUP BY lang),
        dev AS (SELECT d.lang, abs(d.n_chars - st.med) AS ad FROM documents d JOIN st USING (lang)),
        mad AS (SELECT lang, median(ad) AS mad FROM dev GROUP BY lang)
        SELECT s.lang, round(s.med, 6) AS med, round(m.mad, 6) AS mad,
               CAST(sum(CASE WHEN abs(d.n_chars - s.med) > 1.5 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               count(*) AS n_docs
        FROM documents d JOIN st s USING (lang) JOIN mad m ON d.lang = m.lang
        GROUP BY s.lang, s.med, m.mad ORDER BY s.lang"""),
      doc = "Robust per-lang length-outlier gate (median + MAD, 1.5x fence): exact distributed medians via value-counting + cumulative window over distinct (lang, value) pairs — no per-group value buffers, unlike Spark's own median()/percentile() aggregates, so the exact formulation survives corpus scale; the per-lang median/MAD tables are genuinely bounded dims."),

    QueryDef(
      "q196_url_canonicalize",
      (s, dir) => {
        import s.implicits._
        // URL canonicalization + dedup — the crawl-hygiene op every web
        // corpus runs before content dedup. Messy raw URLs (mixed-case
        // scheme/host, explicit default port, utm_* tracking params,
        // fragments, trailing slashes) are synthesized DETERMINISTICALLY
        // from event columns, then canonicalized the real way: parse_url
        // host (port drops with it) lowercased, path with the trailing
        // slash stripped (case preserved — only scheme+host fold),
        // tracking params dropped by re-extracting only the content
        // param, fragment discarded by never reading REF. The oracle
        // reconstructs the canonical form straight from the SOURCE
        // columns — ground truth by construction, so any canonicalizer
        // slip (case, port, params, slash) hash-mismatches. Pure
        // map-side until the dedup groupBy: one shuffle on the
        // canonical key, the 100 TB shape.
        val ev = Tables.t(s, dir, "events")
        val raw = concat(
          lit("HTTPS://Site"), (col("user_id") % 50).cast("string"),
          lit(".Example.COM"),
          when($"event_type" === "click", lit(":443")).otherwise(lit("")),
          lit("/Products/item"), (col("event_id") % 97).cast("string"),
          when($"event_type" === "view", lit("/")).otherwise(lit("")),
          lit("?utm_source=feed&id="), (col("user_id") % 7).cast("string"),
          when($"event_type" === "error", lit("&utm_campaign=x")).otherwise(lit("")),
          when($"event_type" === "purchase", lit("#section2")).otherwise(lit("")))
        ev.withColumn("url", raw)
          .select($"event_id",
            concat(lit("https://"),
              lower(expr("parse_url(url, 'HOST')")),
              regexp_replace(expr("parse_url(url, 'PATH')"), "/$", ""),
              lit("?id="), expr("parse_url(url, 'QUERY', 'id')")).as("canonical_url"))
          .groupBy($"canonical_url")
          .agg(count(lit(1)).as("n_events"), min($"event_id").as("first_seen"))
          .orderBy($"canonical_url")
      },
      Some("""SELECT
          'https://site' || (user_id % 50) || '.example.com/Products/item'
            || (event_id % 97) || '?id=' || (user_id % 7) AS canonical_url,
          count(*) AS n_events, min(event_id) AS first_seen
        FROM events GROUP BY 1 ORDER BY 1"""),
      doc = "URL canonicalization + dedup (crawl hygiene): lowercase scheme/host, default-port drop, tracking-param strip, fragment drop, trailing-slash trim via parse_url — checked against an oracle that rebuilds the canonical form from the source columns (ground truth by construction); map-side until one groupBy shuffle on the canonical key.")
  )
}
