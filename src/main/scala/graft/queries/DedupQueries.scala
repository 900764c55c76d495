package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Deduplication operators for LLM training-data pipelines (builder brief
  * "Beyond the reference"; SURVEY §7.2 M5). Four families over the
  * `documents` table, each expressed with columnar/codegen expressions —
  * no per-row Scala UDFs, no cartesian joins:
  *
  *  - exact dedup: hash-groupBy on the full text.
  *  - n-gram Jaccard near-dup, exact: candidates via shared-shingle
  *    equi-join (recall 1.0 — J>0 implies a shared shingle), then exact
  *    set Jaccard. 100 TB shape: explode-before-shuffle, equi-join on
  *    the shingle key; hot shingles (stopword runs) would be dropped by
  *    a frequency cap in production — the skew is bounded here.
  *  - MinHash + LSH banding: 32 minhashes (double-hashing family over
  *    murmur3+xxhash64, masked to 32 bits so ANSI-mode arithmetic can't
  *    overflow), 16 bands x 2 rows, candidates only within a band
  *    bucket, then exact Jaccard verify. With the verify step the output
  *    equals the exact answer unless LSH misses a true pair:
  *    P(miss | J>=0.85) <= (1-0.85^2)^16 < 2e-9, so the DuckDB
  *    all-pairs oracle is safe. At 100 TB the all-pairs oracle is
  *    impossible and THIS is the query you run.
  *  - SimHash: 16-bit sign-of-sums signature via per-word xxhash64 bit
  *    contributions (explicit bit columns -> single shuffle), collision
  *    groups reported per doc. No DuckDB twin for xxhash64 → rows-only.
  */
object DedupQueries {

  /** words of a document, Spark side */
  private def words(c: Column): Column = split(c, " ")

  /** distinct word-trigram shingles */
  private def shingles(w: Column): Column =
    array_distinct(transform(sequence(lit(1), size(w) - 2),
      i => concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))

  private val shinglesSql =
    """list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2]))"""

  /** doc_id + shingle set for docs with >= 3 words */
  private def shingleTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "documents")
      .filter(size(words($"text")) >= 3)
      .select($"doc_id", shingles(words($"text")).as("sh"))
  }

  private def exactJaccard(cands: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val a = sh.select(col("doc_id").as("d1"), col("sh").as("s1"))
    val b = sh.select(col("doc_id").as("d2"), col("sh").as("s2"))
    cands.join(a, "d1").join(b, "d2")
      .withColumn("j",
        size(array_intersect(col("s1"), col("s2"))).cast("double") /
          size(array_union(col("s1"), col("s2"))))
      .filter(col("j") >= threshold)
      .select(col("d1"), col("d2"), round(col("j"), 6).as("jaccard"))
      .orderBy(col("d1"), col("d2"))
  }

  private def jaccardOracleSql(threshold: Double): String =
    s"""WITH sh AS (
        SELECT doc_id, $shinglesSql AS s FROM documents
        WHERE len(string_split(text,' ')) >= 3)
      SELECT d1, d2, round(j, 6) AS jaccard FROM (
        SELECT a.doc_id AS d1, b.doc_id AS d2,
          CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) AS j
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      WHERE j >= $threshold ORDER BY d1, d2"""

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q45_dedup_exact",
      (s, dir) => {
        import s.implicits._
        // Exact dedup: one shuffle on md5(text); keeps the smallest doc_id
        // as the canonical representative — the standard 100 TB pattern
        // (hash the content, never shuffle the content itself twice).
        Tables.t(s, dir, "documents")
          .select($"doc_id", md5($"text").as("fp"))
          .groupBy($"fp")
          .agg(min($"doc_id").as("canonical"), count(lit(1)).as("n_copies"))
          .groupBy($"n_copies")
          .agg(count(lit(1)).as("n_groups"))
          .orderBy($"n_copies")
      },
      Some("""SELECT n_copies, count(*) AS n_groups FROM (
          SELECT md5(text) AS fp, min(doc_id) AS canonical, count(*) AS n_copies
          FROM documents GROUP BY md5(text))
        GROUP BY n_copies ORDER BY n_copies"""),
      doc = "Exact dedup histogram: hash-groupBy on md5(text), canonical = min doc_id."),

    QueryDef(
      "q46_dedup_ngram_jaccard",
      (s, dir) => {
        val sh = shingleTable(s, dir)
        // Candidate pairs = docs sharing >= 1 shingle (equi-join on the
        // shingle, never a cartesian). Exact: any pair with J>0 shares
        // a shingle, so recall is 1.0 for any positive threshold.
        val inv = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
        val cands = inv.as("x").join(inv.as("y"),
            col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
          .distinct()
        exactJaccard(cands, sh, 0.8)
      },
      Some(jaccardOracleSql(0.8)),
      doc = "Exact n-gram (word-trigram) Jaccard near-dup >= 0.8 via shared-shingle inverted-index join."),

    QueryDef(
      "q47_dedup_minhash_lsh",
      (s, dir) => {
        import s.implicits._
        val sh = shingleTable(s, dir)
        // 32 minhashes h_i(s) = (murmur3(s) & 0xffffffff) + i * (xxhash64(s) & 0xffffffff)
        // (fits in 38 bits — no ANSI overflow), banded 16 x 2.
        val h1 = (c: Column) => hash(c).cast("long").bitwiseAND(lit(0xffffffffL))
        val h2 = (c: Column) => xxhash64(c).bitwiseAND(lit(0xffffffffL))
        val sigs = transform(sequence(lit(0), lit(31)),
          i => array_min(transform($"sh", t => h1(t) + i * h2(t))))
        val bands = transform(sequence(lit(0), lit(15)),
          b => concat_ws(":", b, element_at($"sigs", b * 2 + 1), element_at($"sigs", b * 2 + 2)))
        val banded = sh.withColumn("sigs", sigs)
          .select($"doc_id", explode(bands).as("band"))
        // Equi-join on the band key only; the verify step restores exactness.
        val cands = banded.as("x").join(banded.as("y"),
            $"x.band" === $"y.band" && $"x.doc_id" < $"y.doc_id")
          .select($"x.doc_id".as("d1"), $"y.doc_id".as("d2"))
          .distinct()
        exactJaccard(cands, sh, 0.7)
      },
      Some(jaccardOracleSql(0.7)),
      doc = "MinHash(32) + LSH banding (16x2) candidates, exact Jaccard verify >= 0.7. P(miss) < 2e-9 → exact oracle is safe."),

    QueryDef(
      "q48_dedup_simhash",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        // 16-bit SimHash: per-word xxhash64, per-bit +/-1 vote, sign → bit.
        // Explicit bit columns keep everything in whole-stage codegen with
        // ONE shuffle (groupBy doc_id); word multiplicity intentionally
        // weights repeated words.
        val wordsDf = Tables.t(s, dir, "documents")
          .select($"doc_id", explode(words($"text")).as("w"))
          .withColumn("h", xxhash64($"w"))
        val bitCols = (0 until 16).map { j =>
          sum(when(shiftright($"h", j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"b$j")
        }
        val bitSums = wordsDf.groupBy($"doc_id").agg(bitCols.head, bitCols.tail: _*)
        val sim = (0 until 16)
          .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _)
        val w = Window.partitionBy($"simhash")
        bitSums.select($"doc_id", sim.as("simhash"))
          .withColumn("group_size", count(lit(1)).over(w))
          .withColumn("group_min", min($"doc_id").over(w))
          .orderBy($"doc_id")
      },
      None, // xxhash64 has no DuckDB twin → rows-only check
      doc = "16-bit SimHash signatures + collision groups (group_size/group_min per signature). Spark-exact xxhash64 → rows-only.")
  )
}
