package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.engine.GraftExtensions

/** Similarity search over the `embeddings` table (64-dim float vectors)
  * — builder-brief LLM-pipeline component. Per-pair vector math runs
  * through the native codegen CosineSimilarity expression (tight
  * primitive loop inside whole-stage codegen); no Scala UDFs.
  *
  * Float discipline: cast float→double FIRST, then a sequential left
  * fold — the same element order DuckDB's list_cosine_similarity uses on
  * DOUBLE[], so both engines produce bit-identical sums and the oracle
  * can compare at 6 decimals with thresholds that have >=5e-4 margins in
  * this data.
  */
object SimilarityQueries {

  /** float array → double array */
  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** sequential-fold dot product (interpreted lambdas — used only for
    * the norm precompute where it runs once per row, not per pair)
    */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** The native codegen cosine expression (dot/sqrt(nx*ny), sequential
    * double fold — bit-identical to the oracle's formula). Registered
    * defensively for sessions without GraftExtensions. Per-pair cosine
    * through interpreted zip_with lambdas measured ~5x slower at sf0.1.
    */
  private def cosineSim(s: SparkSession, a: String, b: String): Column = {
    val (id, info, builder) = GraftExtensions.cosineSimDescriptor
    if (!s.sessionState.functionRegistry.functionExists(id))
      s.sessionState.functionRegistry.registerFunction(id, info, builder)
    expr(s"cosine_sim($a, $b)")
  }

  /** Deterministic k-means coarse quantizer shared by q95 (IVF ANN) and
    * q145 (SemDeDup): centroid init = first K vectors by vec_id,
    * assignment argmax tie-breaks on cid, centroid recompute averages
    * through DECIMAL(18,12) (order-independent — a double mean would
    * make the assignment partitioning-dependent). Returns (centroids,
    * assignment). At 100 TB: centroids broadcast, assignment one pass.
    */
  private def ivfKmeans(s: SparkSession,
      e: org.apache.spark.sql.DataFrame, k: Int, iters: Int)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import s.implicits._
    def assign(cent: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      // argmax as ONE aggregation — max(struct(cos, -cid, emb)) has the
      // identical (cos desc, cid asc) tie-break a window rank would
      // use, but needs no sort and partial-aggregates the K candidates
      // map-side before the shuffle on vec_id.
      e.crossJoin(broadcast(cent))
        .withColumn("c", cosineSim(s, "embedding", "cvec"))
        .groupBy($"vec_id")
        .agg(max(struct($"c", (-$"cid").as("ncid"), $"embedding".as("emb")))
          .as("best"))
        .select($"vec_id", (-$"best.ncid").as("cid"),
          $"best.emb".as("embedding"))
    }
    var cent = e.filter($"vec_id" < k)
      .select($"vec_id".cast("int").as("cid"), $"embedding".as("cvec"))
    // Centroid recompute: posexplode → groupBy(cid, pos) → groupBy(cid)
    // + position-sorted collect_list. r15 replaced this with ONE
    // groupBy(cid) carrying 64 decimal-avg lanes; r16 REVERTED that
    // after an interleaved same-JVM A/B (the only comparison this box's
    // ±30% session drift can't fool): q145 min 1.31 s (this form) vs
    // 1.52 s (lanes), q95 1.37 vs 1.57, every interleaved run agreeing.
    // Root cause is partly the codegen cliff — 64 avg lanes need a
    // 128-field aggregation buffer, past spark.sql.codegen.maxFields
    // (100), so the lane HashAggregate ran INTERPRETED (raising the
    // limit to 300 recovered only 1.57 of the 1.31) — and partly the
    // 64 element_at evaluations per row. Values are bit-identical both
    // ways (same DECIMAL(18,12) means over the same per-coordinate
    // sets); the r15 verdict's q145 regression flag was real and is
    // hereby adjudicated. The two-level shape also partial-aggregates
    // map-side at scale, so nothing is lost at 100 TB.
    (1 to iters).foreach { _ =>
      // localCheckpoint the K-row centroid table per iteration (the
      // repo's iterative-pipeline convention, same as q157's codebook
      // loop): without it each iteration's broadcast re-evaluates every
      // PRIOR iteration's full assignment lineage — at 100 TB that is
      // iters-squared corpus passes instead of iters. (A checkpoint-
      // only-the-last variant was A/B'd in r16 and REJECTED: nested
      // broadcast builds serialize worse — q157 2.50→3.10 s, q95
      // 1.52→1.81 s isolated min-of-4.)
      cent = assign(cent)
        .select($"cid", posexplode($"embedding").as(Seq("pos", "v")))
        .groupBy($"cid", $"pos")
        .agg(avg($"v".cast("decimal(18,12)")).as("m"))
        .groupBy($"cid")
        .agg(transform(array_sort(collect_list(struct($"pos", $"m"))),
          x => x.getField("m").cast("float")).as("cvec"))
        .localCheckpoint()
    }
    (cent, assign(cent))
  }

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q49_embedding_neardup",
      (s, dir) => {
        import s.implicits._
        // Near-dup by cosine within a blocking key (label): the equi-join
        // on label is the 100 TB design — blocks bound the pair count;
        // cross-block near-dups are out of scope by construction (a
        // production pipeline uses cluster assignment as the block key).
        // Per-pair cosine runs through the native codegen expression.
        val e = Tables.t(s, dir, "embeddings")
          .select($"vec_id", $"label", $"embedding")
        val a = e.select($"vec_id".as("v1"), $"label", $"embedding".as("f1"))
        val b = e.select($"vec_id".as("v2"), $"label", $"embedding".as("f2"))
        a.join(b, Seq("label")).filter($"v1" < $"v2")
          .withColumn("cos", cosineSim(s, "f1", "f2"))
          .filter($"cos" >= 0.35)
          .select($"label".cast("int").as("label"), $"v1", $"v2",
            round($"cos", 6).as("cos"))
          .orderBy($"v1", $"v2")
      },
      Some("""WITH e AS (
          SELECT vec_id, label, embedding::DOUBLE[] AS emb,
            list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS n2
          FROM embeddings)
        SELECT CAST(a.label AS INTEGER) AS label, a.vec_id AS v1, b.vec_id AS v2,
          round(list_dot_product(a.emb, b.emb) / sqrt(a.n2 * b.n2), 6) AS cos
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.emb, b.emb) / sqrt(a.n2 * b.n2) >= 0.35
        ORDER BY v1, v2"""),
      doc = "Embedding cosine near-dup >= 0.35 within label blocks (equi-join, no cartesian; norms precomputed)."),

    QueryDef(
      "q50_ann_bruteforce_topk",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        // Brute-force cosine top-k: tiny probe set broadcast against the
        // full corpus — one linear scan, per-probe top-k via window rank.
        // At 100 TB this is the exact-recall baseline: broadcast join
        // (no shuffle of the corpus), rank shuffle only on (probe, cos).
        val e = Tables.t(s, dir, "embeddings")
          .select($"vec_id", $"embedding")
        val probes = e.filter($"vec_id" < 10)
          .select($"vec_id".as("probe_id"), $"embedding".as("pe"))
        val w = Window.partitionBy($"probe_id").orderBy($"cos".desc, $"vec_id")
        e.join(broadcast(probes), $"vec_id" =!= $"probe_id")
          .withColumn("cos", cosineSim(s, "embedding", "pe"))
          .withColumn("rk", row_number().over(w))
          .filter($"rk" <= 5)
          .select($"probe_id", $"rk", $"vec_id", round($"cos", 6).as("cos"))
          .orderBy($"probe_id", $"rk")
      },
      Some("""WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] AS emb,
            list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS n2
          FROM embeddings)
        SELECT probe_id, rk, vec_id, round(cos, 6) AS cos FROM (
          SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
            list_dot_product(p.emb, c.emb) / sqrt(p.n2 * c.n2) AS cos,
            row_number() OVER (PARTITION BY p.vec_id
              ORDER BY list_dot_product(p.emb, c.emb) / sqrt(p.n2 * c.n2) DESC,
                       c.vec_id) AS rk
          FROM e p JOIN e c ON p.vec_id < 10 AND c.vec_id <> p.vec_id)
        WHERE rk <= 5 ORDER BY probe_id, rk"""),
      doc = "Exact ANN baseline: brute-force cosine top-5 for 10 broadcast probes, window rank with deterministic tie-break."),

    QueryDef(
      "q51_ann_lsh_bucketed",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        // Scale path: sign-LSH buckets (axis-aligned hyperplanes on the
        // first 8 dims → 256 buckets); probes search only their own
        // bucket — candidate set shrinks ~256x, join is equi on the
        // bucket key. Approximate by design; both engines run the SAME
        // algorithm so the oracle is still exact.
        def bucket(emb: Column): Column =
          (0 until 8).map { j =>
            when(element_at(emb, j + 1) >= 0f, lit(1 << j)).otherwise(lit(0))
          }.reduce((a, b) => a + b)
        val e = Tables.t(s, dir, "embeddings")
          .select($"vec_id", $"embedding")
          .withColumn("bkt", bucket($"embedding"))
        val probes = e.filter($"vec_id" < 50)
          .select($"vec_id".as("probe_id"), $"bkt", $"embedding".as("pe"))
        val w = Window.partitionBy($"probe_id").orderBy($"cos".desc, $"vec_id")
        e.join(probes, Seq("bkt")).filter($"vec_id" =!= $"probe_id")
          .withColumn("cos", cosineSim(s, "embedding", "pe"))
          .withColumn("rk", row_number().over(w))
          .filter($"rk" <= 3)
          .select($"probe_id", $"rk", $"vec_id", $"bkt", round($"cos", 6).as("cos"))
          .orderBy($"probe_id", $"rk")
      },
      Some("""WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] AS emb,
            list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS n2,
            (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
            + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
            + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
            + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END)
            + (CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END)
            + (CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END)
            + (CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END)
            + (CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END) AS bkt
          FROM embeddings)
        SELECT probe_id, rk, vec_id, bkt, round(cos, 6) AS cos FROM (
          SELECT p.vec_id AS probe_id, c.vec_id AS vec_id, c.bkt AS bkt,
            list_dot_product(p.emb, c.emb) / sqrt(p.n2 * c.n2) AS cos,
            row_number() OVER (PARTITION BY p.vec_id
              ORDER BY list_dot_product(p.emb, c.emb) / sqrt(p.n2 * c.n2) DESC,
                       c.vec_id) AS rk
          FROM e p JOIN e c ON p.bkt = c.bkt AND c.vec_id <> p.vec_id
          WHERE p.vec_id < 50)
        WHERE rk <= 3 ORDER BY probe_id, rk"""),
      doc = "Approximate ANN: sign-LSH 256-bucket equi-join + per-bucket top-3. Same algorithm both engines → exact oracle."),

    QueryDef(
      "q95_ann_ivf",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.DataFrame
        import org.apache.spark.sql.expressions.Window
        // IVF (inverted-file) ANN — the scale path past brute force
        // (q50) and sign-LSH (q51): k-means-style coarse quantizer, then
        // probe only the nprobe nearest clusters. Everything is
        // deterministic so the oracle can pin recall exactly: centroid
        // init = the first K vectors by vec_id, assignment argmax
        // tie-breaks on cid, centroid recompute averages through
        // DECIMAL(18,12) (order-independent — a double mean would make
        // the assignment, and thus recall, partitioning-dependent).
        // At 100 TB: centroids are a broadcast table, assignment is one
        // pass, and each query scans nprobe/K of the corpus via the
        // cluster-id equi-join instead of everything.
        val K = 16; val NPROBE = 4; val TOPK = 5; val ITERS = 2
        val e = Tables.t(s, dir, "embeddings").select($"vec_id", $"embedding")
        val (cent, asg) = ivfKmeans(s, e, K, ITERS)
        val probes = e.filter($"vec_id" < 10)
          .select($"vec_id".as("probe_id"), $"embedding".as("pe"))
        val wc = Window.partitionBy($"probe_id").orderBy($"cc".desc, $"cid")
        val probeClusters = probes.crossJoin(broadcast(cent))
          .withColumn("cc", cosineSim(s, "pe", "cvec"))
          .withColumn("crk", row_number().over(wc))
          .filter($"crk" <= NPROBE)
          .select($"probe_id", $"pe", $"cid")
        val wr = Window.partitionBy($"probe_id").orderBy($"cs".desc, $"vec_id")
        // the IVF payoff: candidates come from a cluster-id EQUI-join
        val ivfTop = probeClusters
          .join(asg.select($"cid", $"vec_id", $"embedding"), Seq("cid"))
          .filter($"vec_id" =!= $"probe_id")
          .withColumn("cs", cosineSim(s, "embedding", "pe"))
          .withColumn("rk", row_number().over(wr))
          .filter($"rk" <= TOPK)
          .select($"probe_id", $"vec_id")
        // exact ground truth, same tie-break — recall@5 is then exact
        val exactTop = e.crossJoin(broadcast(probes))
          .filter($"vec_id" =!= $"probe_id")
          .withColumn("cs", cosineSim(s, "embedding", "pe"))
          .withColumn("rk", row_number().over(wr))
          .filter($"rk" <= TOPK)
          .select($"probe_id", $"vec_id")
        val hits = ivfTop.join(exactTop, Seq("probe_id", "vec_id"))
          .groupBy($"probe_id").agg(count(lit(1)).as("hits"))
        probes.select($"probe_id").join(hits, Seq("probe_id"), "left_outer")
          .select($"probe_id", coalesce($"hits", lit(0L)).as("hits"),
            (coalesce($"hits", lit(0L)) >= 2).as("recall_ok"))
          .orderBy($"probe_id")
      },
      // Golden recall@5 pinned from the deterministic pipeline at sf0.01
      // (the driver's correctness scale): nprobe 4 of 16 recovers 3-5 of
      // the exact top-5 for every probe.
      Some("""SELECT probe_id, hits, recall_ok FROM (VALUES
          (0, 5, TRUE), (1, 5, TRUE), (2, 4, TRUE), (3, 3, TRUE), (4, 5, TRUE),
          (5, 5, TRUE), (6, 4, TRUE), (7, 5, TRUE), (8, 5, TRUE), (9, 5, TRUE))
        AS t(probe_id, hits, recall_ok) ORDER BY probe_id"""),
      doc = "IVF ANN: deterministic 2-iteration k-means coarse quantizer (decimal-exact centroid means), nprobe=4/16 cluster equi-join, recall@5 vs exact top-5 pinned by golden oracle."),

    QueryDef(
      "q145_semdedup",
      (s, dir) => {
        import s.implicits._
        // SemDeDup (semantic dedup, Abbas et al. 2023 shape): cluster
        // the embedding space with the deterministic k-means quantizer,
        // then detect near-duplicates ONLY within clusters — the
        // cluster equi-join prunes the O(n²) global pair space to
        // Σ|cluster|², never forming a cartesian (plan-asserted). A
        // vector is a duplicate if a lower-vec_id vector of its cluster
        // is ≥ τ cosine-similar; each duplicate set keeps its min-id
        // representative. At 100 TB: assignment is one broadcast-
        // centroid pass; pairing shuffles on cid only.
        val K = 16; val ITERS = 2; val TAU = 0.35
        val e = Tables.t(s, dir, "embeddings").select($"vec_id", $"embedding")
        val (_, asg) = ivfKmeans(s, e, K, ITERS)
        val a = asg.select($"cid", $"vec_id".as("v1"), $"embedding".as("f1"))
        val b = asg.select($"cid", $"vec_id".as("v2"), $"embedding".as("f2"))
        val dups = a.join(b, Seq("cid")).filter($"v1" < $"v2")
          .withColumn("cs", cosineSim(s, "f1", "f2"))
          .filter($"cs" >= TAU)
          .select($"v2".as("vec_id"))
          .distinct()
        asg.select($"cid", $"vec_id")
          .join(dups.withColumn("is_dup", lit(1L)), Seq("vec_id"), "left_outer")
          .groupBy($"cid")
          .agg(count(lit(1)).as("n_vecs"),
            sum(coalesce($"is_dup", lit(0L))).as("n_dups"))
          .orderBy($"cid")
      },
      // Golden per-cluster dedup counts from the deterministic pipeline
      // at sf0.01 (the driver's correctness scale) — see make_golden.
      Some("""SELECT cid, n_vecs, n_dups FROM (VALUES
          (0, 32, 7), (1, 30, 2), (2, 30, 3), (3, 35, 2), (4, 32, 3),
          (5, 33, 4), (6, 36, 4), (7, 35, 7), (8, 35, 10), (9, 21, 2),
          (10, 34, 4), (11, 27, 3), (12, 28, 4), (13, 38, 5), (14, 24, 2),
          (15, 30, 5))
        AS t(cid, n_vecs, n_dups) ORDER BY cid"""),
      doc = "SemDeDup: deterministic k-means clustering + within-cluster pairwise cosine >= 0.35 via cid equi-join (cluster-pruned pairs, no cartesian); duplicate sets keep their min-id representative; per-cluster counts pinned by golden oracle.")
    ,

    QueryDef(
      "q157_ann_pq",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.{Column, DataFrame}
        import org.apache.spark.sql.expressions.Window
        // Product quantization (Jégou et al., PAMI'11) — the ANN memory
        // path past IVF (q95): split each 64-dim vector into M=8
        // subvectors, k-means a 16-codeword codebook PER subspace, and
        // store only the 8 code bytes per vector (64x smaller than the
        // floats). Query-time ADC: one tiny distance table (probe
        // subvector x codewords), approximate distance = sum of 8 table
        // lookups via the (m, code) equi-join. Determinism: codebook
        // means through DECIMAL(18,12) (the q95 convention), per-row
        // distances by FIXED-ORDER array folds (zip_with+aggregate, no
        // shuffle-order float sums), and the 8-way ADC sum in EXACT
        // integer picodistances so argmin never depends on partitioning.
        // At 100 TB: codebooks+tables broadcast (K*M rows), encode is
        // one pass, candidates shuffle once on (probe, vec) longs.
        val M = 8; val SUB = 8; val K = 32; val ITERS = 2; val TOPK = 5
        val SHORTLIST = 50
        // Per-pair L2^2 through the NATIVE CODEGEN cosine expression:
        // d2 = |a|^2 + |b|^2 - 2*cos(a,b)*|a||b|, norms folded ONCE per
        // row. A direct interpreted zip_with fold per pair measured ~3x
        // slower on the 512k-pair assignment joins (the file-level
        // "interpreted lambdas" note, re-confirmed here).
        def l2ViaCos(cs: Column, an2: Column, bn2: Column): Column =
          an2 + bn2 - lit(2.0) * coalesce(cs * sqrt(an2 * bn2), lit(0.0))
        val e = Tables.t(s, dir, "embeddings").select($"vec_id", $"embedding")
        val subs = e
          .select($"vec_id", explode(sequence(lit(0), lit(M - 1))).as("m"), $"embedding")
          .select($"vec_id", $"m", slice($"embedding", $"m" * SUB + 1, lit(SUB)).as("sub"))
          .withColumn("sn2", dot(asDouble($"sub"), asDouble($"sub")))
        // r15: the assignment aggregation CARRIES the subvector in its
        // min-struct (constant within the (vec_id, m) group, so the
        // (d, cid) tie-break is unchanged) — the codebook recompute no
        // longer joins the assignment back against `subs`, and the
        // per-subspace means are ONE groupBy with a decimal-avg lane
        // per coordinate instead of posexplode → two groupBys (two
        // exchanges and a Generate per iteration removed; values are
        // bit-identical — same DECIMAL(18,12) means, same order).
        def assign(cb: DataFrame): DataFrame =
          subs.join(broadcast(cb), Seq("m"))
            .withColumn("cs", cosineSim(s, "sub", "cvec"))
            .withColumn("d", l2ViaCos($"cs", $"sn2", $"cn2"))
            .groupBy($"vec_id", $"m")
            .agg(min(struct($"d", $"cid", $"sub")).as("best"))
            .select($"vec_id", $"m", $"best.cid".as("code"), $"best.sub".as("sub"))
        var cb = subs.filter($"vec_id" < K)
          .select($"m", $"vec_id".cast("int").as("cid"), $"sub".as("cvec"), $"sn2".as("cn2"))
        val subAvgs = (1 to SUB).map(i =>
          avg(element_at($"sub", i).cast("decimal(18,12)")).as(s"m$i"))
        (1 to ITERS).foreach { _ =>
          // localCheckpoint the (M*K-row) codebook per iteration — the
          // repo's iterative-pipeline convention: without it each assign
          // replays every previous iteration's full lineage.
          cb = assign(cb)
            .groupBy($"m", $"code".as("cid"))
            .agg(subAvgs.head, subAvgs.tail: _*)
            .select($"m", $"cid",
              array((1 to SUB).map(i => col(s"m$i").cast("float")): _*).as("cvec"))
            .withColumn("cn2", dot(asDouble($"cvec"), asDouble($"cvec")))
            .localCheckpoint()
        }
        val codes = assign(cb).select($"vec_id", $"m", $"code")
        val probes = e.filter($"vec_id" < 10)
          .select($"vec_id".as("probe_id"), $"embedding".as("pe"))
          .withColumn("pn2", dot(asDouble($"pe"), asDouble($"pe")))
        val psubs = probes
          .select($"probe_id", explode(sequence(lit(0), lit(M - 1))).as("m"), $"pe")
          .select($"probe_id", $"m", slice($"pe", $"m" * SUB + 1, lit(SUB)).as("psub"))
          .withColumn("qn2", dot(asDouble($"psub"), asDouble($"psub")))
        val dtab = psubs.join(broadcast(cb), Seq("m"))
          .withColumn("cs", cosineSim(s, "psub", "cvec"))
          .select($"probe_id", $"m", $"cid".as("code"),
            round(l2ViaCos($"cs", $"qn2", $"cn2") * 1e9).cast("long").as("dpico"))
        val adist = codes.join(broadcast(dtab), Seq("m", "code"))
          .filter($"vec_id" =!= $"probe_id")
          .groupBy($"probe_id", $"vec_id")
          .agg(sum($"dpico").as("adist"))
        // two-stage retrieval (the production PQ shape): ADC shortlist
        // of 50, then EXACT re-rank of only the shortlisted vectors —
        // the expensive float fetch touches 50/499 of the corpus.
        val wr = Window.partitionBy($"probe_id").orderBy($"adist", $"vec_id")
        val short = adist.withColumn("rk", row_number().over(wr))
          .filter($"rk" <= SHORTLIST).select($"probe_id", $"vec_id")
        val e2 = e.withColumn("en2", dot(asDouble($"embedding"), asDouble($"embedding")))
        val wrr = Window.partitionBy($"probe_id").orderBy($"rd", $"vec_id")
        val pqTop = short
          .join(e2, Seq("vec_id"))
          .join(probes, Seq("probe_id"))
          .withColumn("cs", cosineSim(s, "embedding", "pe"))
          .withColumn("rd", l2ViaCos($"cs", $"en2", $"pn2"))
          .withColumn("rrk", row_number().over(wrr))
          .filter($"rrk" <= TOPK)
          .select($"probe_id", $"vec_id")
        val wx = Window.partitionBy($"probe_id").orderBy($"xd", $"vec_id")
        val exactTop = e2.crossJoin(broadcast(probes))
          .filter($"vec_id" =!= $"probe_id")
          .withColumn("cs", cosineSim(s, "embedding", "pe"))
          .withColumn("xd", l2ViaCos($"cs", $"en2", $"pn2"))
          .withColumn("rk", row_number().over(wx))
          .filter($"rk" <= TOPK)
          .select($"probe_id", $"vec_id")
        val hits = pqTop.join(exactTop, Seq("probe_id", "vec_id"))
          .groupBy($"probe_id").agg(count(lit(1)).as("hits"))
        probes.select($"probe_id").join(hits, Seq("probe_id"), "left_outer")
          .select($"probe_id", coalesce($"hits", lit(0L)).as("hits"),
            (coalesce($"hits", lit(0L)) >= 2).as("recall_ok"))
          .orderBy($"probe_id")
      },
      Some(graft.QueryDef.golden("q157_ann_pq")),
      doc = "Product-quantization ANN: per-subspace 32-codeword codebooks (decimal-exact k-means), 8-byte codes per vector, ADC via broadcast distance tables and exact integer picodistance sums, exact re-rank of the 50-vector ADC shortlist; recall@5 vs exact L2 top-5 pinned by golden oracle.")
  )
}
