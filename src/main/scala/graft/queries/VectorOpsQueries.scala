package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Additional vector/partitioning operators rounding out the
  * LLM-pipeline + scale story: per-label centroids (the k-means /
  * class-prototype step), L2 normalization, and partition pruning over
  * a partitioned parquet layout.
  */
object VectorOpsQueries {

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q70_embedding_centroids",
      (s, dir) => {
        import s.implicits._
        // Per-label, per-dimension centroid: posexplode → one shuffle on
        // (label, pos). Decimal-exact accumulation (order-independent),
        // one deterministic double division at the end. Emits rows (not
        // re-assembled arrays): at scale the downstream join against
        // centroids is on (label, pos) anyway.
        Tables.t(s, dir, "embeddings")
          .select($"label", posexplode($"embedding").as(Seq("pos", "v")))
          .groupBy($"label", $"pos")
          .agg((sum($"v".cast("decimal(27,10)")).cast("double") / count(lit(1)))
            .as("centroid"))
          .filter($"pos" < 8) // keep the verified slice compact
          .select($"label".cast("int").as("label"), ($"pos" + 1).cast("long").as("dim"),
            round($"centroid", 6).as("centroid"))
          .orderBy($"label", $"dim")
      },
      Some("""SELECT CAST(label AS INTEGER) AS label, r.i AS dim,
          round(CAST(sum(CAST(embedding[r.i] AS DECIMAL(27,10))) AS DOUBLE)
            / count(*), 6) AS centroid
        FROM embeddings, range(1, 9) r(i)
        GROUP BY label, r.i ORDER BY label, dim"""),
      doc = "Per-label embedding centroids (dims 1-8): posexplode + decimal-exact mean per (label, dim)."),

    QueryDef(
      "q71_embedding_normalize",
      (s, dir) => {
        import s.implicits._
        // L2 normalization as a higher-order transform; the post-norm is
        // verified to be 1 via the native cosine path (cos(v, v)=1 iff
        // nonzero). Round-trips through double.
        val emb = transform($"embedding", x => x.cast("double"))
        val n2 = aggregate(emb, lit(0.0), (acc, x) => acc + x * x)
        Tables.t(s, dir, "embeddings").filter($"vec_id" < 200)
          .withColumn("norm", sqrt(n2))
          .select($"vec_id",
            round($"norm", 6).as("l2_norm"),
            round(element_at(emb, 1) / $"norm", 6).as("u1"),
            round(element_at(emb, 2) / $"norm", 6).as("u2"),
            round(sqrt(aggregate(transform($"embedding", x => x.cast("double") / $"norm"),
              lit(0.0), (acc, x) => acc + x * x)), 6).as("post_norm"))
          .orderBy($"vec_id")
      },
      Some("""WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] AS emb,
            sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
          FROM embeddings WHERE vec_id < 200)
        SELECT vec_id, round(norm, 6) AS l2_norm,
          round(emb[1] / norm, 6) AS u1,
          round(emb[2] / norm, 6) AS u2,
          round(sqrt(list_dot_product(list_transform(emb, x -> x / norm),
            list_transform(emb, x -> x / norm))), 6) AS post_norm
        FROM e ORDER BY vec_id"""),
      doc = "L2 normalization of embedding vectors; post-normalization norm verified = 1."),

    QueryDef(
      "q72_partition_pruning",
      (s, dir) => {
        import s.implicits._
        // Partition pruning: write orders partitioned by o_orderstatus,
        // read back with a partition-column filter — the scan must touch
        // only one directory (PartitionFilters in the plan; pinned by
        // PlanAssertionSuite). This is THE dominant I/O saver at 100 TB.
        val out = s"/tmp/graft_part/${java.util.UUID.randomUUID()}"
        Tables.t(s, dir, "orders")
          .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
        s.read.parquet(out)
          .filter($"o_orderstatus" === "F")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("total"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      doc = "Hive-style partitioned write + partition-pruned scan (PartitionFilters, one directory touched).")
  )
}
