package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch micro-bench for the r15 trigram-formulation decision —
  * times alternative per-row trigram pipelines over documents.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(f: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[micro] $name%-28s min=${ts.min}%7.3f  runs=${ts.map(t => f"$t%5.2f").mkString(",")}")
    }

    // T: DataFrame resolution cost — spark.read.parquet() per call
    {
      val t0 = System.nanoTime()
      (1 to 50).foreach { _ =>
        spark.read.parquet(s"$sfDir/lineitem.parquet")
        spark.read.parquet(s"$sfDir/documents.parquet")
      }
      println(f"[micro] T_read_resolution_100x  total=${(System.nanoTime() - t0) / 1e9}%7.3f s")
      val t1 = System.nanoTime()
      val cached = spark.read.parquet(s"$sfDir/lineitem.parquet")
      (1 to 100).foreach(_ => cached.select(col("l_orderkey")))
      println(f"[micro] T_reuse_select_100x      total=${(System.nanoTime() - t1) / 1e9}%7.3f s")
    }

    // A: windowed (current committed kernel) + global distinct
    time("A_window_distinct") {
      import org.apache.spark.sql.expressions.Window
      val wspec = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      docs
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "wd")))
        .select(col("doc_id"),
          concat_ws(" ", col("wd"), lead(col("wd"), 1).over(wspec), lead(col("wd"), 2).over(wspec)).as("t3"),
          lead(col("wd"), 2).over(wspec).isNotNull.as("full"))
        .filter(col("full"))
        .select(col("doc_id"), xxhash64(col("t3")).as("shingle"))
        .distinct()
    }

    // B: transform + array_distinct per row (the V1 loser)
    time("B_transform_arraydistinct") {
      val ws = col("_gws")
      docs.select(col("doc_id"), split(col("text"), " ").as("_gws"))
        .filter(size(ws) >= 3)
        .select(col("doc_id"), explode(array_distinct(transform(
          sequence(lit(1), size(ws) - 2),
          i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2))))).as("t3"))
        .select(col("doc_id"), xxhash64(col("t3")).as("shingle"))
    }

    // C: transform per row + GLOBAL distinct (split the cost)
    time("C_transform_globaldistinct") {
      val ws = col("_gws")
      docs.select(col("doc_id"), split(col("text"), " ").as("_gws"))
        .filter(size(ws) >= 3)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(ws) - 2),
          i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2)))).as("t3"))
        .select(col("doc_id"), xxhash64(col("t3")).as("shingle"))
        .distinct()
    }

    // D: regex lookahead trigrams + global distinct
    time("D_regex_globaldistinct") {
      docs
        .select(col("doc_id"),
          explode(expr("regexp_extract_all(text, '(?=(\\\\S+ \\\\S+ \\\\S+))', 1)")).as("t3"))
        .select(col("doc_id"), xxhash64(col("t3")).as("shingle"))
        .distinct()
    }

    // E: regex + array_distinct per row
    time("E_regex_arraydistinct") {
      docs
        .select(col("doc_id"),
          explode(expr("array_distinct(regexp_extract_all(text, '(?=(\\\\S+ \\\\S+ \\\\S+))', 1))")).as("t3"))
        .select(col("doc_id"), xxhash64(col("t3")).as("shingle"))
    }

    // J/K interleaved: V0 q46 (r14 committed form) vs current kernel
    def v0q46: DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val wspec = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val inv = docs
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "wd")))
        .select(col("doc_id"),
          concat_ws(" ", col("wd"), lead(col("wd"), 1).over(wspec), lead(col("wd"), 2).over(wspec)).as("t3"),
          lead(col("wd"), 2).over(wspec).isNotNull.as("full"))
        .filter(col("full"))
        .select(col("doc_id"), xxhash64(col("t3")).as("shingle"))
        .distinct()
        .repartition(col("shingle"))
      val sizes = inv.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val sharedAll = inv.as("x").join(inv.as("y"),
          col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .agg(count(lit(1)).as("shared"))
      sharedAll
        .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
        .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
        .withColumn("j", col("shared").cast("double") / (col("n1") + col("n2") - col("shared")))
        .filter(col("j") >= 0.8)
        .select(col("d1"), col("d2"), round(col("j"), 6).as("jaccard"))
        .orderBy(col("d1"), col("d2"))
    }
    def vXq46: DataFrame = DedupQueries.jaccardPairs(docs, 0.8)
    val tj = collection.mutable.ArrayBuffer[Double]()
    val tk = collection.mutable.ArrayBuffer[Double]()
    (1 to 6).foreach { _ =>
      var t0 = System.nanoTime()
      v0q46.write.format("noop").mode("overwrite").save()
      tj += (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      vXq46.write.format("noop").mode("overwrite").save()
      tk += (System.nanoTime() - t0) / 1e9
    }
    println(f"[micro] J_v0_q46  min=${tj.min}%7.3f runs=${tj.map(t => f"$t%5.2f").mkString(",")}")
    println(f"[micro] K_vX_q46  min=${tk.min}%7.3f runs=${tk.map(t => f"$t%5.2f").mkString(",")}")

    // G: the v3 index alone — checkpoint + sizes join + repartition
    time("G_v3_index_only") {
      DedupQueries.hashedIndex(docs).repartition(col("shingle"))
    }

    // H: v3 index WITHOUT checkpoint/sizes — raw distinct + repartition
    time("H_distinct_repart_only") {
      import org.apache.spark.sql.expressions.Window
      val wspec = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      docs
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "wd")))
        .select(col("doc_id"),
          concat_ws(" ", col("wd"), lead(col("wd"), 1).over(wspec), lead(col("wd"), 2).over(wspec)).as("t3"),
          lead(col("wd"), 2).over(wspec).isNotNull.as("full"))
        .filter(col("full"))
        .select(col("doc_id"), xxhash64(col("t3")).as("shingle"))
        .distinct()
        .repartition(col("shingle"))
    }

    // I: v3 self-join + single pair agg over the checkpointed index
    time("I_v3_selfjoin_agg") {
      val inv = DedupQueries.hashedIndex(docs).repartition(col("shingle"))
      inv.as("x").join(inv.as("y"),
          col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .agg(count(lit(1)).as("shared"),
          max(col("x.n")).as("n1"), max(col("y.n")).as("n2"))
    }

    // F: windowed + global distinct + localCheckpoint, read twice
    //    (approximates the self-join reuse cost profile)
    time("F_window_checkpoint") {
      import org.apache.spark.sql.expressions.Window
      val wspec = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val inv = docs
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "wd")))
        .select(col("doc_id"),
          concat_ws(" ", col("wd"), lead(col("wd"), 1).over(wspec), lead(col("wd"), 2).over(wspec)).as("t3"),
          lead(col("wd"), 2).over(wspec).isNotNull.as("full"))
        .filter(col("full"))
        .select(col("doc_id"), xxhash64(col("t3")).as("shingle"))
        .distinct()
        .localCheckpoint()
      inv.union(inv)
    }

    spark.stop()
  }
}
