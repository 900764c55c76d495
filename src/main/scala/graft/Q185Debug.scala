package graft
import org.apache.spark.sql.SparkSession
object Q185Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .getOrCreate()
    val dir = "/root/testdata/sf0.01"
    spark.conf.set("spark.graft.columnar.window.enabled", "false")
    val off = SparkEntry.queries("q185_window_rolling_wide")(spark, dir).collect()
    spark.conf.set("spark.graft.columnar.window.enabled", "true")
    val onDf = SparkEntry.queries("q185_window_rolling_wide")(spark, dir)
    val on = onDf.collect()
    println("SWAP: " + onDf.queryExecution.executedPlan.toString.contains("GraftWindowSliding"))
    val diff = on.zip(off).zipWithIndex.filter { case ((a, b), _) => a != b }
    println(s"DIFFROWS ${diff.length} of ${on.length}")
    diff.take(3).foreach { case ((a, b), i) => println(s"row $i on=$a off=$b") }
  }
}
