package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** SQL-file corpus runner (reference layer 2: CometSqlFileTestSuite over
  * 176 .sql files, here in miniature): each statement of each .sql file
  * under src/test/resources/sql-tests runs under the default config and
  * again under codegen-off and broadcast-off — results must be
  * identical. Statements are ';'-separated; '--' lines are comments.
  */
class SqlFileSuite extends GraftTestBase {

  private val corpusDir = Paths.get("src/test/resources/sql-tests")

  private def statements(file: java.nio.file.Path): Seq[String] =
    Files.readString(file).linesIterator
      .filterNot(_.trim.startsWith("--"))
      .mkString("\n")
      .split(";")
      .map(_.trim)
      .filter(_.nonEmpty)
      .toSeq

  Files.list(corpusDir).iterator().asScala.toSeq
    .sortBy(_.getFileName.toString)
    .foreach { file =>
      val name = file.getFileName.toString
      statements(file).zipWithIndex.foreach { case (sql, i) =>
        test(s"$name[$i] invariant under codegen off") {
          checkInvariantUnder(spark.sql(sql),
            Seq("spark.sql.codegen.wholeStage" -> "false"))
        }
        test(s"$name[$i] invariant under broadcast off") {
          checkInvariantUnder(spark.sql(sql),
            Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1"))
        }
      }
    }
}
