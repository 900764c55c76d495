package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** SQL-file corpus runner (reference layer 2: CometSqlFileTestSuite over
  * 176 .sql files — format re-implemented, content re-authored).
  *
  * Two file formats under src/test/resources/sql-tests (recursive):
  *
  *  1. Directive format (the reference's):
  *     - `-- Config: key=value` pragma lines apply to the whole file
  *     - a line `statement` introduces a setup statement (executed, not
  *       checked — temp views, etc.)
  *     - a line `query` introduces a query whose result must be
  *       invariant under codegen-off and broadcast-off re-runs
  *     - a line `query expect_error(tag)` introduces a query that must
  *       throw at analysis or execution time
  *     Block bodies run to the next blank line or directive.
  *
  *  2. Legacy format: ';'-separated statements, each treated as `query`.
  *
  * Directive-format files run as ONE test each (setup statements must
  * precede their queries); legacy files keep per-statement tests.
  */
class SqlFileSuite extends GraftTestBase {

  private val corpusDir = Paths.get("src/test/resources/sql-tests")

  private case class Block(directive: String, sql: String)
  private case class SqlFile(configs: Seq[(String, String)], blocks: Seq[Block])

  private val directiveRe = "^(statement|query)(\\s+expect_error\\([^)]*\\))?\\s*$".r
  private val configRe = "^--\\s*Config:\\s*([^=\\s]+)\\s*=\\s*(\\S+)\\s*$".r

  private def parseDirective(lines: Seq[String]): SqlFile = {
    val configs = lines.collect { case configRe(k, v) => k -> v }
    val blocks = Seq.newBuilder[Block]
    var directive: Option[String] = None
    val body = new StringBuilder
    def flush(): Unit = {
      directive.filter(_ => body.nonEmpty)
        .foreach(d => blocks += Block(d, body.toString.trim))
      body.clear()
    }
    lines.foreach { line =>
      val t = line.trim
      if (directiveRe.findFirstIn(t).isDefined) { flush(); directive = Some(t) }
      else if (t.isEmpty) flush()
      else if (!t.startsWith("--")) body.append(line).append('\n')
    }
    flush()
    SqlFile(configs, blocks.result())
  }

  private def isDirectiveFormat(lines: Seq[String]): Boolean =
    lines.exists(l => directiveRe.findFirstIn(l.trim).isDefined)

  private def runFile(f: SqlFile): Unit = withSQLConf(f.configs: _*) {
    f.blocks.foreach { b =>
      if (b.directive == "statement") {
        spark.sql(b.sql).collect()
      } else if (b.directive.startsWith("query expect_error")) {
        val thrown = intercept[Throwable] { spark.sql(b.sql).collect() }
        assert(thrown != null, s"expected error from: ${b.sql}")
      } else {
        checkInvariantUnder(spark.sql(b.sql),
          Seq("spark.sql.codegen.wholeStage" -> "false"))
        checkInvariantUnder(spark.sql(b.sql),
          Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1"))
      }
    }
  }

  private def legacyStatements(lines: Seq[String]): Seq[String] =
    lines.filterNot(_.trim.startsWith("--"))
      .mkString("\n").split(";").map(_.trim).filter(_.nonEmpty).toSeq

  private def allFiles(dir: Path): Seq[Path] =
    Files.walk(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".sql")).toSeq

  allFiles(corpusDir)
    .sortBy(p => corpusDir.relativize(p).toString)
    .foreach { file =>
      val name = corpusDir.relativize(file).toString
      val lines = Files.readString(file).linesIterator.toSeq
      if (isDirectiveFormat(lines)) {
        val parsed = parseDirective(lines)
        val nq = parsed.blocks.count(_.directive.startsWith("query"))
        test(s"$name ($nq queries, dual-run invariant)") { runFile(parsed) }
      } else {
        legacyStatements(lines).zipWithIndex.foreach { case (sql, i) =>
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
}
