package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._

import org.apache.spark.sql.types._

/** Mirror of the driver-hash type-parity gate (tools/type_parity.py /
  * check_oracle.py), run pre-driver by `sbt test`: for every oracle-
  * compared query, the DuckDB oracle's RESULT TYPES must not diverge
  * from Spark's across int128 or decimal width.
  *
  * Why: DuckDB widens `sum(BIGINT)` to HUGEINT and `sum(DECIMAL(p,s))`
  * to DECIMAL(38,s); Spark stays at BIGINT / DECIMAL(p+10,s). The
  * driver's hash normalization diverges on the 128-bit representation
  * even when every VALUE compares equal — this exact class shipped
  * q185–q189 (r10) and q191 (r11) driver-red at birth, because the
  * python value-fetch in the old check collapsed int128 to int and hid
  * it. The fix is always oracle-side: `CAST(sum(...) AS BIGINT)` /
  * `CAST(... AS DECIMAL(p,s))` to Spark's result type (never touch the
  * engine — it is value-correct; q174's BIGINT-cast oracle is the
  * precedent).
  *
  * Mechanics: the Spark side needs only `df.schema` (analysis, no job);
  * the oracle side is one DuckDB `DESCRIBE` per query (binds, never
  * executes), shelled to tools/type_parity.py since DuckDB is a
  * python-side tool. Skips cleanly when python3+duckdb are absent
  * (developer boxes without the driver toolchain).
  */
class TypeParitySuite extends GraftTestBase {

  /** What DuckDB reads back from the Spark parquet dump — only the
    * int-width and decimal lanes matter to the gate; everything else
    * maps to a token the python side never flags. */
  private def duckType(t: DataType): String = t match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType => "SMALLINT"
    case ByteType => "TINYINT"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case DoubleType => "DOUBLE"
    case FloatType => "FLOAT"
    case other => other.simpleString.toUpperCase
  }

  private def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  test("every oracle's result types match Spark's (no int128/decimal-width divergence)") {
    assume(Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ())) == 0,
      "python3+duckdb unavailable — type-parity gate runs driver-side only")

    val entries = Catalog.validated.flatMap { q =>
      q.oracle.map { sql =>
        val cols = q.run(spark, sfDir).schema.fields
          .map(f => s"${jsonStr(f.name)}: ${jsonStr(duckType(f.dataType))}")
          .mkString("{", ",", "}")
        s"""${jsonStr(q.name)}: {"sql": ${jsonStr(sql)}, "cols": $cols}"""
      }
    }
    val spec =
      s"""{"sfdir": ${jsonStr(sfDir)}, "queries": ${entries.mkString("{", ",", "}")}}"""
    val specPath = Files.createTempFile("type_parity", ".json")
    Files.write(specPath, spec.getBytes("UTF-8"))

    val out = new StringBuilder
    val code = Process(Seq("python3", "tools/type_parity.py", specPath.toString),
      new java.io.File(sys.props.getOrElse("user.dir", ".")))
      .!(ProcessLogger(l => out.append(l).append('\n')))
    Files.deleteIfExists(specPath)
    assert(code == 0, s"type-parity offenders (fix the ORACLE SQL with a CAST):\n$out")
  }
}
