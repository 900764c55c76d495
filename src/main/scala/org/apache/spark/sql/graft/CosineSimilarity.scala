// In the org.apache.spark.sql namespace because ExpectsInputTypes'
// AbstractDataType is private[sql] — the same placement the reference
// uses for its operators (org.apache.spark.sql.comet).
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of two float-vector
  * columns (`array<float>`), the hot inner loop of similarity search.
  *
  * Why an Expression rather than a UDF (SURVEY §7.3, pattern:
  * reference docs custom-expression guidance): `doGenCode` emits a tight
  * primitive loop that whole-stage codegen inlines — no boxing, no
  * ArrayData round-trips per element pair beyond the primitive getters,
  * no lambda-function interpretation like the zip_with/aggregate
  * formulation. At 100 TB x 64 dims this is the difference between a
  * memory-bound scan and a CPU-bound one.
  *
  * Semantics: null if either side is null, dims must match (else null —
  * mirrors the tolerant semantics of approximate pipelines), accumulation
  * in double left-to-right (bit-compatible with the sequential-fold
  * definition used by the query oracles).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null else dot / math.sqrt(nx * ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
        int $n = $x.numElements();
        if ($n != $y.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $xi = (double) $x.getFloat($i);
            double $yi = (double) $y.getFloat($i);
            $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
          }
          if ($nx == 0.0 || $ny == 0.0) {
            ${ev.isNull} = true;
          } else {
            ${ev.value} = $dot / java.lang.Math.sqrt($nx * $ny);
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
