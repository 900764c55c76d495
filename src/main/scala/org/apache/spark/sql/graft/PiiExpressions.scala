// Same placement rationale as CosineSimilarity: ExpectsInputTypes'
// AbstractDataType is private[sql].
package org.apache.spark.sql.graft

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** PII pattern registry — the detection/redaction pass of a training-
  * data pipeline (builder brief text-analysis list; reference analogue:
  * the regexp machinery in serde/strings.scala:34-428 and
  * expressions/RegExp.scala, which the reference uses to accelerate
  * exactly this class of scan-side regexp work).
  *
  * Every pattern is RE2-COMPATIBLE BY DESIGN (no lookaround, no
  * backreferences, ASCII \b and \d): the identical regex text runs in
  * Java's engine here and in RE2-based engines (the DuckDB oracle),
  * so detection/redaction is engine-portable and the oracle is exact.
  * Class labels are the supported surface; an unknown label fails at
  * FUNCTION-RESOLUTION time (analysis), never at runtime on an
  * executor.
  */
object PiiPatterns {
  val EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val CC = "\\b\\d{4}[ -]\\d{4}[ -]\\d{4}[ -]\\d{4}\\b"
  val SSN = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PHONE = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val IP = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Label → regex, in the (alphabetical) order `pii_detect` reports. */
  val classes: Seq[(String, String)] = Seq(
    "cc" -> CC, "email" -> EMAIL, "ip" -> IP, "phone" -> PHONE, "ssn" -> SSN)

  /** Redaction application order: email first (its local part may
    * contain digit runs), card before phone (longest digit shape
    * first), then ssn/phone/ip — all mutually disjoint at the \b
    * boundaries, so the order is belt-and-braces, not load-bearing.
    */
  val redactOrder: Seq[String] = Seq("email", "cc", "ssn", "phone", "ip")

  def supported: Set[String] = classes.map(_._1).toSet

  /** Parse a 'cc,email' CSV into validated labels; empty/absent = all. */
  def parseClasses(csv: String): Seq[String] = {
    val sel =
      if (csv.trim.isEmpty) classes.map(_._1)
      else csv.split(",").map(_.trim.toLowerCase).toSeq
    val unknown = sel.filterNot(supported)
    require(unknown.isEmpty,
      s"unsupported PII class(es): ${unknown.mkString(",")} " +
        s"(supported: ${classes.map(_._1).mkString(",")})")
    sel
  }
}

/** Precompiled per-expression matcher state, attached to the generated
  * code as a reference object (the RegExpReplace pattern-cache idiom) —
  * patterns compile once per task, never per row.
  */
final class PiiMatcher(selected: Seq[String]) extends Serializable {
  @transient private lazy val detectSteps: Array[(String, Pattern)] =
    PiiPatterns.classes.collect {
      case (label, re) if selected.contains(label) => (label, Pattern.compile(re))
    }.toArray

  @transient private lazy val redactSteps: Array[(Pattern, String)] =
    PiiPatterns.redactOrder.collect {
      case label if selected.contains(label) =>
        (Pattern.compile(PiiPatterns.classes.toMap.apply(label)),
          "[" + label.toUpperCase + "]")
    }.toArray

  /** Comma-joined labels of classes present, alphabetical; "" if none. */
  def detect(s: UTF8String): UTF8String = {
    val t = s.toString
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < detectSteps.length) {
      if (detectSteps(i)._2.matcher(t).find()) {
        if (sb.length > 0) sb.append(',')
        sb.append(detectSteps(i)._1)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** All selected classes replaced with their [LABEL] tokens. */
  def redact(s: UTF8String): UTF8String = {
    var t = s.toString
    var i = 0
    while (i < redactSteps.length) {
      t = redactSteps(i)._1.matcher(t).replaceAll(
        java.util.regex.Matcher.quoteReplacement(redactSteps(i)._2))
      i += 1
    }
    UTF8String.fromString(t)
  }
}

/** `pii_detect(text[, 'cc,email,...'])` → comma-joined labels of the
  * PII classes found (alphabetical), '' when clean. Codegen emits a
  * single call on the precompiled matcher, so the expression stays
  * inside whole-stage codegen.
  */
case class PiiDetect(child: Expression, selected: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "pii_detect"

  @transient private lazy val matcher = new PiiMatcher(selected)

  override def nullSafeEval(input: Any): Any =
    matcher.detect(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("piiMatcher", matcher, classOf[PiiMatcher].getName)
    defineCodeGen(ctx, ev, c => s"$m.detect($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PiiDetect =
    copy(child = newChild)
}

/** `pii_redact(text[, 'cc,email,...'])` → text with each selected PII
  * class replaced by its [LABEL] token. Same codegen shape as
  * [[PiiDetect]].
  */
case class PiiRedact(child: Expression, selected: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "pii_redact"

  @transient private lazy val matcher = new PiiMatcher(selected)

  override def nullSafeEval(input: Any): Any =
    matcher.redact(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("piiMatcher", matcher, classOf[PiiMatcher].getName)
    defineCodeGen(ctx, ev, c => s"$m.redact($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PiiRedact =
    copy(child = newChild)
}
