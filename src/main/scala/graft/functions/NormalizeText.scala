package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd text canonicalization for corpus cleaning — the
  * first pass every training-data pipeline runs before hashing,
  * deduplicating, or tokenizing text:
  *
  *  1. Unicode NFC normalization (composed forms, so visually-identical
  *     strings hash identically);
  *  2. ASCII control characters (U+0000–U+001F, U+007F) become spaces —
  *     exactly the ASCII range, so the semantics are mirrorable in
  *     engine-portable regex (`[\x00-\x1f\x7f]`); C1 controls are left
  *     alone;
  *  3. space runs collapse to one space; leading/trailing space trims.
  *
  * Stays inside whole-stage codegen via `defineCodeGen` calling the
  * static [[NormalizeText.normalize]] — one virtual call per row, no
  * UDF serialization, null-safe. Idempotent: normalize(normalize(s)) ==
  * normalize(s) (NFC is idempotent; steps 2–3 reach a fixpoint in one
  * pass). The DuckDB-oracle spelling is
  * `trim(regexp_replace(regexp_replace(nfc_normalize(s),
  * '[\x00-\x1f\x7f]', ' ', 'g'), ' +', ' ', 'g'))`; both engines
  * implement Unicode NFC per the standard, so outputs agree on any
  * input (and trivially on the ASCII driver corpus).
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normalize_text requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NormalizeText.normalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.NormalizeText.normalize($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {

  /** NFC → ASCII-controls-to-space → collapse space runs → trim. */
  def normalize(s: String): String = {
    val nfc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var prevSpace = false
    var i = 0
    while (i < nfc.length) {
      val ch = nfc.charAt(i)
      val c = if (ch < 0x20 || ch == 0x7f) ' ' else ch
      if (c == ' ') {
        if (!prevSpace) sb.append(' ')
        prevSpace = true
      } else {
        sb.append(c)
        prevSpace = false
      }
      i += 1
    }
    // runs are already collapsed, so at most one space at each end
    val out = sb.toString
    val from = if (out.startsWith(" ")) 1 else 0
    val until = if (out.endsWith(" ") && out.length > from) out.length - 1 else out.length
    out.substring(from, until)
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(NormalizeText(
      org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** SQL registration: `normalize_text(s)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "normalize_text",
      exprs => NormalizeText(exprs(0)),
      "scala_udf")
}
