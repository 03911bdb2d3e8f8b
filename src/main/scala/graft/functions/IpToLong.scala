package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd dotted-quad IPv4 → numeric conversion — the first
  * step of every CIDR/blocklist/longest-prefix-match operation in a
  * mitigation pipeline (the reference keys everything on string IPs,
  * spark_app/main.py:234-250; range semantics need numbers).
  *
  * Parse is STRICT: exactly four dot-separated decimal octets, each
  * 0–255, no sign, no spaces, and no leading zeros ("010.1.1.1" is
  * rejected — dotted-quad leading zeros are octal in some stacks and a
  * classic blocklist-bypass vector, so a mitigation engine must refuse
  * to guess). Malformed input yields NULL (not a sentinel) so SQL
  * filters compose naturally.
  *
  * Stays inside whole-stage codegen: `nullSafeCodeGen` emits one call
  * to the static [[IpToLong.parse]] (returns −1 for malformed, mapped
  * to NULL in the generated guard) — no UDF serialization, single pass
  * over the bytes, zero allocation beyond the UTF8String view.
  */
case class IpToLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  // malformed strings map to NULL even when the input is non-null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ip_to_long requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val v = IpToLong.parse(input.asInstanceOf[UTF8String].toString)
    if (v < 0L) null else java.lang.Long.valueOf(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.IpToLong.parse($c.toString());
      if (${ev.value} < 0L) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IpToLong {

  /** Strict dotted-quad parse; −1 for any malformed form. Single pass,
    * no regex, no split allocation.
    */
  def parse(s: String): Long = {
    var acc = 0L      // running numeric value
    var octet = -1L   // current octet value; -1 = no digit seen yet
    var digits = 0    // digits in current octet (leading-zero check)
    var nOctets = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val ch = s.charAt(i)
      if (ch >= '0' && ch <= '9') {
        if (octet < 0) { octet = 0; digits = 0 }
        // leading zero: a second digit after a leading '0'
        if (digits >= 1 && octet == 0L && s.charAt(i - digits) == '0') return -1L
        octet = octet * 10 + (ch - '0')
        digits += 1
        if (octet > 255L || digits > 3) return -1L
      } else if (ch == '.') {
        if (octet < 0) return -1L // empty octet ("1..2", ".1")
        nOctets += 1
        if (nOctets > 3) return -1L
        acc = (acc << 8) | octet
        octet = -1L
      } else return -1L
      i += 1
    }
    if (octet < 0 || nOctets != 3) return -1L
    (acc << 8) | octet
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(IpToLong(
      org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** SQL registration: `ip_to_long(s)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ip_to_long",
      exprs => IpToLong(exprs(0)),
      "scala_udf")
}
