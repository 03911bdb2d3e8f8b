package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native codegen'd squared-L2 distance between a WINDOW of one
  * float-array column and a whole second float-array column:
  * `sub_l2(a, aOff, b)` = Σ_{i<|b|} (a[aOff+i] − b[i])², the subvector
  * distance product quantization evaluates n·K·M times per encode pass
  * ([[graft.operators.Pq]]).
  *
  * The composable spelling
  * `aggregate(zip_with(slice(a, aOff+1, |b|), b, ...), 0d, ...)`
  * allocates the slice, the zipped array, and the fold per ROW and
  * interprets two lambdas — measured 20 s for 2000×2048 subdistance
  * pairs at sf0.1; this expression is one fused loop inside whole-stage
  * codegen, no allocation. Semantics match the HOF form bit-for-bit
  * where the catalog evaluates it (non-null fixed-width arrays,
  * in-range offsets): per-element float→double casts, difference and
  * square in double, SEQUENTIAL left-to-right summation — so the
  * DuckDB oracles' ordered `sum() FROM range(...)` stays bit-equal.
  *
  * Documented edge deviations (pinned by `PqSpec`'s laws running the
  * production SQL; unreachable in catalog queries): a window running
  * past `a`'s end truncates the loop (the slice form would null-pad
  * and the fold return NULL); a null ELEMENT reads as 0.0f. Null if
  * any ARGUMENT is null; a negative offset clamps the loop START to
  * the first in-range ordinal (`i = max(0, -aOff)`), so out-of-range
  * positions contribute nothing and `a` is never read below ordinal 0
  * (sub_l2 is registered session-wide — arbitrary SQL can pass any
  * offset, not just the catalog's m·Dsub ≥ 0).
  */
case class SubL2(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Serializable {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), IntegerType, ArrayType(FloatType, _)) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sub_l2 requires (array<float>, int, array<float>), got " +
        s"(${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
        s"${third.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, off: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val o = off.asInstanceOf[Int]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(y.numElements(), x.numElements() - o)
    var acc = 0.0
    var i = math.max(0, -o)
    while (i < n) {
      val d = x.getFloat(o + i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, o, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
        int $n = java.lang.Math.min($y.numElements(), $x.numElements() - $o);
        double $acc = 0.0;
        for (int $i = java.lang.Math.max(0, -$o); $i < $n; $i++) {
          double $d = (double) $x.getFloat($o + $i) - (double) $y.getFloat($i);
          $acc += $d * $d;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SubL2 {
  /** SQL registration: `sub_l2(a, aOff, b)` (aOff 0-based elements). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sub_l2",
      exprs => SubL2(exprs(0), exprs(1), exprs(2)),
      "scala_udf")
}
