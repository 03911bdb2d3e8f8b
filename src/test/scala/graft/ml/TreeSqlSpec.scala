package graft.ml

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** TreeSql unit properties. The cross-engine guarantee rests on every
  * embedded literal parsing back to the identical IEEE-754 bits in any
  * engine that implements correctly-rounded decimal→double conversion;
  * Java's Double.toString is the round-trip witness, and the exponent
  * suffix keeps the literal typed DOUBLE (not DECIMAL) in both SQL
  * dialects.
  */
class TreeSqlSpec extends AnyFunSuite {

  /** scalacheck runner without the scalatestplus bridge (offline deps). */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val finiteDoubles: Gen[Double] = Gen.oneOf(
    Gen.choose(-1e12, 1e12),
    Gen.choose(-1.0, 1.0),
    Gen.oneOf(0.0, -0.0, 1.0 / 3.0, 443.5, Double.MinPositiveValue, 1e-300,
      9.007199254740993e15))

  test("dlit round-trips every finite double to identical bits") {
    check(Prop.forAll(finiteDoubles) { d =>
      val back = java.lang.Double.parseDouble(TreeSql.dlit(d))
      java.lang.Double.doubleToRawLongBits(back) ==
        java.lang.Double.doubleToRawLongBits(d)
    })
  }

  test("dlit output is always exponent-typed (DOUBLE in both dialects)") {
    check(Prop.forAll(finiteDoubles)(d => TreeSql.dlit(d).toLowerCase.contains("e")))
  }

  test("dlit rejects non-finite values") {
    for (bad <- Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity))
      intercept[IllegalArgumentException](TreeSql.dlit(bad))
  }
}
