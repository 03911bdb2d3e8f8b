package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for [[NormalizeText.normalize]] over random strings
  * drawn from a deliberately hostile alphabet: combining marks,
  * compatibility characters with NFC compositions, C0/C1 controls, DEL,
  * long space runs, surrogate-safe BMP letters.
  */
class NormalizePropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val hostileChar: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar,
    3 -> Gen.const(' '),
    2 -> Gen.oneOf('\t', '\n', '\r', 0x0b.toChar, 0x1f.toChar),
    1 -> Gen.choose(0x00.toChar, 0x1f.toChar), // full C0 range
    1 -> Gen.const(0x7f.toChar),               // DEL
    1 -> Gen.choose(0x80.toChar, 0x9f.toChar), // C1: untouched by contract
    2 -> Gen.oneOf('e', 0x301.toChar, 0x300.toChar, 0xe9.toChar,
      0xc5.toChar, 0x212b.toChar, 'A'),        // combining/precomposed/angstrom
    1 -> Gen.choose(0xa0.toChar, 0x24f.toChar)) // latin-1/ext letters

  private val hostileString: Gen[String] =
    Gen.chooseNum(0, 80).flatMap(n => Gen.listOfN(n, hostileChar)).map(_.mkString)

  test("idempotence: normalize ∘ normalize == normalize") {
    check(Prop.forAll(hostileString) { s =>
      val once = NormalizeText.normalize(s)
      NormalizeText.normalize(once) == once
    })
  }

  test("output invariants: no ASCII controls, no space runs, no edge spaces, NFC") {
    check(Prop.forAll(hostileString) { s =>
      val out = NormalizeText.normalize(s)
      val noControls = !out.exists(c => c < 0x20 || c == 0x7f)
      val noRuns = !out.contains("  ")
      val trimmed = !out.startsWith(" ") && !out.endsWith(" ")
      val nfc = java.text.Normalizer.isNormalized(out, java.text.Normalizer.Form.NFC)
      noControls && noRuns && trimmed && nfc
    })
  }

  test("interpreted expression eval equals the scala function on random input") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    check(Prop.forAll(hostileString) { s =>
      NormalizeText(Literal(s)).eval(null).toString == NormalizeText.normalize(s)
    })
  }
}
