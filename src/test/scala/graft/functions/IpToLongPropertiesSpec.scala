package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the strict `ip_to_long` dotted-quad parser:
  * positional correctness over the whole octet space, canonical
  * round-trip, and rejection of grammar mutations (leading zeros,
  * out-of-range octets, arity/separator damage, whitespace). The LPM
  * mitigation path rides on this parse — an accepted malformed source
  * would silently land traffic in the wrong CIDR bucket instead of the
  * explicit allow row.
  */
class IpToLongPropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }

  private val octet: Gen[Long] = Gen.chooseNum(0L, 255L)

  test("positional value and canonical round-trip over the full octet space") {
    check(Prop.forAll(octet, octet, octet, octet) { (a, b, c, d) =>
      val v = IpToLong.parse(s"$a.$b.$c.$d")
      v == ((a << 24) | (b << 16) | (c << 8) | d) &&
        // canonical re-render parses to the same value
        IpToLong.parse(s"${v >> 24 & 255}.${v >> 16 & 255}.${v >> 8 & 255}.${v & 255}") == v
    })
  }

  test("grammar mutations are rejected, never misparsed") {
    val valid = for { a <- octet; b <- octet; c <- octet; d <- octet }
      yield s"$a.$b.$c.$d"
    val mutation: Gen[String => String] = Gen.oneOf(
      (s: String) => " " + s,
      (s: String) => s + " ",
      (s: String) => s.replaceFirst("[.]", ".."),
      (s: String) => s + ".1", // arity 5
      (s: String) => s.substring(0, s.lastIndexOf('.')), // arity 3
      (s: String) => "0" + s, // leading zero unless first octet was 0-prefixed-proof
      (s: String) => s.replace('.', ','),
      (s: String) => "256" + s.dropWhile(_ != '.'), // first octet out of range
      (s: String) => s + ".")
    check(Prop.forAll(valid, mutation) { (s, f) =>
      // every mutation above breaks the grammar: "0"+s always creates a
      // leading-zero first octet ("0"+"7.…"="07.…", "0"+"0.…"="00.…"),
      // the rest damage arity, separators, range, or edges
      IpToLong.parse(f(s)) == -1L
    })
  }
}
