package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NormalizeTextSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // all non-ASCII is built from escapes at RUNTIME (char + toString
  // concatenation) so neither the editor nor scalac's unicode-escape
  // pass can re-normalize what the test feeds the function
  private val combiningAcute = '\u0301'.toString
  private val eAcute = '\u00e9'.toString
  private val decomposed = "caf" + "e" + combiningAcute
  private val composed = "caf" + eAcute

  test("NFC composes decomposed accents; controls scrub; runs collapse; ends trim") {
    assert(NormalizeText.normalize(decomposed) == composed)
    assert(NormalizeText.normalize("a\tb\r\nc d") == "a b c d")
    assert(NormalizeText.normalize("  a   b  ") == "a b")
    assert(NormalizeText.normalize("\t\n ") == "")
    assert(NormalizeText.normalize("") == "")
    assert(NormalizeText.normalize("x y") == "x y")
    // C1 controls (U+0080-U+009F) are documented as untouched
    val nel = '\u0085'.toString
    assert(NormalizeText.normalize("a" + nel + "b") == "a" + nel + "b")
    // DEL (U+007F) is scrubbed like the C0 range
    assert(NormalizeText.normalize("a" + '\u007f'.toString + "b") == "a b")
  }

  test("idempotent: normalize(normalize(s)) == normalize(s)") {
    val angstromSign = '\u212b'.toString // NFC-normalizes to U+00C5
    val samples = Seq(decomposed + "  x\tyz ", " plain ascii ",
      angstromSign + "mixed", " ", "already normal")
    samples.foreach { s =>
      val once = NormalizeText.normalize(s)
      assert(NormalizeText.normalize(once) == once, s"not idempotent on [[$s]]")
    }
  }

  test("codegen path agrees with interpreted eval and with the scala function") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    val samples = Seq(decomposed + " one", "a\t\tb", " c ", "de")
    val viaDf = samples.toDF("s")
      .select(NormalizeText(col("s")).as("n")).collect().map(_.getString(0)).toSeq
    val direct = samples.map(NormalizeText.normalize)
    assert(viaDf == direct)
    assert(viaDf.head == composed + " one")
    samples.foreach { s =>
      val interp = NormalizeText(Literal(s)).eval(null).toString
      assert(interp == NormalizeText.normalize(s))
    }
  }

  test("SQL registration + null passthrough") {
    NormalizeText.register(spark)
    import spark.implicits._
    val r = Seq(Some(" x  y "), None).toDF("s")
      .selectExpr("normalize_text(s) AS n").collect()
    assert(r(0).getString(0) == "x y")
    assert(r(1).isNullAt(0))
  }
}
