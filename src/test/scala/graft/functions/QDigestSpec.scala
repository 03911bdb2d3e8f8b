package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-exact q-digest laws plus the catalog queries' regime canaries
  * (the MisraGriesSpec discipline: every oracle-regime assumption is a
  * pinned fact, not a hope).
  */
class QDigestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def build(values: Seq[Long], k: Int): QDigest.Digest =
    values.foldLeft(QDigest.aggregator(k).zero)(QDigest.aggregator(k).reduce)

  test("compress: cold families cascade upward, heavy leaves survive, weight conserved") {
    // 20 values: leaf 0 heavy (17), leaves 2 and 3 cold (1 + 2).
    // k = 4 → t = 5: the cold family folds into [2,4), whose own family
    // is still < t at every ancestor level (the heavy mass sits on a
    // LEAF, not on the [0,2) internal node), so the 3 cold units
    // cascade all the way to the root — the canonical q-digest shape:
    // detail survives exactly where mass concentrates.
    val d = QDigest.compress(
      build(Seq.fill(17)(0L) ++ Seq(2L, 3L, 3L), 1000000), 4)
    val nodes = QDigest.aggregator(4).finish(d).map(n => (n.lo, n.hi, n.cnt)).toSet
    assert(nodes == Set((0L, 1L, 17L), (0L, QDigest.Universe, 3L)), nodes)
  }

  test("query rule on a hand digest: post-order crossing, exact in the leaf regime") {
    import spark.implicits._
    // values with known discrete quantiles: 1×10, 5×20, 10×70 (N=100... use small)
    val values = Seq.fill(10)(100L) ++ Seq.fill(20)(500L) ++ Seq.fill(70)(900L)
    val df = values.map(v => v.toDouble / 100.0).toDF("value") // cents roundtrip
    val got = graft.operators.Sketches.qdQuantilesOn(df, 1024)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // r(5%)=5 → 100; r(25%)=25 → 500; r(50%)=50 → 900
    assert(got(500L) == 100L && got(2500L) == 500L && got(5000L) == 900L)
    assert(got(7500L) == 900L && got(9500L) == 900L)
  }

  test("bound audit booleans hold on an adversarial skewed corpus above capacity") {
    import spark.implicits._
    // 3000 values, k=8 → t=375: heavy compression; half the mass at one
    // point, the rest spread over a wide range
    val values = Seq.fill(1500)(123L) ++ (1 to 1500).map(i => (i * 37L) % 60000)
    val df = values.map(v => v.toDouble / 100.0).toDF("value")
    val rows = graft.operators.Sketches.qdEstErrOn(df, 8).collect()
    assert(rows.length == 5)
    for (r <- rows; i <- 4 to 6)
      assert(r.getBoolean(i), s"verdict column $i false: $r")
  }

  test("oracle-SF regime canary: event weight sits under the exact-regime capacity") {
    val n = graft.Tables.events(spark, "/root/testdata/sf0.001").count()
    assert(n < graft.operators.Sketches.QdExactK,
      s"sf0.001 weight $n >= QdExactK — the exact-regime oracle would break")
  }

  test("clamp canary: probed-SF cents sit inside the universe (clamp is a guard, not a distortion)") {
    val mx = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .selectExpr("max(CAST(round(value * 100, 0) AS BIGINT)) AS m")
      .head().getLong(0)
    assert(mx < QDigest.Universe, s"cents $mx outside universe ${QDigest.Universe}")
  }

  test("error-regime canary: compression genuinely fires at the oracle SF") {
    val n = graft.Tables.events(spark, "/root/testdata/sf0.001").count()
    assert(n / graft.operators.Sketches.QdErrK >= 1,
      "t = 0 at sf0.001 — the bound audit would silently test the exact regime")
  }
}
