package graft.operators

import graft.operators.HllStream
import org.apache.datasketches.hll.{HllSketch, Union}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Laws behind `q_hll_distinct_stream`'s tolerance boolean and report:
  * sparse-mode exactness at the corpus's structural cardinality (≤ 350
  * sources ≪ the ~512-coupon sparse ceiling at lgK = 12), losslessness
  * of the per-window union across salt groups (disjoint key spaces),
  * the max-stamp final-emission pick, and emission idempotence
  * (bit-identical duplicate rows collapse instead of corrupting the
  * union).
  */
class HllStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sketchOf(keys: Seq[String]): HllSketch = {
    val sk = new HllSketch(HllStream.LgK)
    keys.foreach(sk.update)
    sk
  }

  test("sparse coupon mode is exact at the corpus's structural cardinality") {
    // 350 distinct keys — the generator's whole source domain — stays
    // in sparse mode at lgK=12, where the estimate rounds to exact
    val sk = sketchOf((0 until 350).map(i => s"10.0.${i / 256}.${i % 256}"))
    assert(sk.getEstimate.round == 350L)
    // and survives the state roundtrip the processor does every batch
    val rt = HllSketch.heapify(sk.toUpdatableByteArray)
    rt.update("10.9.9.9")
    assert(rt.getEstimate.round == 351L)
  }

  test("union across disjoint salt groups is lossless in the exact regime") {
    val a = sketchOf((0 until 200).map(i => s"a_$i"))
    val b = sketchOf((0 until 150).map(i => s"b_$i"))
    val u = new Union(HllStream.LgK)
    u.update(a); u.update(b)
    assert(u.getResult.getEstimate.round == 350L)
  }

  test("report picks the max-stamp emission, unions salts, prices the bound") {
    import spark.implicits._
    val salt0Mid = sketchOf((0 until 100).map(i => s"a_$i")).toCompactByteArray
    val salt0Fin = sketchOf((0 until 200).map(i => s"a_$i")).toCompactByteArray
    val salt1Fin = sketchOf((0 until 150).map(i => s"b_$i")).toCompactByteArray
    val emitted = Seq(
      (1L, 0, salt0Mid, 100L),
      (1L, 0, salt0Fin, 200L),  // max stamp for (1, 0) — must win
      (1L, 1, salt1Fin, 150L),
      (1L, 1, salt1Fin, 150L))  // bit-identical duplicate — must collapse
      .toDF("win", "salt", "sk", "n_seen")
    val exact = Seq((1L, 350L)).toDF("win", "n_src_exact")
    val out = HllStream.distinctSourcesReport(emitted, exact).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("window_start_us") == HllStream.WinUs)
    assert(out(0).getAs[Long]("n_src_exact") == 350L)
    assert(out(0).getAs[Boolean]("within_bound"),
      "final emissions union to 350 = exact, well inside the 10% band")
  }

  test("report drops windows the stream never emitted (inner join gate)") {
    import spark.implicits._
    val emitted = Seq.empty[(Long, Int, Array[Byte], Long)]
      .toDF("win", "salt", "sk", "n_seen")
    val exact = Seq((1L, 350L)).toDF("win", "n_src_exact")
    assert(HllStream.distinctSourcesReport(emitted, exact).count() == 0L,
      "a broken stream fails the row-count gate, not silently true")
  }
}
