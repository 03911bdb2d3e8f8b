package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-exact laws for the round-12c additions (rolling distinct
  * actives and friends).
  */
class Round12cOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val DayNs = 86400L * 1000000000L

  private def ev(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("user_id", "ts")
  }

  private def roll(rows: (Long, Long)*): Seq[(Long, Long, Long, Long)] =
    TimeSeries.rollingDistinctOn(ev(rows: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("rolling distinct: hand window — a day counts actives from the prior 6") {
    // day0: users {1,2}; day3: {2}; day8: {3}
    // WAU(0)={1,2}; WAU(3)={1,2} (day0 within 7d) ∪ {2} = {1,2};
    // WAU(8) = {3} only (day3 is 5 days back → within window? 8-3=5 ≤ 6 → yes!)
    // so WAU(8) = {2,3}
    val got = roll(
      (1L, 0L), (2L, 0L),
      (2L, 3 * DayNs), (3L, 8 * DayNs))
    assert(got == Seq(
      (0L, 2L, 2L, 10000L),
      (3L, 1L, 2L, 5000L),
      (8L, 1L, 2L, 5000L)))
  }

  test("rolling distinct: window excludes day-7-and-older activity") {
    // user 1 on day 0, user 2 on day 7: 7-0=7 > 6 → WAU(7) = {2} only
    val got = roll((1L, 0L), (2L, 7 * DayNs))
    assert(got == Seq((0L, 1L, 1L, 10000L), (7L, 1L, 1L, 10000L)))
  }

  test("rolling distinct: duplicate events never inflate distincts; dau<=wau") {
    val got = roll((1L, 0L), (1L, 1000L), (1L, 2000L), (1L, DayNs),
      (2L, DayNs), (2L, DayNs + 5L))
    assert(got == Seq((0L, 1L, 1L, 10000L), (1L, 2L, 2L, 10000L)))
    val corpus = TimeSeries.rollingDistinctOn(
      graft.Tables.events(spark, "/root/testdata/sf0.001")).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "dau must be <= wau")
      assert(r.getLong(3) >= 1L && r.getLong(3) <= 10000L)
    }
  }
}
