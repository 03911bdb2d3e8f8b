package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-overlap laws for the sweep-line peak-concurrency operator:
  * a paper corpus with known overlaps, the closed-interval boundary
  * conventions (touching sessions, single-event sessions), cross-day
  * carry through the two-phase prefix sum, and a peak bound sanity law
  * on the driver corpus.
  */
class ConcurrencySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val M = 60L * 1000000000L       // one minute in nanos
  private val DayNs = 86400L * 1000000000L

  /** events under the engine ts contract (epoch-nanos BIGINT). */
  private def ev(rows: (Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("user_id", "ts", "event_id")
  }

  private def run(rows: (Long, Long, Long)*): Seq[(Long, Long, Long, Long)] =
    Concurrency.peakConcurrencyOn(ev(rows: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("paper corpus: three staggered sessions peak at 3") {
    // u1: [0, 10m]; u2: [5m, 15m]; u3: [8m, 9m] — all three open at 8m
    val got = run(
      (1L, 0L, 1L), (1L, 10 * M, 2L),
      (2L, 5 * M, 3L), (2L, 15 * M, 4L),
      (3L, 8 * M, 5L), (3L, 9 * M, 6L))
    assert(got == Seq((0L, 3L, 3L, 8L * M / 1000)))
  }

  test("closed intervals: a session ending at t overlaps one starting at t") {
    // u1: [0, 10m]; u2 single event at exactly 10m — concurrency 2
    val got = run((1L, 0L, 1L), (1L, 10 * M, 2L), (2L, 10 * M, 3L))
    assert(got.head._2 == 2L)
    // but a session starting 1us after u1's end does NOT overlap
    val apart = run((1L, 0L, 1L), (1L, 10 * M, 2L),
      (2L, 10 * M + 1000L, 3L)) // +1us in nanos
    assert(apart.head._2 == 1L)
  }

  test("single-event sessions never dip the counter and count as 1") {
    val got = run((1L, 5 * M, 1L))
    assert(got == Seq((0L, 1L, 1L, 5L * M / 1000)))
  }

  test("gap splits sessions: two sessions of one user never overlap themselves") {
    // 31-min gap → two sessions; peak stays 1
    val got = run((1L, 0L, 1L), (1L, 31 * M, 2L))
    assert(got.head._2 == 1L)
    assert(got.head._3 == 2L) // two starts that day
  }

  test("cross-day carry: a session spanning midnight raises day 1's peak") {
    // u1 session [day0 23:50, day1 00:10] (20-min span, one session);
    // u2 single event on day 1 at 00:05 → day-1 peak = 2 even though
    // u1's only day-1 rows are the carry (no start on day 1 from u1)
    val got = run(
      (1L, DayNs - 10 * M, 1L), (1L, DayNs + 10 * M, 2L),
      (2L, DayNs + 5 * M, 3L))
    assert(got == Seq(
      (0L, 1L, 1L, (DayNs - 10 * M) / 1000),
      (1L, 2L, 1L, (DayNs + 5 * M) / 1000)))
  }

  test("coverage: union length, not sum — overlap counts once") {
    // u1 session [0, 2h], u2 session [1h, 3h] (20-min event steps keep
    // each session alive) → union [0, 3h] + 1us closing tick
    val H = 60 * M
    val u1 = (0 to 6).map(i => (1L, i * 20 * M, 10L + i))   // 0..2h
    val u2 = (0 to 6).map(i => (2L, H + i * 20 * M, 30L + i)) // 1h..3h
    val got = Concurrency.coverageOn(ev(u1 ++ u2: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((0L, 3L * H / 1000 + 1L, 2L, 1250L)))
  }

  test("coverage: a session spanning a whole day reports that day at 10000 bp") {
    // session [day0 12:00, day2 12:00] — wait, a 48h event gap would
    // split sessions; span it with events every 20 minutes
    val step = 20 * M
    val n = (2 * DayNs / step).toInt
    val rows = (0 to n).map(i =>
      (1L, DayNs / 2 + i * step, 100L + i)) // day0 12:00 → day2 12:00
    val got = Concurrency.coverageOn(ev(rows: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    assert(got.length == 3)
    val day1 = got(1)
    assert(day1._2 == 86400000000L && day1._3 == 10000L,
      s"middle day must be fully covered, got $day1")
    // day 0 and day 2: half each
    assert(got.head._2 == 43200000000L && got.head._3 == 5000L)
  }

  test("coverage: quiet days in the spine report zero, never vanish") {
    // activity on day 0 and day 3 only; days 1 and 2 appear with 0
    val got = Concurrency.coverageOn(ev(
      (1L, 0L, 1L), (2L, 3 * DayNs, 2L))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.map(_._1) == Seq(0L, 1L, 2L, 3L))
    assert(got(1)._2 == 0L && got(2)._2 == 0L)
  }

  test("driver corpus: peaks are positive and bounded by the user count") {
    val e = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val users = e.select("user_id").distinct().count()
    val got = Concurrency.peakConcurrencyOn(e).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) >= 1L && r.getLong(1) <= users)
      assert(r.getLong(2) >= 1L)
    }
  }
}
