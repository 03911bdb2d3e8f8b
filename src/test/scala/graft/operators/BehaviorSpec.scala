package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-exact laws for the behavioral-sequence and decay/trend
  * operators: the transition matrix is checked against a matrix small
  * enough to compute on paper, attribution against an explicitly
  * journey-partitioned event list, decay weights against their defining
  * powers of two, and the weekly trend against hand deltas including
  * the gap-week lag semantics.
  */
class BehaviorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val H = 3600L * 1000000000L // one hour in nanos

  /** events relation under the engine ts contract (epoch-nanos BIGINT) */
  private def ev(rows: (Long, Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("user_id", "ts", "event_id", "event_type")
      .withColumn("value", org.apache.spark.sql.functions.lit(1.0))
  }

  test("transition matrix matches the paper matrix; rows are per-user sequences") {
    // user 1: a b a b c  → a→b ×2, b→a ×1, b→c ×1 (the trailing c has
    // no successor); user 2: c c → c→c ×1 (never chained across users)
    val e = ev(
      (1L, 1 * H, 1L, "a"), (1L, 2 * H, 2L, "b"), (1L, 3 * H, 3L, "a"),
      (1L, 4 * H, 4L, "b"), (1L, 5 * H, 5L, "c"),
      (2L, 1 * H, 6L, "c"), (2L, 2 * H, 7L, "c"))
    val got = Behavior.transitionsOn(e).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      ("a", "b", 2L, 10000L),
      ("b", "a", 1L, 5000L),
      ("b", "c", 1L, 5000L),
      ("c", "c", 1L, 10000L)))
  }

  test("transition shares: per-prev-type basis points sum into (10000 - cells, 10000]") {
    val m = Behavior.transitionsOn(
      graft.Tables.events(spark, "/root/testdata/sf0.001")).collect()
      .map(r => (r.getString(0), r.getLong(3)))
    m.groupBy(_._1).foreach { case (prev, cells) =>
      val s = cells.map(_._2).sum
      assert(s <= 10000 && s > 10000 - cells.length,
        s"floor-division shares for $prev sum to $s over ${cells.length} cells")
    }
  }

  test("attribution partitions touches into journeys; touchless purchases get sentinels") {
    // user 1: view(1) click(2) PURCHASE(3) | view(4) PURCHASE(5) | PURCHASE(6)
    val e = ev(
      (1L, 1 * H, 1L, "view"), (1L, 2 * H, 2L, "click"), (1L, 3 * H, 3L, "purchase"),
      (1L, 4 * H, 4L, "view"), (1L, 5 * H, 5L, "purchase"),
      (1L, 6 * H, 6L, "purchase"))
    val got = Behavior.attributionOn(e).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getString(5),
        r.getLong(6), r.getString(7))).toSeq
    assert(got == Seq(
      (3L, 2L, 1L, "view", 2L, "click"), // both touches, first≠last
      (5L, 1L, 4L, "view", 4L, "view"),  // single touch is both ends
      (6L, 0L, -1L, "", -1L, "")))       // touchless → sentinels
  }

  test("attribution: a touch after the last purchase attributes to nothing") {
    val e = ev(
      (1L, 1 * H, 1L, "purchase"), (1L, 2 * H, 2L, "view"))
    val got = Behavior.attributionOn(e).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got == Seq((1L, 0L))) // the trailing view's journey never converts
  }

  test("decay weights are the defining powers of two; clamp floors at 1") {
    val day = 24 * H
    // reference instant = the freshest event (user 9); user 1 holds
    // ages 0·H, 3d+1h (one half-life), 31d (past the K=10 clamp)
    val t0 = 40L * day
    val e = ev(
      (9L, t0, 99L, "x"),
      (1L, t0, 1L, "x"),
      (1L, t0 - (3 * day + H), 2L, "x"),
      (1L, t0 - 31 * day, 3L, "x"))
    val got = TimeSeries.decayOn(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toMap2
    assert(got(1L) == (3L, 1024L + 512L + 1L, 100L * (1024L + 512L + 1L)))
    assert(got(9L) == (1L, 1024L, 102400L))
  }

  test("decay score is recency-monotone: fresher activity never scores lower") {
    val day = 24 * H
    val t0 = 40L * day
    // same event count; user 2's events are uniformly older
    val e = ev(
      (9L, t0, 99L, "x"),
      (1L, t0 - day, 1L, "x"), (1L, t0 - 2 * day, 2L, "x"),
      (2L, t0 - 20 * day, 3L, "x"), (2L, t0 - 25 * day, 4L, "x"))
    val s = TimeSeries.decayOn(e).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s(1L) > s(2L))
  }

  test("weekly trend: hand deltas, floor basis points, gap-week lag, first-row zeros") {
    import spark.implicits._
    // weeks 0, 1, 2, then a gap, then week 4 equal to week 2
    val orders = Seq(
      ("1970-01-01", 100.00), ("1970-01-08", 150.00),
      ("1970-01-15", 75.00), ("1970-01-29", 75.00))
      .toDF("d", "o_totalprice")
      .selectExpr("CAST(d AS TIMESTAMP) AS o_orderdate", "o_totalprice")
    val got = TimeSeries.wowOn(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSeq
    assert(got == Seq(
      (0L, 10000L, 0L, 0L, 0L, "first"),
      (1L, 15000L, 10000L, 5000L, 5000L, "up"),
      (2L, 7500L, 15000L, -7500L, 5000L, "down"),
      (4L, 7500L, 7500L, 0L, 0L, "flat"))) // lag skips the absent week 3
  }
  test("event paths: total-order prefix, PathLen cap, and path popularity") {
    // user 1 emits PathLen+2 events — path keeps the first PathLen;
    // user 2 repeats user 1's opening exactly; user 3 diverges
    val L = Behavior.PathLen
    val types = Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
    val rows =
      (0 until L + 2).map(i => (1L, (i + 1) * H, (i + 1).toLong, types(i))) ++
      (0 until L).map(i => (2L, (i + 1) * H, (100 + i).toLong, types(i))) ++
      Seq((3L, 1 * H, 200L, "z"))
    val got = Behavior.pathsOn(ev(rows: _*)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    val want = types.take(L).mkString(">")
    assert(got(1L) == ((L.toLong, want, 2L)))
    assert(got(2L) == ((L.toLong, want, 2L)))
    assert(got(3L) == ((1L, "z", 1L)))
  }

  test("event paths: timestamp ties break by event_id, never partition order") {
    val e = ev((1L, H, 5L, "b"), (1L, H, 2L, "a"), (1L, H, 9L, "c"))
    assert(Behavior.pathsOn(e).collect().head.getString(2) == "a>b>c")
  }

  test("modal type: exact counts with lexicographic tie-break") {
    val e = ev(
      (1L, 1 * H, 1L, "view"), (1L, 2 * H, 2L, "view"), (1L, 3 * H, 3L, "click"),
      // user 2: a 2-2 tie — 'click' < 'view' lexicographically
      (2L, 1 * H, 4L, "view"), (2L, 2 * H, 5L, "view"),
      (2L, 3 * H, 6L, "click"), (2L, 4 * H, 7L, "click"))
    val got = Behavior.modeOn(e).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == (("view", 2L, 3L, 6666L)))
    assert(got(2L) == (("click", 2L, 4L, 5000L)))
  }

  private implicit class MapOps(rows: Array[(Long, Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long, Long)] =
      rows.map { case (u, a, b, c) => u -> ((a, b, c)) }.toMap
  }

  test("path conversion: converts only on purchases AFTER the opening window") {
    val L = Behavior.PathLen
    // user 1: L views then a purchase (converts); user 2: purchase INSIDE
    // the opening window, nothing after (does not convert)
    val rows =
      ((0 until L).map(i => (1L, (i + 1) * H, (i + 1).toLong, "view")) :+
        (1L, (L + 1) * H, 99L, "purchase")) ++
      ((0 until L - 1).map(i => (2L, (i + 1) * H, (200 + i).toLong, "view")) :+
        (2L, L * H, 299L, "purchase"))
    val got = Behavior.pathConversionOn(ev(rows: _*)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val allViews = Seq.fill(L)("view").mkString(">")
    val withPurch = (Seq.fill(L - 1)("view") :+ "purchase").mkString(">")
    assert(got.toSet == Set(
      (allViews, 1L, 1L, 10000L),   // user 1 converted after the window
      (withPurch, 1L, 0L, 0L)))     // user 2's in-window purchase is path, not conversion
  }

  test("debounce: lag semantics (gap vs previous RAW event), per (user, type)") {
    val s30 = 30L * 1000000000L // 30s in nanos; DebounceUs is 60s
    // same type at t=0, t=50s, t=100s: lag semantics drops BOTH followers
    // (each is <= 60s from its raw predecessor); keep-chain semantics
    // would keep t=100s (100s from the kept t=0) — this test pins lag.
    val e = ev(
      (1L, 0L, 1L, "view"), (1L, 50L * 1000000000L, 2L, "view"),
      (1L, 100L * 1000000000L, 3L, "view"),
      // different type inside the window is never debounced against views
      (1L, s30, 4L, "click"))
    val got = Behavior.debounceOn(e).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toMap2s
    assert(got("view") == ((3L, 1L, 6666L)))
    assert(got("click") == ((1L, 1L, 0L)))
  }

  test("MAD outliers: discrete medians by rank, 3xMAD cut, zero-MAD degeneracy") {
    import spark.implicits._
    def evv(rows: (Long, Long, Long, String, Double)*) =
      rows.toDF("user_id", "ts", "event_id", "event_type", "value")
    // type 'a': cents [0,10,20,30,1000] -> med 20, devs sorted [0,10,10,20,980]
    // -> mad 10, outliers dev > 30: one (980)
    // type 'b': cents [10,10,10,10,100] -> med 10, mad 0, outliers dev > 0: one
    val e = evv(
      (1L, 1 * H, 1L, "a", 0.00), (1L, 2 * H, 2L, "a", 0.10),
      (1L, 3 * H, 3L, "a", 0.20), (1L, 4 * H, 4L, "a", 0.30),
      (1L, 5 * H, 5L, "a", 10.00),
      (1L, 1 * H, 6L, "b", 0.10), (1L, 2 * H, 7L, "b", 0.10),
      (1L, 3 * H, 8L, "b", 0.10), (1L, 4 * H, 9L, "b", 0.10),
      (1L, 5 * H, 10L, "b", 1.00))
    val got = MultiDimAgg.madOutliersOn(e).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got("a") == ((5L, 20L, 10L, 1L, 2000L)))
    assert(got("b") == ((5L, 10L, 0L, 1L, 2000L)))
  }

  private implicit class MapOps3(rows: Array[(String, Long, Long, Long)]) {
    def toMap2s: Map[String, (Long, Long, Long)] =
      rows.map { case (t, a, b, c) => t -> ((a, b, c)) }.toMap
  }
}
