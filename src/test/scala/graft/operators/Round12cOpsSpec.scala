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

  test("benford: digits extracted from exact cents; deltas against frozen constants") {
    import spark.implicits._
    // cents: 199 (d=1), 2050 (d=2), 150075 (d=1), 999 (d=9) → d1:2, d2:1, d9:1
    val o = Seq(1.99, 20.50, 1500.75, 9.99).toDF("o_totalprice")
    val got = Profiling.benfordOn(o).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, 2L, 5000L, 3010L, 1990L),
      (2L, 1L, 2500L, 1760L, 740L),
      (9L, 1L, 2500L, 457L, 2043L)))
  }

  test("benford: shares cover the distribution; corpus has all nine digits") {
    val got = Profiling.benfordOn(
      graft.Tables.orders(spark, "/root/testdata/sf0.001")).collect()
    assert(got.map(_.getLong(0)).toSeq.sorted == (1L to 9L))
    val s = got.map(_.getLong(2)).sum
    assert(s <= 10000L && s > 10000L - 9, s"floor shares sum to $s")
  }

  test("new-vs-returning: hand growth ledger") {
    // day0: u1,u2 (both new); day1: u1 (returning), u3 (new); day3: u1,u2,u3
    val got = TimeSeries.newVsReturningOn(ev(
      (1L, 0L), (2L, 0L),
      (1L, DayNs), (3L, DayNs),
      (1L, 3 * DayNs), (2L, 3 * DayNs), (3L, 3 * DayNs))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(
      (0L, 2L, 2L, 0L, 2L),
      (1L, 2L, 1L, 1L, 3L),
      (3L, 3L, 0L, 3L, 3L)))
  }

  test("new-vs-returning: ledger laws on the driver corpus") {
    val e = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val got = TimeSeries.newVsReturningOn(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got.foreach { case (_, dau, nw, ret, _) => assert(nw + ret == dau) }
    assert(got.map(_._5) == got.map(_._5).sorted, "cum reach is monotone")
    assert(got.map(_._3).sum == e.select("user_id").distinct().count())
    assert(got.head._2 == got.head._3, "day 0 is all new users")
  }

  test("streaks: hand islands — runs, counts, and earliest-tie start") {
    // u1 active days {0,1,2, 5,6, 9}: streaks 3,2,1 → longest 3 @ day0
    // u2 active days {4,5} twice-daily (dup events): one streak of 2
    // u3 days {1, 3, 5}: three 1-day streaks, tie → earliest start day1
    val got = TimeSeries.streaksOn(ev(
      (1L, 0L), (1L, DayNs), (1L, 2 * DayNs), (1L, 5 * DayNs),
      (1L, 6 * DayNs), (1L, 9 * DayNs),
      (2L, 4 * DayNs), (2L, 4 * DayNs + 7L), (2L, 5 * DayNs),
      (3L, DayNs), (3L, 3 * DayNs), (3L, 5 * DayNs))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, 6L, 3L, 3L, 0L),
      (2L, 2L, 1L, 2L, 4L),
      (3L, 3L, 3L, 1L, 1L)))
  }

  test("streaks: lengths partition active days on the driver corpus") {
    val got = TimeSeries.streaksOn(
      graft.Tables.events(spark, "/root/testdata/sf0.001")).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1), "longest <= active days")
      assert(r.getLong(2) >= 1L)
      // a single streak means every active day is consecutive
      if (r.getLong(2) == 1L) assert(r.getLong(3) == r.getLong(1))
    }
  }

  test("ab lift: users partition into sticky variants; bp math is self-consistent") {
    val e = graft.Tables.events(spark, "/root/testdata/sf0.001")
    e.createOrReplaceTempView("events")
    val r = spark.sql(Sampling.abLiftSql(SparkSql)).collect().head
    val (aU, aC, aBp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (bU, bC, bBp) = (r.getLong(3), r.getLong(4), r.getLong(5))
    assert(aU + bU == e.select("user_id").distinct().count())
    assert(aC <= aU && bC <= bU)
    assert(aBp == 10000 * aC / aU && bBp == 10000 * bC / bU)
    val dir = r.getString(6)
    assert(dir == (if (bBp > aBp) "up" else if (bBp < aBp) "down" else "flat"))
    assert(r.getLong(7) == math.abs(bBp - aBp))
    assert(r.getLong(8) == 10000 * math.abs(bBp - aBp) / aBp)
    // stickiness: the variant of a user is a pure function of user_id —
    // rerunning on a shuffled relation yields the identical row
    e.repartition(7).createOrReplaceTempView("events")
    val r2 = spark.sql(Sampling.abLiftSql(SparkSql)).collect().head
    assert(r.toSeq == r2.toSeq)
  }

  private val SecNs = 1000000000L

  private def tev(rows: (Long, Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("user_id", "ts", "event_id", "event_type")
  }

  test("time-to-convert: first-view→first-purchase hours; pre-view purchases excluded") {
    // u1: view@0, purchase@90m → 1h bucket; u2: purchase@0, view@1h → excluded
    // u3: view@0, purchase@30m → 0h; u4: views only → excluded
    val got = Behavior.timeToConvertOn(tev(
      (1L, 0L, 1L, "view"), (1L, 5400L * SecNs, 2L, "purchase"),
      (2L, 0L, 3L, "purchase"), (2L, 3600L * SecNs, 4L, "view"),
      (3L, 0L, 5L, "view"), (3L, 1800L * SecNs, 6L, "purchase"),
      (4L, 0L, 7L, "view"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 1L), (1L, 1L)))
  }

  test("time-to-convert: converters + excluded partition the user base") {
    val e = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val hist = Behavior.timeToConvertOn(e).collect()
    val nConverted = hist.map(_.getLong(1)).sum
    assert(nConverted > 0L)
    assert(nConverted <= e.select("user_id").distinct().count())
  }

  test("bot cadence: a metronomic user has MAD 0; a bursty one does not") {
    // bot: events every 60s exactly (gaps 60,60,60,60 → med 60, mad 0)
    val bot = (0 to 4).map(i => (1L, i * 60L * SecNs, 10L + i, "view"))
    // human: gaps 10s, 600s, 60s, 3000s → sorted 10,60,600,3000:
    // med (lower) = 60; devs |10-60|=50,0,540,2940 → sorted 0,50,540,2940 → mad 50
    val times = Seq(0L, 10L, 610L, 670L, 3670L)
    val human = times.zipWithIndex.map { case (t, i) =>
      (2L, t * SecNs, 20L + i, "view") }
    val got = Behavior.cadenceOn(tev(bot ++ human: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(got == Seq(
      (1L, 4L, 60L, 0L, true),
      (2L, 4L, 60L, 50L, false)))
  }

  test("bot cadence: single-event users emit no row; corpus medians positive") {
    val lone = Behavior.cadenceOn(tev((9L, 0L, 1L, "view"))).collect()
    assert(lone.isEmpty)
    val got = Behavior.cadenceOn(
      graft.Tables.events(spark, "/root/testdata/sf0.001")).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(3) >= 0L)
      assert(r.getLong(3) <= r.getLong(2) * 1000,
        "MAD wildly exceeding the median would mean a rank bug")
    }
  }

  test("lifecycle: all four purchase-recency segments on a planted corpus") {
    // ref day = 10 (u5's non-purchase view); recency window [9, 10]
    // u1: buys day 9 only → new; u2: buys day 0 and day 10 → active
    // u3: buys day 0 only → lapsed; u4: views only → never
    val got = TimeSeries.lifecycleOn(tev(
      (1L, 9 * DayNs, 1L, "purchase"),
      (2L, 0L, 2L, "purchase"), (2L, 10 * DayNs, 3L, "purchase"),
      (3L, 0L, 4L, "purchase"),
      (4L, 5 * DayNs, 5L, "view"),
      (5L, 10 * DayNs, 6L, "view"))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      ("active", 1L, 2L, 2000L),
      ("lapsed", 1L, 1L, 2000L),
      ("never", 2L, 0L, 4000L),
      ("new", 1L, 1L, 2000L)))
  }

  test("lifecycle: non-vacuous split at the oracle scale") {
    val got = TimeSeries.lifecycleOn(
      graft.Tables.events(spark, "/root/testdata/sf0.01")).collect()
    assert(got.length >= 2, "the catalog row must split users non-trivially")
    assert(got.map(_.getLong(1)).sum == 150L)
  }

  test("bounce rate: single-event sessions per start day; midnight spans count once") {
    // u1 day0: lone event (bounce); u2: 2-event session starting day0
    // 23:59 crossing into day1 (NOT a bounce, counted on day0);
    // u3 day1: lone event (bounce)
    val got = Sessionize.bounceOn(tev(
      (1L, 0L, 1L, "view"),
      (2L, DayNs - 60L * SecNs, 2L, "view"), (2L, DayNs + 60L * SecNs, 3L, "view"),
      (3L, DayNs + 5000L * SecNs, 4L, "view"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((0L, 2L, 1L, 5000L), (1L, 1L, 1L, 10000L)))
  }

  test("fulfillment sla: hand percentiles — crossing picks the right day") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-${day + 1}%02d 00:00:00")
    // one priority, 10 orders with latencies 0..9 days:
    // p50 = smallest v with cum >= (10+1) DIV 2 = 5 → day 4
    // p90 = smallest v with cum >= (90+9) DIV 10 = 9 → day 8
    val orders = (0 until 10).map(i => (i.toLong, "1-URGENT", ts(0)))
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val li = (0 until 10).map(i => (i.toLong, ts(i)))
      .toDF("l_orderkey", "l_shipdate")
    val got = Fulfillment.slaOn(orders, li).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(("1-URGENT", 10L, 4L, 8L, 9L)))
  }

  test("fulfillment sla: last shipment governs; percentile order holds on the corpus") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-${day + 1}%02d 00:00:00")
    // an order with lines shipping day 1 and day 7 has latency 7
    val orders = Seq((1L, "2-HIGH", ts(0))).toDF(
      "o_orderkey", "o_orderpriority", "o_orderdate")
    val li = Seq((1L, ts(1)), (1L, ts(7))).toDF("l_orderkey", "l_shipdate")
    val one = Fulfillment.slaOn(orders, li).collect().head
    assert((one.getLong(2), one.getLong(3), one.getLong(4)) == ((7L, 7L, 7L)))
    val corpus = Fulfillment.slaOn(
      graft.Tables.orders(spark, "/root/testdata/sf0.001"),
      graft.Tables.lineitem(spark, "/root/testdata/sf0.001")).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4),
        "p50 <= p90 <= max must hold")
    }
  }

  test("rfm: hand quartiles — 4 customers split one per quartile on every axis") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-${day + 1}%02d 00:00:00")
    // c1: 4 orders, newest (day 9), biggest → 444; c2: 3 orders day 6 → 333
    // c3: 2 orders day 3 → 222; c4: 1 order day 0 → 111
    val rows =
      (1 to 4).map(i => (1L, ts(9), 100.0 * i)) ++
        (1 to 3).map(i => (2L, ts(6), 50.0 * i)) ++
        (1 to 2).map(i => (3L, ts(3), 20.0 * i)) ++
        Seq((4L, ts(0), 10.0))
    val o = rows.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = Deciles.rfmOn(o).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((111L, 1L), (222L, 1L), (333L, 1L), (444L, 1L)))
  }

  test("rfm: codes partition customers; scores stay in 1..4 on the corpus") {
    val o = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val got = Deciles.rfmOn(o).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.map(_._2).sum == o.select("o_custkey").distinct().count())
    got.foreach { case (code, _) =>
      val (r, f, m) = (code / 100, (code / 10) % 10, code % 10)
      assert(r >= 1 && r <= 4 && f >= 1 && f <= 4 && m >= 1 && m <= 4, code)
    }
  }

  test("kcore: iterative peel — a chain needs two rounds, one degree filter lies") {
    import spark.implicits._
    // K4 {1,2,3,4} + 5–6 tail: deg(5)=3 via (6,1,2), deg(6)=2 via (5,3).
    // Round 1 peels 6 (deg 2); only THEN 5 drops to deg 2 and peels in
    // round 2 — a single degree>=3 filter would wrongly keep 5.
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 6L), (1L, 5L), (2L, 5L), (3L, 6L))
      .toDF("u", "v")
    val got = Graph.kcore(pairs, 3, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("kcore: a clique survives whole; a triangle has no 3-core") {
    import spark.implicits._
    val k5 = (for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b))
      .toDF("u", "v")
    val got = Graph.kcore(k5, 3, 4).collect()
    assert(got.length == 5 && got.forall(_.getLong(1) == 4L))
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    assert(Graph.kcore(tri, 3, 4).collect().isEmpty)
  }

  test("kcore: the co-purchase catalog query converges within its peel budget") {
    import spark.implicits._
    val b = MarketBasket.cappedBasket(
      graft.Tables.lineitem(spark, "/root/testdata/sf0.01"))
    val pairs = MarketBasket.supportPairs(b).localCheckpoint()
    val atBudget = Graph.kcore(pairs, MarketBasket.CoreK, MarketBasket.CorePeels)
    val onePast = Graph.kcore(pairs, MarketBasket.CoreK, MarketBasket.CorePeels + 1)
    val a = atBudget.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a.nonEmpty, "the 3-core must be non-vacuous at oracle scale")
    assert(a == onePast.collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      "peel budget must reach the fixpoint on the oracle corpus")
  }

  private def vev(rows: (Long, Long, Long, Double)*) = {
    import spark.implicits._
    rows.toDF("user_id", "ts", "event_id", "value")
  }

  test("twap: holding durations weight the step function; plain mean would differ") {
    // u1: value 1.00 held 9 s, then 3.00 held 1 s, then a terminal obs.
    // TWAP = (100·9e6 + 300·1e6) / 10e6 = 120 cents; plain mean = 200.
    val got = TimeSeries.twapOn(vev(
      (1L, 0L, 1L, 1.0),
      (1L, 9L * SecNs, 2L, 3.0),
      (1L, 10L * SecNs, 3L, 9.99))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 2L, 10000000L, 120L)))
  }

  test("twap: single-observation users emit no row; corpus twap within value bounds") {
    assert(TimeSeries.twapOn(vev((9L, 0L, 1L, 1.0))).collect().isEmpty)
    val e = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val maxCents = e.selectExpr("max(CAST(round(value * 100, 0) AS BIGINT))")
      .collect().head.getLong(0)
    val got = TimeSeries.twapOn(e).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(3) >= 0L && r.getLong(3) <= maxCents,
        "a weighted average can never leave the observed value range")
      assert(r.getLong(2) > 0L)
    }
  }

  private def pkts(rows: (String, String, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("src_ip", "dst_ip", "dst_port", "ts_us")
  }

  test("port scan: endpoint fan-out per day, duplicates collapse, days don't combine") {
    val day = 86400L * 1000000
    // scanner: 4 distinct endpoints on day 0 (one endpoint repeated);
    // slow scanner: 2+2 endpoints split across two days → never flagged
    val got = Detection.portScanOn(pkts(
      ("10.0.0.1", "10.9.9.1", 80L, 0L), ("10.0.0.1", "10.9.9.1", 443L, 1L),
      ("10.0.0.1", "10.9.9.2", 80L, 2L), ("10.0.0.1", "10.9.9.3", 80L, 3L),
      ("10.0.0.1", "10.9.9.1", 80L, 4L), // dup endpoint
      ("10.0.0.2", "10.9.9.1", 80L, 0L), ("10.0.0.2", "10.9.9.1", 443L, 1L),
      ("10.0.0.2", "10.9.9.2", 80L, day), ("10.0.0.2", "10.9.9.3", 80L, day + 1))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(("10.0.0.1", 0L, 4L, 5L)))
  }

  test("seasonal anomaly: judged against the SAME hour-of-day; min-history guard") {
    import spark.implicits._
    // prefix 10.0, hour-of-day 3: days 0..5 have 10 packets, day 6 has
    // 100 → 100·6 > 3·60 → alert. Hour-of-day 7 has only 3 days of
    // history (< 5 others) → its identical spike stays silent.
    val rows =
      (0 to 6).map(d => ("10.0", d * 24L + 3L, if (d == 6) 100L else 10L)) ++
        (0 to 3).map(d => ("10.0", d * 24L + 7L, if (d == 3) 100L else 10L))
    val ph = rows.toDF("pfx", "h", "cnt")
    val got = Ewma.seasonalFromCounts(ph).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(("10.0", 6L, 3L, 100L, 60L, 6L)))
  }

  test("seasonal anomaly: non-vacuous at the oracle scale") {
    val ph = Ewma.prefixHourCounts(graft.flow.BatchFlowFeaturizer.packetsFromEvents(
      graft.Tables.events(spark, "/root/testdata/sf0.01")))
    val got = Ewma.seasonalFromCounts(ph).collect()
    assert(got.nonEmpty)
  }

  test("seasonal anomaly: alerts are antitone in the threshold ratio") {
    // 3/2 < 8/5 < 2/1 < 3/1 — nesting plus catalog-cut non-vacuity on
    // the driver corpus (the r12 3/1 cut was sf0.1/sf1-vacuous)
    val ph = Ewma.prefixHourCounts(graft.flow.BatchFlowFeaturizer.packetsFromEvents(
      graft.Tables.events(spark, "/root/testdata/sf0.001"))).cache()
    def keys(num: Long, den: Long): Set[(String, Long, Long)] =
      Ewma.seasonalFromCounts(ph, num, den).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val Seq(loose, catalog, two, three) =
      Seq((3L, 2L), (8L, 5L), (2L, 1L), (3L, 1L)).map((keys _).tupled)
    assert(three.subsetOf(two) && two.subsetOf(catalog) && catalog.subsetOf(loose))
    assert(catalog.nonEmpty)
    ph.unpersist()
  }

  private def ord(rows: (Long, Double)*) = {
    import spark.implicits._
    rows.toDF("o_custkey", "o_totalprice")
  }

  test("deciles: 10 distinct spends → one customer per decile, exact bounds") {
    val rows = (1L to 10L).map(c => (c, c * 10.0)) // cents 1000..10000
    val got = Deciles.decilesOn(ord(rows: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got.map(_._1) == (0L to 9L))
    assert(got.map(_._2).forall(_ == 1L))
    assert(got.map(_._3) == (1L to 10L).map(_ * 1000L))
    assert(got.map(_._4) == got.map(_._3)) // min == max, one customer each
  }

  test("deciles: ties split deterministically by custkey; sizes differ by <= 1") {
    // 23 customers, all the same spend → deciles sized 3/2 by rank formula
    val rows = (1L to 23L).map(c => (c, 5.0))
    val got = Deciles.decilesOn(ord(rows: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.map(_._2).sum == 23L)
    assert(got.map(_._2).max - got.map(_._2).min <= 1L)
    // orders aggregate per customer first: two orders = one customer
    val dup = Deciles.decilesOn(ord((1L, 5.0), (1L, 5.0), (2L, 5.0))).collect()
    assert(dup.map(_.getLong(1)).sum == 2L)
  }

  test("concentration: hand CR-k with deterministic ties") {
    // spends: c1=100.00, c2=100.00, c3=50.00, c4=50.00 → total 300.00
    // top1 = c1 (tie → lower key) 10000*10000/30000 = 3333
    // top10/top100 = everyone (n_top clamps to 4) → 10000
    val got = Deciles.concentrationOn(ord(
      (1L, 100.0), (2L, 100.0), (3L, 50.0), (4L, 50.0))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, 1L, 10000L, 30000L, 3333L),
      (10L, 4L, 30000L, 30000L, 10000L),
      (100L, 4L, 30000L, 30000L, 10000L)))
  }

  test("concentration: shares are monotone in k on the driver corpus") {
    val got = Deciles.concentrationOn(
      graft.Tables.orders(spark, "/root/testdata/sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toSeq
    assert(got.map(_._1) == Seq(1L, 10L, 100L))
    assert(got.map(_._2) == got.map(_._2).sorted, "CR-k monotone in k")
    assert(got.head._2 > 0L)
  }

  test("deciles: revenue shares are monotone and sum within floor slack") {
    val got = Deciles.decilesOn(
      graft.Tables.orders(spark, "/root/testdata/sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5))).toSeq
    assert(got.map(_._1) == (0L to 9L))
    // equi-depth by spend: decile 9 must out-earn decile 0
    assert(got.last._2 > got.head._2)
    val s = got.map(_._3).sum
    assert(s <= 10000L && s > 10000L - 10)
  }

  private val HourUs = 3600L * 1000000L

  private def pk(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("src_ip", "ts_us")
  }

  /** n packets for prefix 10.0 in hour h. */
  private def burst(h: Long, n: Int): Seq[(String, Long)] =
    (1 to n).map(i => ("10.0.0.1", h * HourUs + i))

  test("ewma: hand baseline — a burst after 3 quiet hours alerts at the exact cut") {
    // hours 0,1,2: 10 packets each. Baseline for hour 3 (K=10):
    // 10·2^9 + 10·2^8 + 10·2^7 = 10·(512+256+128) = 8960; n_hist=3.
    // alert iff cnt·1023·4 > 7·8960 = 62720 → cnt > 15.33 → cnt ≥ 16.
    val quiet = burst(0, 10) ++ burst(1, 10) ++ burst(2, 10)
    val hot = Ewma.ewmaAlertsOn(pk(quiet ++ burst(3, 16): _*)).collect()
    assert(hot.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq ==
      Seq(("10.0", 3L, 16L, 8960L, 3L)))
    val mild = Ewma.ewmaAlertsOn(pk(quiet ++ burst(3, 15): _*)).collect()
    assert(mild.isEmpty, "cnt=15 sits just under the 7/4 cut")
  }

  test("ewma: alerts are antitone in the threshold ratio (monotonicity law)") {
    // strictly ordered ratios 3/2 < 7/4 < 2/1 < 4/1: each tighter cut's
    // alert set must nest inside the looser one's, and the catalog 7/4
    // must be non-vacuous where the r12 4/1 cut was already vacuous —
    // the exact inversion that motivated the re-threshold
    val ph = Ewma.prefixHourCounts(graft.flow.BatchFlowFeaturizer.packetsFromEvents(
      graft.Tables.events(spark, "/root/testdata/sf0.001"))).cache()
    def keys(num: Long, den: Long): Set[(String, Long)] =
      Ewma.alertsFromCounts(ph, num, den).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    val Seq(loose, catalog, two, four) =
      Seq((3L, 2L), (7L, 4L), (2L, 1L), (4L, 1L)).map((keys _).tupled)
    assert(four.subsetOf(two) && two.subsetOf(catalog) && catalog.subsetOf(loose))
    assert(catalog.nonEmpty)
    ph.unpersist()
  }

  test("ewma: warmup — fewer than MinHist active prior hours never alerts") {
    // 2 quiet hours then a huge burst: n_hist=2 < 3 → no alert
    val got = Ewma.ewmaAlertsOn(
      pk(burst(0, 1) ++ burst(1, 1) ++ burst(2, 500): _*)).collect()
    assert(got.isEmpty)
  }

  test("ewma: recency dominates — old traffic decays out of the baseline") {
    // identical total history, but placed 8-10 hours back vs 1-3 back:
    // the distant history's weights (2^0..2^2) make a far smaller
    // baseline, so the same current count (15 < the 16-packet cut over
    // a recent-history baseline of 8960) alerts only in the distant case
    val cur = burst(11, 15)
    val recent = burst(8, 10) ++ burst(9, 10) ++ burst(10, 10)
    val distant = burst(1, 10) ++ burst(2, 10) ++ burst(3, 10)
    val alertRecent = Ewma.ewmaAlertsOn(pk(recent ++ cur: _*)).collect()
    val alertDistant = Ewma.ewmaAlertsOn(pk(distant ++ cur: _*)).collect()
    assert(alertRecent.isEmpty, "recent history baselines the burst away")
    assert(alertDistant.nonEmpty, "decayed history cannot explain the burst")
  }

  test("ewma: non-vacuous at the oracle scale") {
    val got = Ewma.ewmaAlertsOn(graft.flow.BatchFlowFeaturizer.packetsFromEvents(
      graft.Tables.events(spark, "/root/testdata/sf0.01"))).collect()
    assert(got.length > 0, "sf0.01 must emit alert rows through the oracle")
  }

  private def baskets(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("l_orderkey", "l_partkey")
  }

  test("co-occurrence: hand affinity matrix with exact jaccard bp") {
    // orders: 1:[A=10,B=20,C=30], 2:[A,B], 3:[A,C], 4:[B]
    // pairs: (A,B)=2, (A,C)=2, (B,C)=1; freq A=3 B=3 C=2
    val got = MarketBasket.cooccurrenceOn(baskets(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 30L),
      (4L, 20L))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(
      // A: B first (tie on n_ab=2, lower id), j(A,B)=20000/(3+3-2)=5000;
      //    C second, j(A,C)=20000/(3+2-2)=6666
      (10L, 1L, 20L, 2L, 5000L), (10L, 2L, 30L, 2L, 6666L),
      // B: A (n=2, j=5000) then C (n=1, 10000/(3+2-1)=2500)
      (20L, 1L, 10L, 2L, 5000L), (20L, 2L, 30L, 1L, 2500L),
      // C: A (n=2, j=6666) then B (n=1, j=2500)
      (30L, 1L, 10L, 2L, 6666L), (30L, 2L, 20L, 1L, 2500L)))
  }

  test("co-occurrence: oversized baskets are dropped whole; dup lines don't inflate") {
    // order 9 has MaxBasket+1 parts → contributes zero pairs AND zero freq
    val big = (1L to (MarketBasket.MaxBasket + 1L)).map(p => (9L, 100L + p))
    val rows = Seq((1L, 10L), (1L, 20L), (1L, 10L)) ++ big
    val got = MarketBasket.cooccurrenceOn(baskets(rows: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    // only the (10,20) pair from order 1 survives; dup (1,10) line ignored
    assert(got == Seq((10L, 20L, 1L, 10000L), (20L, 10L, 1L, 10000L)))
  }

  test("profile: planted nulls, distincts, and the scrub sentinel are exact") {
    import spark.implicits._
    // 4 rows: one 'error' (→ null after scrub), duplicate user values
    val e = Seq(
      (1L, 100L, 7L, "view", 0.50),
      (2L, 200L, 7L, "error", 0.50),
      (3L, 300L, 8L, "click", 1.25),
      (4L, 400L, 8L, "error", 0.999)) // cents 100 (round-half-even in both engines? 99.9 → 100)
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Profiling.profileOn(e).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(
      ("event_id", 4L, 0L, 4L, 0L),
      ("event_type_scrubbed", 4L, 2L, 2L, 5000L),
      ("ts", 4L, 0L, 4L, 0L),
      ("user_id", 4L, 0L, 2L, 0L),
      ("value_cents", 4L, 0L, 3L, 0L))) // 50, 50, 125, 100 → 3 distinct
  }

  test("profile: driver corpus is null-free except the scrub column") {
    val got = Profiling.profileOn(
      graft.Tables.events(spark, "/root/testdata/sf0.001")).collect()
    val byCol = got.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byCol("event_type_scrubbed") > 0L,
      "the scrub sentinel must be non-vacuous on the driver corpus")
    assert(byCol.filterNot(_._1 == "event_type_scrubbed").values.forall(_ == 0L))
  }

  test("basket rules: confidence is asymmetric; lift verdict is cross-multiplied") {
    // baskets: {A,B} ×2, {A} ×2, {B} — A→B: conf 2/4=5000bp; B→A: 2/3=6666bp
    // lift: n_ab·n_baskets = 2·5 = 10 > n_a·n_b = 4·3 = 12? NO → not lifted
    val rows = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 10L), (4L, 10L), (5L, 20L))
    val got = MarketBasket.rulesOnBasket(baskets(rows: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toSeq
    assert(got == Seq(
      (10L, 20L, 2L, 4L, 4000L, 5000L, false),
      (20L, 10L, 2L, 3L, 4000L, 6666L, false)))
    // make the pair genuinely lifted: drop the lone-A/lone-B baskets
    val lift = MarketBasket.rulesOnBasket(
      baskets((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (3L, 30L))).collect()
    assert(lift.forall(_.getBoolean(6)), "2·3 > 2·2 must report lifted")
  }

  test("co-occurrence: top-K bounds neighbors per part on the driver corpus") {
    val got = MarketBasket.cooccurrenceOn(
      graft.Tables.lineitem(spark, "/root/testdata/sf0.001")).collect()
    assert(got.nonEmpty)
    val perPart = got.groupBy(_.getLong(0)).values.map(_.length)
    assert(perPart.max <= MarketBasket.TopK)
    got.foreach(r => assert(r.getLong(4) >= 0L && r.getLong(4) <= 10000L))
  }
}
