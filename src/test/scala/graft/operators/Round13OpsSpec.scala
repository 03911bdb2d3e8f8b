package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 operator laws: the order-latency family over the shared
  * per-order `order_ship_v` stage — monthly trend arithmetic (exact
  * centiday means), the strictly-greater breach boundary, and corpus
  * non-vacuity for both new rollups.
  */
class Round13OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import java.sql.Timestamp
  private def ts(month: Int, day: Int) =
    Timestamp.valueOf(f"2024-$month%02d-$day%02d 00:00:00")

  private def orderShip(ordersRows: Seq[(Long, String, Timestamp)],
      liRows: Seq[(Long, Timestamp)]) = {
    import spark.implicits._
    Fulfillment.orderShipOn(
      ordersRows.toDF("o_orderkey", "o_orderpriority", "o_orderdate"),
      liRows.toDF("l_orderkey", "l_shipdate"))
  }

  test("order_ship: one row per shipped order; last line governs; month is the order's") {
    val os = orderShip(
      Seq((1L, "1-URGENT", ts(1, 30)), (2L, "2-HIGH", ts(2, 1)),
        (3L, "3-MEDIUM", ts(2, 10))), // order 3 never ships → absent
      Seq((1L, ts(2, 2)), (1L, ts(2, 5)), (2L, ts(2, 3))))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getDate(2).toString, r.getLong(3))).sortBy(_._1).toSeq
    assert(os == Seq(
      (1L, "1-URGENT", "2024-01-01", 6L), // Jan 30 → Feb 4... max(Feb2,Feb5)=Feb5 → 6 days
      (2L, "2-HIGH", "2024-02-01", 2L)))
  }

  test("latency trend: per-month exact sums and floor centiday means") {
    // Jan: latencies 3 and 4 → sum 7, avg_x100 = 700 DIV 2 = 350
    // Feb: latency 10 → avg_x100 = 1000
    val got = Fulfillment.latencyTrendFromOrderShip(orderShip(
      Seq((1L, "1-URGENT", ts(1, 1)), (2L, "1-URGENT", ts(1, 2)),
        (3L, "2-HIGH", ts(2, 1))),
      Seq((1L, ts(1, 4)), (2L, ts(1, 6)), (3L, ts(2, 11)))))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      ("2024-01-01", 2L, 7L, 4L, 350L),
      ("2024-02-01", 1L, 10L, 10L, 1000L)))
  }

  test("sla breach: boundary is strictly greater than BreachDays; floor basis points") {
    import spark.implicits._
    // hand-built per-order rows: 100 days exactly is ON TIME, 101 late;
    // bp = 10000·1 DIV 3 = 3333 (floor)
    val os = Seq(
      ("1-URGENT", 100L), ("1-URGENT", 101L), ("1-URGENT", 99L),
      ("2-HIGH", 5L))
      .toDF("priority", "days")
    val got = Fulfillment.breachFromOrderShip(os).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(("1-URGENT", 3L, 1L, 3333L), ("2-HIGH", 1L, 0L, 0L)))
  }

  private def ph(rows: (String, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("pfx", "h", "cnt")
  }

  test("pattern search: a planted exact ramp wins with distance zero") {
    // bounds rows pin the spine to [0, 30]; the ramp's nonzero tail is
    // planted at hours 14..21 so the window starting at 10 matches the
    // L=12 pattern exactly (leading zeros = absent hours)
    val planted = Ewma.Pattern.zipWithIndex.collect {
      case (q, k) if q > 0 => ("10.0", 10L + k, q)
    }
    val got = Ewma.patternMatchOn(ph(
      (("10.0", 0L, 1L) +: ("10.0", 30L, 1L) +: planted): _*)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.head == (("10.0", 10L, 0L)), s"ramp window must rank first: ${got.head}")
    assert(got.count(_._3 == 0L) == 1, "exactly one zero-distance window")
    // an all-quiet window's distance is exactly sum(q^2)
    val sumSq = Ewma.Pattern.map(q => q * q).sum
    assert(got.exists(_._3 == sumSq), "quiet windows sit at sum(q^2)")
  }

  test("pattern search: ties order by (dist2, pfx, start); edges are complete windows only") {
    // two prefixes with identical series -> identical distances, pfx tiebreak
    val rows = Seq("10.0", "10.1").flatMap(p =>
      Seq((p, 0L, 3L), (p, 15L, 3L)))
    val got = Ewma.patternMatchOn(ph(rows: _*), topK = 1000).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val l = Ewma.Pattern.length
    // spine [0,15] per prefix -> starts 0..(15-L+1) = 0..4, both prefixes
    assert(got.length == 2 * (15 - l + 2))
    assert(got.forall { case (_, s, _) => s >= 0 && s <= 15 - l + 1 })
    // global total order holds
    val key = got.map { case (p, s, d) => (d, p, s) }
    assert(key.sameElements(key.sorted))
    // equal-distance pairs appear 10.0 before 10.1
    got.groupBy(_._3).values.filter(_.length == 2).foreach { pair =>
      assert(pair.map(_._1).toSeq == Seq("10.0", "10.1"))
    }
  }

  test("pattern search: non-vacuous and sorted on the driver corpus") {
    val got = Ewma.qTsPatternMatch.run(spark, "/root/testdata/sf0.001").collect()
    assert(got.length == Ewma.PatternTopK)
    val d = got.map(_.getLong(2))
    assert(d.sameElements(d.sorted))
    StageViews.unpersistAll(spark)
  }

  test("latency family: non-vacuous on the driver corpus; invariants hold") {
    val dir = "/root/testdata/sf0.001"
    val os = Fulfillment.orderShipOn(
      graft.Tables.orders(spark, dir), graft.Tables.lineitem(spark, dir)).cache()
    val trend = Fulfillment.latencyTrendFromOrderShip(os).collect()
    assert(trend.nonEmpty)
    trend.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getLong(4) <= r.getLong(3) * 100L, "mean cannot exceed max")
    }
    val breach = Fulfillment.breachFromOrderShip(os).collect()
    assert(breach.nonEmpty)
    assert(breach.exists(_.getLong(2) > 0L),
      "BreachDays must be non-vacuous: some order ships past the promise")
    breach.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 10000L)
    }
    os.unpersist()
  }
}
