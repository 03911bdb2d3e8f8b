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
