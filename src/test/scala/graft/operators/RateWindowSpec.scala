package graft.operators

import graft.flow.PacketRow
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class RateWindowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def pkt(id: Long, tsUs: Long, src: String, len: Long) =
    PacketRow(id, tsUs, 17, len, src, "10.9.9.9", 1, 2, 0, len - 48,
      0, 0, 0, 0, 0, 0, 0, 0)

  test("event-time window + watermark emits closed windows once") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[PacketRow]
    val q = RateWindow.streamingRates(input.toDS(), watermark = "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("rates")
      .start()
    try {
      val m = 60L * 1000000
      // burst from one src in minute 0 (10 packets), one quiet src
      input.addData((0 until 10).map(i => pkt(i.toLong, i * 1000000, "10.0.0.1", 100)) :+
        pkt(99, 30 * 1000000, "10.0.0.2", 100): _*)
      q.processAllAvailable()
      // advance the watermark far past minute 0 to close its windows
      input.addData(pkt(100, 10 * m, "10.0.0.3", 100))
      q.processAllAvailable()
      val rows = spark.table("rates").collect()
      val byKey = rows.map(r => (r.getString(0),
        r.getAs[java.sql.Timestamp]("window_start").getTime) -> r).toMap
      val burst = byKey(("10.0.0.1", 0L))
      assert(burst.getAs[Long]("n_packets") == 10)
      assert(burst.getAs[Boolean]("alert"))
      val quiet = byKey(("10.0.0.2", 0L))
      assert(quiet.getAs[Long]("n_packets") == 1)
      assert(!quiet.getAs[Boolean]("alert"))
      // the minute-10 window is still open (watermark has not passed it)
      assert(!byKey.contains(("10.0.0.3", 600000L)))
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[PacketRow]
    val q = RateWindow.streamingRates(input.toDS(), watermark = "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("rates_late")
      .start()
    try {
      val m = 60L * 1000000
      input.addData(pkt(0, 0, "a", 100), pkt(1, 10 * m, "a", 100))
      q.processAllAvailable()
      // an hour-late packet for minute 0: dropped, not re-emitted
      input.addData(pkt(2, 1000, "a", 100))
      q.processAllAvailable()
      input.addData(pkt(3, 20 * m, "a", 100))
      q.processAllAvailable()
      val rows = spark.table("rates_late").collect()
        .filter(r => r.getAs[java.sql.Timestamp]("window_start").getTime == 0L)
      assert(rows.length == 1)
      assert(rows.head.getAs[Long]("n_packets") == 1) // late packet not counted
    } finally q.stop()
  }

  // ---- q_rate_anomaly: the catalog threshold must exercise real logic ----

  val dir = "/root/testdata/sf0.001"

  test("rate anomaly: catalog threshold is non-vacuous at the smallest SF") {
    // r11 watch item 1: at the old 2x cut the corpus' max window/mean
    // ratio (~1.96) emitted zero rows at every oracle scale, so the
    // green CORRECTNESS row proved only 0 = 0. The catalog 3/2 cut must
    // emit rows even at sf0.001 — and every emitted row must actually
    // satisfy the cross-multiplied threshold it claims to.
    val rows = RateWindow.rateAnomalyOn(spark, dir).collect()
    assert(rows.nonEmpty, "catalog threshold emits no rows: the oracle row is vacuous again")
    rows.foreach { r =>
      val (n, nw, tp) = (r.getAs[Long]("n_packets"),
        r.getAs[Long]("n_windows"), r.getAs[Long]("total_packets"))
      assert(n * nw * RateWindow.AnomalyDen > RateWindow.AnomalyNum * tp)
    }
  }

  test("rate anomaly: tightening the threshold only removes rows (monotone)") {
    def keys(num: Long, den: Long): Set[(String, Long)] =
      RateWindow.rateAnomalyOn(spark, dir, num, den).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    val loose = keys(9, 10)  // below-mean cut: nearly every window
    val mid = keys(RateWindow.AnomalyNum, RateWindow.AnomalyDen)
    val tight = keys(2, 1)   // the old vacuous cut
    assert(tight.subsetOf(mid) && mid.subsetOf(loose))
    assert(mid.nonEmpty && loose.size > mid.size,
      s"thresholds do not separate: loose=${loose.size} mid=${mid.size}")
  }
}
