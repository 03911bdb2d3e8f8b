package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.expr
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

case class FlowEvent(user: String, ts: Timestamp, bytes: Long)
case class ThreatAlert(auser: String, ats: Timestamp, severity: String)

/** Stream-stream inner join with event-time watermarks and a time-range
  * constraint — the last Structured Streaming join shape the engine
  * didn't exercise (the reference has no joins at all; SURVEY §2.5).
  *
  * Scale semantics proven here are the ones that matter on a cluster:
  * both sides are watermarked and the join predicate bounds event-time
  * distance, so each side's buffered state is GC-able — without the
  * range condition the state store would grow without bound.
  */
class StreamStreamJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def t(s: Long) = new Timestamp(1700000000000L + s * 1000)

  test("watermarked interval join matches only within ±5s and same user") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val flows = MemoryStream[FlowEvent]
    val alerts = MemoryStream[ThreatAlert]
    val joined = flows.toDF().withWatermark("ts", "10 seconds")
      .join(
        alerts.toDF().withWatermark("ats", "10 seconds"),
        expr("""user = auser AND
                ts BETWEEN ats - INTERVAL 5 SECONDS AND ats + INTERVAL 5 SECONDS"""))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj").start()
    try {
      flows.addData(
        FlowEvent("alice", t(0), 100),
        FlowEvent("alice", t(20), 200), // outside every alert's ±5s
        FlowEvent("bob", t(1), 300))
      alerts.addData(
        ThreatAlert("alice", t(3), "high"), // matches alice@t0 only
        ThreatAlert("carol", t(0), "low"))  // no carol flow
      q.processAllAvailable()
      val rows = spark.table("ssj")
        .select("user", "bytes", "severity").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      assert(rows == Set(("alice", 100L, "high")))
      // a second batch joins against buffered state from the first
      alerts.addData(ThreatAlert("bob", t(4), "med"))
      q.processAllAvailable()
      val rows2 = spark.table("ssj")
        .select("user", "bytes", "severity").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      assert(rows2 == Set(("alice", 100L, "high"), ("bob", 300L, "med")))
    } finally q.stop()
  }

  /** r11 ADVICE: the left-outer oracle emits a null row only when the
    * click's join horizon (c_ts + range) is STRICTLY below the final
    * watermark. This pins Spark's eviction behavior at the exact
    * boundary — a click whose horizon EQUALS the watermark microsecond
    * — so the oracle inequality is a tested fact, not an assumption
    * that happens to hash-match on the current corpus.
    */
  test("left-outer null row is withheld when horizon == watermark, emitted when passed") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // same shape as q_stream_stream_left_join: 10 min watermark, 2 h range
    val clicks = MemoryStream[FlowEvent]
    val errors = MemoryStream[ThreatAlert]
    val joined = clicks.toDF().withWatermark("ts", "10 minutes")
      .join(
        errors.toDF().toDF("auser", "ats", "severity").withWatermark("ats", "10 minutes"),
        expr("""user = auser AND
                ats >= ts AND ats <= ts + INTERVAL 2 HOURS"""),
        "leftOuter")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_boundary").start()
    def nullRowFor(user: String): Boolean = spark.table("ssj_boundary")
      .where(s"user = '$user' AND severity IS NULL").count() > 0
    try {
      val h = 3600L
      // the probe click: horizon = 0 + 2h = t(7200)
      clicks.addData(FlowEvent("probe", t(0), 1))
      // advance BOTH sides' max event time to t(7800): global watermark
      // = 7800 − 600 = t(7200), EXACTLY the probe's horizon
      clicks.addData(FlowEvent("adv", t(2 * h + 600), 1))
      errors.addData(ThreatAlert("zz", t(2 * h + 600), "x"))
      q.processAllAvailable()
      q.processAllAvailable() // no-data batch applies the advanced watermark
      val atEqual = nullRowFor("probe")
      // push the watermark one second past the horizon
      clicks.addData(FlowEvent("adv2", t(2 * h + 601), 1))
      errors.addData(ThreatAlert("zz2", t(2 * h + 601), "x"))
      q.processAllAvailable()
      q.processAllAvailable()
      val pastEqual = nullRowFor("probe")
      assert(pastEqual, "null row never emitted even after the watermark passed the horizon")
      // the oracle's strict `<`: no emission at exact equality
      assert(!atEqual,
        "Spark emitted the null row at horizon == watermark; the oracle's strict < is wrong")
    } finally q.stop()
  }
}
