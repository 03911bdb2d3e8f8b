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
}
