package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class Doc(doc_id: Long, ts_us: Long, text: String)

/** Streaming deduplication for a document ingest pipeline:
  * `dropDuplicatesWithinWatermark` on the content hash — state bounded
  * by the watermark, exactly what a continuous training-data ingest
  * needs (batch exact-dedup is q_dedup_exact).
  */
class StreamingDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("duplicate documents are dropped across micro-batches") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Doc]
    val deduped = input.toDS()
      .withColumn("event_time", timestamp_micros($"ts_us"))
      .withColumn("text_hash", md5($"text"))
      .withWatermark("event_time", "10 minutes")
      .dropDuplicatesWithinWatermark("text_hash")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    try {
      val m = 60L * 1000000
      input.addData(Doc(0, 0, "alpha"), Doc(1, 1 * m, "beta"), Doc(2, 2 * m, "alpha"))
      q.processAllAvailable()
      // a later batch re-sends "alpha" within the watermark: dropped
      input.addData(Doc(3, 3 * m, "alpha"), Doc(4, 4 * m, "gamma"))
      q.processAllAvailable()
      val texts = spark.table("dedup_stream").collect().map(_.getAs[String]("text"))
      assert(texts.sorted.toSeq == Seq("alpha", "beta", "gamma"))
    } finally q.stop()
  }

  /** The bounded-state contract behind q_dedup_stream_windowed: a key
    * recurring PAST the watermark horizon is re-emitted (its state entry
    * was evicted), and the state store row count tracks the horizon, not
    * the all-time distinct-key count.
    */
  test("state is evicted past the watermark and a recurring key re-emits") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Doc]
    val deduped = input.toDS()
      .withColumn("event_time", timestamp_micros($"ts_us"))
      .withWatermark("event_time", "10 minutes")
      .dropDuplicatesWithinWatermark("text")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_windowed_stream").start()
    try {
      val m = 60L * 1000000
      // base offset keeps event times strictly ABOVE the initial
      // watermark (epoch 0): the late-record filter is strict, so a row
      // AT the watermark — e.g. t=0 against the initial 0 — is dropped
      // as late before it ever reaches the dedup state
      val b = 100L * m
      input.addData(Doc(0, b, "alpha"), Doc(1, b + 1 * m, "beta"))
      q.processAllAvailable()
      // jump event time 60 min ahead: watermark -> b+50 min, past
      // alpha's and beta's expiry (b+10/b+11 min); processAllAvailable
      // runs the no-data follow-up batch that commits the advanced
      // watermark and evicts both entries
      input.addData(Doc(2, b + 60 * m, "gamma"))
      q.processAllAvailable()
      input.addData(Doc(3, b + 62 * m, "delta"))
      q.processAllAvailable()
      // alpha recurs past the horizon: no state remembers it -> re-emitted
      input.addData(Doc(4, b + 63 * m, "alpha"))
      q.processAllAvailable()
      val texts = spark.table("dedup_windowed_stream")
        .collect().map(_.getAs[String]("text")).sorted.toSeq
      assert(texts == Seq("alpha", "alpha", "beta", "delta", "gamma"),
        s"expected alpha re-emitted after eviction, got $texts")
      // 5 arrivals / 4 distinct keys ever, but state holds only the
      // entries the watermark hasn't expired: gamma (expires b+70m),
      // delta (b+72m), re-admitted alpha (b+73m)
      val lastState = q.recentProgress.reverse
        .find(_.stateOperators.nonEmpty).get.stateOperators.head
      assert(lastState.numRowsTotal == 3,
        s"state should hold 3 unexpired keys, got ${lastState.numRowsTotal}")
    } finally q.stop()
  }
}
