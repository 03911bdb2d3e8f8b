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
}
