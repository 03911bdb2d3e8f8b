package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class Vec(vec_id: Long, embedding: Array[Float])

/** Streaming IVF index maintenance (q_ann_ivf_stream): the
  * bounded-state contract. Assignment to the frozen coarse quantizer is
  * a stateless projection; the ONLY state is the per-list membership
  * aggregate — ≤ one row per centroid, regardless of how many vectors
  * ever stream through. The StreamingDedupSpec analogue for the ANN
  * family's freshness path.
  */
class StreamingAnnSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("per-list state stays bounded by the centroid count across micro-batches") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 3 frozen centroids along 3 axes; many more vectors than lists
    val cents = Seq(
      0L -> Array(1.0f, 0.0f, 0.0f),
      1L -> Array(0.0f, 1.0f, 0.0f),
      2L -> Array(0.0f, 0.0f, 1.0f))
    val input = MemoryStream[Vec]
    val counts = input.toDS().toDF()
      .withColumn("c1", Similarity.assignToFrozen(cents))
      .groupBy($"c1")
      .agg(count(lit(1)).as("n_members"),
        min($"vec_id").as("min_vec"), max($"vec_id").as("max_vec"),
        sum($"vec_id").as("sum_vec"))
    val q = counts.writeStream.outputMode("complete")
      .format("memory").queryName("ann_stream_counts").start()
    try {
      def vec(id: Long): Vec = {
        val axis = (id % 3).toInt
        val e = Array(0.1f, 0.1f, 0.1f); e(axis) = 5.0f
        Vec(id, e)
      }
      // two waves of arrivals — state must not grow with the second
      input.addData((0L until 30L).map(vec): _*)
      q.processAllAvailable()
      val state1 = q.lastProgress.stateOperators.head.numRowsTotal
      input.addData((30L until 90L).map(vec): _*)
      q.processAllAvailable()
      val state2 = q.lastProgress.stateOperators.head.numRowsTotal
      assert(state1 <= cents.size && state2 <= cents.size,
        s"per-list state must stay <= ${cents.size} rows, got $state1 then $state2")
      // the complete-mode table equals the batch groupBy over all data
      val got = spark.table("ann_stream_counts").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq.sortBy(_._1)
      val all = (0L until 90L).map(vec)
      val expected = all.groupBy(_.vec_id % 3).toSeq.map { case (c, vs) =>
        (c, vs.size.toLong, vs.map(_.vec_id).min, vs.map(_.vec_id).max,
          vs.map(_.vec_id).sum)
      }.sortBy(_._1)
      assert(got == expected, s"streamed table must equal batch fold: $got")
    } finally q.stop()
  }

  test("frozen centroids are index metadata: bounded size, sorted, level-1 seeds") {
    val cents = Similarity.frozenCentroids(spark, "/root/testdata/sf0.001")
    assert(cents.nonEmpty && cents.size <= 4096,
      s"level-1 quantizer must be broadcastable metadata, got ${cents.size}")
    assert(cents.map(_._1) == cents.map(_._1).sorted)
    // seeds are the first nl1 vectors by id — ids are exactly 0..nl1-1
    assert(cents.map(_._1) == (0L until cents.size.toLong),
      "frozen seeds must be the first nl1 vectors by vec_id")
    StageViews.unpersistAll(spark)
  }
}
