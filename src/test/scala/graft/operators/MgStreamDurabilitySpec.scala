package graft.operators

import graft.operators.MgStream.{MgEmit, MgRow, TopTalkersProcessor}
import org.apache.spark.sql.{Dataset, Encoders, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Restart durability for the streaming Misra–Gries state: a fresh
  * query over the SAME checkpoint must resume each (window, salt)
  * group's summary — counts continue across the restart (exact regime,
  * so continuation is observable as exact cumulative counts) — and
  * groups quiet in the second run must not re-emit (update mode).
  */
class MgStreamDurabilitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeBatch(dir: String, name: String,
      rows: Seq[(Long, Int, String)]): Unit = {
    import spark.implicits._
    rows.toDF("win", "salt", "k")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/$name")
    val d = new java.io.File(s"$dir/$name")
    val part = d.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(s"$dir/$name.parquet").toPath)
    d.listFiles().foreach(_.delete()); d.delete()
  }

  private def runOnce(src: String, ckpt: String, outDir: String,
      cap: Int): Unit = {
    import spark.implicits._
    val q = spark.readStream
      .schema("win BIGINT, salt INT, k STRING")
      .parquet(src)
      .as[MgRow]
      .groupByKey(r => (r.win, r.salt))
      .transformWithState(new TopTalkersProcessor(cap),
        TimeMode.None(), OutputMode.Update(), Encoders.product[MgEmit])
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (batch: Dataset[MgEmit], id: Long) =>
        if (!batch.isEmpty)
          batch.toDF().write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$id")
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def readOut(outDir: String): Map[(Long, Int, String), Long] = {
    val dirs = Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
    assert(dirs.nonEmpty, s"no batches written under $outDir")
    spark.read.parquet(dirs.map(_.getAbsolutePath).toIndexedSeq: _*).collect()
      .map(r => (r.getAs[Long]("win"), r.getAs[Int]("salt"), r.getAs[String]("k")) ->
        r.getAs[Long]("est")).toMap
  }

  private def writeQdBatch(dir: String, name: String,
      rows: Seq[(Long, Int, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("win", "salt", "v")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/$name")
    val d = new java.io.File(s"$dir/$name")
    val part = d.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(s"$dir/$name.parquet").toPath)
    d.listFiles().foreach(_.delete()); d.delete()
  }

  private def runQdOnce(src: String, ckpt: String, outDir: String,
      cap: Int): Unit = {
    import graft.operators.QdStream.{QdEmit, QdRow, WindowQuantileProcessor}
    import spark.implicits._
    val q = spark.readStream
      .schema("win BIGINT, salt INT, v BIGINT")
      .parquet(src)
      .as[QdRow]
      .groupByKey(r => (r.win, r.salt))
      .transformWithState(new WindowQuantileProcessor(cap),
        TimeMode.None(), OutputMode.Update(), Encoders.product[QdEmit])
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (batch: Dataset[QdEmit], id: Long) =>
        if (!batch.isEmpty)
          batch.toDF().write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$id")
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("q-digest ValueState resumes across a query restart from checkpoint") {
    StatefulTotals.withRocksDb(spark) {
      val src = Files.createTempDirectory("qd_src").toString
      val ckpt = Files.createTempDirectory("qd_ckpt").toString
      val out1 = Files.createTempDirectory("qd_out1").toString
      val out2 = Files.createTempDirectory("qd_out2").toString
      // run 1: window 1 sees 40×2 and 100×1 (exact regime, cap 64)
      writeQdBatch(src, "q1", Seq((1L, 0, 40L), (1L, 0, 40L), (1L, 0, 100L)))
      runQdOnce(src, ckpt, out1, cap = 64)
      val r1 = spark.read.parquet(s"$out1/batch=0").collect()
        .map(r => r.getAs[Long]("v") -> r.getAs[Long]("cnt")).toMap
      assert(r1 == Map(40L -> 2L, 100L -> 1L))
      // run 2, FRESH query, same checkpoint: two more 40s — the
      // histogram must continue from run-1 state (40 -> 4), not restart
      writeQdBatch(src, "q2", Seq((1L, 0, 40L), (1L, 0, 40L)))
      runQdOnce(src, ckpt, out2, cap = 64)
      val dirs2 = new java.io.File(out2).listFiles()
      val r2 = spark.read.parquet(dirs2.map(_.getAbsolutePath).toIndexedSeq: _*)
        .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("cnt")).toMap
      assert(r2 == Map(40L -> 4L, 100L -> 1L),
        "restart must resume the run-1 histogram, not restart counts")
    }
  }

  private def runHllOnce(src: String, ckpt: String, outDir: String): Unit = {
    import graft.operators.HllStream.{DistinctSourcesProcessor, HsEmit, HsRow}
    import spark.implicits._
    val q = spark.readStream
      .schema("win BIGINT, salt INT, k STRING")
      .parquet(src)
      .as[HsRow]
      .groupByKey(r => (r.win, r.salt))
      .transformWithState(new DistinctSourcesProcessor(12),
        TimeMode.None(), OutputMode.Update(), Encoders.product[HsEmit])
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (batch: Dataset[HsEmit], id: Long) =>
        if (!batch.isEmpty)
          batch.toDF().write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$id")
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def hllEstimates(outDir: String): Map[(Long, Int), Long] = {
    val dirs = Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
    assert(dirs.nonEmpty, s"no batches written under $outDir")
    spark.read.parquet(dirs.map(_.getAbsolutePath).toIndexedSeq: _*).collect()
      .map { r =>
        val est = org.apache.datasketches.hll.HllSketch
          .heapify(r.getAs[Array[Byte]]("sk")).getEstimate.round
        (r.getAs[Long]("win"), r.getAs[Int]("salt")) -> est
      }.toMap
  }

  test("HLL ValueState resumes across a query restart from checkpoint") {
    StatefulTotals.withRocksDb(spark) {
      val src = Files.createTempDirectory("hs_src").toString
      val ckpt = Files.createTempDirectory("hs_ckpt").toString
      val out1 = Files.createTempDirectory("hs_out1").toString
      val out2 = Files.createTempDirectory("hs_out2").toString
      // run 1: window 1 sees {a, b, a} — 2 distinct; window 2 sees {c}
      writeBatch(src, "h1", Seq(
        (1L, 0, "a"), (1L, 0, "b"), (1L, 0, "a"), (2L, 0, "c")))
      runHllOnce(src, ckpt, out1)
      val r1 = hllEstimates(out1)
      assert(r1((1L, 0)) == 2L && r1((2L, 0)) == 1L)
      // run 2, FRESH query, same checkpoint: window 1 gets a (already
      // seen — must NOT bump the count) and a new key d; window 2 quiet
      writeBatch(src, "h2", Seq((1L, 0, "a"), (1L, 0, "d")))
      runHllOnce(src, ckpt, out2)
      val r2 = hllEstimates(out2)
      assert(r2((1L, 0)) == 3L,
        "restart must resume the run-1 sketch: {a,b}+{a,d} = 3 distinct, " +
          "not 2 (restarted sketch would count only {a,d})")
      assert(!r2.contains((2L, 0)),
        "window 2 was quiet in run 2 and must not re-emit")
    }
  }

  test("MG ValueState resumes across a query restart from checkpoint") {
    StatefulTotals.withRocksDb(spark) {
      val src = Files.createTempDirectory("mg_src").toString
      val ckpt = Files.createTempDirectory("mg_ckpt").toString
      val out1 = Files.createTempDirectory("mg_out1").toString
      val out2 = Files.createTempDirectory("mg_out2").toString
      // run 1: window 1 sees a×3, b×1; window 2 sees c×2
      writeBatch(src, "b1", Seq(
        (1L, 0, "a"), (1L, 0, "a"), (1L, 0, "a"), (1L, 0, "b"),
        (2L, 0, "c"), (2L, 0, "c")))
      runOnce(src, ckpt, out1, cap = 16)
      val r1 = readOut(out1)
      assert(r1((1L, 0, "a")) == 3L && r1((1L, 0, "b")) == 1L)
      assert(r1((2L, 0, "c")) == 2L)
      // run 2, FRESH query, same checkpoint: window 1 gets a×2 and a
      // new key d; window 2 is quiet
      writeBatch(src, "b2", Seq(
        (1L, 0, "a"), (1L, 0, "a"), (1L, 0, "d")))
      runOnce(src, ckpt, out2, cap = 16)
      val r2 = readOut(out2)
      assert(r2((1L, 0, "a")) == 5L,
        "restart must resume run-1 summary, not restart counts")
      assert(r2((1L, 0, "b")) == 1L, "run-1 keys re-emit with the group")
      assert(r2((1L, 0, "d")) == 1L)
      assert(!r2.contains((2L, 0, "c")),
        "window 2 was quiet in run 2 and must not re-emit")
    }
  }
}
