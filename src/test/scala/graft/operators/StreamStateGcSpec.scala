package graft.operators

import graft.operators.HllStream.{DistinctSourcesProcessor, HsEmit, HsRow}
import graft.operators.MgStream.{MgEmit, MgRow, TopTalkersProcessor}
import graft.operators.QdStream.{QdEmit, QdRow, WindowQuantileProcessor}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Watermark-bounded state LIFETIME for the in-stream sketches
  * ([[MgStream]], [[QdStream]]): under `TimeMode.EventTime` each
  * (window, salt) group registers one close timer at window end; when
  * the watermark passes it the group's state is CLEARED, and late rows
  * for the closed window are dropped rather than resurrecting an empty
  * summary. This is the live-deployment bound — state is O(open
  * windows), not O(all windows ever) — and this spec proves it the
  * direct way: it reads the checkpoint's state store (the `statestore`
  * data source) and asserts the closed window's key is GONE while the
  * open window's key persists, across a query restart.
  *
  * Windows here are 1 s (`winMs = 1000`) so win w spans
  * [w·1000, (w+1)·1000) ms; watermark delay is 0 s, so a single batch
  * carrying windows 1 and 9 closes window 1 in the trailing no-data
  * batch (timer at 2000 ms ≤ watermark 9000 ms) and leaves window 9
  * open (timer at 10000 ms > 9000 ms).
  */
class StreamStateGcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val WinMs = 1000L

  private def writeMgBatch(dir: String, name: String,
      rows: Seq[(Long, Int, String, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("win", "salt", "k", "ts_ms")
      .withColumn("ts", timestamp_millis($"ts_ms")).drop("ts_ms")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/$name")
    promote(dir, name)
  }

  private def writeQdBatch(dir: String, name: String,
      rows: Seq[(Long, Int, Long, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("win", "salt", "v", "ts_ms")
      .withColumn("ts", timestamp_millis($"ts_ms")).drop("ts_ms")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/$name")
    promote(dir, name)
  }

  /** The file source sees one new file per run (the existing
    * MgStreamDurabilitySpec recipe). */
  private def promote(dir: String, name: String): Unit = {
    val d = new java.io.File(s"$dir/$name")
    val part = d.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(s"$dir/$name.parquet").toPath)
    d.listFiles().foreach(_.delete()); d.delete()
  }

  private def runMgOnce(src: String, ckpt: String, outDir: String): Unit = {
    import spark.implicits._
    val q = spark.readStream
      .schema("win BIGINT, salt INT, k STRING, ts TIMESTAMP")
      .parquet(src)
      .withWatermark("ts", "0 seconds")
      .select($"win", $"salt", $"k").as[MgRow]
      .groupByKey(r => (r.win, r.salt))
      .transformWithState(new TopTalkersProcessor(16, winMs = WinMs),
        TimeMode.EventTime(), OutputMode.Update(), Encoders.product[MgEmit])
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

  private def runQdOnce(src: String, ckpt: String, outDir: String): Unit = {
    import spark.implicits._
    val q = spark.readStream
      .schema("win BIGINT, salt INT, v BIGINT, ts TIMESTAMP")
      .parquet(src)
      .withWatermark("ts", "0 seconds")
      .select($"win", $"salt", $"v").as[QdRow]
      .groupByKey(r => (r.win, r.salt))
      .transformWithState(new WindowQuantileProcessor(64, winMs = WinMs),
        TimeMode.EventTime(), OutputMode.Update(), Encoders.product[QdEmit])
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

  /** Grouping-key `win` values present in the checkpoint's ValueState. */
  private def stateWins(ckpt: String, stateVar: String): Set[Long] =
    spark.read.format("statestore")
      .option("path", ckpt)
      .option("stateVarName", stateVar)
      .load()
      .select("key.*")
      .collect().map(_.getLong(0)).toSet

  private def emittedWins(outDir: String): Set[Long] = {
    val dirs = Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
    if (dirs.isEmpty) Set.empty
    else spark.read.parquet(dirs.map(_.getAbsolutePath).toIndexedSeq: _*)
      .select("win").collect().map(_.getLong(0)).toSet
  }

  test("MG: watermark closes a window, clears its state, drops late rows") {
    StatefulTotals.withRocksDb(spark) {
      val src = Files.createTempDirectory("gc_mg_src").toString
      val ckpt = Files.createTempDirectory("gc_mg_ckpt").toString
      val out1 = Files.createTempDirectory("gc_mg_out1").toString
      val out2 = Files.createTempDirectory("gc_mg_out2").toString
      // run 1: window 1 gets a×2, b×1; window 9 gets c×1 and pushes the
      // watermark to 9500 ms — past window 1's close (2000 ms), short of
      // window 9's (10000 ms)
      writeMgBatch(src, "b1", Seq(
        (1L, 0, "a", 1100L), (1L, 0, "a", 1200L), (1L, 0, "b", 1300L),
        (9L, 0, "c", 9500L)))
      runMgOnce(src, ckpt, out1)
      assert(emittedWins(out1) == Set(1L, 9L),
        "both windows emit from their data batch before any timer fires")
      val wins1 = stateWins(ckpt, "mg")
      assert(!wins1.contains(1L),
        s"window 1's state must be CLEARED once the watermark (9500 ms) " +
          s"passes its close timer (2000 ms); state store holds $wins1")
      assert(wins1.contains(9L),
        "window 9 is still open (close 10000 ms > watermark) — state persists")
      // run 2, fresh query, same checkpoint: a LATE row for window 1
      // (ts 1400 ms, far below the persisted watermark) must be dropped,
      // not resurrect a 1-count summary
      writeMgBatch(src, "b2", Seq((1L, 0, "a", 1400L)))
      runMgOnce(src, ckpt, out2)
      assert(emittedWins(out2) == Set.empty,
        "a late row for a closed window must emit nothing")
      assert(!stateWins(ckpt, "mg").contains(1L),
        "the late row must not re-create window 1 state")
    }
  }

  private def runHllOnce(src: String, ckpt: String, outDir: String): Unit = {
    import spark.implicits._
    val q = spark.readStream
      .schema("win BIGINT, salt INT, k STRING, ts TIMESTAMP")
      .parquet(src)
      .withWatermark("ts", "0 seconds")
      .select($"win", $"salt", $"k").as[HsRow]
      .groupByKey(r => (r.win, r.salt))
      .transformWithState(new DistinctSourcesProcessor(12, winMs = WinMs),
        TimeMode.EventTime(), OutputMode.Update(), Encoders.product[HsEmit])
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

  test("HLL: watermark closes a window, clears its state, drops late rows") {
    StatefulTotals.withRocksDb(spark) {
      val src = Files.createTempDirectory("gc_hs_src").toString
      val ckpt = Files.createTempDirectory("gc_hs_ckpt").toString
      val out1 = Files.createTempDirectory("gc_hs_out1").toString
      val out2 = Files.createTempDirectory("gc_hs_out2").toString
      writeMgBatch(src, "b1", Seq(
        (1L, 0, "a", 1100L), (1L, 0, "b", 1200L), (1L, 0, "a", 1300L),
        (9L, 0, "c", 9500L)))
      runHllOnce(src, ckpt, out1)
      assert(emittedWins(out1) == Set(1L, 9L))
      val wins1 = stateWins(ckpt, "hs")
      assert(!wins1.contains(1L),
        s"closed window 1 must be cleared; state store holds $wins1")
      assert(wins1.contains(9L), "open window 9 persists")
      writeMgBatch(src, "b2", Seq((1L, 0, "d", 1400L)))
      runHllOnce(src, ckpt, out2)
      assert(emittedWins(out2) == Set.empty,
        "a late row for a closed window must emit nothing")
      assert(!stateWins(ckpt, "hs").contains(1L))
    }
  }

  test("q-digest: watermark closes a window, clears its state, drops late rows") {
    StatefulTotals.withRocksDb(spark) {
      val src = Files.createTempDirectory("gc_qd_src").toString
      val ckpt = Files.createTempDirectory("gc_qd_ckpt").toString
      val out1 = Files.createTempDirectory("gc_qd_out1").toString
      val out2 = Files.createTempDirectory("gc_qd_out2").toString
      writeQdBatch(src, "b1", Seq(
        (1L, 0, 40L, 1100L), (1L, 0, 40L, 1200L), (1L, 0, 100L, 1300L),
        (9L, 0, 60L, 9500L)))
      runQdOnce(src, ckpt, out1)
      assert(emittedWins(out1) == Set(1L, 9L))
      val wins1 = stateWins(ckpt, "qd")
      assert(!wins1.contains(1L),
        s"closed window 1 must be cleared; state store holds $wins1")
      assert(wins1.contains(9L), "open window 9 persists")
      writeQdBatch(src, "b2", Seq((1L, 0, 40L, 1400L)))
      runQdOnce(src, ckpt, out2)
      assert(emittedWins(out2) == Set.empty,
        "a late row for a closed window must emit nothing")
      assert(!stateWins(ckpt, "qd").contains(1L))
    }
  }
}
