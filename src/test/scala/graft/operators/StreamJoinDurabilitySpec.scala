package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Restart-from-checkpoint durability for the watermarked interval
  * join's buffered-rows state — the one stateful operator family whose
  * checkpoint recovery wasn't pinned (StateDurabilitySpec covers
  * flatMapGroupsWithState, TwsDurabilitySpec covers
  * transformWithState). Shape mirrors `q_stream_stream_join` /
  * `q_stream_stream_left_join`: both sides filtered from one file
  * stream, 10-minute watermarks, "errors within 2 hours after a
  * click". Two facts must survive a full query restart (fresh query
  * object, same checkpoint):
  *  1. BUFFERED ROWS: a click seen only in run 1 must match an error
  *     arriving in run 2 — and already-emitted matches must not
  *     re-emit (append mode exactly-once across restarts);
  *  2. WATERMARK + EXPIRY: the restored watermark must keep advancing
  *     so a never-matched click's left-outer NULL row emits in run 2
  *     once the global watermark passes its join horizon.
  */
class StreamJoinDurabilitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val T0 = 1700000000000000L // µs
  private val Min = 60L * 1000000

  /** rows: (user_id, event_id, event_type, ts_us) */
  private def writeBatch(dir: String, name: String,
      rows: Seq[(Long, Long, String, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("user_id", "event_id", "event_type", "ts_us")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/$name")
    val d = new java.io.File(s"$dir/$name")
    val part = d.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(s"$dir/$name.parquet").toPath)
    d.listFiles().foreach(_.delete()); d.delete()
  }

  private def runOnce(src: String, ckpt: String, outDir: String,
      joinType: String): Unit = {
    import spark.implicits._
    def side(tpe: String, p: String): DataFrame =
      spark.readStream
        .schema("user_id BIGINT, event_id BIGINT, event_type STRING, ts_us BIGINT")
        .parquet(src)
        .where($"event_type" === tpe)
        .select($"user_id".as(s"${p}_user"), $"event_id".as(s"${p}_id"),
          $"ts_us".as(s"${p}_ts_us"),
          timestamp_micros($"ts_us").as(s"${p}_time"))
        .withWatermark(s"${p}_time", "10 minutes")
    val q = side("click", "c")
      .join(side("error", "e"),
        expr("""c_user = e_user AND
                e_time >= c_time AND
                e_time <= c_time + INTERVAL 2 HOURS"""),
        joinType)
      .select($"c_user".as("user_id"), $"c_id".as("click_id"),
        $"e_id".as("error_id"))
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty)
          batch.write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$id")
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** (click_id, error_id-or-null) pairs emitted by one run. */
  private def readOut(outDir: String): Set[(Long, Option[Long])] = {
    val dirs = Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
    if (dirs.isEmpty) Set.empty
    else spark.read.parquet(dirs.map(_.getAbsolutePath).toIndexedSeq: _*)
      .collect()
      .map(r => r.getAs[Long]("click_id") ->
        (if (r.isNullAt(r.fieldIndex("error_id"))) None
         else Some(r.getAs[Long]("error_id")))).toSet
  }

  test("inner join: run-1 buffered clicks match run-2 errors; no re-emission") {
    val src = Files.createTempDirectory("ssj_src").toString
    val ckpt = Files.createTempDirectory("ssj_ckpt").toString
    val out1 = Files.createTempDirectory("ssj_out1").toString
    val out2 = Files.createTempDirectory("ssj_out2").toString
    // run 1: two clicks; one error matching click 1 within its 2 h range
    writeBatch(src, "b1", Seq(
      (1L, 1L, "click", T0),
      (2L, 2L, "click", T0),
      (1L, 10L, "error", T0 + 60 * Min)))
    runOnce(src, ckpt, out1, "inner")
    assert(readOut(out1) == Set(1L -> Some(10L)))
    // run 2, FRESH query, same checkpoint: errors for both users inside
    // the clicks' windows — click 2 never matched in run 1 and can only
    // match now if its buffered row survived the restart
    writeBatch(src, "b2", Seq(
      (1L, 11L, "error", T0 + 90 * Min),
      (2L, 12L, "error", T0 + 95 * Min)))
    runOnce(src, ckpt, out2, "inner")
    assert(readOut(out2) == Set(1L -> Some(11L), 2L -> Some(12L)),
      "run 2 must join against run-1 buffered state and must not replay run-1 matches")
  }

  test("left join: restored watermark advances and expires a run-1 click as a null row") {
    val src = Files.createTempDirectory("ssjl_src").toString
    val ckpt = Files.createTempDirectory("ssjl_ckpt").toString
    val out1 = Files.createTempDirectory("ssjl_out1").toString
    val out2 = Files.createTempDirectory("ssjl_out2").toString
    // run 1: click 3 (user 3) never gets an error; both sides get a
    // row so each side's watermark initializes
    writeBatch(src, "b1", Seq(
      (3L, 3L, "click", T0),
      (9L, 90L, "error", T0 + 30 * Min)))
    runOnce(src, ckpt, out1, "leftOuter")
    // horizon T0+2h not passed (watermark ≈ T0−10min) → nothing yet
    assert(readOut(out1).isEmpty)
    // run 2: advance BOTH sides' event time to T0+3h → global watermark
    // T0+170min > click 3's horizon T0+120min → its null row must emit.
    // The driver rows don't match each other (different users) and the
    // new click's own horizon is not passed, so it stays silent.
    writeBatch(src, "b2", Seq(
      (8L, 99L, "click", T0 + 180 * Min),
      (7L, 98L, "error", T0 + 180 * Min)))
    runOnce(src, ckpt, out2, "leftOuter")
    assert(readOut(out2) == Set(3L -> None),
      "the restarted query must expire run-1's unmatched click via the restored watermark")
  }
}
