package graft.flow

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming state durability: the flow state (including the IAT seam
  * timestamps) must survive a query restart from checkpoint, and the
  * featurizer must behave identically on the RocksDB state store (the
  * 100 TB-scale provider) as on the default HDFS-backed one.
  */
class StateDurabilitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def pkt(id: Long, tsUs: Long, len: Long) =
    PacketRow(id, tsUs, 6, len, "1.1.1.1", "2.2.2.2", 10, 20,
      math.max(len - 60, 0), 0, 0, 0, 0, id % 2, 1, 0, 0, 0)

  private def writeBatch(dir: String, name: String, ps: Seq[PacketRow]): Unit = {
    import spark.implicits._
    ps.toDF().coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/$name")
    // file source watches one directory non-recursively: move part file up
    val d = new java.io.File(s"$dir/$name")
    val part = d.listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath, new java.io.File(s"$dir/$name.parquet").toPath)
    d.listFiles().foreach(_.delete()); d.delete()
  }

  private def runUntilStable(sourceDir: String, ckpt: String, outDir: String): Unit = {
    import spark.implicits._
    val packets = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[PacketRow]].schema)
      .parquet(sourceDir)
      .as[PacketRow]
    // memory sink cannot recover from a checkpoint; foreachBatch can
    val q = FlowFeaturizer.featurize(packets, timeoutMs = 0, emitOnUpdate = true)
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[FlowFeatures], id: Long) =>
        if (!batch.isEmpty)
          batch.toDF().write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$id")
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def readOut(outDir: String) = {
    val dirs = Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
    assert(dirs.nonEmpty, s"no batches written under $outDir")
    spark.read.parquet(dirs.map(_.getAbsolutePath).toIndexedSeq: _*).collect()
  }

  test("state (incl. IAT seam) survives restart from checkpoint; RocksDB matches") {
    for ((provider, tag) <- Seq(
        (None, "hdfs"),
        (Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"), "rocks"))) {
      provider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      val src = Files.createTempDirectory(s"dur_src_$tag").toString
      val ckpt = Files.createTempDirectory(s"dur_ckpt_$tag").toString
      val out1 = Files.createTempDirectory(s"dur_out1_$tag").toString
      val out2 = Files.createTempDirectory(s"dur_out2_$tag").toString
      // run 1: first half of the flow
      writeBatch(src, "b1", (0 until 5).map(i => pkt(i.toLong, i * 1000000L, 100)))
      runUntilStable(src, ckpt, out1)
      val r1 = readOut(out1)
      assert(r1.map(_.getAs[Long]("total_fwd_packets")).max == 5)
      // run 2 (fresh query, same checkpoint): second half, 1s gap
      writeBatch(src, "b2", (5 until 10).map(i => pkt(i.toLong, i * 1000000L, 200)))
      runUntilStable(src, ckpt, out2)
      val r2 = readOut(out2)
      assert(r2.length == 1)
      val f = r2.head
      // cumulative across the restart
      assert(f.getAs[Long]("total_fwd_packets") == 10)
      assert(f.getAs[Long]("total_length_of_fwd_packets") == 5 * 100 + 5 * 200)
      // the IAT seam: diff between packet 4 (run 1) and packet 5 (run 2)
      // is 1s like all others -> 9 IATs of exactly 1s each
      assert(f.getAs[Long]("flow_iat_mean") == 1000000L)
      assert(f.getAs[Long]("flow_iat_max") == 1000000L)
      assert(f.getAs[Long]("fwd_iat_total") == 9000000L)
      assert(f.getAs[Long]("flow_bytes_s") == (1500.0 / 9.0).toLong)
    }
  }
}
