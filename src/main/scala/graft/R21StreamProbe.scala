package graft

/** r21 streaming-floor experiment: times representative streaming
  * catalog queries under conf variants, in ONE session, interleaved
  * A/B/A/B so machine drift cannot masquerade as a variant effect.
  *
  * Variants: baseline vs RocksDB changelog checkpointing (commit writes
  * a changelog instead of zipping a full snapshot per partition).
  * State-partition count is a separate axis driven by
  * SPARK_GRAFT_STREAM_PARTS across invocations.
  *
  * Usage: runMain graft.R21StreamProbe <sfDir> <query> [query...]
  */
object R21StreamProbe {
  private val Chg = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = GraftSession.getOrCreate()
    spark.range(1000000).selectExpr("sum(id)").collect()
    // streaming warmup: one-time RocksDB JNI / state-provider / codegen
    Seq("q_rate_window_stream", "q_tws_running_totals").foreach { w =>
      try SparkEntry.queries(w)(spark, dir).count()
      catch { case _: Throwable => () }
      GraftSession.dropStreamSinks(spark)
    }
    val parts = sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "8")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, dir).count(); GraftSession.dropStreamSinks(spark) // per-query warm
      for (rep <- 1 to 2; chg <- Seq(false, true)) {
        val t0 = System.nanoTime()
        GraftSession.withConf(spark, Chg, chg.toString)(fn(spark, dir).count())
        GraftSession.dropStreamSinks(spark)
        println(f"[sprobe] $name parts=$parts chg=$chg rep$rep ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }
    spark.stop()
  }
}
