package graft

/** r21 state-partition experiment: times streaming catalog queries with
  * the fixed pre-r21 partition count (8) vs the input-size-adaptive
  * rule ([[GraftSession.adaptiveStreamParts]]), in ONE session,
  * interleaved A/B/A/B so machine drift cannot masquerade as a variant
  * effect. The [[GraftSession.streamPartsOverride]] hook flips the
  * resolved count between runs without touching operator code.
  *
  * Note: stream-stream join queries are NOT meaningful here — their
  * pre-r21 constant was 2, which the adaptive rule reproduces locally
  * (storesPerPartition = 4), so both arms would be identical.
  *
  * Usage: runMain graft.R21PartsProbe <sfDir> <query> [query...]
  */
object R21PartsProbe {
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
    val adaptive = GraftSession.adaptiveStreamParts(spark, dir)
    System.err.println(s"[pprobe] adaptive parts for events = $adaptive")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      try {
        fn(spark, dir).count(); GraftSession.dropStreamSinks(spark) // per-query warm
        val variants: Seq[Option[Int]] =
          sys.env.get("SPARK_GRAFT_PPROBE_VARIANTS")
            .map(_.split(",").toSeq.map(v =>
              if (v == "adaptive") None else Some(v.toInt)))
            .getOrElse(Seq(Some(8), None))
        for (rep <- 1 to 2; fixed <- variants) {
          GraftSession.streamPartsOverride = fixed
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          GraftSession.dropStreamSinks(spark)
          val label = fixed.map(_.toString).getOrElse("adaptive")
          println(f"[pprobe] $name%-32s parts=$label%-8s rep$rep ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        }
      } finally GraftSession.streamPartsOverride = None
    }
    spark.stop()
  }
}
