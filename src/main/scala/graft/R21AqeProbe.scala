package graft

/** r21 systemic experiment: AQE partition-coalescing policy. Default
  * Spark keeps post-shuffle parallelism high (parallelismFirst=true,
  * minPartitionSize 1 MB); the guide-§2.2 production setting sizes
  * partitions by advisoryPartitionSizeInBytes instead. Interleaved
  * A/B per query in one session.
  *
  * Usage: runMain graft.R21AqeProbe <sfDir> <query> [query...]
  */
object R21AqeProbe {
  private val PF = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = GraftSession.getOrCreate()
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, dir).count(); GraftSession.dropStreamSinks(spark) // warm + stages
      for (rep <- 1 to 2; pf <- Seq("1m", "8m")) {
        val t0 = System.nanoTime()
        GraftSession.withConf(spark, PF, pf)(fn(spark, dir).count())
        GraftSession.dropStreamSinks(spark)
        println(f"[aqe] $name pf=$pf rep$rep ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }
    spark.stop()
  }
}
