package graft

/** Repeated-run timing probe: runs each named catalog query three times
  * in one session, separating one-time costs (Janino codegen compile,
  * cached-view materialization) from steady-state execution — the
  * number that actually scales with data.
  *
  * Usage: runMain graft.Probe <sfDir> <query> [query...]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.range(1000000).selectExpr("sum(id)").collect() // session warmup
    for (n <- args.drop(1); i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      println(f"[probe] $n run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
