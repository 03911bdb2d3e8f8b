package graft

/** Round-21 optimization-evidence dump: writes the FORMATTED physical
  * plan of each named catalog query to plans/r21/<query>_<tag>.txt
  * (tag = "before" / "after"), with shared stages built first so the
  * plan shown is the steady state the bench times.
  *
  * Usage: runMain graft.R21Explain <sfDir> <tag> <query> [query...]
  */
object R21Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: R21Explain <sfDir> <tag> <query> [query...]")
    val dir = args(0)
    val tag = args(1)
    val spark = GraftSession.getOrCreate()
    spark.range(1000000).selectExpr("sum(id)").collect()
    val outDir = java.nio.file.Paths.get("plans", "r21")
    java.nio.file.Files.createDirectories(outDir)
    for (name <- args.drop(2)) {
      val q = SparkEntry.queries(name)
      try {
        q(spark, dir).count() // build shared stages; warm the steady state
        GraftSession.dropStreamSinks(spark)
        val df = q(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val out = outDir.resolve(s"${name}_$tag.txt")
        java.nio.file.Files.writeString(out,
          s"$name — steady-state explain(formatted), $tag r21 ($dir, shared stages hot)\n\n$txt")
        println(s"[r21explain] $name -> $out")
      } catch {
        case e: Throwable => println(s"[r21explain] FAIL $name: ${e.getMessage}")
      }
      GraftSession.dropStreamSinks(spark)
    }
    operators.StageViews.unpersistAll(spark)
    spark.stop()
  }
}
