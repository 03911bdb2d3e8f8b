package graft.operators
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = if (args.length > 1) args(1) else "raw"
    val spark = graft.GraftSession.getOrCreate()
    spark.range(1000000).selectExpr("sum(id)").collect()
    if (mode == "raw")
      StageViews.ensure(spark, "documents", dir)(graft.Tables.documents(spark, dir))
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stage] $name%-16s wall=${(System.nanoTime() - t0) / 1e9}%6.2f rows=$n")
    }
    t(s"simhash_$mode")(graft.SparkEntry.queries("q_dedup_simhash")(spark, dir).count())
    t(s"simhash_${mode}_2")(graft.SparkEntry.queries("q_dedup_simhash")(spark, dir).count())
    spark.stop()
  }
}
