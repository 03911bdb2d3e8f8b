package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Single-session full-catalog pressure probe at ~sf1 (r5 VERDICT #8).
  *
  * The driver ships sf0.001/0.01/0.1 only, so this probe synthesizes an
  * sf1-scale corpus under `target/sf1` by replicating sf0.1 `REPS`(=10)
  * times with key columns shifted per replica (offset = max(key)+1 of
  * the base, so replicas can never collide). Referential joins survive
  * because foreign keys shift by the SAME offset as their primary key;
  * the small dimension tables (region/nation/part/supplier) stay
  * unreplicated, exactly like a real 100 TB layout. Text/embedding
  * payloads are NOT perturbed — every document gains 10 exact copies,
  * which deliberately stress-tests the dedup family's frequency caps
  * and cluster solve rather than handing it an easy dup-free corpus.
  *
  * It then runs EVERY catalog query in one session (count() per query,
  * sorted name order) so cache/state pressure accumulates the way a
  * long-lived service's would, and prints a per-query + total summary.
  * This is a diagnostic main, not a driver contract: run it manually
  * via `SPARK_DRIVER_MEM=48g sbt "runMain graft.Sf1Probe"`.
  */
object Sf1Probe {

  private val Reps = 10

  /** Replicate `df` `Reps` times, shifting each key column by
    * replica × (max(key)+1 of the base).
    */
  private def replicate(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val base = df.cache()
    val offsets: Map[String, Long] = keyCols.map { c =>
      c -> (base.agg(max(col(c))).collect()(0).getAs[Number](0).longValue + 1L)
    }.toMap
    val parts = (0 until Reps).map { r =>
      keyCols.foldLeft(base) { (d, c) =>
        d.withColumn(c, col(c) + lit(r * offsets(c)))
      }
    }
    val out = parts.reduce(_ unionAll _)
    out
  }

  private def build(spark: SparkSession, src: String, out: String): Unit = {
    val plans: Seq[(String, Seq[String])] = Seq(
      "region" -> Nil, "nation" -> Nil, "part" -> Nil, "supplier" -> Nil,
      "customer" -> Seq("c_custkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    plans.foreach { case (t, keys) =>
      val in = spark.read.parquet(s"$src/$t.parquet")
      val rep = if (keys.isEmpty) in else replicate(in, keys)
      rep.write.mode("overwrite").parquet(s"$out/$t.parquet")
      spark.catalog.clearCache()
      println(s"[sf1] built $t (${if (keys.isEmpty) "dim, as-is" else s"x$Reps on ${keys.mkString(",")}"})")
    }
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "target/sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // events carries TIMESTAMP(NANOS) — readable only as nanos BIGINT
    // under the legacy flag (see Tables.events); the replica write-out
    // then stores plain BIGINT nanos, which every query already expects
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (!new java.io.File(s"$out/embeddings.parquet").exists()) build(spark, src, out)

    val results = SparkEntry.catalog.sortBy(_.name).map { q =>
      val t0 = System.nanoTime()
      val res =
        try Right(q.run(spark, out).count())
        catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
      val sec = (System.nanoTime() - t0) / 1e9
      res match {
        case Right(n) => println(f"[sf1] ${q.name}%-32s $sec%8.2f s  $n%10d rows")
        case Left(err) => println(f"[sf1] ${q.name}%-32s $sec%8.2f s  FAILED: $err")
      }
      (q.name, sec, res)
    }
    operators.StageViews.unpersistAll(spark)
    val total = results.map(_._2).sum
    val failed = results.collect { case (n, _, Left(e)) => s"$n ($e)" }
    println(f"[sf1] TOTAL ${results.size} queries in $total%.1f s; ${failed.size} failed")
    failed.foreach(f => println(s"[sf1] FAILED: $f"))
    println("[sf1] slowest 10: " + results.sortBy(-_._2).take(10)
      .map { case (n, s, _) => f"$n=$s%.1f" }.mkString(", "))
    spark.stop()
  }
}
