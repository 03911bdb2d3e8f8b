package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-independent invariants for the round-4 pipeline operators —
  * hash-parity with DuckDB is the driver gate's job; these pin the
  * properties that must hold on ANY corpus.
  */
class PipelineOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("gap_fill: contiguous spine, counts conserved, LOCF never null") {
    import spark.implicits._
    val rows = TimeSeries.qGapFill.run(spark, dir)
      .select($"user_id", $"bucket_start_us", $"n_events", $"last_type").cache()
    val perUser = rows.groupBy($"user_id")
      .agg(count(lit(1)).as("n_rows"),
        ((max($"bucket_start_us") - min($"bucket_start_us"))
          / TimeSeries.BucketUs + 1).as("span"),
        sum($"n_events").as("events"),
        sum(when($"last_type".isNull, 1).otherwise(0)).as("null_fills"))
      .collect()
    assert(perUser.nonEmpty)
    perUser.foreach { r =>
      assert(r.getAs[Long]("n_rows") == r.getAs[Double]("span").toLong,
        s"spine not contiguous for user ${r.get(0)}")
      assert(r.getAs[Long]("null_fills") == 0,
        s"LOCF left nulls for user ${r.get(0)}")
    }
    val totalEvents = perUser.map(_.getAs[Long]("events")).sum
    assert(totalEvents == graft.Tables.events(spark, dir).count())
    rows.unpersist()
  }

  test("doc_chunks: chunk count and sizes follow the integer arithmetic") {
    import spark.implicits._
    val (w, s) = (40L, 30L)
    val chunks = graft.SparkEntry.queries("q_doc_chunks")(spark, dir)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("nc"), max($"chunk_idx").as("maxi"),
        min($"n_tokens").as("mintok"), max($"n_tokens").as("maxtok"))
    val toks = graft.Tables.documents(spark, dir)
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS BIGINT) AS nw")
    val joined = chunks.join(toks, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nc, nw) = (r.getAs[Long]("nc"), r.getAs[Long]("nw"))
      val expected = if (nw <= w) 1L else 1L + (nw - w + s - 1) / s
      assert(nc == expected, s"doc ${r.get(0)}: $nc chunks, expected $expected (nw=$nw)")
      assert(r.getAs[Long]("maxi") == nc - 1) // contiguous 0..nc-1 indices
      assert(r.getAs[Long]("maxtok") <= w && r.getAs[Long]("mintok") >= 1)
    }
  }

  test("incremental dedup agrees with the all-pairs LSH result") {
    import spark.implicits._
    val inc = graft.SparkEntry.queries("q_dedup_incremental")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(inc.keySet.forall(_ % 2 == 1)) // new side = odd ids only
    inc.foreach { case (id, (isDup, m)) =>
      if (isDup) assert(m >= 0 && m % 2 == 0, s"doc $id matched odd/neg $m")
      else assert(m == -1L)
    }
    // every cross-parity verified pair implies a dup verdict for its odd side
    val crossPairs = Dedup.qMinhash.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) =>
        if (a % 2 == 1 && b % 2 == 0) Some(a)
        else if (b % 2 == 1 && a % 2 == 0) Some(b) else None
      }.toSet
    crossPairs.foreach { odd =>
      assert(inc(odd)._1, s"odd doc $odd pairs cross-parity but not flagged dup")
    }
  }

  test("sliding windows: every packet lands in exactly width/slide windows") {
    import spark.implicits._
    val packets = graft.flow.BatchFlowFeaturizer
      .packetsFromEvents(graft.Tables.events(spark, dir)).count()
    val windowed = RateWindow.qRateWindowSliding.run(spark, dir)
      .agg(sum($"n_packets")).head().getLong(0)
    assert(windowed == 2 * packets, s"$windowed != 2*$packets")
  }
}
