package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Verdict laws for the per-window threat screen. The catalog corpus
  * is steady traffic — its surge verdicts are legitimately all-false
  * there (talker_dom does fire) — so each verdict's TRUE direction is
  * proven here on hand-built windows: a reflection fan-out trips
  * src_surge alone, a fixed-size flood trips vol_surge + len_collapse,
  * an organic volume spike with neither shape nor concentration signal
  * does NOT alert, and the dominance/tie-break/rank-rule arithmetic is
  * checked against hand values.
  */
class ThreatScreenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 24 steady windows 0..23: 5 sources × 4 packets, lengths
    * 40/50/60/70 per source → n_src 5, n_pkts 20, p50 50, p99 70,
    * top share 2000 bp (no verdict fires past window 0's cold start).
    */
  private def baseline: Seq[(Long, String, Long)] =
    for {
      w <- 0L until 24L
      s <- 1 to 5
      l <- Seq(40L, 50L, 60L, 70L)
    } yield (w, s"10.0.0.$s", l)

  private def screen(rows: Seq[(Long, String, Long)]): Map[Long, Row] = {
    import spark.implicits._
    ThreatScreen.screenOn(rows.toDF("win", "src_ip", "length"))
      .collect()
      .map(r => r.getAs[Long]("window_start_us") / ThreatScreen.WinUs -> r)
      .toMap
  }

  test("steady baseline: no verdict fires; cold-start window has no surges") {
    val out = screen(baseline)
    val w0 = out(0L)
    assert(w0.getAs[Long]("trail_w") == 0L)
    assert(!w0.getAs[Boolean]("src_surge") && !w0.getAs[Boolean]("vol_surge"),
      "an empty trailing frame must never claim a surge")
    val w23 = out(23L)
    assert(w23.getAs[Long]("n_src") == 5L && w23.getAs[Long]("n_pkts") == 20L)
    assert(w23.getAs[Long]("p50_len") == 50L && w23.getAs[Long]("p99_len") == 70L)
    assert(w23.getAs[Long]("top_share_bp") == 2000L)
    assert(out.values.forall(!_.getAs[Boolean]("threat")))
  }

  test("reflection fan-out: src_surge alone alerts") {
    // window 24: 16 sources × 1 packet — 16·24 > 3·(24·5) = 360, but
    // only 16 packets (no volume surge), lengths varied
    val surge = (1 to 16).map(i => (24L, s"198.51.$i.1", 40L + 10 * (i % 4)))
    val out = screen(baseline ++ surge)
    val w = out(24L)
    assert(w.getAs[Boolean]("src_surge"))
    assert(!w.getAs[Boolean]("vol_surge"))
    assert(w.getAs[Boolean]("threat"),
      "cardinality explosion must alert without any volume signal")
  }

  test("fixed-size flood: vol_surge + len_collapse alert") {
    // window 24: 3 sources × 40 packets, every packet 64 bytes —
    // 120·24 > 3·(24·20) = 1440, p50 == p99 == 64
    val flood = for (s <- 1 to 3; _ <- 1 to 40) yield (24L, s"203.0.113.$s", 64L)
    val out = screen(baseline ++ flood)
    val w = out(24L)
    assert(w.getAs[Boolean]("vol_surge"))
    assert(w.getAs[Boolean]("len_collapse"))
    assert(w.getAs[Long]("p50_len") == 64L && w.getAs[Long]("p99_len") == 64L)
    assert(!w.getAs[Boolean]("src_surge"), "3 sources is not a cardinality surge")
    assert(w.getAs[Boolean]("threat"))
  }

  test("organic volume spike: no shape or concentration signal, no alert") {
    // window 24: the same 5 sources send 5× the packets with the same
    // varied lengths — volume surges, but the distribution and shares
    // look like traffic, not attack
    val organic = for {
      s <- 1 to 5; l <- Seq(40L, 50L, 60L, 70L); _ <- 1 to 5
    } yield (24L, s"10.0.0.$s", l)
    val out = screen(baseline ++ organic)
    val w = out(24L)
    assert(w.getAs[Boolean]("vol_surge"))
    assert(!w.getAs[Boolean]("len_collapse") && !w.getAs[Boolean]("talker_dom"))
    assert(!w.getAs[Boolean]("threat"),
      "volume alone must not alert — that is what keeps flash crowds out")
  }

  test("dominance arithmetic and top-talker tie-break") {
    // 3:1 split → 7500 bp, dominant; tie case → lexicographically
    // smallest source wins the top slot
    val rows = Seq.fill(3)((0L, "10.0.0.1", 40L)) :+ ((0L, "10.0.0.2", 50L))
    val w = screen(rows)(0L)
    assert(w.getAs[Long]("top_share_bp") == 7500L)
    assert(w.getAs[Boolean]("talker_dom"))
    assert(!w.getAs[Boolean]("threat"), "dominance without a surge is not a threat")
    val tie = screen(Seq((0L, "10.0.0.9", 40L), (0L, "10.0.0.2", 50L)))(0L)
    assert(tie.getAs[String]("top_src") == "10.0.0.2")
  }

  test("discrete rank rule: p50/p99 on a skewed histogram") {
    // 50×40B, 49×100B, 1×500B: rank 50 → 40, rank 99 → 100
    val rows = (Seq.fill(50)(40L) ++ Seq.fill(49)(100L) :+ 500L)
      .zipWithIndex.map { case (l, i) => (0L, s"10.1.${i % 7}.1", l) }
    val w = screen(rows)(0L)
    assert(w.getAs[Long]("p50_len") == 40L)
    assert(w.getAs[Long]("p99_len") == 100L)
  }
}
