package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 operator laws: the above-capacity MG audit's heavy-set
  * arithmetic and bound verdicts, and the streaming top-talkers
  * report's last-emission-wins / disjoint-merge / tie-break semantics.
  */
class Round14OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(rows: (String, Int)*) = {
    import spark.implicits._
    rows.flatMap { case (lang, n) => Seq.fill(n)(lang) }
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("doc_id", "lang")
  }

  test("mg_est_error: heavy set is exact-count-derived; every verdict true above capacity") {
    // 5 keys, cap 3 → approximate regime; en(50) > N/4 = 27.5 is the
    // only guaranteed-heavy key (fr=20 < 27.5)
    val d = docs("en" -> 50, "fr" -> 20, "es" -> 15, "de" -> 15, "zh" -> 10)
    val got = Sketches.mgEstErrOn(d, cap = 3).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("en"))
    val r = got.head
    assert(r.getLong(1) == 50L && r.getLong(2) == 110L && r.getLong(3) == 5L)
    for (i <- 4 to 8)
      assert(r.getBoolean(i), s"verdict column $i false: $r")
  }

  test("mg_est_error: exact regime (cap above domain) — all verdicts still true") {
    val d = docs("en" -> 30, "fr" -> 5)
    val got = Sketches.mgEstErrOn(d, cap = 8).collect()
    // en(30) > 35*? threshold c*(cap+1) > N → 30*9=270 > 35 ✓; fr 45 > 35 ✓
    assert(got.map(_.getString(0)).toSeq == Seq("en", "fr"))
    for (r <- got; i <- 4 to 8) assert(r.getBoolean(i), s"$r")
  }

  test("mg_est_error: two heavy keys when the skew supports them") {
    val d = docs("en" -> 40, "fr" -> 35, "es" -> 3, "de" -> 2, "zh" -> 2)
    // N=82, threshold N/4=20.5 → en, fr
    val got = Sketches.mgEstErrOn(d, cap = 3).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("en", "fr"))
    for (r <- got; i <- 4 to 8) assert(r.getBoolean(i), s"$r")
  }

  private def emitted(rows: (Long, Int, String, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("win", "salt", "k", "est", "n_seen")
  }

  test("topTalkersReport: last emission per (win, salt) wins") {
    // group (1,0) emitted twice: stale summary at n_seen=2, final at 5
    val got = MgStream.topTalkersReport(emitted(
      (1L, 0, "a", 2L, 2L),
      (1L, 0, "a", 4L, 5L), (1L, 0, "b", 1L, 5L)))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", 4L, 1L), ("b", 1L, 2L)))
  }

  test("topTalkersReport: salts merge keywise and rank is (count desc, ip asc)") {
    val got = MgStream.topTalkersReport(emitted(
      (1L, 0, "10.0.0.1", 7L, 9L), (1L, 0, "10.0.0.3", 2L, 9L),
      (1L, 1, "10.0.0.2", 7L, 4L), (1L, 1, "10.0.0.4", 1L, 4L)),
      topK = 3)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    // tie 7/7 broken by ip asc; k=3 cuts 10.0.0.4
    assert(got.toSeq == Seq(
      ("10.0.0.1", 7L, 1L), ("10.0.0.2", 7L, 2L), ("10.0.0.3", 2L, 3L)))
  }

  test("topTalkersReport: windows rank independently") {
    val got = MgStream.topTalkersReport(emitted(
      (1L, 0, "a", 3L, 3L), (2L, 0, "b", 9L, 9L), (2L, 0, "c", 1L, 9L)))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(got.toSeq == Seq(
      (MgStream.WinUs, "a", 1L),
      (2 * MgStream.WinUs, "b", 1L), (2 * MgStream.WinUs, "c", 2L)))
  }

  private def qdEmitted(rows: (Long, Int, Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("win", "salt", "v", "cnt", "n_seen")
  }

  test("windowQuantileReport: last emission wins, salts merge, exact rank rule") {
    // window 1 final histogram: 40×9 (5 from salt 0 + 4 from salt 1),
    // 100×1 → N=10, r50=5 → 40, r99=10 → 100. Stale salt-0 emission
    // (n_seen=3) must be ignored.
    val got = QdStream.windowQuantileReport(qdEmitted(
      (1L, 0, 40L, 2L, 3L),
      (1L, 0, 40L, 5L, 8L),
      (1L, 1, 40L, 4L, 5L), (1L, 1, 100L, 1L, 5L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((QdStream.WinUs, 10L, 40L, 100L)))
  }

  test("windowQuantileReport: single-point window collapses both quantiles") {
    val got = QdStream.windowQuantileReport(qdEmitted(
      (2L, 0, 77L, 6L, 6L)))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((6L, 77L, 77L)))
  }

  test("qd stream regime canary: per-window weight sits far under the digest capacity") {
    // exactness needs t = ⌊N_group/k⌋ = 0; the densest probed window
    // must stay under QdStreamCap even BEFORE salting splits it
    val maxWin = graft.flow.BatchFlowFeaturizer
      .packetsFromEvents(graft.Tables.events(spark, "/root/testdata/sf0.001"))
      .selectExpr(s"ts_us DIV ${QdStream.WinUs} AS win")
      .groupBy("win").count().agg(org.apache.spark.sql.functions.max("count"))
      .head().getLong(0)
    assert(maxWin < QdStream.QdStreamCap,
      s"densest window $maxWin >= cap ${QdStream.QdStreamCap}")
  }

  test("stream regime canary: the packet source domain sits under the per-salt capacity") {
    // src_ip is a function of user_id mod 300 / mod 50 (packetStage0),
    // so the WHOLE domain — before salting even splits it — must stay
    // under MgStreamCap at the oracle SF for the exact-regime oracle
    // to be sound at any partitioning
    val distinct = graft.flow.BatchFlowFeaturizer
      .packetsFromEvents(graft.Tables.events(spark, "/root/testdata/sf0.001"))
      .select("src_ip").distinct().count()
    assert(distinct <= MgStream.MgStreamCap,
      s"src_ip domain $distinct exceeds MgStreamCap ${MgStream.MgStreamCap}")
  }
}
