package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** CUSUM changepoint laws.
  *
  * The load-bearing test is the DENSE-EQUALITY law: the operator's
  * sparse gap-analytic form (two candidates per present hour + one
  * running min — never touching absent hours) must equal the textbook
  * dense recursion `S' = max(0, S' + driftDen·H·x − driftNum·T)`
  * walked hour by calendar hour, exactly, on gappy data. That law is
  * what licenses the O(present hours) plan at 100 TB.
  */
class CusumSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** (pfx, hour, cnt) rows as the maintained counter relation. */
  private def ph(rows: (String, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("pfx", "h", "cnt")
  }

  /** Textbook dense recursion — the ONE shared reference walk
    * ([[Cusum.denseReferenceWalk]], also the ScaleSmoke gate's
    * comparator, so spec and gate can never check different
    * references). Independence from the window algebra is preserved by
    * the hand-computed cases below, whose expected values are literal.
    */
  private def denseRef(rows: Seq[(String, Long, Long)],
      driftNum: Long, driftDen: Long): Map[(String, Long), Long] =
    Cusum.denseReferenceWalk(rows, driftNum, driftDen)

  private def trajectory(rows: (String, Long, Long)*): Map[(String, Long), Long] =
    Cusum.trajectoryFromCounts(ph(rows: _*)).collect()
      .map(r => (r.getAs[String]("pfx"), r.getAs[Long]("h")) ->
        r.getAs[Long]("cusum_scaled")).toMap

  private def alerts(rows: (String, Long, Long)*): Seq[(String, Long, Long)] =
    Cusum.cusumFromCounts(ph(rows: _*)).collect()
      .map(r => (r.getAs[String]("pfx"), r.getAs[Long]("hour_idx"),
        r.getAs[Long]("cusum_scaled"))).toSeq

  test("cusum: sparse gap-analytic form equals the dense recursion on gappy series") {
    // seeded gappy series: several prefixes, hour gaps of 0-9, counts
    // with occasional spikes — every present hour's S' must match the
    // dense walk bit for bit (the gap floor + lag-0 start candidates
    // must reproduce max(0,·) clamping INSIDE gaps, not just at rows)
    val rnd = new scala.util.Random(42)
    val rows = for {
      pfx <- Seq("10.0", "10.1", "172.16", "192.168")
      _ <- 0 until 1 // one series per prefix
      hs = Iterator.iterate(rnd.nextInt(5).toLong)(h => h + 1 + rnd.nextInt(9)).take(40).toSeq
      h <- hs
    } yield (pfx, h, (1 + rnd.nextInt(20) + (if (rnd.nextInt(10) == 0) 200 else 0)).toLong)
    assert(trajectory(rows: _*) == denseRef(rows, Cusum.DriftNum, Cusum.DriftDen))
    // and at a different drift rate, so the law isn't constant-specific
    val gotLoose = Cusum.trajectoryFromCounts(ph(rows: _*), 9, 8).collect()
      .map(r => (r.getAs[String]("pfx"), r.getAs[Long]("h")) ->
        r.getAs[Long]("cusum_scaled")).toMap
    assert(gotLoose == denseRef(rows, 9, 8))
  }

  test("cusum: hand case — a one-hour burst alerts at the exact integer cut") {
    // 4 in-control hours of 8, then a burst x at hour 4: T = 32 + x,
    // H = 5, denH = 100; quiet steps add 800 − 21T = 128 − 21x < 0 for
    // x ≥ 7 (S' pins at 0), the burst lands S' = 100x − 21T = 79x − 672,
    // cut = 1·20·T = 640 + 20x → alert iff 59x ≥ 1312 ⟺ x ≥ 22.2:
    // x = 23 alerts (S' = 1145 ≥ 1100), x = 22 does not (1066 < 1080).
    val quiet = Seq(("10.0", 0L, 8L), ("10.0", 1L, 8L), ("10.0", 2L, 8L), ("10.0", 3L, 8L))
    assert(alerts(quiet :+ (("10.0", 4L, 23L)): _*) == Seq(("10.0", 4L, 1145L)))
    assert(alerts(quiet :+ (("10.0", 4L, 22L)): _*).isEmpty)
  }

  test("cusum: accumulation — a sustained 3× flood alerts on persistence, not peak") {
    // 10 hours of 10, then 4 hours of 30: T = 220, H = 14, denH = 280;
    // quiet steps add 2800 − 4620 < 0, flood steps add 8400 − 4620 =
    // 3780 each, cut = 20·220 = 4400 — the FIRST flood hour (3780)
    // stays silent, hours 11/12/13 accumulate past the cut
    // (7560, 11340, 15120). The accumulated excess fires, not the peak.
    val rows = (0L to 9L).map(h => ("10.0", h, 10L)) ++
      (10L to 13L).map(h => ("10.0", h, 30L))
    assert(alerts(rows: _*) ==
      Seq(("10.0", 11L, 7560L), ("10.0", 12L, 11340L), ("10.0", 13L, 15120L)))
  }

  test("cusum: zero-traffic gaps drain the statistic at exactly k per hour") {
    // burst to S' > 0, then a gap: with T = 120, H = 12, denH = 240,
    // each dense hour (absent included) drains driftNum·T = 2520.
    // Quiet hours add 2400 − 2520 = −120 (pinned 0), the hour-3 burst
    // adds 240·60 − 2520 = 11880; a 5-hour silent gap drains
    // 5·2520 = 12600 > 11880 → S' pins at 0 inside the gap, and h=9's
    // own 10 packets land −120 → S' = 0, not 11880 − 15120.
    val rows = Seq(("10.0", 0L, 10L), ("10.0", 1L, 10L), ("10.0", 2L, 10L),
      ("10.0", 3L, 60L), ("10.0", 9L, 10L), ("10.0", 10L, 10L), ("10.0", 11L, 10L))
    val t = trajectory(rows: _*)
    assert(t(("10.0", 3L)) == 11880L)
    assert(t(("10.0", 9L)) == 0L, "the gap must clamp at 0, not go negative")
    // shorter gap (hours 4-5 absent): drain 2·2520 = 5040 < 11880 →
    // S' carries 6840 into hour 6, whose own step adds −120 → 6720;
    // pinned against the dense walk
    val rows2 = Seq(("10.0", 0L, 10L), ("10.0", 1L, 10L), ("10.0", 2L, 10L),
      ("10.0", 3L, 60L), ("10.0", 6L, 10L), ("10.0", 10L, 10L), ("10.0", 11L, 10L))
    val t2 = trajectory(rows2: _*)
    assert(t2(("10.0", 6L)) == 6720L)
    assert(t2 == denseRef(rows2, Cusum.DriftNum, Cusum.DriftDen))
  }

  test("cusum: warmup — fewer than MinHist prior present hours never alerts") {
    // an immediate huge burst with only 2 prior present hours: pos ≤ 3
    val got = alerts(("10.0", 0L, 1L), ("10.0", 1L, 1L), ("10.0", 2L, 500L))
    assert(got.isEmpty)
  }

  // ---------------- causally-calibrated variant ----------------

  /** Dense post-warmup walk with warmup-derived constants — the same
    * shared reference, warmup-anchored.
    */
  private def calDenseRef(rows: Seq[(String, Long, Long)],
      driftNum: Long, driftDen: Long, warmup: Int): Map[(String, Long), Long] =
    Cusum.denseReferenceWalk(rows, driftNum, driftDen, warmup)

  private def calTrajectory(warmup: Int, rows: (String, Long, Long)*): Map[(String, Long), Long] =
    Cusum.calibratedTrajectory(ph(rows: _*), Cusum.DriftNum, Cusum.DriftDen, warmup)
      .collect()
      .map(r => (r.getAs[String]("pfx"), r.getAs[Long]("h")) ->
        r.getAs[Long]("cusum_scaled")).toMap

  test("calibrated cusum: sparse form equals the dense post-warmup walk on gappy series") {
    val rnd = new scala.util.Random(7)
    val rows = for {
      pfx <- Seq("10.0", "10.1", "172.16")
      hs = Iterator.iterate(rnd.nextInt(4).toLong)(h => h + 1 + rnd.nextInt(7)).take(30).toSeq
      h <- hs
    } yield (pfx, h, (1 + rnd.nextInt(15) + (if (rnd.nextInt(8) == 0) 120 else 0)).toLong)
    val w = 8
    assert(calTrajectory(w, rows: _*) ==
      calDenseRef(rows, Cusum.DriftNum, Cusum.DriftDen, w))
  }

  test("calibrated cusum: verdicts are CAUSAL — future rows never move an earlier one") {
    // the retrospective screen fails this law by construction (its
    // drift is the FULL-span mean); the calibrated screen must pass it
    val base = (0L to 11L).map(h => ("10.0", h, 10L)) :+ (("10.0", 12L, 80L))
    val future = Seq(("10.0", 20L, 500L), ("10.0", 21L, 500L))
    val w = 4
    def calAt12(rows: Seq[(String, Long, Long)]) =
      calTrajectory(w, rows: _*).get(("10.0", 12L))
    assert(calAt12(base) == calAt12(base ++ future),
      "appending future hours must not move the hour-12 calibrated verdict")
    // contrast: the retrospective trajectory at hour 12 DOES move
    // (its span-mean drift absorbs the future flood)
    assert(trajectory(base: _*).get(("10.0", 12L)) !=
      trajectory(base ++ future: _*).get(("10.0", 12L)),
      "the retrospective screen is expected to be non-causal here")
  }

  test("calibrated cusum: first-crossing emits once per excursion, at the exact cut") {
    // warmup 4 hours of 10 (hw_span=4, tw=40): post steps add
    // 80x − 840; x=10 → −40 (drains), x=30 → 1560. Cut = 1·20·40=800.
    // Flood hours 4,5: S' = 1560, 3120 — both hot, only hour 4 is a
    // crossing. After a 1-hour dip (−40 → 3080? no: x=10 adds −40 →
    // 3080, still hot — stays suppressed), a LONG gap drains to 0
    // (840/dense-hour), and a fresh flood crosses AGAIN.
    val warm = (0L to 3L).map(h => ("10.0", h, 10L))
    val rows = warm ++ Seq(("10.0", 4L, 30L), ("10.0", 5L, 30L),
      ("10.0", 6L, 10L), ("10.0", 15L, 30L))
    val got = Cusum.calibratedDetections(ph(rows: _*), warmup = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
    // hour 4 crosses (1560 ≥ 800); hours 5-6 stay hot/suppressed
    // (3120, 3080); the gap 7..14 drains 8·840 = 6720 > 3080 → S'
    // pins at 0; hour 15 lands 1560 again — a second crossing
    assert(got == Seq(("10.0", 4L, 1560L), ("10.0", 15L, 1560L)))
  }

  test("calibrated cusum: crossings match a full dense walk on random gappy series") {
    // the first-crossing filter reconstructs S at the previous DENSE
    // hour from (p_gap, lagged runmin); this law re-derives every
    // alarm from an independent hour-by-hour walk that tracks S
    // through gaps and takes (below→at-or-above) transitions. S only
    // decreases inside a gap, so crossings can only land on present
    // hours — the walk checks them all.
    val rnd = new scala.util.Random(19)
    val w = 6
    val rows = for {
      pfx <- Seq("10.0", "10.1", "172.16", "192.168")
      hs = Iterator.iterate(rnd.nextInt(3).toLong)(h => h + 1 + rnd.nextInt(6)).take(40).toSeq
      h <- hs
    } yield (pfx, h, (1 + rnd.nextInt(12) + (if (rnd.nextInt(6) == 0) 150 else 0)).toLong)
    // .toSeq before flatMap: flatMapping a Map with tuple results
    // re-collects INTO a Map keyed by pfx, silently collapsing every
    // prefix's crossings down to its last one
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (pfx, rs) =>
      val sorted = rs.sortBy(_._2)
      val warm = sorted.take(w)
      val tw = warm.map(_._3).sum
      val hwSpan = warm.last._2 - warm.head._2 + 1
      val byH = sorted.drop(w).map(r => r._2 -> r._3).toMap
      val cut = Cusum.ThrNum * Cusum.DriftDen * tw // thrDen = 1
      var s = 0L
      ((warm.last._2 + 1) to sorted.last._2).flatMap { h =>
        val prev = s
        s = math.max(0L,
          s + Cusum.DriftDen * hwSpan * byH.getOrElse(h, 0L) - Cusum.DriftNum * tw)
        if (byH.contains(h) && s >= cut && prev < cut) Some((pfx, h)) else None
      }
    }.toSet
    val got = Cusum.calibratedDetections(ph(rows: _*), warmup = w).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(expected.nonEmpty, "the random corpus must exercise the alarm path")
  }

  test("calibrated cusum: a prefix that never completes warmup is never screened") {
    val rows = (0L to 5L).map(h => ("10.0", h, 500L)) // 6 < 168 present hours
    assert(Cusum.calibratedDetections(ph(rows: _*)).collect().isEmpty)
    // and at an explicit small warmup, exactly-warmup-many hours still
    // yields no post-warmup rows to screen
    assert(Cusum.calibratedDetections(ph(rows: _*), warmup = 6).collect().isEmpty)
  }

  test("calibrated cusum: the HOT SET is antitone in the threshold (crossings need not be)") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val counts = Ewma.prefixHourCounts(
      graft.flow.BatchFlowFeaturizer.packetsFromEvents(events)).cache()
    def hotSet(tn: Long, td: Long): Set[(String, Long)] =
      Cusum.calibratedTrajectory(counts)
        .where(s"cusum_scaled * $td >= $tn * ${Cusum.DriftDen} * warmup_cnt")
        .select("pfx", "h").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val Seq(loose, catalog, tight) = Seq((1L, 2L), (1L, 1L), (2L, 1L))
      .map { case (tn, td) => hotSet(tn, td) }
    assert(tight.subsetOf(catalog) && catalog.subsetOf(loose))
    assert(catalog.nonEmpty, "catalog constants must be non-vacuous at sf0.001")
    counts.unpersist()
  }

  test("cusum: alerts are antitone in threshold and in drift (monotonicity laws)") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val counts = Ewma.prefixHourCounts(
      graft.flow.BatchFlowFeaturizer.packetsFromEvents(events)).cache()
    def keys(dn: Long, dd: Long, tn: Long, td: Long): Set[(String, Long)] =
      Cusum.cusumFromCounts(counts, dn, dd, tn, td).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    // threshold chain at the catalog drift: 1/2 ⊇ catalog 1/1 ⊇ 2/1
    val Seq(looseT, catalogT, tightT) =
      Seq((1L, 2L), (Cusum.ThrNum, Cusum.ThrDen), (2L, 1L))
        .map { case (tn, td) => keys(Cusum.DriftNum, Cusum.DriftDen, tn, td) }
    assert(tightT.subsetOf(catalogT) && catalogT.subsetOf(looseT))
    // drift chain at the catalog threshold: 41/40 ⊇ catalog 21/20 ⊇ 9/8
    // (smaller drift drains less, so S and the alert set only grow)
    val Seq(looseD, catalogD, tightD) =
      Seq((41L, 40L), (Cusum.DriftNum, Cusum.DriftDen), (9L, 8L))
        .map { case (dn, dd) => keys(dn, dd, Cusum.ThrNum, Cusum.ThrDen) }
    assert(tightD.subsetOf(catalogD) && catalogD.subsetOf(looseD))
    assert(catalogT.nonEmpty, "catalog constants must be non-vacuous at sf0.001")
    counts.unpersist()
  }
}
