package graft.operators

import graft.GraftSession
import org.apache.datasketches.hll.HllSketch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 laws: the three r15-ADVICE hardenings, each driven through
  * its failure mode — the multi-batch CUSUM sink collapse, the threat
  * screen's MG-capacity guard, and the sink-name registry replacing the
  * digit-suffix regex.
  */
class Round16OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // ---- q_cusum_stream multi-batch collapse (r15 ADVICE #1) ----
  // An update-mode memory sink appends each micro-batch's UPDATED rows:
  // a (pfx, h) key split across batches appears once per batch, each
  // carrying the count as of that batch (monotone for a streaming
  // count). The query collapses with max(cnt) per key before screening;
  // this law pins that the collapsed multi-batch table yields the
  // exact trajectory of the final counts — and that WITHOUT the
  // collapse the trajectory would differ (the test is non-vacuous).

  test("cusum stream collapse: max(cnt) over partial emissions == final counts") {
    // final counts: a bursty prefix over 8 present hours + a quiet one
    val finals = Seq(
      ("a", 0L, 10L), ("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 10L),
      ("a", 4L, 11L), ("a", 5L, 40L), ("a", 6L, 42L), ("a", 7L, 10L),
      ("b", 0L, 5L), ("b", 3L, 5L), ("b", 6L, 5L), ("b", 7L, 5L))
      .toDF("pfx", "h", "cnt")
    // multi-batch sink image: hours 5 and 6 were first emitted with
    // partial counts (an earlier micro-batch saw only part of the hour)
    val partials = finals.unionAll(Seq(
      ("a", 5L, 17L), ("a", 6L, 30L), ("b", 6L, 2L)).toDF("pfx", "h", "cnt"))
    val collapsed = partials.groupBy($"pfx", $"h").agg(max($"cnt").as("cnt"))
    def traj(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long, Long)] =
      Cusum.trajectoryFromCounts(df)
        .select($"pfx", $"h", $"cnt", $"cusum_scaled")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq.sorted
    assert(traj(collapsed) == traj(finals),
      "collapsed multi-batch emissions must reproduce the final-count trajectory")
    // non-vacuity: feeding the raw partials in (the pre-fix shape)
    // inflates total_cnt/cum and corrupts the trajectory
    assert(traj(partials) != traj(finals),
      "uncollapsed partials must NOT match — otherwise this law tests nothing")
  }

  // ---- threat screen MG-capacity guard (r15 ADVICE #2) ----
  // hll_within prices the HLL estimate against n_src, which is exact
  // only while no (win, salt) MG summary ever hit capacity. The report
  // now raises instead of silently measuring against a degraded
  // baseline.

  private def emitRow(win: Long, srcs: Array[String],
      hitCap: Boolean = false): (Long, Int,
      Array[String], Array[Long], Array[Long], Array[Long], Array[Byte],
      Long, Boolean) = {
    val sk = new HllSketch(ThreatScreenStream.LgK)
    srcs.foreach(sk.update)
    (win, 0, srcs, Array.fill(srcs.length)(3L),
      Array(40L, 60L), Array(4L, 4L), sk.toCompactByteArray,
      srcs.length * 3L, hitCap)
  }

  private val emitCols = Seq("win", "salt", "srcs", "srcCnts", "lenVals",
    "lenCnts", "hll", "n", "hitCap")

  test("screen report: guard fires on the latched hitCap flag, not summary size") {
    val ok = Seq(emitRow(0L, Array("s1", "s2", "s3")))
      .toDF(emitCols: _*)
    val rows = ThreatScreenStream.screenReport(ok).collect()
    assert(rows.length == 1 &&
      rows(0).getBoolean(rows(0).fieldIndex("hll_within")),
      "3 sources, exact regime: the 6-sigma band must hold")
    // exactly MgCap retained keys with NO eviction: still exact — the
    // old size-based guard raised a spurious error here (r16 ADVICE)
    val fullNoEvict = Seq(emitRow(1L,
      Array.tabulate(ThreatScreenStream.MgCap)(i => s"s$i")))
      .toDF(emitCols: _*)
    val fullRows = ThreatScreenStream.screenReport(fullNoEvict).collect()
    assert(fullRows.length == 1 &&
      fullRows(0).getBoolean(fullRows(0).fieldIndex("hll_within")),
      "exactly-at-cap with no eviction is still exact — must not raise")
    // degraded group that closed UNDER capacity (the usual shape after
    // subtractCompact drops zero-count keys): the size guard would
    // pass silently; the flag guard must raise
    val degraded = Seq(emitRow(2L, Array("s1", "s2", "s3"), hitCap = true))
      .toDF(emitCols: _*)
    val e = intercept[Exception] {
      ThreatScreenStream.screenReport(degraded).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("MG summary hit capacity")),
      s"expected the capacity guard to fire, got: $e")
  }

  // ---- UniMax budget allocation (q_corpus_unimax) ----
  // hand corpora driving both branches of the closed form: the capped
  // prefix, the crossover, the exact BIGINT split of the remaining
  // budget (first `remainder` sources get the extra token), and the
  // Σ alloc == B conservation law (with B = 1.5·total < 2·total = Σcap,
  // an all-capped outcome is arithmetically impossible, so the budget
  // is always spent exactly).

  private def umx(rows: (String, Int)*): Map[String, (Long, Long, Long)] = {
    rows.zipWithIndex.map { case ((lang, ntok), i) =>
      (i.toLong, Seq.fill(ntok)("w").mkString(" "), lang) }
      .toDF("doc_id", "text", "lang")
      .createOrReplaceTempView("umx_fixture")
    Packing.unimaxOn(spark, "umx_fixture").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
  }

  test("unimax: capped prefix at exactly the epoch cap, crossover absorbs the slack") {
    // caps 20/40/200, total 130, B = 195: a and b cap at 2 epochs
    // (20000 bp), c takes the remaining 135 — Σ = B
    val out = umx("a" -> 10, "b" -> 20, "c" -> 100)
    assert(out == Map(
      "a" -> (10L, 20L, 20000L),
      "b" -> (20L, 40L, 20000L),
      "c" -> (100L, 135L, 13500L)))
    assert(out.values.map(_._2).sum == 130L * 3 / 2)
  }

  test("unimax: odd remainder goes one-token-each to the FIRST uncapped sources") {
    // caps 22/200/204, total 213, B = 319: a capped (22), remaining 297
    // over {b, c} = 148 each + 1 extra to b (first in ascending cap
    // order) — the deterministic integer split both engines must agree on
    val out = umx("a" -> 11, "b" -> 100, "c" -> 102)
    assert(out("a") == (11L, 22L, 20000L))
    assert(out("b") == (100L, 149L, 14900L))
    assert(out("c") == (102L, 148L, 14509L))
    assert(out.values.map(_._2).sum == 213L * 3 / 2)
  }

  test("unimax: budget conservation on an uneven mix") {
    val sizes = Seq("p" -> 7, "q" -> 13, "r" -> 29, "s" -> 61, "t" -> 400)
    val out = umx(sizes: _*)
    val total = sizes.map(_._2.toLong).sum
    assert(out.values.map(_._2).sum == total * 3 / 2,
      "some source is uncapped by construction, so the budget must be spent exactly")
    sizes.foreach { case (l, n) =>
      assert(out(l)._2 <= 2L * n, s"$l exceeded the epoch cap") }
  }

  // ---- sink-name registry (r15 ADVICE #3) ----
  // dropStreamSinks drops exactly the names newSinkName registered for
  // this session — a fixed-name bystander view whose name happens to
  // end in 10+ digits (the old regex's false positive) survives.

  test("sink registry: registered names drop, digit-suffixed bystanders survive") {
    val sink = GraftSession.newSinkName(spark, "regtest")
    spark.range(3).toDF("x").createOrReplaceTempView(sink)
    val bystander = "decoy_12345678901"
    spark.range(2).toDF("x").createOrReplaceTempView(bystander)
    GraftSession.dropStreamSinks(spark)
    assert(!spark.catalog.tableExists(sink), "registered sink must be dropped")
    assert(spark.catalog.tableExists(bystander),
      "a convention-named bystander must survive (the r15 ADVICE regression)")
    // drained registry: a second drain is a no-op, and re-registering
    // works
    GraftSession.dropStreamSinks(spark)
    assert(spark.catalog.tableExists(bystander))
    spark.catalog.dropTempView(bystander)
  }
}
