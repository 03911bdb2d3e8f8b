package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 behavioral specs: substring-window duplication counts
  * exactly what the hand math says, the per-source token quota is
  * greedy-prefix (not best-fit), the MinHash estimate is exact on
  * identical docs, and the market-share basis points per year sum to
  * 10000 minus only floor-division dust.
  */
class Round11OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def toks(n: Int, w: String): String = Seq.fill(n)(w).mkString(" ")

  test("substring dup: cross-doc shared 8-gram flagged, unique doc clean") {
    import spark.implicits._
    // A and B share exactly their first 8 tokens; C shares nothing.
    val docs = Seq(
      (0L, "a b c d e f g h i j", "en", "s", 19L),
      (1L, "a b c d e f g h x y", "en", "s", 19L),
      (2L, "q r s t u v w z0 z1 z2", "en", "s", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = WebCorpus.substringDupOn(spark, "r11-ssdup", docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 10 tokens → 3 positional windows; only window 1 is shared.
    assert(rows.toSeq == Seq(
      (0L, 3L, 1L, 3333L),
      (1L, 3L, 1L, 3333L),
      (2L, 3L, 0L, 0L)))
  }

  test("substring dup: within-doc repetition alone is NOT duplication (≥2 distinct docs)") {
    import spark.implicits._
    // the same 8-gram occurs twice inside ONE doc (positions 1 and 9)
    val docs = Seq(
      (0L, "p q r s t u v w p q r s t u v w", "en", "s", 31L),
      (1L, "k0 k1 k2 k3 k4 k5 k6 k7 k8", "en", "s", 26L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dup = WebCorpus.substringDupOn(spark, "r11-ssdup-within", docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(dup == Map(0L -> 0L, 1L -> 0L))
  }

  test("domain token cap: greedy prefix under budget, oversize head keeps nothing") {
    import spark.implicits._
    // s1 priority order (n_tok desc): 1500 (cum 1500 ≤ 2000, keep),
    // 600 (cum 2100, drop) — and the 100-token doc is ALSO dropped
    // (greedy prefix on the running sum, not best-fit packing).
    // s2's single 2500-token doc exceeds the budget outright.
    val docs = Seq(
      (0L, toks(1500, "w"), "en", "s1", 1L),
      (1L, toks(600, "w"), "en", "s1", 1L),
      (2L, toks(100, "w"), "en", "s1", 1L),
      (3L, toks(2500, "w"), "en", "s2", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = WebCorpus.domainCapOn(spark, "r11-dcap", docs)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.toSeq == Seq(
      ("s1", 3L, 2200L, 1L, 1500L, 10000L * 1500 / 2200),
      ("s2", 1L, 2500L, 0L, 0L, 0L)))
  }

  test("minhash estimate error: identical docs → est 10000, exact 10000, err 0") {
    import spark.implicits._
    val same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (0L, same, "en", "s", 1L),
      (1L, same, "en", "s", 1L),
      (2L, "one two three four five six seven eight nine ten", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Dedup.minhashEstErrOn(spark, "r11-esterr", docs).collect()
    val pair = rows.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(pair.isDefined, s"identical pair missing from ${rows.length} rows")
    val p = pair.get
    assert((p.getLong(2), p.getLong(3), p.getLong(4)) == ((10000L, 10000L, 0L)))
    // every estimate the 16-hash family can emit is a multiple of 625
    assert(rows.forall(r => r.getLong(2) % 625 == 0))
  }

  test("market share: per-year shares sum to 10000 minus floor dust") {
    val rows = Joins.qMarketShare.run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val byYear = rows.groupBy(_.getLong(0))
    byYear.foreach { case (y, rs) =>
      val s = rs.map(_.getLong(3)).sum
      // floor division loses < 1 bp per nation
      assert(s <= 10000 && s > 10000 - rs.length,
        s"year $y share sum $s over ${rs.length} nations")
      assert(rs.forall(_.getDouble(2) > 0.0))
    }
  }

  test("ngram novelty: duplicate doc adds zero novel shingles, first and unique docs are fully novel") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e f", "en", "s", 11L),
      (1L, "a b c d e f", "en", "s", 11L), // exact dup of doc 0 — nothing new
      (2L, "u v w x y z", "en", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = TextAnalysis.noveltyOn(spark, "r11-novelty", docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (0L, 2L, 2L, 10000L),
      (1L, 2L, 0L, 0L),
      (2L, 2L, 2L, 10000L)))
  }

  test("ip prefix agg: partitions the packet stream exactly") {
    val dir = "/root/testdata/sf0.001"
    val rows = Detection.qIpPrefix.run(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(0).startsWith("10.")))
    val total = rows.map(_.getLong(1)).sum
    val events = graft.Tables.events(spark, dir).count()
    assert(total == events, s"prefix rollup covers $total of $events packets")
  }

  test("bucketed join: the fact-fact join is sort-merge over bucket scans, not broadcast") {
    val df = Layout.qBucketedJoin.run(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), "bucketed join took the broadcast path")
    assert(df.collect().nonEmpty)
  }

  test("stream-stream left outer: null rows appear exactly for watermark-expired unmatched clicks") {
    val rows = StreamJoin.qStreamStreamLeftJoin.run(spark, "/root/testdata/sf0.001").collect()
    val nulls = rows.filter(_.isNullAt(2))
    assert(rows.nonEmpty)
    assert(nulls.nonEmpty, "no watermark-expired unmatched clicks emitted")
    // expired rows carry null for BOTH right-side columns
    assert(nulls.forall(_.isNullAt(3)))
    // matched and expired partitions are disjoint on click_id
    val matchedClicks = rows.filterNot(_.isNullAt(2)).map(_.getLong(1)).toSet
    assert(nulls.forall(r => !matchedClicks.contains(r.getLong(1))))
  }

  test("domain token cap law: kept tokens are monotone in the budget, bounded by it") {
    import spark.implicits._
    val docs = (0 until 30).map { i =>
      (i.toLong, toks(50 + 37 * (i % 7), "w"), "en", s"s${i % 3}", 1L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val budgets = Seq(100L, 300L, 700L, 1500L, 4000L)
    val keptBy = budgets.map { b =>
      val rows = WebCorpus.domainCapOn(spark, s"r11-dcap-law-$b", docs, b).collect()
      // per-source kept tokens never exceed the budget
      rows.foreach(r => assert(r.getLong(4) <= b,
        s"budget $b violated: ${r.getLong(4)} kept for ${r.getString(0)}"))
      b -> rows.map(r => r.getString(0) -> r.getLong(4)).toMap
    }
    // growing the budget never shrinks any source's kept tokens
    keptBy.sliding(2).foreach {
      case Seq((b1, k1), (b2, k2)) =>
        k1.keys.foreach(s => assert(k1(s) <= k2(s),
          s"kept tokens shrank for $s when budget grew $b1 -> $b2"))
      case _ => ()
    }
  }

  test("substring dup law: doc relabeling permutes but never changes the stats multiset") {
    import spark.implicits._
    val base = Seq(
      (0L, "a b c d e f g h i j k", "en", "s", 1L),
      (1L, "a b c d e f g h z y x", "en", "s", 1L),
      (2L, "m n o p q r s t u v w", "en", "s", 1L),
      (3L, "m n o p q r s t 1 2 3", "en", "s", 1L))
    def statsOf(rows: Seq[(Long, String, String, String, Long)], key: String) =
      WebCorpus.substringDupOn(spark, key, rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    val relabeled = base.map { case (id, t, l, s, n) => (1000L - id * 7, t, l, s, n) }
    assert(statsOf(base, "r11-ssdup-law-a") == statsOf(relabeled, "r11-ssdup-law-b"),
      "per-doc window stats must be invariant under doc_id relabeling")
  }

  test("events ts contract: epoch-nanos BIGINT whatever the parquet encoding") {
    import org.apache.spark.sql.types.LongType
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == LongType, "ts must normalize to BIGINT nanos")
    // value check: nanos must be an exact multiple of 1000 of the
    // micros DuckDB reads (epoch_us parity is what every oracle uses),
    // and land in a sane epoch range (2020-2030)
    val r = ev.selectExpr("min(ts) AS mn", "max(ts) AS mx",
      "sum(CASE WHEN ts % 1000 != 0 THEN 1 ELSE 0 END) AS off_grid").head()
    assert(r.getLong(2) == 0L, "micros-encoded file must normalize onto the nanos grid")
    assert(r.getLong(0) > 1577836800L * 1000000000L && r.getLong(1) < 1893456000L * 1000000000L,
      s"ts out of epoch-nanos range: ${r.getLong(0)}..${r.getLong(1)}")
  }

  test("hll intersect: bounds hold and intersections are sane on testdata") {
    val rows = Relational.qHllIntersect.run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (na, nb, ni) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ni <= math.min(na, nb))
      assert(r.getBoolean(5), s"inclusion-exclusion bound failed: $r")
    }
  }
}
