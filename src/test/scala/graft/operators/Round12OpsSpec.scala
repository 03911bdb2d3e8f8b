package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 behavioral specs: the /16-prefix extraction is anchored to
  * full dotted quads with an explicit unparseable bucket, and the
  * variant-shapes query classifies every generated shape through
  * schema introspection.
  */
class Round12OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("prefix16: full-quad anchoring; malformed sources land in the '' bucket") {
    import spark.implicits._
    // r11 ADVICE: the old `^([0-9]+[.][0-9]+)` matched ANY leading
    // d.d — `1.2.3` and `999.1` produced bogus prefixes, and a
    // startsWith("10.") assertion could never catch the empty bucket.
    val cases = Seq(
      "10.1.2.3"   -> "10.1", // well-formed quad
      "1.2.3"      -> "",     // too few octets
      "999.1"      -> "",     // partial
      "evil"       -> "",     // not an IP at all
      "10.1.2.3.4" -> "")     // over-long ($ anchor)
    val got = cases.map(_._1).toDF("src_ip")
      .selectExpr("src_ip",
        s"regexp_extract(src_ip, '${Detection.Prefix16Re}', 1) AS p")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (ip, want) => assert(got(ip) == want, s"for $ip") }
  }

  test("prefix16 over the corpus: exactly the synthetic /16s, no empty bucket") {
    val prefixes = Detection.qIpPrefix.run(spark, "/root/testdata/sf0.001")
      .collect().map(_.getString(0)).toSet
    // the event→packet derivation puts every source in 10.[0-4].*
    assert(prefixes == Set("10.0", "10.1", "10.2", "10.3", "10.4"))
  }

  test("variant shapes: every generation classified via schema introspection") {
    val rows = SemiStructured.qVariantShapes.run(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1000 events spread over event_id % 4 + the planted malformed row
    assert(rows.keySet == Set("flat", "with_tags", "nested", "string_k", "malformed"))
    assert(rows("malformed") == 1L)
    assert(rows.values.sum == 1001L)
  }

  test("variant shapes: nested and array paths extract; type change absorbed") {
    val r = SemiStructured.qVariantShapes.run(spark, "/root/testdata/sf0.001")
      .collect().map(x => x.getString(0) -> x).toMap
    // nested shape: k arrives ONLY via $.meta.k
    assert(r("nested").getAs[Long]("n_k_top") == 0L)
    assert(r("nested").getAs[Long]("n_k_meta") == r("nested").getAs[Long]("n"))
    // bigint→string generation: try_variant_get still casts every k
    assert(r("string_k").getAs[Long]("n_k_top") == r("string_k").getAs[Long]("n"))
    // array shape: every row has tags[0] and exactly 2 elements
    val wt = r("with_tags")
    assert(wt.getAs[Long]("n_tag0") == wt.getAs[Long]("n"))
    assert(wt.getAs[Long]("sum_n_tags") == 2 * wt.getAs[Long]("n"))
  }

  test("surprisal: whole-bit hand math — common tokens 0 bits, hapax log2(N)") {
    import spark.implicits._
    // corpus: a×5, b×1 → N=6; bits(a)=floor(log2(6 DIV 5))=0,
    // bits(b)=floor(log2(6 DIV 1))=2
    val docs = Seq(
      (0L, "a a a a", "en", "s", 7L),
      (1L, "a b", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = TextAnalysis.surprisalOn(spark, "r12-surp", docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (0L, 4L, 0L, 0L),       // all-common doc carries zero bits
      (1L, 2L, 2L, 1000L)))   // the hapax contributes its 2 bits
  }

  test("surprisal: rare-token docs rank above common-token docs (quality law)") {
    import spark.implicits._
    // 9 identical prose docs + 1 gibberish doc of unique tokens
    val docs = ((0L to 8L).map(i => (i, "the cat sat on the mat", "en", "s", 22L)) :+
      (9L, "zq8 vx0 qk7 jw2 hp9 fz4", "en", "s", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val scores = TextAnalysis.surprisalOn(spark, "r12-surp2", docs)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert((0L to 8L).forall(i => scores(i) < scores(9L)),
      s"gibberish doc must out-score prose: $scores")
  }

  test("cluster-size histogram is consistent with the per-doc cluster relation") {
    val dir = "/root/testdata/sf0.001"
    val perDoc = Dedup.qClusters.run(spark, dir).collect()
      .map(r => r.getAs[Long]("cluster_rep") -> r.getAs[Long]("cluster_size"))
    // derive the histogram from the (oracle-gated) per-doc view...
    val expect = perDoc.distinct.groupBy(_._2) // one (rep, size) row per cluster
      .map { case (sz, clusters) =>
        sz -> (clusters.length.toLong, clusters.length * sz) }
    // ...and it must equal q_dedup_cluster_sizes exactly
    val got = Dedup.qClusterSizes.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect, s"histogram mismatch: got $got expect $expect")
    // and the histogram must account for every document exactly once
    assert(got.values.map(_._2).sum == perDoc.length)
  }

  test("cohort retention: offset-0 is always 10000 bp and cohorts partition the users") {
    val dir = "/root/testdata/sf0.001"
    val rows = TimeSeries.qCohortRetention.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, off, n, size, bp) =>
      assert(off >= 0 && n <= size && bp <= 10000)
      if (off == 0) assert(n == size && bp == 10000)
    }
    // offset-0 cohort sizes partition the distinct-user universe
    val users = graft.Tables.events(spark, dir)
      .select("user_id").distinct().count()
    assert(rows.collect { case (_, 0L, n, _, _) => n }.sum == users)
  }

  test("cohort retention: shifting all timestamps by whole weeks translates the matrix") {
    // equivariance law: ts -> ts + k weeks shifts every cohort_week by
    // k and preserves (offset, n_users, cohort_size, retention_bp) —
    // the matrix depends only on RELATIVE timing
    val dir = "/root/testdata/sf0.001"
    val k = 3L
    val weekNs = TimeSeries.WeekUs * 1000
    val ev = graft.Tables.events(spark, dir)
    def matrix(df: org.apache.spark.sql.DataFrame) =
      TimeSeries.cohortOn(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val base = matrix(ev)
    val shifted = matrix(ev.withColumn("ts",
      org.apache.spark.sql.functions.expr(s"ts + ${k * weekNs}")))
    assert(shifted.toSeq == base.map { case (cw, off, n, sz, bp) => (cw + k, off, n, sz, bp) }.toSeq)
  }

  test("hierarchy traversal: recursive depth is exactly floor(log2(id))") {
    // The binary-tree synthesis makes the invariant exact: level d of
    // the recursion holds precisely the contiguous ids of binary width
    // d+1 — so the UnionLoop traversal is checked against pure
    // arithmetic, not against another traversal.
    val dir = "/root/testdata/sf0.001"
    val nKeys = graft.Tables.customer(spark, dir).count()
    val rows = Relational.qHierarchy.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (depth, n, minId, maxId) =>
      def flog2(x: Long) = 63 - java.lang.Long.numberOfLeadingZeros(x)
      assert(flog2(minId) == depth && flog2(maxId) == depth)
      assert(minId == (1L << depth))
      assert(n == maxId - minId + 1, "keys are contiguous, so each level is an id interval")
    }
    // every customer except the degenerate self-parent id 0 is reached
    assert(rows.map(_._2).sum == nKeys - 1)
  }

  test("surprisal: duplicating the whole corpus leaves every score unchanged") {
    import spark.implicits._
    // k-fold duplication scales N and every c_t by k, so N/c_t — and
    // therefore every whole-bit surprisal — is invariant: floor of the
    // SAME rational. The dedup-before-scoring ordering question is
    // therefore score-neutral; only the weights change.
    val docs = Seq(
      (0L, "alpha beta beta gamma", "en", "s", 21L),
      (1L, "alpha delta", "en", "s", 11L),
      (2L, "rare0 rare1 rare2", "en", "s", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val doubled = docs.unionAll(docs
      .withColumn("doc_id", $"doc_id" + 100L))
    def scores(df: org.apache.spark.sql.DataFrame, key: String) =
      TextAnalysis.surprisalOn(spark, key, df).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val s1 = scores(docs, "r12-dup1")
    val s2 = scores(doubled, "r12-dup2")
    (0L to 2L).foreach { id =>
      assert(s2(id) == s1(id), s"doc $id moved under corpus duplication")
      assert(s2(id + 100) == s1(id), s"copy of doc $id diverged")
    }
  }
  // ---- source-entropy flood signal ----

  private def packets(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("ts_us", "src_ip")
  }

  test("entropy: a single-source window collapses to zero bits and flags low_entropy") {
    val h = Detection.EntropyWinUs
    val got = Detection.entropyOn(packets(
      (0L until 10L).map(i => (i * 1000L, "10.0.0.1")): _*)).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)) ==
      ((10L, 1L, 0L, 0L, true)))
    assert(r.getLong(0) == 0L && h > 0)
  }

  test("entropy: a uniform 8-source window scores exactly 3000 mbits and does not flag") {
    // 8 sources x 2 packets: every c = 2, N = 16, floorLog2(16/2) = 3
    val rows = for { s <- 0 until 8; k <- 0 until 2 }
      yield ((s * 100 + k).toLong, s"10.0.0.$s")
    val r = Detection.entropyOn(packets(rows: _*)).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)) ==
      ((16L, 8L, 48L, 3000L, false)))
  }

  test("entropy: below the MinPackets support floor nothing flags, even at zero entropy") {
    val r = Detection.entropyOn(packets(
      (1L, "10.0.0.1"), (2L, "10.0.0.1"), (3L, "10.0.0.1"))).collect().head
    assert(r.getLong(4) == 0L && !r.getBoolean(5))
  }

  test("entropy: windows partition by event-time hour") {
    val h = Detection.EntropyWinUs
    val got = Detection.entropyOn(packets(
      (0L, "a"), (h - 1, "a"), (h, "b"), (2 * h + 5, "c"))).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 2L), (h, 1L), (2 * h, 1L)))
  }
  // ---- XML schema-on-read semantics ----

  test("from_xml PERMISSIVE: malformed XML yields null fields, partial parses keep good ones") {
    import org.apache.spark.sql.functions.{from_xml, lit => flit}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("cents", LongType)))
    val rows = Seq(
      "<ROW><event_id>1</event_id><cents>250</cents></ROW>", // clean
      "<ROW><event_id>oops</ROW>",                           // unclosed tag
      "garbage",                                             // not XML
      "<ROW><event_id>7</event_id><cents>bad</cents></ROW>") // bad cell only
      .toDF("x")
    val got = rows
      .select(from_xml($"x", schema).as("p"))
      .selectExpr("p IS NULL AS pn", "p.event_id AS e", "p.cents AS c")
      .collect()
      .map(r => (r.getBoolean(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(got == Seq(
      (false, Some(1L), Some(250L)),
      (false, None, None),     // struct survives, fields null — the
      (false, None, None),     // q_xml_extract count(p.event_id) contract
      (false, Some(7L), None))) // cell-level nulling, not row-level
  }
  // ---- dup-graph transitivity ----

  test("transitivity: triangle + pendant gives the paper numbers; empty graph gives zeros") {
    import spark.implicits._
    // edges (1,2),(2,3),(1,3),(3,4): degrees 2,2,3,1 -> wedges 1+1+3 = 5,
    // one triangle -> transitivity = 3*1/5 = 6000 bp
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val r = Dedup.transitivityOn(pairs).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((4L, 4L, 5L, 1L, 6000L)))
    val empty = Dedup.transitivityOn(pairs.where($"doc_a" < 0)).collect().head
    assert((empty.getLong(0), empty.getLong(1), empty.getLong(2), empty.getLong(3),
      empty.getLong(4)) == ((0L, 0L, 0L, 0L, 0L)))
  }

  test("transitivity: a clique is fully transitive (10000 bp), a path has no triangles") {
    import spark.implicits._
    // K4: 6 edges, wedges = 4*C(3,2) = 12, triangles = 4 -> 3*4/12 = 10000 bp
    val k4 = (for { a <- 1 to 4; b <- (a + 1) to 4 } yield (a.toLong, b.toLong))
      .toDF("doc_a", "doc_b")
    assert(Dedup.transitivityOn(k4).collect().head.getLong(4) == 10000L)
    // path 1-2-3-4: 2 wedges, 0 triangles
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val p = Dedup.transitivityOn(path).collect().head
    assert((p.getLong(2), p.getLong(3), p.getLong(4)) == ((2L, 0L, 0L)))
  }
  // ---- correlated LATERAL top-k ----

  test("lateral top-k: decorrelates to group-limit operators and matches the rank spelling") {
    val dir = "/root/testdata/sf0.001"
    val df = Relational.qLateralTopk.run(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the LIMIT-under-LATERAL must become WindowGroupLimit pruning
    // (map-side partial + final), never a per-nation loop or cartesian
    assert(plan.contains("WindowGroupLimit"), s"no group-limit pruning in:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    val viaRank = spark.sql("""
      SELECT n_name, c_custkey, cents FROM (
        SELECT n.n_name, c.c_custkey,
               CAST(round(c.c_acctbal * 100, 0) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY n.n_nationkey
                                  ORDER BY CAST(round(c.c_acctbal * 100, 0) AS BIGINT) DESC,
                                           c.c_custkey) AS rn
        FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey)
      WHERE rn <= 3 ORDER BY n_name, cents DESC, c_custkey""")
    assert(df.collect().toSeq == viaRank.collect().toSeq)
  }
  // ---- BFS hop distance ----

  test("hop distance: path cluster counts hops, singleton reports 0, cross-cluster isolated") {
    import spark.implicits._
    // cluster rep 1 is a path 1-2-3-4; doc 9 is a singleton
    val comp = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (9L, 9L))
      .toDF("doc_id", "cluster_rep")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val got = Dedup.hopDistancesOn(comp, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 2L), (4L, 1L, 3L),
      (9L, 9L, 0L)))
  }

  test("hop distance: shortest path wins when a shortcut edge exists") {
    import spark.implicits._
    // 1-2-3-4 plus shortcut 1-4: doc 4 is 1 hop, doc 3 is 2 (via either side)
    val comp = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)).toDF("doc_id", "cluster_rep")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("doc_a", "doc_b")
    val got = Dedup.hopDistancesOn(comp, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }
  // ---- 2-D Pareto front ----

  test("pareto front: windowed rewrite matches hand dominance, duplicates share a cell") {
    import spark.implicits._
    val pts = Seq((3L, 1L), (2L, 2L), (1L, 3L), (2L, 1L), (3L, 0L), (3L, 1L))
      .toDF("cents", "dt")
    val got = Relational.skylineOn(pts).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // staircase: (3,1)x2, (2,2), (1,3); (2,1) loses to (2,2), (3,0) to (3,1)
    assert(got == Seq((3L, 1L, 2L), (2L, 2L, 1L), (1L, 3L, 1L)))
  }

  test("pareto front: equality on one axis still dominates when the other is strict") {
    import spark.implicits._
    // (2,5) is dominated by (3,5): same date, strictly higher cents
    val pts = Seq((3L, 5L), (2L, 5L), (2L, 7L)).toDF("cents", "dt")
    val got = Relational.skylineOn(pts).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((3L, 5L), (2L, 7L)))
  }
}
