package graft.operators

import graft.functions.IpToLong
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the CIDR longest-prefix-match rollup and the strict
  * `ip_to_long` parse it rides on: parse accept/reject cases (octet
  * range, arity, leading zeros), interpreted == codegen == SQL
  * registration, longest-prefix-wins on a hand rule table, the
  * explicit allow bucket for uncovered and unparseable sources, and
  * packet-count conservation across buckets.
  */
class MitigationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("ip_to_long: strict parse accepts exactly well-formed dotted quads") {
    assert(IpToLong.parse("0.0.0.0") == 0L)
    assert(IpToLong.parse("255.255.255.255") == 4294967295L)
    assert(IpToLong.parse("10.0.0.1") == 167772161L)
    assert(IpToLong.parse("172.16.0.0") == 2886729728L)
    assert(IpToLong.parse("1.2.3.4") == 16909060L)
    // rejections: octet range, arity, separators, leading zeros, junk
    for (bad <- Seq("256.1.1.1", "1.2.3.256", "1.2.3", "1.2.3.4.5",
        "1..2.3", ".1.2.3", "1.2.3.", "", "a.b.c.d", "1.2.3.4 ",
        " 1.2.3.4", "01.2.3.4", "1.2.3.04", "00.1.2.3", "1,2,3,4",
        "-1.2.3.4", "1.2.3.4.", "1234.1.1.1"))
      assert(IpToLong.parse(bad) == -1L, s"accepted malformed: '$bad'")
    // single zeros are fine, multi-digit values starting non-zero too
    assert(IpToLong.parse("0.10.100.200") ==
      (10L * 65536 + 100L * 256 + 200L))
  }

  test("ip_to_long: interpreted, codegen'd, and SQL paths agree (null on malformed)") {
    import spark.implicits._
    IpToLong.register(spark)
    val in = Seq("10.1.2.3", "256.1.1.1", "01.1.1.1", "8.8.8.8", "x")
      .toDF("s")
    val viaCol = in.select(IpToLong($"s").as("ip")).collect().map(r =>
      if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0)))
    val viaSql = in.selectExpr("ip_to_long(s) AS ip").collect().map(r =>
      if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0)))
    val expect = Array[java.lang.Long](
      167838211L, null, null, 134744072L, null)
    assert(viaCol.toSeq == expect.toSeq)
    assert(viaSql.toSeq == expect.toSeq)
  }

  private def packets(rows: (String, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("src_ip", "length", "syn_flag")
  }

  private val handRules = Seq(
    (1L, "10.0.0.0/8", "monitor"),
    (2L, "10.7.0.0/16", "rate_limit"),
    (3L, "10.7.7.0/24", "block"),
    (4L, "10.7.7.128/25", "block"))

  test("longest prefix wins through a 4-deep nest; tie-break is rule_id") {
    // 10.7.7.200 → /25 (deepest); 10.7.7.1 → /24; 10.7.1.1 → /16;
    // 10.9.9.9 → /8; 9.9.9.9 → no rule → allow bucket
    val p = packets(
      ("10.7.7.200", 100L, 1L), ("10.7.7.200", 50L, 0L),
      ("10.7.7.1", 10L, 0L), ("10.7.1.1", 20L, 1L),
      ("10.9.9.9", 30L, 0L), ("9.9.9.9", 40L, 1L))
    val got = Mitigation.cidrMatchOn(p, handRules).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(5))).toSeq
    assert(got == Seq(
      (-1L, "", "allow", 1L, 40L),
      (1L, "10.0.0.0/8", "monitor", 1L, 30L),
      (2L, "10.7.0.0/16", "rate_limit", 1L, 20L),
      (3L, "10.7.7.0/24", "block", 1L, 10L),
      (4L, "10.7.7.128/25", "block", 2L, 150L)))
    // same-length overlap: duplicate /24 rule with higher id must lose
    val dup = handRules :+ (9L, "10.7.7.0/24", "block")
    val tie = Mitigation.cidrMatchOn(packets(("10.7.7.1", 1L, 0L)), dup)
      .collect().map(_.getLong(0)).toSeq
    assert(tie == Seq(3L))
  }

  test("unparseable sources land in the explicit allow bucket, never dropped") {
    val p = packets(("999.1.1.1", 7L, 0L), ("garbage", 3L, 1L),
      ("10.0.0.1", 5L, 0L))
    val got = Mitigation.cidrMatchOn(p, handRules).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
    // (-1, 2 packets over 2 distinct "ips"), (rule 1, the real packet)
    assert(got == Seq((-1L, 2L, 2L), (1L, 1L, 1L)))
  }

  test("buckets conserve the packet stream on the driver corpus") {
    val pk = graft.flow.BatchFlowFeaturizer.packetsFromEvents(
      graft.Tables.events(spark, "/root/testdata/sf0.001"))
    val out = Mitigation.cidrMatchOn(pk, Mitigation.Rules)
    val rows = out.collect()
    assert(rows.map(_.getLong(3)).sum == pk.count(),
      "per-rule n_packets must partition the stream")
    // the never-matching 172.16/12 rule emits no row; every emitted
    // rule is from the table or the allow bucket
    val ids = rows.map(_.getLong(0)).toSet
    assert(!ids.contains(7L))
    assert(ids.subsetOf(Mitigation.Rules.map(_._1).toSet + -1L))
  }

  test("the nested /27 is non-vacuous at the oracle scale") {
    // sf0.001's 30 distinct sources miss 10.2.1.32–49 entirely; the
    // sf0.01 oracle corpus (200 sources) must exercise the deepest rule
    val pk = graft.flow.BatchFlowFeaturizer.packetsFromEvents(
      graft.Tables.events(spark, "/root/testdata/sf0.01"))
    val ids = Mitigation.cidrMatchOn(pk, Mitigation.Rules)
      .collect().map(_.getLong(0)).toSet
    assert(ids.contains(6L), "10.2.1.32/27 should capture b-side traffic")
  }

  test("no forced broadcast of input-derived relations — only config rules hinted") {
    // Under spoofed randomized sources, the distinct-src_ip verdict
    // relation is bounded only by the 2^32 address space; a forced
    // broadcast of it is an OOM at adversarial cardinality. The ONLY
    // hint allowed in the plan is the literal rules table (config
    // data, a LocalRelation leaf) — the verdict join must stay a
    // plain equi-join whose strategy AQE chooses at runtime.
    import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, ResolvedHint}
    val df = Mitigation.qCidrMatch.run(spark, "/root/testdata/sf0.001")
    val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.nonEmpty, "the config rules broadcast should remain hinted")
    hints.foreach { h =>
      assert(h.child.collectLeaves().forall(_.isInstanceOf[LocalRelation]),
        "a broadcast hint covers an input-derived relation — would OOM " +
          "at adversarial distinct-IP cardinality:\n" + h.treeString)
    }
  }

  test("cidrBounds rejects unaligned bases") {
    intercept[IllegalArgumentException](Mitigation.cidrBounds("10.0.0.1/8"))
    assert(Mitigation.cidrBounds("10.2.1.32/27") ==
      ((167903520L, 167903551L, 27L)))
  }
}
