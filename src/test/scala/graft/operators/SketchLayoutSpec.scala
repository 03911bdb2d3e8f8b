package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Data-independent invariants of the round-5 operators: the bloom
  * filter's one-sided error, CMS admissibility, the Morton curve's
  * tile-locality (the property that makes z-order skipping work), and
  * SCD2 history-shape laws. The DuckDB oracle already gates exact
  * values; these pin the THEOREMS, so a future hash change that
  * accidentally breaks a guarantee fails here with a named law, not a
  * hash diff.
  */
class SketchLayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("bloom semi-join: no false negatives, candidates bounded by scan") {
    val r = Sketches.qBloomSemiJoin.run(spark, dir).collect()(0)
    val (n, cand, exact, fn, fp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(fn == 0L, "bloom must never drop a true match")
    assert(cand >= exact && cand <= n)
    assert(cand == exact + fp)
  }

  test("bloom + CMS plans are pure broadcast joins — the fact scan never shuffles") {
    for (q <- Seq(Sketches.qBloomSemiJoin, Sketches.qCmsHeavyHitters)) {
      val plan = q.run(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"),
        s"${q.name}: a sketch probe must not sort-merge the fact side:\n$plan")
      assert(plan.contains("BroadcastHashJoin"), s"${q.name}: no broadcast join found")
    }
  }

  test("CMS heavy hitters: every estimate is admissible (est >= exact)") {
    val rows = Sketches.qCmsHeavyHitters.run(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"CMS under-estimated ${r.getLong(0)}")
      assert(r.getLong(2) >= r.getLong(1))
    }
  }

  test("z-order buckets are 16x16 tiles (the locality skipping relies on)") {
    // dropping the low 8 z-bits fixes the high 4 bits of BOTH x and y,
    // so every bucket's x/y envelope spans at most one 16-wide tile.
    val rows = Layout.qZorderCurve.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (xMin, xMax) = (r.getLong(4), r.getLong(5))
      val (yMin, yMax) = (r.getLong(6), r.getLong(7))
      assert(xMax - xMin <= 15, s"bucket ${r.getLong(0)} x-span ${xMax - xMin}")
      assert(yMax - yMin <= 15, s"bucket ${r.getLong(0)} y-span ${yMax - yMin}")
      assert(xMax / 16 == xMin / 16 && yMax / 16 == yMin / 16,
        s"bucket ${r.getLong(0)} crosses a tile boundary")
    }
  }

  test("int8 quantization: codes hit both extremes, error within half a step") {
    val rows = Quantize.qEmbeddingQuantize.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1, s"vec ${r.getLong(0)}: min element must code to 0")
      assert(r.getLong(3) >= 1, s"vec ${r.getLong(0)}: max element must code to 255")
      assert(r.getLong(1) >= 255, "code_sum must at least cover the max code")
      assert(r.getLong(4) <= 500001, s"vec ${r.getLong(0)}: error ${r.getLong(4)} ppm > half step")
    }
  }

  test("key skew: shares are consistent and ordering is by weight") {
    val rows = OpsDiagnostics.qKeySkew.run(spark, dir).collect()
    assert(rows.length == 10)
    val ns = rows.map(_.getLong(1))
    assert(ns.sameElements(ns.sorted.reverse), "not ordered by weight")
    rows.foreach(r => assert(r.getLong(2) >= 0 && r.getLong(2) <= 10000))
  }

  test("compaction plan: first-fit bins overflow by at most one document") {
    val rows = OpsDiagnostics.qCompactionPlan.run(spark, dir).collect()
    val maxDoc = graft.Tables.documents(spark, dir)
      .agg(org.apache.spark.sql.functions.max("n_chars")).collect()(0).getLong(0)
    rows.foreach { r =>
      assert(r.getLong(3) < 64000L + maxDoc,
        s"bin ${r.getString(0)}/${r.getLong(1)} holds ${r.getLong(3)} chars")
    }
    // bins are dense per source: 0..max with no gaps
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val bins = rs.map(_.getLong(1)).sorted
      assert(bins.sameElements(bins.indices.map(_.toLong)), s"gap in bins for $src")
    }
  }

  test("CDC apply: deletes drop, latest change wins, odd keys untouched") {
    val out = Cdc.qCdcApply.run(spark, dir)
    out.createOrReplaceTempView("cdc")
    graft.Tables.orders(spark, dir).createOrReplaceTempView("orders_base")
    val laws = spark.sql("""
      SELECT
        count_if(o_orderkey % 10 = 0) AS surviving_deleted,
        count_if(o_orderkey % 2 = 0 AND NOT was_updated) AS even_not_updated,
        count_if(o_orderkey % 2 = 1 AND was_updated) AS odd_updated,
        count_if(o_orderkey % 2 = 0 AND cents <> base_cents + 200) AS wrong_final
      FROM (SELECT c.*, CAST(round(b.o_totalprice * 100, 0) AS BIGINT) AS base_cents
            FROM cdc c JOIN orders_base b USING (o_orderkey))
      """).collect()(0)
    (0 until 4).foreach(i => assert(laws.getLong(i) == 0L,
      s"law ${laws.schema(i).name} violated ${laws.getLong(i)} times"))
  }

  test("SCD2 upsert: exactly one open version per key; updates close at 1") {
    val out = Scd.qScd2Upsert.run(spark, dir)
    out.createOrReplaceTempView("scd")
    // classification is relative to the real base-key range, not a
    // constant threshold: inserts are exactly the keys above max(base)
    val maxKey = graft.Tables.customer(spark, dir)
      .agg(org.apache.spark.sql.functions.max("c_custkey")).collect()(0)
      .getAs[Number](0).longValue
    val laws = spark.sql(s"""
      SELECT
        count_if(open_n != 1) AS bad_open,
        count_if(is_update AND (n != 2 OR closed_n != 1)) AS bad_update,
        count_if(is_insert AND (n != 1 OR min_vf != 1)) AS bad_insert,
        count_if(NOT is_update AND NOT is_insert AND
                 (n != 1 OR min_vf != 0)) AS bad_untouched
      FROM (
        SELECT c_custkey,
               count(*) AS n,
               count_if(valid_to IS NULL) AS open_n,
               count_if(valid_to IS NOT NULL) AS closed_n,
               min(valid_from) AS min_vf,
               c_custkey % 3 = 0 AND c_custkey <= $maxKey AS is_update,
               c_custkey > $maxKey AS is_insert
        FROM scd GROUP BY c_custkey)
      """).collect()(0)
    (0 until 4).foreach(i => assert(laws.getLong(i) == 0L,
      s"law ${laws.schema(i).name} violated ${laws.getLong(i)} times"))
  }
}
