package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the Misra–Gries mergeable heavy-hitter summary: exactness
  * below capacity (under every partitioning), the underestimate-only
  * and bounded-error guarantees in the approximate regime, the
  * guaranteed-retention threshold, capacity enforcement, and the
  * driver-side algebra of reduce/merge (decrement semantics,
  * merge-cut ties).
  */
class MisraGriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def summarize(keys: Seq[String], m: Int, parts: Int): Map[String, Long] = {
    import spark.implicits._
    val mg = MisraGries.aggregator(m).toColumn
    spark.createDataset(keys).repartition(parts)
      .select(mg.name("entries")).collect().head
      .map(e => e.key -> e.min_count).toMap
  }

  // ---- driver-side algebra (no Spark) ----

  test("reduce: global decrement fires only when full; new key is not inserted") {
    val agg = MisraGries.aggregator(2)
    var s = agg.zero
    s = agg.reduce(s, "a"); s = agg.reduce(s, "a"); s = agg.reduce(s, "b")
    // table full {a:2, b:1}; incoming "c" decrements both, drops b, and
    // is itself cancelled against the decrement
    s = agg.reduce(s, "c")
    assert(s.keys.toSeq == Seq("a") && s.counts.toSeq == Seq(1L))
  }

  test("merge: keywise sums below capacity; (m+1)-th-largest cut above, ties dropped") {
    val agg = MisraGries.aggregator(2)
    def mk(kvs: (String, Long)*) =
      MisraGries.Summary(kvs.map(_._1).toArray, kvs.map(_._2).toArray)
    val sum = agg.merge(mk("a" -> 3L, "b" -> 2L), mk("b" -> 4L, "a" -> 1L))
    assert(sum.keys.toSeq.sorted == Seq("a", "b"))
    assert(sum.keys.zip(sum.counts).toMap == Map("a" -> 4L, "b" -> 6L))
    // 3 distinct keys, m=2: cut = 3rd largest (2); c is tied with the
    // cut and must drop (strictly-greater survival)
    val cut = agg.merge(mk("a" -> 5L, "b" -> 3L), mk("c" -> 2L))
    assert(cut.keys.zip(cut.counts).toMap == Map("a" -> 3L, "b" -> 1L))
  }

  // ---- distributed laws ----

  test("exact below capacity: equals GROUP BY counts under every partitioning") {
    val keys = (1 to 40).flatMap(i => Seq.fill(i % 7 + 1)(s"k$i"))
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 4, 13))
      assert(summarize(keys, m = 64, parts) == truth,
        s"below-capacity summary must be exact at $parts partitions")
  }

  test("approximate regime: underestimate-only, bounded error, heavy key retained") {
    // skewed stream: one heavy key + a singleton tail far above capacity
    val heavy = Seq.fill(500)("HEAVY")
    val tail = (1 to 300).map(i => s"t$i")
    val keys = new scala.util.Random(42).shuffle(heavy ++ tail ++ tail) // N = 1100
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = keys.size.toLong
    for (parts <- Seq(1, 4, 13)) {
      val est = summarize(keys, m = 8, parts)
      assert(est.size <= 8, "capacity bound violated")
      val retained = est.values.sum
      val bound = (n - retained) / 9 // (N - M)/(m+1)
      est.foreach { case (k, c) =>
        assert(c <= truth(k), s"$k overestimated: $c > ${truth(k)}")
        assert(truth(k) - c <= bound,
          s"$k error ${truth(k) - c} exceeds (N-M)/(m+1)=$bound at $parts parts")
      }
      // the heavy key's true count dwarfs the bound -> must be retained
      assert(est.contains("HEAVY"),
        s"guaranteed-heavy key evicted at $parts partitions")
      assert(truth("HEAVY") > bound)
    }
  }

  test("updateTracked flags exactly the global-decrement steps") {
    // m=2: a, b fill the slots; a third distinct key triggers the
    // decrement (hit=true); re-seen keys and slot claims never do.
    var s = MisraGries.Summary(Array.empty, Array.empty)
    def step(k: String): Boolean = {
      val (ns, hit) = MisraGries.updateTracked(s, k, 2)
      s = ns; hit
    }
    assert(!step("a") && !step("b"), "slot claims are not capacity hits")
    assert(!step("a"), "tracked-key increment is not a capacity hit")
    assert(step("c"), "absent key with no free slot IS a capacity hit")
    // after the decrement, b (count 1) dropped; summary is under
    // capacity again — the final size cannot reveal the hit (the r16
    // ADVICE failure mode this API exists to fix)
    assert(s.keys.length < 2)
    assert(!step("d"), "freed slot: claim again, no hit")
  }

  test("null keys are tracked and the final sort is null-safe on count ties") {
    val agg = MisraGries.aggregator(4)
    var s = agg.zero
    // null and "b" tie at 2; "a" leads with 3 — finish must not NPE
    // and must place non-null before null within the tie
    Seq("a", null, "b", "a", null, "b", "a").foreach(k => s = agg.reduce(s, k))
    val out = agg.finish(s)
    assert(out.map(e => Option(e.key)).toSeq ==
      Seq(Some("a"), Some("b"), None))
    assert(out.map(_.min_count).toSeq == Seq(3L, 2L, 2L))
  }

  test("oracle-SF regime canary: distinct keys at sf0.01 sit under the capacity") {
    // the q_mg_heavy_hitters oracle (plain GROUP BY) is valid ONLY
    // below capacity; the driver's hash gate runs at sf0.01. If a
    // testdata refresh ever pushes the user domain past MgCap, this
    // canary fails BEFORE the driver reads a mysterious hash mismatch.
    val users = graft.Tables.events(spark, "/root/testdata/sf0.01")
      .select("user_id").distinct().count()
    assert(users <= graft.operators.Sketches.MgCap,
      s"sf0.01 has $users distinct users > MgCap=${graft.operators.Sketches.MgCap} — " +
        "the MG oracle would mismatch by design; raise MgCap or re-key the query")
  }

  test("catalog regime: q_mg_heavy_hitters is exact at the oracle scale") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val got = graft.operators.Sketches.mgOn(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val truth = ev.groupBy($"user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == truth, "below-capacity catalog run must equal exact counts")
    assert(got.nonEmpty)
  }
}
