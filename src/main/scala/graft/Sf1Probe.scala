package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sharded full-catalog pressure probe at ~sf1 (r5 VERDICT #8;
  * shard isolation r18 per the r17 VERDICT task 1).
  *
  * The driver ships sf0.001/0.01/0.1 only, so this probe synthesizes an
  * sf1-scale corpus under `target/sf1` by replicating sf0.1 `REPS`(=10)
  * times with key columns shifted per replica (offset = max+1 of the
  * key's DOMAIN, read from the domain's defining table, so replicas can
  * never collide). Referential joins survive because every column of a
  * key domain — PK and FKs alike — shifts by that one shared offset;
  * the small dimension tables (region/nation/part/supplier) stay
  * unreplicated, exactly like a real 100 TB layout. Text/embedding
  * payloads are NOT perturbed — every document gains 10 exact copies,
  * which deliberately stress-tests the dedup family's frequency caps
  * and cluster solve rather than handing it an easy dup-free corpus.
  *
  * Measurement is SHARDED (r17 VERDICT task 1): the catalog runs as K
  * contiguous sorted-name groups of ≤ [[ShardSize]] queries, EACH in
  * its own fresh session with its own mini-canary — the r17 sf1 sweep's
  * remaining swept/iso outliers (q_weighted_median 4.2×,
  * q_dedup_ngram_jaccard 3.4×, q_cms_heavy_hitters 3.1×) were co-tenant
  * GC + page-cache pressure from the 209-query single-session sweep,
  * not plans, and the fix is to stop the measurement lying rather than
  * to add storage tiers. Contiguous (not round-robin) grouping keeps
  * operator families with their shared stage views in one shard;
  * cross-shard rebuilds of a shared view are itemized per shard by the
  * build-attribution channel, never silently charged to a query. The
  * slowest movers still get a fresh-session iso re-run afterwards —
  * with sharding, swept ≈ iso is the expected steady state.
  *
  * This is a diagnostic main, not a driver contract: run it manually
  * via `SPARK_DRIVER_MEM=48g sbt "runMain graft.Sf1Probe"`.
  */
object Sf1Probe {

  private val Reps = 10

  /** Shard sizing target: shard count = ⌈catalog/ShardSize⌉ with
    * cost-balanced boundaries ([[Bench.costBalancedShards]], hard cap
    * 1.5×). ~30 keeps a shard's accumulated cache/heap pressure an
    * order of magnitude under the old full-sweep's while bounding
    * session bring-up overhead to K ≈ 8 extra warmups per probe run.
    */
  private val ShardSize = 30

  /** Per-shard machine-state canary: small (3 queries, median-of-3),
    * stage-view-free, spanning scan-agg / window / shuffle-heavy so
    * each shard's numbers carry their own machine context. Distinct
    * from Bench.canary (9 queries) deliberately — K shards × 9 × 3
    * would spend more time on canaries than on measurement.
    */
  private val ShardCanary = Seq(
    "q1_pricing_summary", "q_sessionize", "q_weighted_median")

  /** Replicate `df` `Reps` times, shifting each key column by
    * replica × its key DOMAIN's offset (pre-computed from the domain's
    * defining table).
    */
  private def replicate(df: DataFrame, keyOffsets: Seq[(String, Long)]): DataFrame = {
    val parts = (0 until Reps).map { r =>
      keyOffsets.foldLeft(df) { case (d, (c, off)) =>
        d.withColumn(c, col(c) + lit(r * off))
      }
    }
    parts.reduce(_ unionAll _)
  }

  private def build(spark: SparkSession, src: String, out: String): Unit = {
    // One offset per key DOMAIN, derived from the domain's defining
    // (primary-key) table and applied to EVERY column referencing it.
    // Deriving each column's offset independently breaks referential
    // joins whenever the max PK value never appears in an FK column
    // (orderless customers are standard in TPC-H-style data): replica
    // r's o_custkey would land r·Δ away from replica r's c_custkey.
    def domainOffset(table: String, keyCol: String): Long = {
      val m = spark.read.parquet(s"$src/$table.parquet")
        .agg(max(col(keyCol))).collect()(0)
      require(!m.isNullAt(0),
        s"sf1 probe: base table $table is empty — cannot derive the $keyCol domain offset")
      m.getAs[Number](0).longValue + 1L
    }
    val dom: Map[String, Long] = Map(
      "custkey" -> domainOffset("customer", "c_custkey"),
      "orderkey" -> domainOffset("orders", "o_orderkey"),
      "event_id" -> domainOffset("events", "event_id"),
      "user_id" -> domainOffset("events", "user_id"),
      "doc_id" -> domainOffset("documents", "doc_id"),
      "vec_id" -> domainOffset("embeddings", "vec_id"))
    val plans: Seq[(String, Seq[(String, String)])] = Seq(
      "region" -> Nil, "nation" -> Nil, "part" -> Nil, "supplier" -> Nil,
      "customer" -> Seq("c_custkey" -> "custkey"),
      "orders" -> Seq("o_orderkey" -> "orderkey", "o_custkey" -> "custkey"),
      "lineitem" -> Seq("l_orderkey" -> "orderkey"),
      "events" -> Seq("event_id" -> "event_id", "user_id" -> "user_id"),
      "documents" -> Seq("doc_id" -> "doc_id"),
      "embeddings" -> Seq("vec_id" -> "vec_id"))
    plans.foreach { case (t, keys) =>
      val in = spark.read.parquet(s"$src/$t.parquet")
      val rep = if (keys.isEmpty) in
                else replicate(in, keys.map { case (c, d) => c -> dom(d) })
      rep.write.mode("overwrite").parquet(s"$out/$t.parquet")
      spark.catalog.clearCache()
      println(s"[sf1] built $t (${if (keys.isEmpty) "dim, as-is" else s"x$Reps on ${keys.map(_._1).mkString(",")}"})")
    }
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "target/sf1"
    // arg-order guard: `Sf1Probe <src> <out> [query...]` — passing a
    // query name where OUT goes silently builds a 1.5 GB replica corpus
    // into ./<query_name>/ (this exact misuse once committed one to git)
    require(!SparkEntry.catalog.exists(_.name == out),
      s"second arg '$out' is a catalog QUERY name but is the OUTPUT DIR " +
        "slot — usage: Sf1Probe <srcDir> <outDir> [queryName...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    def newSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      // events.ts rides through the replica untouched in whatever
      // physical encoding the generator used (nanos-under-legacy-flag
      // or micros TIMESTAMP_NTZ) — Tables.events normalizes to
      // epoch-nanos BIGINT at read time either way
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s
    }
    // The ×10 replica build runs in ITS OWN SparkContext, stopped
    // before measurement: r11 found that probing in the build's JVM
    // session inflates allocation-heavy queries 4-25× (621 s total vs
    // 282 s clean for the identical catalog — q_mrl_recall 73 s vs
    // 3.6 s). Whatever the build leaves behind (heap growth, file
    // source state), the measurement session must not inherit it.
    if (!new java.io.File(s"$out/embeddings.parquet").exists()) {
      val buildSpark = newSession()
      build(buildSpark, src, out)
      buildSpark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
    // same attributed eager stage materialization as Bench: at sf1 the
    // shared-stage builds are seconds each, and which query pays must
    // be visible, not inferred
    // optional 3rd+ args: run only the named queries (local profiling)
    val only: Set[String] = args.drop(2).toSet
    var currentQuery = "warmup"
    operators.StageViews.enableBuildAttribution(() => currentQuery)

    // One query, measured MIN-OF-TWO (r18: the same basis as Bench's
    // sweep). Stage (re)builds are charged to the stage channel, not
    // the query (r15 VERDICT task 5) — builds are timed and attributed
    // by StageViews, the query's swept sec EXCLUDES them, and the
    // rebuild cost stays visible under stage_builds with chargedTo =
    // this query. The min matters even with sharding: the FIRST
    // attempt of a query that follows tens of seconds of in-shard
    // stage builds inherits their GC/page-cache wake (r18 shard 3:
    // q_kcore_copurchase 17.7 s attempt-1 vs 2.6 s iso, with its own
    // builds already excluded); attempt 2 runs in the stabilized shard
    // and reads the built stages — the steady-state cost the probe
    // reports everywhere else.
    def runQuery(s: SparkSession, q: Q): (String, Double, Either[String, Long]) = {
      currentQuery = q.name
      def attempt(): (Double, Either[String, Long]) = {
        val builds0 = operators.StageViews.buildLog.size
        val t0 = System.nanoTime()
        val res =
          try Right(q.run(s, out).count())
          catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
        val raw = (System.nanoTime() - t0) / 1e9
        val buildSec = operators.StageViews.buildLog.drop(builds0).map(_.sec).sum
        // free this query's memory-sink tables between attempts: at sf1
        // the streaming emissions held in driver heap otherwise
        // compound across the sweep (the uniform inflation of SF1_r14)
        GraftSession.dropStreamSinks(s)
        (math.max(0.0, raw - buildSec), res)
      }
      val (s1, r1) = attempt()
      val (sec, res) = r1 match {
        case Left(_) => (s1, r1) // a failed query is not re-attempted
        case Right(_) =>
          val (s2, r2) = attempt()
          if (r2.isLeft) (s1, r1) else (math.min(s1, s2), r1)
      }
      res match {
        case Right(n) => println(f"[sf1] ${q.name}%-32s $sec%8.2f s " +
          f"(attempt1 $s1%.2f)  $n%10d rows")
        case Left(err) => println(f"[sf1] ${q.name}%-32s $sec%8.2f s  FAILED: $err")
      }
      (q.name, sec, res)
    }

    // Per-shard machine-state canary, median-of-3 (one-off stalls out,
    // sustained pressure in — the quantity a canary reports).
    def shardCanaryOn(s: SparkSession, shard: Int): Seq[(String, Double)] =
      ShardCanary.flatMap { name =>
        val q = SparkEntry.catalog.find(_.name == name).get
        currentQuery = s"canary$shard:$name"
        val attempts = (1 to 3).flatMap { _ =>
          val t0 = System.nanoTime()
          val sec = try { q.run(s, out).count(); Some((System.nanoTime() - t0) / 1e9) }
            catch { case e: Throwable =>
              println(s"[sf1] canary FAILED $name: ${e.getMessage}"); None }
          GraftSession.dropStreamSinks(s)
          sec
        }
        if (attempts.isEmpty) None
        else {
          val med = attempts.sorted.apply(attempts.size / 2)
          println(f"[sf1] shard$shard canary $name%-24s $med%8.2f s")
          Some(name -> med)
        }
      }

    val sorted = SparkEntry.catalog.sortBy(_.name)
      .filter(q => only.isEmpty || only(q.name))
    // shard = (index, firstName, lastName, canary, shardSec, warm);
    // `warm` itemizes mini-canary members swept in their home shard —
    // those queries' swept numbers carry a warm basis from the canary's
    // median-of-3 moments earlier (r19 ADVICE: document, don't hide)
    case class ShardMeta(idx: Int, first: String, last: String,
        canary: Seq[(String, Double)], sec: Double, warm: Seq[String])
    val (results, shardMeta): (Seq[(String, Double, Either[String, Long])], Seq[ShardMeta]) =
      if (only.nonEmpty) {
        // targeted profiling path: one session, no shards/canaries
        val s = newSession()
        s.range(1000000).selectExpr("sum(id)").collect()
        val r = sorted.map(runQuery(s, _))
        operators.StageViews.unpersistAll(s)
        s.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        (r, Nil)
      } else {
        // Throwaway JVM-warmup SESSION (r19 VERDICT task 2, adjudicated
        // r20): the slowness of shard 0's canary is scoped to the
        // JVM's FIRST SparkContext, not to JIT rep counts — with THREE
        // discarded in-session reps of every canary member, the 6th
        // wm execution of context #1 still read 7.2 s while context
        // #2's first read 2.2 s (r19 baseline: 8.38 s with no warmup,
        // 7.54 s with one rep). Same class as the r11 lesson above
        // (never measure in the replica-BUILD context): context #1 is
        // structurally slow at sf1 scale, so burn it on warmup work
        // and measure only in contexts #2+ — shard 0 then starts
        // exactly as hot as shards 1–7.
        locally {
          val s = newSession()
          s.range(1000000).selectExpr("sum(id)").collect()
          currentQuery = "jvm_warmup"
          try SparkEntry.catalog.find(_.name == "q_rate_window_stream")
            .get.run(s, out).count()
          catch { case _: Throwable => () }
          GraftSession.dropStreamSinks(s)
          for (name <- ShardCanary) {
            try SparkEntry.catalog.find(_.name == name).get.run(s, out).count()
            catch { case _: Throwable => () }
            GraftSession.dropStreamSinks(s)
          }
          operators.StageViews.unpersistAll(s)
          s.stop()
          SparkSession.clearActiveSession()
          SparkSession.clearDefaultSession()
          println("[sf1] jvm warmup context retired (measurement starts at context #2)")
        }
        // cost-balanced contiguous cuts from the last committed SF1
        // record (r19 VERDICT task 1: alphabetical fixed-size cuts left
        // shard 6 at 122 s vs shard 7's 49 s); fixed-size when absent
        val (costSrc, qCosts, bCosts) = Bench.latestRoundCosts("SF1")
        // repMult = Reps: this probe sweeps each query Reps times, so
        // query seconds must be weighted Reps x (not Bench's 2 x) to sit
        // on the same wall-clock scale as stage-build seconds (r20 ADVICE).
        // Affinity order (r21): co-locate stage-sharing families like
        // Bench, reusing the bench channel's touch signal (the view
        // consumer sets are scale-independent); cuts prefer cluster
        // boundaries; clusters size-capped at ShardSize (the first sf1
        // probe under an uncapped plan put a 45-query component in
        // shard 0 — wall 120.8 s vs the 51-69 s band, co-resident
        // queries inflated up to 8x their iso by its accumulated
        // caches).
        val (touchPairs0, viewCostsBench) = Bench.latestRoundTouches("BENCH_FULL")
        // view costs from THIS channel's record when available: which
        // spanning view is cheapest to rebuild is scale-dependent
        // (sh_v is 0.5 s at sf0.1 but multi-second at sf1), and the
        // greedy size-capped union skips the cheapest links
        val viewCostsSf1 = Bench.latestRoundTouches("SF1")._2
        val viewCosts0 =
          if (viewCostsSf1.nonEmpty) viewCostsSf1 else viewCostsBench
        val (ordered, clusterIds) = Bench.affinityPlan(
          sorted.map(q => q.name -> q), touchPairs0, viewCosts0, ShardSize)
        val shards = Bench.costBalancedShards(
          ordered, qCosts, bCosts, ShardSize, Reps.toDouble, clusterIds)
          .map(_.map(_._2))
        println(s"[sf1] shard plan: ${shards.size} shards, " +
          (if (costSrc.nonEmpty) s"cost-balanced from $costSrc" else "fixed-size (no prior record)"))
        val out2 = shards.zipWithIndex.map { case (qs, i) =>
          val s = newSession()
          s.range(1000000).selectExpr("sum(id)").collect()
          // per-shard streaming warmup: the first streaming query in a
          // fresh session pays one-time RocksDB/streaming-codegen costs
          // no steady-state number should carry (the Bench phase-2
          // rationale, now needed once per shard)
          currentQuery = s"shard${i}_warmup"
          try SparkEntry.catalog.find(_.name == "q_rate_window_stream")
            .get.run(s, out).count()
          catch { case _: Throwable => () }
          GraftSession.dropStreamSinks(s)
          // (shard-0 cold-start handled by the throwaway warmup
          // SESSION before this loop — see its comment)
          val canary = shardCanaryOn(s, i)
          val t0 = System.nanoTime()
          val res = qs.map(runQuery(s, _))
          val shardSec = (System.nanoTime() - t0) / 1e9
          operators.StageViews.unpersistAll(s)
          s.stop()
          SparkSession.clearActiveSession()
          SparkSession.clearDefaultSession()
          println(f"[sf1] shard $i done: ${qs.size} queries in $shardSec%.1f s " +
            f"(${qs.head.name} .. ${qs.last.name})")
          (res, ShardMeta(i, qs.head.name, qs.last.name, canary, shardSec,
            qs.map(_.name).filter(ShardCanary.contains)))
        }
        (out2.flatMap(_._1), out2.map(_._2))
      }
    val canarySec: Seq[(String, Double)] = shardMeta.headOption.map(_.canary).getOrElse(Nil)
    val total = results.map(_._2).sum
    val failed = results.collect { case (n, _, Left(e)) => s"$n ($e)" }
    println(f"[sf1] TOTAL ${results.size} queries in $total%.1f s; ${failed.size} failed")
    failed.foreach(f => println(s"[sf1] FAILED: $f"))
    println("[sf1] slowest 10: " + results.sortBy(-_._2).take(10)
      .map { case (n, s, _) => f"$n=$s%.1f" }.mkString(", "))

    // Isolated re-runs of the slowest movers in a FRESH session (full
    // runs only): with sharded sweeps, swept ≈ iso is the EXPECTED
    // steady state — a mover whose swept number still exceeds its iso
    // by >1.5× is intra-shard pressure worth a look. Min-of-two so
    // shared-stage rebuilds land on attempt 1, same basis as the
    // sweep's per-query numbers (which read already-cached stages).
    val isolated: Seq[(String, Double)] = if (only.nonEmpty) Nil else {
      // top-10 movers (r14 task 2: the r14 sweep inflated ~23 queries
      // uniformly — a 6-deep iso channel could not cover enough of the
      // tail to prove contention vs regression per-query)
      val movers = results.sortBy(-_._2).take(10).map(_._1)
      val s2 = newSession()
      s2.range(1000000).selectExpr("sum(id)").collect()
      // streaming warmup — the Bench phase-2 rationale: absorb the
      // fresh session's one-time RocksDB/streaming-codegen costs so a
      // streaming mover's iso number shares the sweep's warm basis
      currentQuery = "iso_warmup"
      Seq("q_rate_window_stream", "q_tws_running_totals").foreach { w =>
        try SparkEntry.catalog.find(_.name == w).get.run(s2, out).count()
        catch { case _: Throwable => () }
        GraftSession.dropStreamSinks(s2)
      }
      val iso = movers.flatMap { name =>
        currentQuery = s"iso:$name"
        val q = SparkEntry.catalog.find(_.name == name).get
        // a failed attempt must NOT record its time-to-failure: a
        // 0.1 s crash next to a 40 s swept number would fake exactly
        // the swept>>iso contention signature this map exists to prove
        def once(): Option[Double] = {
          val t0 = System.nanoTime()
          try { q.run(s2, out).count(); Some((System.nanoTime() - t0) / 1e9) }
          catch {
            case e: Throwable =>
              println(s"[sf1] iso FAILED $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
              None
          }
        }
        val sec = (once(), once()) match {
          case (Some(a), Some(b)) => Some(math.min(a, b))
          case (a, b) => a.orElse(b)
        }
        sec.foreach(s => println(
          f"[sf1] iso $name%-32s $s%8.2f s (swept ${results.find(_._1 == name).get._2}%.2f)"))
        GraftSession.dropStreamSinks(s2)
        sec.map(name -> _)
      }
      operators.StageViews.unpersistAll(s2)
      s2.stop()
      iso
    }
    // Persist the probe as a diffable per-round artifact (committed as
    // SF1_rN.json): the 100×-scale evidence should live in the repo,
    // not in commit marks. JSON numbers go through an explicit ROOT
    // locale — the f-interpolator uses the DEFAULT locale, and a
    // comma-decimal machine would render "sec":1,234 — invalid JSON
    // (the exact r5 ADVICE bug class Bench already guards against).
    def num(v: Double, decimals: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(v))
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => String.format(java.util.Locale.ROOT, "\\u%04x", Int.box(c.toInt))
      case c => c.toString
    }
    val qjson = results.map { case (n, s, res) =>
      val body = res match {
        case Right(rows) => s"""{"sec":${num(s, 3)},"rows":$rows}"""
        case Left(e)     => s"""{"sec":${num(s, 3)},"error":"${esc(e)}"}"""
      }
      s""""$n":$body"""
    }.mkString(",")
    val sjson = operators.StageViews.buildLog.map(b =>
      s"""{"view":"${b.view}","charged_to":"${b.chargedTo}","sec":${num(b.sec, 3)}}""")
      .mkString("[", ",", "]")
    val ijson = isolated.map { case (n, s) => s""""$n":${num(s, 3)}""" }.mkString("{", ",", "}")
    val cjson = canarySec.map { case (n, s) => s""""$n":${num(s, 3)}""" }.mkString("{", ",", "}")
    val shjson = shardMeta.map { m =>
      val c = m.canary.map { case (n, s) => s""""$n":${num(s, 3)}""" }.mkString("{", ",", "}")
      s"""{"idx":${m.idx},"first":"${esc(m.first)}","last":"${esc(m.last)}","sec":${num(m.sec, 1)},"canary":$c,"warm_basis":${m.warm.map("\"" + _ + "\"").mkString("[", ",", "]")}}"""
    }.mkString("[", ",", "]")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/sf1_probe.json"),
      s"""{"sf_dir":"${esc(out)}","reps":$Reps,"n_queries":${results.size},"total_sec":${num(total, 1)},"n_failed":${failed.size},"shard_size":$ShardSize,"canary":$cjson,"shards":$shjson,"stage_builds":$sjson,"isolated":$ijson,"queries":{$qjson}}""")
    println("[sf1] wrote target/sf1_probe.json")
    // Hard coverage gate (r14 VERDICT task 3), full runs only: the
    // committed SF1_r{N}.json must itemize the ENTIRE catalog. Note
    // the mechanism: a failing query stays IN `results` (as an
    // "error" entry), so on a full run results.size always equals the
    // catalog size and the LIVE gate is `failed.nonEmpty`; the size
    // disjunct is a structural invariant (it can only fire if the
    // itemization machinery itself drops entries), not the failure
    // path. Stale-subset protection comes from the driver comparing
    // n_queries against the catalog it sees — this probe always runs
    // its own binary's catalog.
    if (only.isEmpty &&
        (results.size != SparkEntry.catalog.size || failed.nonEmpty)) {
      println(s"[sf1] GATE FAIL: ${results.size} of ${SparkEntry.catalog.size} " +
        s"catalog queries itemized, ${failed.size} failed")
      sys.exit(2)
    }
  }
}
