package graft

import org.apache.spark.sql.functions._

/** Scale-behavior probe: replicates the sf0.1 events table N× with
  * shifted user ids (→ N× distinct flows, N× packets) and times the
  * batch featurizer at each multiple. Near-linear growth here is the
  * local evidence that the one-shuffle featurizer plan scales with data
  * rather than with anything quadratic.
  *
  * Usage: runMain graft.ScaleSmoke [sfDir] [multiples...]
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val multiples = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(1, 4, 10)
    val spark = GraftSession.getOrCreate()
    val packets = flow.BatchFlowFeaturizer
      .packetsFromEvents(Tables.events(spark, sfDir)).cache()
    val baseRows = packets.count()
    val results = multiples.map { m =>
      // remap the ip space per replica: flows AND packets scale ×m
      val multiplied = packets
        .crossJoin(spark.range(m).toDF("rep"))
        .withColumn("src_ip", concat(col("rep"), lit("."), col("src_ip")))
        .withColumn("dst_ip", concat(col("rep"), lit("."), col("dst_ip")))
        .withColumn("event_id", col("event_id") + col("rep") * lit(100000000L))
        .drop("rep")
      val t0 = System.nanoTime()
      val flows = flow.BatchFlowFeaturizer.features(multiplied).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale] x$m%-3d packets=${baseRows * m}%9d flows=$flows%8d  $sec%7.2f s  (${baseRows * m / sec / 1e6}%.2f Mpkt/s)")
      (m, sec)
    }
    val (m0, t0) = results.head
    val (mN, tN) = results.last
    println(f"[scale] growth: input x${mN / m0} -> time x${tN / t0}%.1f")

    // ---- dedup family (minhash-LSH): the candidate-generation probe ----
    // Replica texts are made DISTINCT (per-replica word prefix) so the
    // corpus grows ×m with the SAME near-dup structure per replica.
    // Replicating identical text instead would grow duplicate clusters
    // ×m and the true candidate-pair count would grow quadratically by
    // construction of the DATA — masking whether the ALGORITHM scales.
    val docs = Tables.documents(spark, sfDir).cache()
    val nDocs = docs.count()
    def distinctCorpus(m: Int) = docs
      .crossJoin(spark.range(m).toDF("rep"))
      .selectExpr(
        "doc_id + rep * 100000000 AS doc_id",
        "array_join(transform(split(text, ' '), w -> concat('r', CAST(rep AS STRING), w)), ' ') AS text")
    val dedupResults = multiples.map { m =>
      val corpus = distinctCorpus(m)
      val t0d = System.nanoTime()
      val pairsDf = operators.Dedup.minhashOn(spark, s"scale-minhash-$m", corpus)
      val pairs = pairsDf.count()
      val sec = (System.nanoTime() - t0d) / 1e9
      println(f"[scale] minhash x$m%-3d docs=${nDocs * m}%8d pairs=$pairs%8d  $sec%7.2f s")
      // clusters: the iterative CC must also grow linearly — its rounds
      // depend on component DIAMETER, which replication keeps constant
      val t0c = System.nanoTime()
      val comps = operators.Graph
        .connectedComponents(pairsDf.selectExpr("doc_a AS u", "doc_b AS v"))
        .count()
      val secC = (System.nanoTime() - t0c) / 1e9
      println(f"[scale] cc      x$m%-3d edges=$pairs%8d members=$comps%8d  $secC%7.2f s")
      (m, sec + secC)
    }
    println(f"[scale] minhash+cc growth: input x${dedupResults.last._1 / dedupResults.head._1} -> time x${dedupResults.last._2 / dedupResults.head._2}%.1f")

    // ---- containment: same distinct-ified replicas, so the TRUE pair
    // count grows exactly ×m (per-replica structure repeats, replicas
    // never share a shingle). The DF-capped shingle join must track
    // that — pair growth beyond ~×m would mean the candidate join is
    // doing super-linear work the cap failed to bound.
    val containResults = multiples.map { m =>
      val t0x = System.nanoTime()
      val pairs = operators.Dedup
        .containmentOn(spark, s"scale-contain-$m", distinctCorpus(m)).count()
      val sec = (System.nanoTime() - t0x) / 1e9
      println(f"[scale] contain x$m%-3d docs=${nDocs * m}%8d pairs=$pairs%8d  $sec%7.2f s")
      (m, sec, pairs)
    }
    if (containResults.head._3 > 0 && containResults.size > 1) {
      val inputRatio = containResults.last._1.toDouble / containResults.head._1
      val pairRatio = containResults.last._3.toDouble / containResults.head._3
      println(f"[scale] contain pairs: input x$inputRatio%.0f -> pairs x$pairRatio%.2f (linear bound ${1.1 * inputRatio}%.2f)")
      require(pairRatio <= 1.1 * inputRatio,
        s"containment pairs grew x$pairRatio for x$inputRatio input — candidate join not linear")
    }

    // ---- substring-window dup stats: stats-shaped (no self-join), so
    // on distinct-ified replicas the duplicated-DOC count must grow
    // EXACTLY ×m (each replica reproduces the base corpus's window
    // structure and replicas never share a window — the md5 key
    // carries the replica prefix). Growth off ×m in either direction
    // means the window relation or the dup-set join broke linearity.
    val ssdupResults = multiples.map { m =>
      val t0s = System.nanoTime()
      val dupDocs = operators.WebCorpus
        .substringDupOn(spark, s"scale-ssdup-$m", distinctCorpus(m))
        .filter(col("n_dup_windows") > 0).count()
      val sec = (System.nanoTime() - t0s) / 1e9
      println(f"[scale] ssdup   x$m%-3d docs=${nDocs * m}%8d dupdocs=$dupDocs%8d  $sec%7.2f s")
      (m, sec, dupDocs)
    }
    if (ssdupResults.head._3 > 0 && ssdupResults.size > 1) {
      val inputRatio = ssdupResults.last._1.toDouble / ssdupResults.head._1
      val dupRatio = ssdupResults.last._3.toDouble / ssdupResults.head._3
      println(f"[scale] ssdup dup-docs: input x$inputRatio%.0f -> dup docs x$dupRatio%.2f (exact-linear bound)")
      require(dupRatio <= 1.05 * inputRatio && dupRatio >= 0.95 * inputRatio,
        s"substring-dup docs grew x$dupRatio for x$inputRatio input — window stats not linear")
    }

    // ---- BPE trainer (r15): the corpus is touched once (word-freq
    // aggregate); every training iteration is VOCABULARY-sized. On
    // identically-replicated corpora (vocab constant by construction)
    // the learned merge TABLE must be invariant and every pair count
    // must scale EXACTLY ×m — any drift means an iteration leaked
    // corpus-sized state or the argmax tie-break is not total.
    val bpeResults = multiples.map { m =>
      val corpus = docs.crossJoin(spark.range(m).toDF("rep"))
        .selectExpr("doc_id + rep * 100000000 AS doc_id", "text", "lang")
      val t0b = System.nanoTime()
      val merges = operators.Bpe.trainOn(spark, corpus).collect()
      val sec = (System.nanoTime() - t0b) / 1e9
      println(f"[scale] bpe     x$m%-3d docs=${nDocs * m}%8d merges=${merges.length}%2d  $sec%7.2f s")
      (m, sec, merges.map(r => (r.getLong(0), r.getString(3))).toSeq,
        merges.map(_.getLong(4)).toSeq)
    }
    locally {
      val (m0b, _, table0, counts0) = bpeResults.head
      for ((m, _, table, counts) <- bpeResults.tail) {
        require(table == table0,
          s"BPE merge table changed under replication: $table0 vs $table at x$m")
        val expected = counts0.map(_ * m / m0b)
        require(counts == expected,
          s"BPE pair counts not exactly linear: $counts vs $expected at x$m")
      }
      println(s"[scale] bpe merges: table invariant, pair counts exactly linear across x${multiples.mkString("/x")}")
    }

    // ---- BPE trainer job-count gate (r16 VERDICT #1): the merge loop
    // is driver-local over the once-collected vocabulary, so the SPARK
    // JOB COUNT must be IDENTICAL at any merge budget — the r15
    // spelling ran one job + a 1-row collect PER step, which this gate
    // would have caught (8 vs 64 budgets differed by 56 jobs).
    locally {
      // SparkListener counting onJobStart between markers (r17 ADVICE:
      // the setJobGroup + statusTracker spelling was flaky — job-group
      // propagation is thread-local, so AQE/broadcast jobs submitted
      // off-thread escaped the group, and the status store retains only
      // spark.ui.retainedJobs entries, so a long run could EVICT the
      // very jobs the gate counts). The listener sees every job start
      // regardless of submitting thread, and nothing is retained-store
      // dependent. The bus is async: drain by polling the counter to a
      // fixed point after the driving collect() returns.
      def jobsDuring(steps: Int,
          corpus: org.apache.spark.sql.DataFrame): (Int, Int, Double) = {
        val counter = new java.util.concurrent.atomic.AtomicInteger(0)
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            counter.incrementAndGet(); ()
          }
        }
        spark.sparkContext.addSparkListener(listener)
        val t0j = System.nanoTime()
        val (jobs, nMerges) = try {
          val merges = operators.Bpe.trainOn(spark, corpus, steps).collect()
          require(merges.nonEmpty)
          // every job's onJobStart was POSTED before its result reached
          // the collect above; wait for the async bus to deliver them
          var last = -1
          var cur = counter.get()
          while (cur != last) { Thread.sleep(200); last = cur; cur = counter.get() }
          (cur, merges.length)
        } finally spark.sparkContext.removeSparkListener(listener)
        (jobs, nMerges, (System.nanoTime() - t0j) / 1e9)
      }
      val (j8, _, t8) = jobsDuring(8, docs)
      val (j64, _, t64) = jobsDuring(64, docs)
      println(f"[scale] bpe jobs: steps=8 -> $j8 jobs $t8%5.2f s; steps=64 -> $j64 jobs $t64%5.2f s")
      require(j8 == j64,
        s"BPE Spark job count grew with merge budget: $j8 jobs at 8 steps vs $j64 at 64 — " +
          "a per-step Spark roundtrip leaked back into the trainer")
      // r17 VERDICT #4: the other bounded resource at a REAL vocabulary
      // budget. The documents corpus has only ~31 word types (the
      // 64-merge budget already exhausts it), so the 1024-merge probe
      // runs on a synthetic WIDE-vocabulary corpus — 100k docs of
      // 'tok<i>' words ≈ 100k word types — where 1024 merges are
      // genuinely available: the budget must be FULLY consumed
      // (1024 learned rules, not an early exhaust), the Spark job
      // count must still be the constant j8, and the collected
      // (word, cnt, seg) relation must be VOCABULARY-sized — row count
      // invariant under identical corpus replication (word-frequency
      // aggregation guarantees it; this measures the guarantee).
      def wideCorpus(m: Int) = spark.range(100000L * m).selectExpr(
        "id AS doc_id",
        "concat('tok', id % 100000, ' tok', (id + 1) % 100000, ' tok', (id + 2) % 100000) AS text",
        "'en' AS lang")
      val (j1024, m1024, t1024) = jobsDuring(1024, wideCorpus(1))
      // Driver-heap gate (r18 VERDICT task 6): the raw used-heap reading
      // after the trainer includes uncollected garbage (r18 recorded
      // 3519 MiB raw while the live set was far smaller — and the
      // MEASUREMENT prose wrongly quoted "under 2 GiB" from the live-set
      // intuition). Report BOTH, and gate the LIVE set (post-System.gc)
      // at an explicit bound so the trainer's driver residency cannot
      // drift silently: the collected (word, cnt, seg) relation is
      // vocabulary-sized (~100k rows here), which must stay well under
      // 1 GiB live.
      val rawHeapMb = (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) >> 20
      // System.gc() is ADVISORY: under -XX:+DisableExplicitGC (or a
      // collector that ignores the hint) the post-gc reading stays at
      // the raw value and the gate would fail on uncollected garbage
      // rather than the trainer's live set (r19 ADVICE). Detect the
      // ineffective hint DIRECTLY from the collector MXBeans' collection
      // counts (r20 ADVICE: the old heap-ratio heuristic could not
      // distinguish a disabled System.gc() from a genuinely mostly-live
      // heap, silently skipping the gate in exactly the regression case
      // it guards): if no collector ran a single collection across two
      // explicit System.gc() calls, the hint was ignored.
      def gcCount(): Long = {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          .asScala.map(b => math.max(0L, b.getCollectionCount)).sum
      }
      val gcCountBefore = gcCount()
      // two GC passes: a single System.gc() is advisory and an
      // incomplete collection leaves floating garbage above the bound
      System.gc(); System.gc()
      val gcEffective = gcCount() > gcCountBefore
      val liveHeapMb = (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) >> 20
      val LiveHeapBoundMb = 1024L
      println(f"[scale] bpe jobs: steps=1024 wide-vocab -> $j1024 jobs, $m1024 merges learned, $t1024%6.2f s (driver heap: raw ${rawHeapMb}%d MiB, live ${liveHeapMb}%d MiB, gate $LiveHeapBoundMb MiB)")
      // the bound is the WHOLE-JVM live set — local mode keeps the
      // smoke's own resident caches (packets/docs) in this JVM, so at
      // a much larger sfDir the gate would trip on them, not on the
      // trainer; the message names both candidates rather than blaming
      // the collect unconditionally.
      if (!gcEffective)
        println(s"[scale] WARN: explicit GC ineffective (raw $rawHeapMb MiB -> " +
          s"post-gc $liveHeapMb MiB) — live-heap gate SKIPPED this run; the " +
          "vocabulary-rows gate below still bounds the trainer's collect")
      else require(liveHeapMb < LiveHeapBoundMb,
        s"live JVM heap after the BPE 1024-merge trainer is $liveHeapMb MiB " +
          s"(bound $LiveHeapBoundMb MiB) — either the trainer's collect is no " +
          "longer vocabulary-sized, or this run's resident smoke caches " +
          "(packets/docs at a larger-than-default sfDir) exceed the bound")
      require(j1024 == j8,
        s"BPE Spark job count grew at a 1024-merge budget: $j1024 vs $j8 at 8 steps")
      require(m1024 == 1024,
        s"wide-vocab corpus exhausted at $m1024 merges — the 1024-step budget was not exercised")
      val vocabRows = multiples.map { m =>
        val rows = operators.Bpe.vocabRowsOn(spark, wideCorpus(m))
        println(f"[scale] bpevoc  x$m%-3d docs=${100000L * m}%8d collected_rows=$rows%8d")
        rows
      }
      require(vocabRows.distinct.size == 1,
        s"BPE collected vocabulary rows changed under replication: $vocabRows — " +
          "the driver collect is corpus-sized, not vocabulary-sized")
      println(s"[scale] bpe trainer: jobs constant at 8/64/1024 merges ($j8), " +
        s"1024-merge budget fully consumed, collected rows invariant under " +
        s"x${multiples.mkString("/x")} replication (${vocabRows.head})")
    }

    // ---- BM25 retrieval (r17): the query workload (top-40 df terms)
    // is replication-INVARIANT by construction (df scales x m for every
    // term, ties unchanged), so candidate rows — postings matching the
    // workload — must grow EXACTLY x m, and the result-row count (top-k
    // per query) must not grow at all. Super-linear candidates would
    // mean the workload leaked corpus-sized state; growing result rows
    // would mean the top-k bound broke.
    val bm25Results = multiples.map { m =>
      val corpus = docs.crossJoin(spark.range(m).toDF("rep"))
        .selectExpr("doc_id + rep * 100000000 AS doc_id", "text", "lang")
      val t0r = System.nanoTime()
      val cands = operators.Retrieval.bm25CandidatesOn(spark, s"scale-bm25-$m", corpus)
      val rows = operators.Retrieval.bm25On(spark, s"scale-bm25-$m", corpus).count()
      val sec = (System.nanoTime() - t0r) / 1e9
      println(f"[scale] bm25    x$m%-3d docs=${nDocs * m}%8d cands=$cands%9d rows=$rows%4d  $sec%7.2f s")
      (m, cands, rows)
    }
    locally {
      val (m0r, c0, r0) = bm25Results.head
      for ((m, c, r) <- bm25Results.tail) {
        require(c == c0 * m / m0r,
          s"BM25 candidates not exactly linear: $c vs ${c0 * m / m0r} at x$m — " +
            "the query workload leaked corpus-sized state")
        require(r == r0,
          s"BM25 result rows grew under replication: $r0 -> $r at x$m — top-k bound broke")
      }
      println(s"[scale] bm25 candidates exactly linear, result rows invariant across x${multiples.mkString("/x")}")
    }

    // ---- span-level dedup (r19): positional-gram rows must grow
    // EXACTLY linearly, and at any m ≥ 2 every ≥5-token document is
    // FULLY covered (each of its grams recurs in the replicas) — the
    // sharpest coverage invariant replication admits.
    locally {
      val spanMultiples = Seq(1, multiples.last)
      val stats = spanMultiples.map { m =>
        val corpus = docs.crossJoin(spark.range(m).toDF("rep"))
          .selectExpr("doc_id + rep * 100000000 AS doc_id", "text", "lang")
        val t0s = System.nanoTime()
        val (pg, d5, full) = operators.Dedup.spanStatsOn(spark, s"scale-span-$m", corpus)
        val sec = (System.nanoTime() - t0s) / 1e9
        println(f"[scale] span    x$m%-3d docs=${nDocs * m}%8d grams=$pg%9d docs5=$d5%7d fullcov=$full%7d  $sec%7.2f s")
        (m, pg, d5, full)
      }
      val (m0s, pg0, _, _) = stats.head
      for ((m, pg, d5, full) <- stats.tail) {
        require(pg == pg0 * m / m0s,
          s"span positional grams not exactly linear: $pg vs ${pg0 * m / m0s} at x$m")
        require(d5 == full,
          s"x$m replication must fully cover every >=5-token doc: $full of $d5 covered")
      }
      println(s"[scale] span grams exactly linear; full coverage law holds at x${spanMultiples.last}")
      // EXCISION law (r20) at the top multiple, over the same ensured
      // stages: full coverage means every ≥5-token doc merges to
      // exactly ONE excision region spanning the whole doc (kept 0,
      // excised == all), and every <5-token doc keeps everything with
      // zero regions — integer-exact per doc, checked as corpus-wide
      // violation counts so nothing collects to the driver.
      locally {
        val m = spanMultiples.last
        val t0e = System.nanoTime()
        val bad = operators.Dedup.qSpanExcise.run(spark, s"scale-span-$m")
          .selectExpr(
            "sum(CASE WHEN n_tokens >= 5 AND NOT (kept_tokens = 0 AND n_spans = 1 AND n_dup_tokens = n_tokens) THEN 1 ELSE 0 END) AS bad5",
            "sum(CASE WHEN n_tokens < 5 AND NOT (kept_tokens = n_tokens AND n_spans = 0) THEN 1 ELSE 0 END) AS bad_s",
            "count(*) AS n").head()
        val sec = (System.nanoTime() - t0e) / 1e9
        println(f"[scale] spanexc x$m%-3d docs=${bad.getLong(2)}%8d bad5=${bad.getLong(0)} badshort=${bad.getLong(1)}  $sec%7.2f s")
        require(bad.getLong(0) == 0L && bad.getLong(1) == 0L,
          s"span excision laws violated at x$m: ${bad.getLong(0)} covered docs " +
            s"not fully excised as one region, ${bad.getLong(1)} short docs not kept whole")
      }
    }

    // ---- RAKE keyphrases (r19): word scores are ratios of two ×m
    // quantities, so the top-20 phrases, word counts, and scores must
    // be replication-INVARIANT while occurrence counts are exactly ×m
    // — corpus-sized state leaking into the vocabulary-sized scorer
    // would break one of the three.
    locally {
      val rakeMultiples = Seq(1, multiples.last)
      val tops = rakeMultiples.map { m =>
        val corpus = docs.crossJoin(spark.range(m).toDF("rep"))
          .selectExpr("doc_id + rep * 100000000 AS doc_id", "text", "lang")
        val t0r = System.nanoTime()
        val rows = operators.TextAnalysis.rakeOn(spark, s"scale-rake-$m", corpus)
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
            r.getLong(4))).toSeq
        val sec = (System.nanoTime() - t0r) / 1e9
        println(f"[scale] rake    x$m%-3d docs=${nDocs * m}%8d top=${rows.size}%3d  $sec%7.2f s")
        (m, rows)
      }
      val (m0r, top0) = tops.head
      for ((m, top) <- tops.tail) {
        require(top.map(t => (t._1, t._2, t._3, t._5)) ==
            top0.map(t => (t._1, t._2, t._3, t._5)),
          s"RAKE ranking/scores changed under x$m replication")
        require(top.map(_._4) == top0.map(_._4 * m / m0r),
          s"RAKE occurrence counts not exactly x$m under replication")
      }
      println(s"[scale] rake top-20 invariant, occurrences exactly linear at x${rakeMultiples.last}")
    }

    // ---- IVF ANN: two-level quantizer (T ≈ √n lists = nl1×nl2) with
    // multi-probe at both levels, so probed candidate rows must grow
    // ~n^(3/4) — SUB-linearly. We assert it: probed(×mN)/probed(×m1)
    // must be well under the input ratio.
    val emb = Tables.embeddings(spark, sfDir).cache()
    val nVec = emb.count()
    val ivfResults = multiples.map { m =>
      val corpus = emb
        .crossJoin(spark.range(m).toDF("rep"))
        .selectExpr("vec_id + rep * 100000000 AS vec_id", "embedding")
      val t0v = System.nanoTime()
      val rows = operators.Similarity.ivfOn(spark, s"scale-ivf-$m", corpus).count()
      val sec = (System.nanoTime() - t0v) / 1e9
      val probed = operators.Similarity.ivfProbedOn(spark, s"scale-ivf-$m", corpus)
      // recall-vs-scale (r16 VERDICT task 6): the probe budget must
      // keep FINDING the true top-5 as n grows, not just stay
      // sub-linear. Same corpus key — the widened embeddings view is
      // reused, not rebuilt.
      val recall = operators.Similarity.ivfRecallAt5On(spark, s"scale-ivf-$m", corpus)
      println(f"[scale] ivf     x$m%-3d vecs=${nVec * m}%8d rows=$rows%8d probed=$probed%8d recall@5=$recall%.3f  $sec%7.2f s")
      (m, sec, probed, recall)
    }
    println(f"[scale] ivf growth: input x${ivfResults.last._1 / ivfResults.head._1} -> time x${ivfResults.last._2 / ivfResults.head._2}%.1f")
    locally {
      val inputRatio = ivfResults.last._1.toDouble / ivfResults.head._1
      val probedRatio = ivfResults.last._3.toDouble / ivfResults.head._3
      println(f"[scale] ivf probed rows: input x$inputRatio%.0f -> probed x$probedRatio%.2f (sub-linear bound ${0.8 * inputRatio}%.2f)")
      require(probedRatio < 0.8 * inputRatio,
        s"IVF probed rows grew x$probedRatio for x$inputRatio input — index is not sub-linear")
      // Floors calibrated against the DuckDB oracle on the same
      // replicated corpora (sf0.1: x1=0.70, x4=0.98, x10=1.00 —
      // replication ADDS same-cell duplicate ties, so recall rises
      // with m here; the gate is that it never COLLAPSES): >= 0.8 at
      // the top multiple (the r16 VERDICT ask), >= 0.6 absolute
      // everywhere.
      val recalls = ivfResults.map(r => f"x${r._1}=${r._4}%.3f").mkString(" ")
      println(s"[scale] ivf recall@5 vs scale: $recalls (floors: 0.6 all, 0.8 at top multiple)")
      ivfResults.foreach { case (m, _, _, rec) =>
        require(rec >= 0.6,
          f"IVF recall@5 collapsed to $rec%.3f at x$m replication — " +
            "probe budget no longer finds the true neighbors as n grows")
      }
      require(ivfResults.last._4 >= 0.8,
        f"IVF recall@5 at the top multiple is ${ivfResults.last._4}%.3f < 0.8")
    }

    // ---- frozen-quantizer routing cost vs nl1 (r19 VERDICT task 5) ----
    // q_ann_ivf_stream's router carries the quantizer as an nl1-way
    // greatest() chain of array<float> literals. Measured r20: the
    // chain stays inside whole-stage codegen up to nl1 = 512
    // (FrozenLiteralCap); at 1024 Janino's 64 KB method limit bails
    // codegen and the interpreted chain goes pathological (2000 vecs:
    // 2.7 s at 1024, 17–36 s at 4096 — vs a flat ~0.3 s for the
    // broadcast argmax). This probe re-measures every round: literal
    // plan+exec at nl1 ∈ {64, 512} must stay ~flat (codegen'd), the
    // above-cap broadcast path at nl1 = 4096 must stay flat, and the
    // two paths must assign identically at the cap.
    locally {
      val dims = 64
      def synthCents(nl1: Int): Seq[(Long, Array[Float])] =
        (0 until nl1).map(c =>
          c.toLong -> Array.tabulate(dims)(d => (((c * 131 + d * 17) % 97) - 48).toFloat / 48f))
      val vecs = spark.range(2000).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 64), d -> CAST((CAST(pmod(id * 37 + d * 13, 89) AS DOUBLE) - 44.0) / 44.0 AS FLOAT)) AS embedding")
        .cache()
      vecs.count()
      // min-of-two per point: the first execution pays one-time Janino
      // compiles the steady state never sees
      def minOf2(work: () => Double): Double = math.min(work(), work())
      val lit = Seq(64, operators.Similarity.FrozenLiteralCap).map { nl1 =>
        val cents = synthCents(nl1)
        def once(): (Double, Double) = {
          val t0p = System.nanoTime()
          val routed = vecs
            .withColumn("c1", operators.Similarity.assignToFrozen(cents))
            .groupBy("c1").count()
          routed.queryExecution.executedPlan
          val planSec = (System.nanoTime() - t0p) / 1e9
          val t0e = System.nanoTime()
          routed.count()
          (planSec, (System.nanoTime() - t0e) / 1e9)
        }
        val (a, b) = (once(), once())
        val (planSec, exec) = (math.min(a._1, b._1), math.min(a._2, b._2))
        println(f"[scale] frozenq literal  nl1=$nl1%-5d plan=$planSec%5.2f s exec=$exec%5.2f s (2000 vecs)")
        (nl1, planSec, exec)
      }
      val bSec = minOf2(() => {
        val t0b = System.nanoTime()
        operators.Similarity.assignToFrozenBroadcast(spark, synthCents(4096), vecs.toDF())
          .groupBy("c1").count().count()
        (System.nanoTime() - t0b) / 1e9
      })
      println(f"[scale] frozenq broadcast nl1=4096  total=$bSec%5.2f s (above-cap path, 2000 vecs)")
      // codegen'd literal path: going 64 → 512 centroids is 8× the
      // per-row flops on a ~fixed 2000×nl1×64 ≈ 66 MFLOP budget that
      // the local floor dominates — a codegen bail or interpreted
      // fallback would blow these bounds immediately (1024 already
      // measures 4–6× the 512 exec)
      val (_, p0, e0) = lit.head
      val (capN, pC, eC) = lit.last
      require(pC <= 4.0 * math.max(p0, 0.15),
        f"frozen-quantizer literal plan time grew $pC%.2f s at nl1=$capN (x${pC / math.max(p0, 0.15)}%.1f vs nl1=64) — plan no longer ~flat in nl1")
      require(eC <= 4.0 * math.max(e0, 0.3),
        f"frozen-quantizer literal exec grew $eC%.2f s at nl1=$capN — whole-stage codegen likely bailed below FrozenLiteralCap")
      require(bSec <= 2.0,
        f"above-cap broadcast routing took $bSec%.2f s at nl1=4096 — the flat O(nl1·dims)/row path regressed")
      // path parity at the cap (the total-order law Round20OpsSpec pins
      // with a hand tie; here: the full 2000-vector assignment map)
      val cents = synthCents(operators.Similarity.FrozenLiteralCap)
      val viaLit = vecs.withColumn("c1", operators.Similarity.assignToFrozen(cents))
        .groupBy("c1").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaBc = operators.Similarity.assignToFrozenBroadcast(spark, cents, vecs.toDF())
        .groupBy("c1").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      require(viaLit == viaBc,
        s"literal and broadcast frozen-quantizer paths disagree at the cap: $viaLit vs $viaBc")
      println(s"[scale] frozenq paths agree at nl1=${operators.Similarity.FrozenLiteralCap} (${viaLit.size} lists)")
      vecs.unpersist()
    }

    // ---- hybrid retrieval over the IVF dense ranker (r18 VERDICT task
    // 3): the serving-shaped fusion (BM25 ⊕ IVF) must keep overlapping
    // the exact fusion's (BM25 ⊕ brute) top-5 as the corpus grows — the
    // q_ann_ivf_recall discipline applied to the fused lists. Bottom and
    // top multiples only (each runs three full ranker chains).
    locally {
      val hyMultiples = Seq(multiples.head, multiples.last).distinct
      val hyOverlaps = hyMultiples.map { m =>
        val dcorp = docs.crossJoin(spark.range(m).toDF("rep"))
          .selectExpr("doc_id + rep * 100000000 AS doc_id", "text", "lang")
        val ecorp = emb.crossJoin(spark.range(m).toDF("rep"))
          .selectExpr("vec_id + rep * 100000000 AS vec_id", "embedding")
        val t0h = System.nanoTime()
        val ov = operators.Retrieval.hybridIvfOverlapAt5On(
          spark, s"scale-hyivf-$m", dcorp, ecorp)
        val sec = (System.nanoTime() - t0h) / 1e9
        println(f"[scale] hyivf   x$m%-3d overlap@5=$ov%.3f  $sec%7.2f s")
        (m, ov)
      }
      hyOverlaps.foreach { case (m, ov) =>
        require(ov >= 0.6,
          f"IVF-fused top-5 overlap vs the brute fusion collapsed to $ov%.3f at x$m — " +
            "the serving-shaped hybrid no longer finds what exact fusion finds")
      }
      println(s"[scale] hybrid-ivf fusion overlap@5 >= 0.6 at " +
        s"x${hyMultiples.mkString("/x")} (" +
        hyOverlaps.map { case (m, ov) => f"x$m=$ov%.3f" }.mkString(" ") + ")")
    }

    // ---- embedding near-dup: the adaptive sign-bucket modulus (+
    // frequency cap) must keep CANDIDATE pairs ~linear in corpus size.
    // Replicas get a rep-dependent deterministic dim-wise sign flip so
    // they occupy different buckets — replicating identical vectors
    // would grow true dup clusters ×m and the candidate count
    // quadratically BY CONSTRUCTION of the data (same reasoning as the
    // distinct-ified texts above). The bound allows 2.2× the input
    // ratio: the power-of-two modulus quantizes mean occupancy into
    // (8, 16], so per-vector candidates legitimately wobble up to 2×
    // between scale points — while the pre-fix fixed-4096-bucket scheme
    // would grow ×(input ratio)² and blow straight through it.
    val embDedupResults = multiples.map { m =>
      val corpus = emb.crossJoin(spark.range(m).toDF("rep"))
        .selectExpr(
          "vec_id + rep * 100000000 AS vec_id",
          "transform(embedding, (x, i) -> CASE WHEN ((CAST(rep AS INT) >> (i % 8)) & 1) = 1 THEN -x ELSE x END) AS embedding")
      val t0e = System.nanoTime()
      val cands = operators.Dedup.embedCandidatesOn(spark, s"scale-embdup-$m", corpus)
      val sec = (System.nanoTime() - t0e) / 1e9
      println(f"[scale] embdup  x$m%-3d vecs=${nVec * m}%8d cands=$cands%8d  $sec%7.2f s")
      (m, sec, cands)
    }
    if (embDedupResults.head._3 > 0 && embDedupResults.size > 1) {
      val inputRatio = embDedupResults.last._1.toDouble / embDedupResults.head._1
      val candRatio = embDedupResults.last._3.toDouble / embDedupResults.head._3
      println(f"[scale] embdup candidates: input x$inputRatio%.0f -> cands x$candRatio%.2f (linear bound ${2.2 * inputRatio}%.2f)")
      require(candRatio <= 2.2 * inputRatio,
        s"embedding-dedup candidates grew x$candRatio for x$inputRatio input — adaptive modulus not holding")
    }

    // ---- mutual-kNN graph (r18): the directed top list is hard-capped
    // at KnnGraphK rows per vector BY CONSTRUCTION (the per-vector rank
    // window), so top rows must stay ≤ K·n at every multiple, and the
    // mutual edge count — bounded by top/2 — must grow ~linearly like
    // the embdup candidates (same sign-bucket blocking, same occupancy
    // wobble bound). Reuses the sign-flipped replication corpus so
    // replicas land in different buckets.
    val knngResults = multiples.map { m =>
      val corpus = emb.crossJoin(spark.range(m).toDF("rep"))
        .selectExpr(
          "vec_id + rep * 100000000 AS vec_id",
          "transform(embedding, (x, i) -> CASE WHEN ((CAST(rep AS INT) >> (i % 8)) & 1) = 1 THEN -x ELSE x END) AS embedding")
      val t0k = System.nanoTime()
      val edges = operators.Similarity.knnGraphOn(spark, s"scale-knng-$m", corpus).count()
      val top = spark.sql("SELECT count(*) FROM knng_top_v").head().getLong(0)
      val sec = (System.nanoTime() - t0k) / 1e9
      println(f"[scale] knng    x$m%-3d vecs=${nVec * m}%8d top=$top%8d edges=$edges%8d  $sec%7.2f s")
      (m, top, edges)
    }
    locally {
      for ((m, top, _) <- knngResults)
        require(top <= operators.Similarity.KnnGraphK * nVec * m,
          s"kNN-graph top list exceeded K·n at x$m: $top — per-vector rank cap broke")
      val inputRatio = knngResults.last._1.toDouble / knngResults.head._1
      val edgeRatio = knngResults.last._3.toDouble / knngResults.head._3.max(1L)
      println(f"[scale] knng edges: input x$inputRatio%.0f -> edges x$edgeRatio%.2f (linear bound ${2.2 * inputRatio}%.2f)")
      require(edgeRatio <= 2.2 * inputRatio,
        s"kNN-graph edges grew x$edgeRatio for x$inputRatio input — blocking not holding")
    }

    // ---- PQ encode (r16): code assignment is ONE broadcast join of
    // n·M subvectors against the ≤2048-row codebook — O(n·K) work with
    // K capped at 256, so the code table must grow EXACTLY ×m (8 codes
    // per vector, structural) and every code must index the capped
    // codebook. Replica ids shift by 1e8, so the j < 256 codebook
    // seeds are the SAME vectors at every multiple — growth changes
    // the assignment load, never the quantizer.
    val pqResults = multiples.map { m =>
      val corpus = emb.crossJoin(spark.range(m).toDF("rep"))
        .selectExpr("vec_id + rep * 100000000 AS vec_id", "embedding")
      val t0p = System.nanoTime()
      val st = operators.Pq.encodeOn(spark, s"scale-pq-$m", corpus)
        .agg(count(lit(1)).as("rows"), max(col("code")).as("maxc")).head()
      val sec = (System.nanoTime() - t0p) / 1e9
      println(f"[scale] pq      x$m%-3d vecs=${nVec * m}%8d codes=${st.getLong(0)}%9d maxcode=${st.getLong(1)}%4d  $sec%7.2f s")
      (m, st.getLong(0), st.getLong(1))
    }
    locally {
      require(pqResults.zip(multiples).forall { case ((_, rows, _), m) =>
        rows == 8L * nVec * m },
        s"PQ code table must be exactly 8 rows per vector: ${pqResults.map(_._2)}")
      require(pqResults.forall(_._3 < 256),
        s"PQ codes must index the capped 256-codeword codebook: ${pqResults.map(_._3)}")
    }

    // ---- LSH ANN: L sign-hyperplane tables with an adaptive modulus
    // keep bucket occupancy ~constant, and hamming-1 multi-probing adds
    // ONE bucket per modulus bit — so probed candidates must grow
    // ~log(corpus), far under input growth (same sign-flipped replicas
    // as embdup so replicas land in distinct buckets).
    val lshResults = multiples.map { m =>
      val corpus = emb.crossJoin(spark.range(m).toDF("rep"))
        .selectExpr(
          "vec_id + rep * 100000000 AS vec_id",
          "transform(embedding, (x, i) -> CASE WHEN ((CAST(rep AS INT) >> (i % 8)) & 1) = 1 THEN -x ELSE x END) AS embedding")
      val t0l = System.nanoTime()
      val cands = operators.Similarity.lshCandidatesOn(spark, s"scale-lsh-$m", corpus)
      val sec = (System.nanoTime() - t0l) / 1e9
      println(f"[scale] annlsh  x$m%-3d vecs=${nVec * m}%8d cands=$cands%8d  $sec%7.2f s")
      (m, sec, cands)
    }
    if (lshResults.head._3 > 0 && lshResults.size > 1) {
      val inputRatio = lshResults.last._1.toDouble / lshResults.head._1
      val candRatio = lshResults.last._3.toDouble / lshResults.head._3
      println(f"[scale] annlsh candidates: input x$inputRatio%.0f -> cands x$candRatio%.2f (log-growth bound ${0.5 * inputRatio}%.2f)")
      require(candRatio < 0.5 * inputRatio,
        s"LSH probed candidates grew x$candRatio for x$inputRatio input — log-probe shape not holding")
    }

    // ---- triangle census (r15): the degree-oriented wedge join keeps
    // the only super-linear intermediate bounded by |E|^(3/2) with no
    // max-degree dependence. Node-shifted replicas are disjoint
    // subgraphs, so the whole census — nodes, edges, triangles,
    // wedges — must be EXACTLY ×m and the clustering coefficient
    // invariant; census drift means the orientation dropped or
    // double-counted a triangle class.
    val triEdges = operators.MarketBasket.supportEdges(
      operators.MarketBasket.pairsView(spark, sfDir)).cache()
    triEdges.count()
    val triResults = multiples.map { m =>
      val rep = triEdges.crossJoin(spark.range(m).toDF("rep"))
        .selectExpr("u + rep * 100000000 AS u", "v + rep * 100000000 AS v")
      val t0t = System.nanoTime()
      val r = operators.Graph.triangleStats(rep).collect().head
      val secT = (System.nanoTime() - t0t) / 1e9
      println(f"[scale] triangl x$m%-3d edges=${r.getLong(1)}%8d tris=${r.getLong(2)}%8d wedges=${r.getLong(3)}%9d cc_bp=${r.getLong(4)}%5d  $secT%7.2f s")
      (m, r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    }
    locally {
      val (m0t, n0, e0, t0, w0, c0) = triResults.head
      for ((m, n, e, t, w, c) <- triResults.tail) {
        require(n * m0t == n0 * m && e * m0t == e0 * m &&
            t * m0t == t0 * m && w * m0t == w0 * m,
          s"triangle census not exactly linear at x$m: ($n,$e,$t,$w) vs base ($n0,$e0,$t0,$w0)")
        require(c == c0, s"clustering coefficient drifted: $c vs $c0 at x$m")
      }
      println(s"[scale] triangl census: exactly linear, clustering invariant across x${multiples.mkString("/x")}")
    }
    triEdges.unpersist()

    // ---- sketches: bloom is broadcast-probe-only on the fact side and
    // CMS partial aggregates are capped at d·w rows per task, so both
    // must track input size linearly (dim AND fact replicated ×m)
    val ordersB = Tables.orders(spark, sfDir).cache()
    val nOrd = ordersB.count()
    val custB = Tables.customer(spark, sfDir).cache()
    custB.count()
    val sketchResults = multiples.map { m =>
      val o = ordersB.crossJoin(spark.range(m).toDF("rep"))
        .selectExpr("o_orderkey + rep * 100000000 AS o_orderkey",
          "o_custkey + rep * 1000000 AS o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
      val c = custB.crossJoin(spark.range(m).toDF("rep"))
        .selectExpr("c_custkey + rep * 1000000 AS c_custkey", "c_name",
          "c_nationkey", "c_acctbal", "c_mktsegment")
      val t0k = System.nanoTime()
      operators.Sketches.bloomOn(spark, o, c).collect()
      val secB = (System.nanoTime() - t0k) / 1e9
      println(f"[scale] bloom   x$m%-3d orders=${nOrd * m}%9d  $secB%7.2f s")
      // join-size estimate (r15): the CMS inner product's overcount
      // guarantee must hold at EVERY collision pressure — key
      // cardinality grows ×m against the fixed 768-counter sketch, and
      // `admissible` flipping false would be the theorem breaking.
      val js = operators.Sketches.cmsJoinSizeOn(spark, o, c).collect().head
      println(f"[scale] cmsjoin x$m%-3d keys x$m exact=${js.getLong(0)}%8d est=${js.getLong(1)}%9d admissible=${js.getBoolean(2)}")
      require(js.getBoolean(2),
        s"CMS join-size estimate ${js.getLong(1)} under exact ${js.getLong(0)} at x$m — overcount theorem broken")
      (m, secB, js.getLong(0))
    }
    println(f"[scale] bloom growth: input x${sketchResults.last._1 / sketchResults.head._1} -> time x${sketchResults.last._2 / sketchResults.head._2}%.1f")
    locally {
      // disjoint per-replica key shifts → the exact join size must be
      // EXACTLY ×m; drift means the replica key spaces overlapped and
      // the probe was measuring the wrong thing
      val (m0s, _, e0) = sketchResults.head
      for ((m, _, e) <- sketchResults.tail)
        require(e * m0s == e0 * m, s"exact join size $e not linear at x$m (base $e0 at x$m0s)")
      println(s"[scale] cmsjoin: admissible at every multiple, exact side linear")
    }

    // ---- fulfillment family (r13): the shared per-order stage is a
    // fact-fact equi-join with lineitem pre-aggregated to per-order
    // last-ship BEFORE the join, so its output must be EXACTLY one row
    // per shipped order (×m under replication) and its cost linear.
    // Off-×m rows mean the pre-aggregation leaked across replicas or
    // the join stopped being per-order.
    val liB = Tables.lineitem(spark, sfDir)
      .selectExpr("l_orderkey", "l_shipdate").cache()
    liB.count()
    val shipResults = multiples.map { m =>
      val o = ordersB.crossJoin(spark.range(m).toDF("rep"))
        .selectExpr("o_orderkey + rep * 100000000 AS o_orderkey",
          "o_orderpriority", "o_orderdate")
      val l = liB.crossJoin(spark.range(m).toDF("rep"))
        .selectExpr("l_orderkey + rep * 100000000 AS l_orderkey", "l_shipdate")
      val t0f = System.nanoTime()
      val rows = operators.Fulfillment.orderShipOn(o, l).count()
      val secF = (System.nanoTime() - t0f) / 1e9
      println(f"[scale] ordship x$m%-3d orders=${nOrd * m}%9d rows=$rows%9d  $secF%7.2f s")
      (m, secF, rows)
    }
    locally {
      val inputRatio = shipResults.last._1.toDouble / shipResults.head._1
      val rowRatio = shipResults.last._3.toDouble / shipResults.head._3
      println(f"[scale] ordship rows: input x$inputRatio%.0f -> rows x$rowRatio%.2f (exact-linear bound)")
      require(rowRatio == inputRatio,
        s"order_ship rows grew x$rowRatio for x$inputRatio input — per-order reduction leaked across replicas")
    }
    liB.unpersist()

    // ---- behavioral family (r12b): attribution over replicated USERS.
    // Each replica shifts user_id and event_id, so per-user windows
    // never cross replicas — purchases (output rows) must grow EXACTLY
    // ×m, and the user-partitioned window passes must track input
    // linearly. Off-×m growth means journey numbering leaked across
    // the replica boundary or the touch join stopped being
    // journey-sized.
    val evB = Tables.events(spark, sfDir).cache()
    evB.count()
    val behaviorResults = multiples.map { m =>
      val e = evB.crossJoin(spark.range(m).toDF("rep"))
        .selectExpr("user_id + rep * 1000000 AS user_id", "ts",
          "event_id + rep * 100000000 AS event_id", "event_type", "value")
      val t0b = System.nanoTime()
      val rows = operators.Behavior.attributionOn(e).count()
      val secB = (System.nanoTime() - t0b) / 1e9
      println(f"[scale] behav   x$m%-3d events=${baseRows * m}%9d purchases=$rows%8d  $secB%7.2f s")
      (m, secB, rows)
    }
    locally {
      val inputRatio = behaviorResults.last._1.toDouble / behaviorResults.head._1
      val rowRatio = behaviorResults.last._3.toDouble / behaviorResults.head._3
      println(f"[scale] behav purchases: input x$inputRatio%.0f -> rows x$rowRatio%.2f (exact-linear bound)")
      require(rowRatio == inputRatio,
        s"attribution rows grew x$rowRatio for x$inputRatio input — journey windows leaked across replicas")
    }
    // ---- pattern search (r13): the sliding-window relation must be
    // DOMAIN-bounded — prefixes × (calendar hours − L + 1) — so
    // replicating packet VOLUME ×m (same hours, same prefixes) must
    // leave the window count EXACTLY constant while distances change.
    // Window growth with volume means the packet reduction leaked past
    // the (pfx, h) groupBy.
    val patResults = multiples.map { m =>
      val e = evB.crossJoin(spark.range(m).toDF("rep"))
        .selectExpr("user_id", "ts", "event_id + rep * 100000000 AS event_id",
          "event_type", "value")
      val ph = operators.Ewma.prefixHourCounts(
        flow.BatchFlowFeaturizer.packetsFromEvents(e))
      val t0p = System.nanoTime()
      val rows = operators.Ewma.patternMatchOn(ph, topK = Int.MaxValue).count()
      val secP = (System.nanoTime() - t0p) / 1e9
      println(f"[scale] tspat   x$m%-3d events=${baseRows * m}%9d windows=$rows%8d  $secP%7.2f s")
      (m, secP, rows)
    }
    locally {
      val counts = patResults.map(_._3).distinct
      println(f"[scale] tspat windows: input x${patResults.last._1 / patResults.head._1} -> windows x${patResults.last._3.toDouble / patResults.head._3}%.2f (exact-constant bound)")
      require(counts.size == 1,
        s"window count changed with packet volume ($counts) — the packet reduction leaked")
    }
    // ---- pattern-search spine SPAN guard (r14): the probe above pins
    // the spine constant under VOLUME replication; this one replicates
    // in TIME (each replica shifted past the corpus's end) so the
    // hour-span grows ×m, and asserts the spine relation is EXACTLY
    // |pfx| · (min(span, H) − L + 1): linear in the span below the
    // trailing-horizon clamp, hard-capped at |pfx| · H above it. ×13
    // pushes the sf0.1 span (~720 h) past the 8760 h horizon, so the
    // clamp's engagement is measured, not assumed.
    locally {
      val tsB = evB.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).head()
      val shiftNs = tsB.getLong(1) - tsB.getLong(0) + 3600L * 1000000000L
      val patLen = operators.Ewma.Pattern.length
      val horizon = operators.Ewma.PatternHorizonHours
      val spanProbes = Seq(1, 3, 13).map { m =>
        val e = evB.crossJoin(spark.range(m).toDF("rep"))
          .selectExpr("user_id", s"ts + rep * ${shiftNs}L AS ts",
            "event_id + rep * 100000000 AS event_id", "event_type", "value")
        val ph = operators.Ewma.prefixHourCounts(
          flow.BatchFlowFeaturizer.packetsFromEvents(e)).cache()
        val st = ph.agg(min(col("h")), max(col("h")), countDistinct(col("pfx"))).head()
        val span = st.getLong(1) - st.getLong(0) + 1
        val t0s = System.nanoTime()
        val windows = operators.Ewma.patternMatchOn(ph, topK = Int.MaxValue).count()
        val secS = (System.nanoTime() - t0s) / 1e9
        val expected = st.getLong(2) * (math.min(span, horizon) - patLen + 1)
        println(f"[scale] tspan   x$m%-3d span=$span%6d h windows=$windows%9d expected=$expected%9d clamped=${span > horizon}%-5s $secS%7.2f s")
        require(windows == expected,
          s"spine windows $windows != |pfx|*(min(span,H)-L+1) = $expected — span guard broken")
        ph.unpersist()
        (m, span)
      }
      require(spanProbes.exists(_._2 > horizon),
        "no span probe crossed the horizon — raise the time multiple")
      println(s"[scale] tspan spine: linear in span below H=$horizon h, hard-clamped above (exact-equality bound)")
    }

    // ---- CUSUM sparse-form guard (r15): the changepoint screen
    // claims O(present hours) with NO dense spine — the gap-analytic
    // candidates stand in for every absent calendar hour. Under ×13
    // TIME replication (span ~9400 h, far past anything the spec
    // walks, with replica-boundary gaps) the sparse trajectory must
    // equal the textbook dense recursion
    // S' = max(0, S' + den·H·x − num·T) walked hour-by-hour on the
    // driver over the FULL span — exact equality at every present
    // hour — and its cost must track present hours, not span.
    locally {
      val tsB = evB.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).head()
      val shiftNs = tsB.getLong(1) - tsB.getLong(0) + 3600L * 1000000000L
      val cuProbes = Seq(1, 13).map { m =>
        val e = evB.crossJoin(spark.range(m).toDF("rep"))
          .selectExpr("user_id", s"ts + rep * ${shiftNs}L AS ts",
            "event_id + rep * 100000000 AS event_id", "event_type", "value")
        val ph = operators.Ewma.prefixHourCounts(
          flow.BatchFlowFeaturizer.packetsFromEvents(e)).cache()
        val present = ph.count()
        val t0c = System.nanoTime()
        val traj = operators.Cusum.trajectoryFromCounts(ph)
          .select(col("pfx"), col("h"), col("cusum_scaled")).collect()
        val secC = (System.nanoTime() - t0c) / 1e9
        val sparse = traj.map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
        val counts = ph.select(col("pfx"), col("h"), col("cnt")).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        val dense = operators.Cusum.denseReferenceWalk(counts,
          operators.Cusum.DriftNum, operators.Cusum.DriftDen)
        require(sparse == dense,
          s"x$m: sparse gap-analytic CUSUM diverged from the dense walk " +
            s"(${sparse.size} vs ${dense.size} rows, " +
            s"${sparse.count { case (k, v) => dense.get(k).contains(v) }} agree)")
        // the causally-calibrated twin, same exact-equality bound: its
        // post-warmup sparse trajectory must match the dense walk with
        // warmup-derived constants across the replica-boundary gaps
        val calSparse = operators.Cusum.calibratedTrajectory(ph)
          .select(col("pfx"), col("h"), col("cusum_scaled")).collect()
          .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
        val calDense = operators.Cusum.denseReferenceWalk(counts,
          operators.Cusum.DriftNum, operators.Cusum.DriftDen,
          operators.Cusum.WarmupHours)
        require(calSparse == calDense,
          s"x$m: calibrated CUSUM diverged from its dense post-warmup walk " +
            s"(${calSparse.size} vs ${calDense.size} rows)")
        val spanH = counts.map(_._2).max - counts.map(_._2).min + 1
        println(f"[scale] cusum   x$m%-3d span=$spanH%6d h present=$present%7d rows=${traj.length}%7d cal_rows=${calSparse.size}%7d  $secC%7.2f s")
        ph.unpersist()
        (m, present)
      }
      println(f"[scale] cusum trajectory: span x13 -> dense-walk equality at every present hour (exact bound), rows x${cuProbes.last._2.toDouble / cuProbes.head._2}%.2f")
    }

    // ---- Misra-Gries (r13): the summary's defining property is a
    // HARD capacity bound — replicating USERS ×m grows the key
    // cardinality ×m, but the emitted summary must never exceed MgCap
    // rows, whatever the cardinality. Unbounded growth means the
    // aggregate degenerated into an exact groupBy.
    val mgResults = multiples.map { m =>
      val e = evB.crossJoin(spark.range(m).toDF("rep"))
        .selectExpr("user_id + rep * 1000000 AS user_id", "ts",
          "event_id + rep * 100000000 AS event_id", "event_type", "value")
      val t0g = System.nanoTime()
      val rows = operators.Sketches.mgOn(e).count()
      val secG = (System.nanoTime() - t0g) / 1e9
      println(f"[scale] mgsumm  x$m%-3d events=${baseRows * m}%9d keys=${1500 * m}%7d rows=$rows%6d  $secG%7.2f s")
      (m, secG, rows)
    }
    locally {
      val cap = operators.Sketches.MgCap.toLong
      println(s"[scale] mgsumm rows: keys x${mgResults.last._1 / mgResults.head._1} -> summary rows ${mgResults.map(_._3).mkString("/")} (hard cap $cap)")
      require(mgResults.forall(_._3 <= cap),
        s"MG summary exceeded its capacity bound: ${mgResults.map(_._3)}")
    }

    // ---- q-digest (r14): same defining property for the quantile
    // summary — replicating values ×m (shifted per replica so distinct
    // values grow toward the universe) must keep the compressed digest
    // within its 4k node bound, whatever the weight or cardinality,
    // while total weight is conserved exactly. Node growth past the
    // bound means compression degenerated into the exact histogram.
    val qdK = operators.Sketches.QdErrK
    val qdResults = multiples.map { m =>
      val e = evB.crossJoin(spark.range(m).toDF("rep"))
        .selectExpr("user_id", "ts", "event_id + rep * 100000000 AS event_id",
          "event_type", "value + CAST(rep AS DOUBLE) * 7.77 AS value")
      val t0q = System.nanoTime()
      val nodes = operators.Sketches.qdigestNodes(e, qdK)
        .agg(count(lit(1)).as("n_nodes"), sum(col("cnt")).as("w")).head()
      val secQ = (System.nanoTime() - t0q) / 1e9
      println(f"[scale] qdigest x$m%-3d events=${baseRows * m}%9d nodes=${nodes.getLong(0)}%6d weight=${nodes.getLong(1)}%9d  $secQ%7.2f s")
      (m, nodes.getLong(0), nodes.getLong(1))
    }
    locally {
      val bound = functions.QDigest.sizeBound(qdK).toLong
      println(s"[scale] qdigest nodes: weight x${qdResults.last._3 / qdResults.head._3} -> nodes ${qdResults.map(_._2).mkString("/")} (hard bound $bound)")
      require(qdResults.forall(_._2 <= bound),
        s"q-digest exceeded its size bound: ${qdResults.map(_._2)}")
      require(qdResults.zip(multiples).forall { case ((_, _, w), m) => w == baseRows * m },
        s"q-digest lost weight: ${qdResults.map(_._3)} vs ${multiples.map(_ * baseRows)}")
    }

    // ---- HLL stream state (r15): the in-stream distinct-sources
    // screen's defining property is a HARD state ceiling — remapping
    // the ip space ×m grows per-(window, salt) source cardinality ×m
    // (past the ~512-coupon sparse regime at ×10, into dense HLL
    // territory the catalog corpus never reaches), but the bytes a
    // group's ValueState holds (probed via the processor's own update
    // calls) must never exceed the DataSketches published
    // updatable-image maximum for lgK, and the estimate must stay
    // inside the catalog's 10% oracle band even in the dense regime.
    val hllResults = multiples.map { m =>
      val multiplied = packets
        .crossJoin(spark.range(m).toDF("rep"))
        .withColumn("src_ip", concat(col("rep"), lit("."), col("src_ip")))
      import spark.implicits._
      val rows = multiplied.selectExpr(
        s"ts_us DIV ${operators.HllStream.WinUs} AS win",
        s"CAST(pmod(xxhash64(src_ip), ${operators.HllStream.Salts}) AS INT) AS salt",
        "src_ip AS k").as[operators.HllStream.HsRow]
      val t0h = System.nanoTime()
      val st = operators.HllStream.stateProbe(rows)
        .agg(
          max(col("state_bytes")).as("max_bytes"),
          max(abs(col("est") - col("n_exact")).cast("double") / col("n_exact"))
            .as("max_rel_err"),
          max(col("n_exact")).as("max_card"))
        .head()
      val secH = (System.nanoTime() - t0h) / 1e9
      println(f"[scale] hllst   x$m%-3d group_card<=${st.getLong(2)}%6d state_bytes<=${st.getInt(0)}%6d rel_err<=${st.getDouble(1) * 100}%5.2f%% $secH%7.2f s")
      (m, st.getInt(0), st.getDouble(1))
    }
    locally {
      val ceiling = org.apache.datasketches.hll.HllSketch
        .getMaxUpdatableSerializationBytes(operators.HllStream.LgK,
          org.apache.datasketches.hll.TgtHllType.HLL_4)
      println(s"[scale] hllst state: cardinality x${hllResults.last._1 / hllResults.head._1} -> max state bytes ${hllResults.map(_._2).mkString("/")} (hard ceiling $ceiling)")
      require(hllResults.forall(_._2 <= ceiling),
        s"HLL stream state exceeded the published ceiling $ceiling: ${hllResults.map(_._2)}")
      require(hllResults.forall(_._3 <= 0.10),
        s"HLL estimate left the 10% oracle band: ${hllResults.map(_._3)}")
    }

    // ---- q-digest stream state (r16, VERDICT task 6): the persisted
    // ValueState image must honor QDigest.sizeBound(k) = 4k nodes —
    // the pre-persist compress makes that a HARD bound, not update()'s
    // larger 6k+64 amortization buffer. Two regimes, both ×1/×4/×10:
    //  - stress cap 64 with per-replica length offsets (disjoint value
    //    domains, so distinct values AND weight grow ×m, t = n/k ≥ 1
    //    from ×1 on): compression is ACTIVE and nodes must stay ≤ 256
    //    however far weight outruns the cap;
    //  - deployed cap 4096 at the top multiple: this corpus stays in
    //    the exact t = 0 regime there, where the bound holds because
    //    nodes ≤ distinct values and the no-op compress must not
    //    corrupt the histogram (weight conservation is the witness).
    val qdstCap = 64
    val qdstResults = multiples.map { m =>
      import spark.implicits._
      val rows = packets
        .crossJoin(spark.range(m).toDF("rep"))
        .selectExpr(
          s"ts_us DIV ${operators.QdStream.WinUs} AS win",
          s"CAST(pmod(xxhash64(src_ip), ${operators.QdStream.QdSalts}) AS INT) AS salt",
          "length + rep * 4096 AS v")
        .as[operators.QdStream.QdRow]
      val t0q = System.nanoTime()
      val st = operators.QdStream.stateProbe(rows, qdstCap)
        .agg(
          max(col("state_nodes")).as("max_nodes"),
          sum(col("weight")).as("w"),
          max(col("weight")).as("max_group_w"))
        .head()
      val secQ = (System.nanoTime() - t0q) / 1e9
      println(f"[scale] qdst    x$m%-3d rows=${baseRows * m}%9d group_w<=${st.getLong(2)}%7d state_nodes<=${st.getInt(0)}%5d $secQ%7.2f s")
      (m, st.getInt(0), st.getLong(1))
    }
    locally {
      val bound = functions.QDigest.sizeBound(qdstCap).toLong
      println(s"[scale] qdst state: weight x${multiples.last / multiples.head} -> max persisted nodes ${qdstResults.map(_._2).mkString("/")} (hard bound $bound)")
      require(qdstResults.forall(_._2 <= bound),
        s"q-digest stream persisted state exceeded sizeBound($qdstCap) = $bound: ${qdstResults.map(_._2)}")
      require(qdstResults.zip(multiples).forall { case ((_, _, w), m) => w == baseRows * m },
        s"q-digest stream state lost weight: ${qdstResults.map(_._3)} vs ${multiples.map(_ * baseRows)}")
      // deployed cap at the top multiple: exact regime, bound + weight
      import spark.implicits._
      val m = multiples.last
      val rows = packets
        .crossJoin(spark.range(m).toDF("rep"))
        .selectExpr(
          s"ts_us DIV ${operators.QdStream.WinUs} AS win",
          s"CAST(pmod(xxhash64(src_ip), ${operators.QdStream.QdSalts}) AS INT) AS salt",
          "length AS v")
        .as[operators.QdStream.QdRow]
      val st = operators.QdStream.stateProbe(rows, operators.QdStream.QdStreamCap)
        .agg(max(col("state_nodes")), sum(col("weight"))).head()
      val depBound = functions.QDigest.sizeBound(operators.QdStream.QdStreamCap)
      println(s"[scale] qdst deployed cap ${operators.QdStream.QdStreamCap} x$m: max nodes ${st.getInt(0)} (bound $depBound), weight ${st.getLong(1)}")
      require(st.getInt(0) <= depBound && st.getLong(1) == baseRows * m,
        s"deployed-cap qdst state violated bound/weight: nodes ${st.getInt(0)}, weight ${st.getLong(1)}")
    }

    // ---- twap family (r13): the per-user step-integral must stay ONE
    // user-partitioned window + one combinable groupBy. Replicated
    // users are disjoint, so output rows (users with >= 2 events) grow
    // EXACTLY ×m; off-×m growth means the lead window leaked across
    // the replica boundary.
    val twapResults = multiples.map { m =>
      val e = evB.crossJoin(spark.range(m).toDF("rep"))
        .selectExpr("user_id + rep * 1000000 AS user_id", "ts",
          "event_id + rep * 100000000 AS event_id", "event_type", "value")
      val t0b = System.nanoTime()
      val rows = operators.TimeSeries.twapOn(e).count()
      val secB = (System.nanoTime() - t0b) / 1e9
      println(f"[scale] twap    x$m%-3d events=${baseRows * m}%9d users=$rows%8d  $secB%7.2f s")
      (m, secB, rows)
    }
    locally {
      val inputRatio = twapResults.last._1.toDouble / twapResults.head._1
      val rowRatio = twapResults.last._3.toDouble / twapResults.head._3
      println(f"[scale] twap users: input x$inputRatio%.0f -> rows x$rowRatio%.2f (exact-linear bound)")
      require(rowRatio == inputRatio,
        s"twap rows grew x$rowRatio for x$inputRatio input — the lead window leaked across replicas")
    }
    evB.unpersist()
    ordersB.unpersist(); custB.unpersist()
    emb.unpersist(); docs.unpersist()
    operators.StageViews.unpersistAll(spark)

    // streaming path: same multiplied packets through the stateful
    // operator (state store + typed encoders are the extra cost vs the
    // batch window plan)
    if (sys.env.get("SPARK_GRAFT_SCALE_STREAM").contains("1")) { // opt-in
      import spark.implicits._
      val m = multiples.last
      val dir = java.nio.file.Files.createTempDirectory("scale_stream").toString
      packets
        .crossJoin(spark.range(m).toDF("rep"))
        .withColumn("src_ip", concat(col("rep"), lit("."), col("src_ip")))
        .withColumn("dst_ip", concat(col("rep"), lit("."), col("dst_ip")))
        .withColumn("event_id", col("event_id") + col("rep") * lit(100000000L))
        .drop("rep")
        .write.mode("overwrite").parquet(dir)
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[graft.flow.PacketRow]].schema)
        .parquet(dir).as[graft.flow.PacketRow]
      val t0s = System.nanoTime()
      val q = graft.flow.FlowFeaturizer
        .featurize(stream, timeoutMs = 0, emitOnUpdate = true)
        .writeStream.outputMode("update")
        .format("memory").queryName("scale_stream")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t0s) / 1e9
      val flows = spark.table("scale_stream").count()
      println(f"[scale] streaming x$m%-3d packets=${baseRows * m}%9d flows=$flows%8d  $sec%7.2f s  (${baseRows * m / sec / 1e6}%.2f Mpkt/s)")
    }
    spark.stop()
  }
}
