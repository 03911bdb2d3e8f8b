package graft.operators

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING — the missing half of the text
  * family: `q_text_tokens_bpe` APPLIES a byte-pair segmentation, this
  * LEARNS the merge table from the corpus (Gage 1994; Sennrich,
  * Haddow, Birch 2016 — the standard LLM tokenizer-training loop).
  *
  * Algorithm, exactly the textbook loop: start from the per-word
  * character segmentation, then repeat [[MergeSteps]] times: count
  * adjacent symbol pairs across the corpus (weighted by word
  * frequency), pick the most frequent pair (count DESC, pair ASC — a
  * total, deterministic tie-break), and merge its occurrences
  * greedily left-to-right within every word.
  *
  * Why this scales to 100 TB: the corpus is touched EXACTLY ONCE — by
  * the word-frequency aggregate (map-side combinable, the cheapest
  * full-scan shape). Every training iteration after that runs on the
  * VOCABULARY (distinct words + counts), which saturates while the
  * corpus keeps growing — the reason real BPE trainers shard the word
  * table, not the corpus. ScaleSmoke measures exactly this: replicate
  * the corpus ×10 and the learned merge table is invariant with every
  * pair count exactly ×10.
  *
  * Engine/oracle split (both sides share the [[SqlDialect]] fragments
  * for tokenize / char-split / pair extraction, so the semantics
  * cannot drift): the ENGINE runs the ONE corpus-sized aggregate on
  * Spark, collects the vocabulary-sized (word, cnt, seg) relation to
  * the driver ONCE (bounded by [[MaxTrainVocab]], checked before the
  * collect), and runs the merge loop driver-locally — the standard
  * tokenizer-trainer shape (HuggingFace tokenizers, SentencePiece:
  * the word-count table lives on one node; only the corpus scan is
  * distributed). The r15 spelling ran one Spark job + a 1-row collect
  * PER merge step, which hid that a real 32k-merge vocabulary means
  * 32k sequential jobs (r16 VERDICT #1) — the trainer now runs a
  * CONSTANT number of Spark jobs regardless of [[MergeSteps]]
  * (ScaleSmoke gates exactly that with a job-counting listener). The
  * ORACLE unrolls the identical loop as [[MergeSteps]] chained CTEs
  * in DuckDB. An earlier spelling unrolled the chain on Spark too;
  * its inlined plan grew to ~5400 formatted lines and planning
  * dominated runtime.
  *
  * Driver-local loop parity: pair counts are exact BIGINT sums of
  * word frequencies over ALL adjacent (overlapping) positions — the
  * same multiset the vocabulary-sized Spark aggregate produced; the
  * argmax tie-break compares the pair string by UNSIGNED UTF-8 BYTES
  * (`utf8Less`), which is Spark's and DuckDB's binary string order —
  * `String.compareTo` (UTF-16 code units) would disagree on
  * supplementary characters. The greedy leftmost token-array merge is
  * equivalent to the delimiter-doubling string replace (both consume
  * occurrences left-to-right, non-overlapping), and the FINAL
  * segmentation relation stays DISTRIBUTED: the learned rules fold
  * into one chained-`replace` projection over the checkpointed seg0 —
  * nothing vocabulary-sized is ever shipped back up.
  *
  * The greedy leftmost merge uses a delimiter-doubling encoding on
  * BOTH sides: a segmentation [t1, t2, …] is stored as the string
  * `" t1  t2 … "` — single space flanking, DOUBLE space between
  * tokens — so the literal replace of `" x  y "` with `" xy "`
  *  - cannot match inside a multi-character symbol (symbols contain no
  *    spaces) and cannot span a token boundary misaligned (the inner
  *    separator of the pattern is the full two-space delimiter);
  *  - consumes each occurrence's OWN flanking spaces (every token
  *    contributes one space to each neighboring double separator), so
  *    back-to-back occurrences `[a,b,a,b]` both merge while the
  *    overlap `[a,a,a]` merges leftmost-first — byte-for-byte the
  *    reference BPE behavior;
  *  - preserves the encoding invariant for the next iteration.
  *
  * Two catalog queries: `q_bpe_train` emits the learned merge table
  * (step, symbols, merged form, weighted pair count) and
  * `q_bpe_segment` applies the final segmentation back to the corpus
  * and reports per-language token inflation (all integer arithmetic —
  * `tok_per_word_bp` is an exact BIGINT basis-point ratio, never a
  * float). If the vocabulary merges to single tokens before the step
  * budget is spent, both sides STOP merging (the oracle's per-step
  * LEFT JOIN passes segmentations through an empty argmax unchanged).
  */
object Bpe {

  /** Merge iterations to learn. 64 exercises deep multi-character
    * symbol chains (later steps merge PAIRS OF MERGED symbols) at a
    * size where the oracle's unrolled CTE chain still runs instantly
    * in DuckDB; the ENGINE's cost is independent of this knob beyond
    * the in-memory loop itself (constant Spark jobs — r16 VERDICT #1).
    */
  val MergeSteps = 64

  /** Hard bound on the vocabulary rows collected to the driver for
    * training. The (word, cnt, seg) relation is DISTINCT whitespace
    * words — it saturates while the corpus grows (Heaps' law), and
    * every real tokenizer trainer holds it on one node. 8M rows ≈ a
    * few GB of driver heap at web-corpus word lengths; past it, fail
    * loudly (prune the corpus with a min-frequency filter upstream)
    * rather than OOM mid-collect.
    */
  val MaxTrainVocab = 8000000L

  private def explodeWords(d: SqlDialect, table: String): String = d match {
    case SparkSql => s"SELECT lang, explode(split(text, ' ')) AS word FROM $table"
    case DuckSql => s"SELECT lang, unnest(string_split(text, ' ')) AS word FROM $table"
  }

  /** word → `"c1  c2 … "` (chars double-spaced, trailing run trimmed).
    * `(?s)` in both dialects: the default `.` excludes line terminators
    * in Java regex AND RE2, so a word carrying an embedded `\n` would
    * otherwise enter the base segmentation as a fused multi-char
    * symbol — violating the per-character start BPE is defined from.
    * Both engines erred identically, so only a spec (not the oracle
    * hash) can pin this.
    */
  private def spaced(d: SqlDialect, col: String): String = d match {
    case SparkSql => "regexp_replace(" + col + ", '(?s)(.)', '$1  ')"
    case DuckSql => "regexp_replace(" + col + ", '(?s)(.)', '\\1  ', 'g')"
  }

  /** The `"  "`-delimited segmentation string back to a token array. */
  private def toks(d: SqlDialect, col: String): String = d match {
    case SparkSql => s"split(trim($col), '  ')"
    case DuckSql => s"string_split(trim($col), '  ')"
  }

  /** The word-frequency + char-segmentation stage (the ONE
    * corpus-sized aggregate), shared verbatim by engine and oracle.
    */
  private def seg0Sql(d: SqlDialect, table: String): String =
    s"""SELECT word, cnt, ' ' || rtrim(${spaced(d, "word")}) || ' ' AS seg
FROM (SELECT word, CAST(count(*) AS BIGINT) AS cnt
      FROM (${explodeWords(d, table)}) GROUP BY word) w0"""

  // ------------- engine side: the driver-local trainer -------------

  /** One learned merge rule (public: the row encoder's generated code
    * constructs and reads it).
    */
  case class Merge(step: Long, left_sym: String, right_sym: String,
      merged_sym: String, pair_count: Long)

  /** Unsigned UTF-8 byte order — Spark's AND DuckDB's binary string
    * comparison, which `String.compareTo` (UTF-16 code units) gets
    * wrong for supplementary characters vs code points ≥ U+E000.
    */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Greedy leftmost non-overlapping merge of adjacent (x, y) into xy —
    * the token-array equivalent of replacing `" x  y "` with `" xy "`
    * in the delimiter-doubled segmentation string (both scan left to
    * right and consume matched occurrences, so `[a,a,a]` under (a,a)
    * gives `[aa,a]` and `[a,b,a,b]` merges both).
    */
  private def mergeTokens(t: Array[String], x: String, y: String,
      xy: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](t.length)
    var i = 0
    while (i < t.length) {
      if (i + 1 < t.length && t(i) == x && t(i + 1) == y) { out += xy; i += 2 }
      else { out += t(i); i += 1 }
    }
    out.toArray
  }

  /** Expression-depth bound for the chained-replace segmentation: a
    * merge budget deeper than this folds in CHUNKS with a
    * localCheckpoint between them — a single nested-replace column
    * 1024 deep overflows the column-conversion stack (measured:
    * StackOverflow in ColumnNodeToExpressionConverter at the r18
    * wide-vocabulary gate).
    */
  private val SegChunk = 64

  /** Run the training loop: the learned merge rules (≤ `steps`) and a
    * THUNK of the final segmentation relation (word, cnt, seg) — the
    * rules come from the DRIVER-LOCAL loop over the once-collected
    * vocabulary; the relation stays distributed (the rules fold into
    * chained `replace` projections over the checkpointed seg0,
    * [[SegChunk]] rules per projection). The thunk is only forced by
    * [[segmentOn]]: training alone must not build (or execute) a
    * merge-budget-deep expression. Spark job count during TRAINING is
    * CONSTANT in `steps`; segmentation adds ⌈steps/[[SegChunk]]⌉
    * checkpoint jobs over the vocabulary-sized relation.
    */
  private def trainLoop(spark: SparkSession, docsView: String,
      steps: Int = MergeSteps): (Seq[Merge], () => DataFrame) = {
    // the corpus-sized stage is materialized ONCE; training reads the
    // vocabulary-sized relation it leaves behind
    val seg0 = spark.sql(seg0Sql(SparkSql, docsView)).localCheckpoint()
    val nVocab = seg0.count()
    require(nVocab <= MaxTrainVocab,
      s"BPE training vocabulary $nVocab exceeds MaxTrainVocab=$MaxTrainVocab — " +
        "prune the corpus (min word frequency) before training")
    val rows = seg0.select(col("cnt"), col("seg")).collect()

    // word table: token arrays + frequencies (segs parsed once)
    val toksArr = new Array[Array[String]](rows.length)
    val cnts = new Array[Long](rows.length)
    var w = 0
    while (w < rows.length) {
      cnts(w) = rows(w).getLong(0)
      // strip EXACTLY the single framing spaces seg0Sql guarantees —
      // Java String.trim strips every char <= U+0020, so a word with a
      // leading/trailing control char (e.g. "\nb") would lose its "\n"
      // base token here while the SQL spelling (space-only trim) keeps
      // it, silently diverging pair counts from the DuckDB oracle
      val s = rows(w).getString(1)
      toksArr(w) = s.substring(1, s.length - 1).split("  ", -1)
      w += 1
    }
    // pair -> summed word-frequency weight over ALL adjacent positions
    // (overlapping included — the multiset the Spark aggregate built),
    // plus pair -> word indices for incremental re-count on merge
    val pcnt = new java.util.HashMap[(String, String), Long]()
    val occ = new java.util.HashMap[(String, String), java.util.HashSet[Integer]]()
    def addWord(wi: Int, sign: Long): Unit = {
      val t = toksArr(wi)
      var i = 0
      while (i + 1 < t.length) {
        val k = (t(i), t(i + 1))
        val nv = pcnt.getOrDefault(k, 0L) + sign * cnts(wi)
        if (nv == 0L) { pcnt.remove(k); val s = occ.get(k); if (s != null) s.remove(wi) }
        else {
          pcnt.put(k, nv)
          if (sign > 0)
            occ.computeIfAbsent(k, _ => new java.util.HashSet[Integer]()).add(wi)
        }
        i += 1
      }
    }
    w = 0
    while (w < toksArr.length) { addWord(w, 1L); w += 1 }

    val merges = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= steps && !exhausted) {
      // argmax: count DESC, pair ASC in UTF-8 byte order — the total,
      // deterministic tie-break both engines sort by
      var bestK: (String, String) = null
      var bestC = 0L
      val it = pcnt.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue
        if (c > bestC || (c == bestC && bestK != null && {
          val a = e.getKey._1 + " " + e.getKey._2
          val b = bestK._1 + " " + bestK._2
          utf8Less(a, b)
        })) { bestK = e.getKey; bestC = c }
      }
      if (bestK == null) exhausted = true // vocabulary fully merged
      else {
        val (x, y) = bestK
        merges += Merge(step.toLong, x, y, x + y, bestC)
        // re-count exactly the words containing the pair: subtract the
        // word's old adjacencies, merge, add the new ones
        val hit = occ.remove(bestK)
        if (hit != null) {
          val wi = hit.iterator()
          while (wi.hasNext) {
            val i = wi.next().intValue
            addWord(i, -1L)
            toksArr(i) = mergeTokens(toksArr(i), x, y, x + y)
            addWord(i, 1L)
          }
        }
        pcnt.remove(bestK) // merged pair can no longer be adjacent as (x, y)
      }
      step += 1
    }
    val learned = merges.result()
    // final segmentation stays distributed: fold the learned rules into
    // chained-replace expressions over seg0, SegChunk rules deep per
    // projection with a checkpoint between chunks (bounds expression
    // depth at any merge budget)
    val segDf = () => learned.grouped(SegChunk).foldLeft(seg0) { (df, chunk) =>
      val segExpr = chunk.foldLeft(col("seg")) { (c, m) =>
        replace(c, lit(s" ${m.left_sym}  ${m.right_sym} "),
          lit(s" ${m.merged_sym} "))
      }
      val next = df.withColumn("seg", segExpr)
      if (learned.length > SegChunk) next.localCheckpoint() else next
    }
    (learned, segDf)
  }

  /** Register `documents` under a QUERY-UNIQUE temp view for the
    * SQL-fragment stages, dropping it when done. A fixed name here
    * once clobbered the harness-wide `documents` StageViews
    * registration (whose registry-key dedup never re-registers), so
    * every later `FROM documents` query in the session silently read
    * the raw one-split parquet instead of the widened view. The drop
    * is safe immediately: `spark.sql` resolves the view at analysis
    * time and trainLoop's outputs are checkpointed.
    */
  private def withDocsView[A](spark: SparkSession, documents: DataFrame)
      (f: String => A): A = {
    val view = s"bpe_docs_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    documents.createOrReplaceTempView(view)
    try f(view) finally spark.catalog.dropTempView(view)
  }

  /** @param steps merge budget override — ScaleSmoke trains the same
    *   corpus at several budgets and gates that the SPARK JOB COUNT
    *   is identical (the driver-local loop is the only thing that
    *   grows; r16 VERDICT #1's done-condition).
    */
  def trainOn(spark: SparkSession, documents: DataFrame,
      steps: Int = MergeSteps): DataFrame = {
    import spark.implicits._
    val (merges, _) = withDocsView(spark, documents)(trainLoop(spark, _, steps))
    spark.createDataset(merges).toDF().orderBy("step")
  }

  /** Row count of the (word, cnt, seg) relation the trainer collects —
    * the driver-side resource ScaleSmoke gates: it is VOCABULARY-sized
    * (distinct whitespace words), so it must be invariant under
    * identical corpus replication while the corpus itself grows ×m.
    */
  private[graft] def vocabRowsOn(spark: SparkSession, documents: DataFrame): Long =
    withDocsView(spark, documents) { v =>
      spark.sql(seg0Sql(SparkSql, v)).count()
    }

  def segmentOn(spark: SparkSession, documents: DataFrame,
      steps: Int = MergeSteps): DataFrame =
    withDocsView(spark, documents) { docsView =>
    val (_, segThunk) = trainLoop(spark, docsView, steps)
    val seg = segThunk()
    val wl = spark.sql(
      s"""SELECT lang, word, CAST(count(*) AS BIGINT) AS wcnt
FROM (${explodeWords(SparkSql, docsView)}) GROUP BY lang, word""")
    val tk = seg.selectExpr("word",
      s"CAST(${SparkSql.len(toks(SparkSql, "seg"))} AS BIGINT) AS ntok")
    wl.join(tk, "word")
      .groupBy(col("lang"))
      .agg(sum(col("wcnt")).cast("bigint").as("n_words"),
        sum(col("wcnt") * col("ntok")).cast("bigint").as("n_tokens"))
      .selectExpr("lang", "n_words", "n_tokens",
        "(n_tokens * 10000) DIV n_words AS tok_per_word_bp")
      .orderBy("lang")
  }

  // ---------------- oracle side: the unrolled CTE chain ----------------

  /** The oracle's CTE chain: `seg0` (the shared stage), then per step i
    * the pair count `pc{i}`, argmax `top{i}`, and merged segmentation
    * `seg{i}` (LEFT JOIN: an empty argmax passes `seg` through
    * unchanged — the loop's stop condition).
    */
  private def chain(d: SqlDialect): String = {
    // seg$i is referenced TWICE by step i+1 (tok and the merge join):
    // DuckDB inlines single-shot CTEs, so without MATERIALIZED the
    // 64-step chain expands ~2^64 — observed as "Too many open files"
    // on the documents parquet before the planner even finishes. Spark
    // never runs this chain (the engine is the driver-local trainer).
    val m = d match { case DuckSql => "MATERIALIZED " case SparkSql => "" }
    val steps = (1 to MergeSteps).map { i =>
      val prev = s"seg${i - 1}"
      s"""tok$i AS (SELECT word, cnt, ${toks(d, "seg")} AS t FROM $prev),
tf$i AS (SELECT word, cnt, t FROM tok$i WHERE ${d.len("t")} >= 2),
pos$i AS (${d.series("word, cnt, t", d.len("t") + " - 1", "p", s"tf$i")}),
pc$i AS (SELECT ${d.el("t", "p")} || ' ' || ${d.el("t", "p + 1")} AS pair,
                CAST(sum(cnt) AS BIGINT) AS pcnt
         FROM pos$i GROUP BY 1),
top$i AS $m(SELECT pair, pcnt FROM pc$i ORDER BY pcnt DESC, pair LIMIT 1),
seg$i AS $m(SELECT s.word, s.cnt,
                 CASE WHEN t.pair IS NULL THEN s.seg
                      ELSE replace(s.seg, ' ' || replace(t.pair, ' ', '  ') || ' ',
                                   ' ' || replace(t.pair, ' ', '') || ' ') END AS seg
          FROM $prev s LEFT JOIN top$i t ON TRUE)"""
    }
    s"""WITH seg0 AS $m(${seg0Sql(d, "documents")}),
${steps.mkString(",\n")}"""
  }

  private def trainSql(d: SqlDialect): String = {
    val rows = (1 to MergeSteps).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS step, split_part(pair, ' ', 1) AS left_sym,
       split_part(pair, ' ', 2) AS right_sym,
       replace(pair, ' ', '') AS merged_sym, pcnt AS pair_count FROM top$i"""
    }
    s"""${chain(d)}
SELECT * FROM (
${rows.mkString("\nUNION ALL\n")}
) merges
ORDER BY step"""
  }

  private def segmentSql(d: SqlDialect): String =
    s"""${chain(d)},
wl AS (SELECT lang, word, CAST(count(*) AS BIGINT) AS wcnt
       FROM (${explodeWords(d, "documents")}) GROUP BY lang, word),
tk AS (SELECT word, CAST(${d.len(toks(d, "seg"))} AS BIGINT) AS ntok
       FROM seg$MergeSteps)
SELECT lang,
       CAST(sum(wcnt) AS BIGINT) AS n_words,
       CAST(sum(wcnt * ntok) AS BIGINT) AS n_tokens,
       CAST(${d.idiv("CAST(sum(wcnt * ntok) AS BIGINT) * 10000", "CAST(sum(wcnt) AS BIGINT)")} AS BIGINT) AS tok_per_word_bp
FROM wl JOIN tk USING (word)
GROUP BY lang
ORDER BY lang"""

  val qBpeTrain = Q(
    "q_bpe_train",
    (spark, dir) => trainOn(spark, graft.Tables.documents(spark, dir)),
    Some(trainSql(DuckSql)))

  val qBpeSegment = Q(
    "q_bpe_segment",
    (spark, dir) => segmentOn(spark, graft.Tables.documents(spark, dir)),
    Some(segmentSql(DuckSql)))

  val all: Seq[Q] = Seq(qBpeTrain, qBpeSegment)
}
