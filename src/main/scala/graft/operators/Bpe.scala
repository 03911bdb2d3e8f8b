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
  * cannot drift): the ENGINE runs the loop iteratively — each step is
  * one vocabulary-sized aggregate whose 1-row argmax is collected and
  * folded into the next step's merge expression (the same
  * scalar-per-round pattern as [[Graph.kcore]]'s convergence counts;
  * the collected row is the merge RULE, never data). The ORACLE
  * unrolls the identical loop as [[MergeSteps]] chained CTEs. The
  * first spelling ran the unrolled chain on Spark too; its inlined
  * plan grew to ~5400 formatted lines and planning dominated runtime —
  * the iterative engine keeps every step's plan constant-depth.
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

  /** Merge iterations to learn. Enough to exercise multi-character
    * symbol merges (later steps merge PAIRS OF MERGED symbols) while
    * keeping the oracle's unrolled CTE chain readable.
    */
  val MergeSteps = 6

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

  // ---------------- engine side: the iterative loop ----------------

  /** Adjacent-pair counts (pair string `"x y"`, summed word-frequency
    * weight) of a segmentation relation — one vocabulary-sized
    * aggregate, built from the same dialect fragments the oracle
    * unrolls.
    */
  private def pairCounts(seg: DataFrame): DataFrame = {
    val d = SparkSql
    seg.selectExpr("cnt", s"${toks(d, "seg")} AS t")
      .where(expr(d.len("t") + " >= 2"))
      .selectExpr("cnt", "t", s"explode(sequence(1, ${d.len("t")} - 1)) AS p")
      .selectExpr(s"${d.el("t", "p")} || ' ' || ${d.el("t", "p + 1")} AS pair",
        "cnt")
      .groupBy(col("pair"))
      .agg(sum(col("cnt")).cast("bigint").as("pcnt"))
  }

  /** One learned merge rule (public: the row encoder's generated code
    * constructs and reads it).
    */
  case class Merge(step: Long, left_sym: String, right_sym: String,
      merged_sym: String, pair_count: Long)

  /** Run the training loop: the learned merge rules (≤ [[MergeSteps]])
    * and the final segmentation relation (word, cnt, seg).
    */
  private def trainLoop(spark: SparkSession,
      docsView: String): (Seq[Merge], DataFrame) = {
    // the corpus-sized stage is materialized ONCE; every iteration
    // after it reads this vocabulary-sized relation
    var seg = spark.sql(seg0Sql(SparkSql, docsView)).localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= MergeSteps && !exhausted) {
      val top = pairCounts(seg)
        .orderBy(col("pcnt").desc, col("pair").asc).limit(1).collect()
      if (top.isEmpty) exhausted = true // vocabulary fully merged
      else {
        val pair = top.head.getString(0)
        val Array(x, y) = pair.split(' ')
        merges += Merge(step.toLong, x, y, x + y, top.head.getLong(1))
        seg = seg.withColumn("seg",
            replace(col("seg"), lit(s" $x  $y "), lit(s" $x$y ")))
          .localCheckpoint() // constant-depth lineage across steps
      }
      step += 1
    }
    (merges.result(), seg)
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

  def trainOn(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    val (merges, _) = withDocsView(spark, documents)(trainLoop(spark, _))
    spark.createDataset(merges).toDF().orderBy("step")
  }

  def segmentOn(spark: SparkSession, documents: DataFrame): DataFrame =
    withDocsView(spark, documents) { docsView =>
    val (_, seg) = trainLoop(spark, docsView)
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
    val steps = (1 to MergeSteps).map { i =>
      val prev = s"seg${i - 1}"
      s"""tok$i AS (SELECT word, cnt, ${toks(d, "seg")} AS t FROM $prev),
tf$i AS (SELECT word, cnt, t FROM tok$i WHERE ${d.len("t")} >= 2),
pos$i AS (${d.series("word, cnt, t", d.len("t") + " - 1", "p", s"tf$i")}),
pc$i AS (SELECT ${d.el("t", "p")} || ' ' || ${d.el("t", "p + 1")} AS pair,
                CAST(sum(cnt) AS BIGINT) AS pcnt
         FROM pos$i GROUP BY 1),
top$i AS (SELECT pair, pcnt FROM pc$i ORDER BY pcnt DESC, pair LIMIT 1),
seg$i AS (SELECT s.word, s.cnt,
                 CASE WHEN t.pair IS NULL THEN s.seg
                      ELSE replace(s.seg, ' ' || replace(t.pair, ' ', '  ') || ' ',
                                   ' ' || replace(t.pair, ' ', '') || ' ') END AS seg
          FROM $prev s LEFT JOIN top$i t ON TRUE)"""
    }
    s"""WITH seg0 AS (${seg0Sql(d, "documents")}),
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
