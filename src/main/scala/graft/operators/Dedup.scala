package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deduplication operators for the training-data pipeline (BASELINE.json
  * north star): exact, word-5-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup. Each query is one SQL template rendered
  * into both Spark and DuckDB (SqlDialect), so the oracle is the same
  * computation by construction.
  *
  * Hashing is md5-based (available and identical in both engines):
  * MinHash uses the lexicographic min of md5(seed:shingle) strings —
  * a valid min-wise hash family; SimHash packs the first 8 md5 hex
  * nibbles into a 32-bit token hash.
  *
  * Scale design: everything is candidate-generation-by-join — shingle
  * bands, LSH band hashes, simhash byte bands, embedding sign buckets —
  * never an O(n²) cross join. The verify stage touches candidate pairs
  * only. At 100 TB the band joins shuffle (band, hash) keys; skewed
  * bands (stop-shingles) are the known risk, bounded here by 5-gram
  * rarity and in production by frequency-capping bands before the join.
  */
object Dedup {

  /** Self-union with shifted ids — simulates a re-ingested corpus so
    * dedup has true positives (the driver corpus is dup-free).
    */
  private val IdShift = 10000000L

  private def run(sql: String)(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
    spark.sql(sql)
  }

  /** Spark side only: materialize the shingle relation once as a cached
    * view. SQL CTEs are inlined per reference — without this, the
    * explode+distinct subtree re-executes for every mention (sig, both
    * sides of the pair join, sizes): ~6 recomputations in the LSH query.
    * The cache manager dedupes by plan, so all shingle-based queries in
    * a session share one materialization per table.
    */
  private def runWithShingles(sql: String)(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
    val sh = spark.sql(s"WITH ${shingleCore(SparkSql)} SELECT doc_id, shingle FROM sh")
    sh.cache().createOrReplaceTempView("sh_v")
    spark.sql(sql)
  }

  // ---- exact dedup (hash-groupBy) ----

  private def exactSql(d: SqlDialect): String = s"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + $IdShift AS doc_id, text FROM documents
)
SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
       count(*) AS n_copies
FROM corpus
GROUP BY text
ORDER BY text_hash"""

  val qExact = Q("q_dedup_exact", run(exactSql(SparkSql)), Some(exactSql(DuckSql)))

  // ---- shared shingle CTEs (word 5-grams) ----

  private[operators] def shingleCore(d: SqlDialect): String = s"""
dw AS (SELECT doc_id, ${d.split("text")} AS w FROM documents),
dwf AS (SELECT doc_id, w, ${d.len("w")} AS nw FROM dw WHERE ${d.len("w")} >= 5),
idx AS (${d.series("doc_id, w", "nw - 4", "i", "dwf")}),
sh AS (SELECT DISTINCT doc_id, concat_ws(' ', ${(0 to 4).map(k => d.el("w", s"i + $k")).mkString(", ")}) AS shingle FROM idx)"""

  private def shingleBase(d: SqlDialect): String = d match {
    // Spark: read the cached materialization (see runWithShingles)
    case SparkSql => """
sh AS (SELECT doc_id, shingle FROM sh_v),
sz AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id)"""
    case DuckSql => s"""${shingleCore(d)},
sz AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id)"""
  }

  /** Exact pairwise Jaccard over a shingle relation. */
  private def jacCtes(shRel: String): String = s"""
it AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ic
       FROM $shRel a JOIN $shRel b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       GROUP BY a.doc_id, b.doc_id),
jac AS (SELECT doc_a, doc_b,
               CAST(ic AS DOUBLE) / CAST(sa.nsh + sb.nsh - ic AS DOUBLE) AS jaccard
        FROM it JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id)"""

  private def shingleCtes(d: SqlDialect): String =
    s"${shingleBase(d)},${jacCtes("sh")}"

  // ---- n-gram Jaccard near-dup ----

  private def ngramSql(d: SqlDialect): String = s"""
WITH ${shingleCtes(d)}
SELECT doc_a, doc_b, jaccard FROM jac
WHERE jaccard >= 0.5
ORDER BY doc_a, doc_b"""

  val qNgram = Q("q_dedup_ngram_jaccard", runWithShingles(ngramSql(SparkSql)), Some(ngramSql(DuckSql)))

  // ---- MinHash + LSH (12 hashes, 3 bands × 4 rows) ----

  private def minhashSql(d: SqlDialect): String = {
    val band = "CAST((k - 1 - (k - 1) % 4) / 4 AS BIGINT)"
    val bandHash = (0 to 3)
      .map(r => s"min(CASE WHEN (k - 1) % 4 = $r THEN h END)")
      .mkString("md5(", " || ", ")")
    // LSH core: signatures → bands → candidate pairs
    val lsh = s"""
ks AS (${d.seriesTable("12", "k")}),
sig AS (SELECT doc_id, k, min(md5(CAST(k AS STRING) || ':' || shingle)) AS h
        FROM sh CROSS JOIN ks GROUP BY doc_id, k),
bands AS (SELECT doc_id, $band AS band, $bandHash AS bh
          FROM sig GROUP BY doc_id, $band),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)"""
    d match {
      case SparkSql =>
        // the engine verifies ONLY candidate pairs: shingles are first
        // semi-joined to candidate docs, so the exact-Jaccard pass costs
        // O(candidates), not O(all sharing pairs) — the LSH payoff
        s"""
WITH ${shingleBase(d)},$lsh,
cdocs AS (SELECT doc_a AS doc_id FROM cand UNION SELECT doc_b AS doc_id FROM cand),
sh_c AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN cdocs ON sh.doc_id = cdocs.doc_id),${jacCtes("sh_c")}
SELECT j.doc_a, j.doc_b, j.jaccard
FROM cand c JOIN jac j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
WHERE j.jaccard >= 0.5
ORDER BY j.doc_a, j.doc_b"""
      case DuckSql =>
        // oracle keeps the simple brute-force shape; inner-joining cand
        // against all-pair Jaccard yields identical rows
        s"""
WITH ${shingleCtes(d)},$lsh
SELECT j.doc_a, j.doc_b, j.jaccard
FROM cand c JOIN jac j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
WHERE j.jaccard >= 0.5
ORDER BY j.doc_a, j.doc_b"""
    }
  }

  val qMinhash = Q("q_dedup_minhash_lsh", runWithShingles(minhashSql(SparkSql)), Some(minhashSql(DuckSql)))

  // ---- SimHash (32-bit, 4 byte-bands, hamming ≤ 6) ----

  private def simhashSql(d: SqlDialect): String = {
    // token hash: first 8 md5 nibbles → 32-bit int
    val nibble = (1 to 8)
      .map { i =>
        val c = s"substr(md5(t), $i, 1)"
        s"(${d.strpos("'0123456789abcdef'", c)} - 1) * CAST(${1L << (4 * (8 - i))} AS BIGINT)"
      }
      .mkString(" + ")
    val bitSums = (0 to 31)
      .map(j => s"sum(CASE WHEN (${d.shr("v", j.toString)} & 1) = 1 THEN 1 ELSE -1 END) AS b$j")
      .mkString(", ")
    val pack = (0 to 31)
      .map(j => s"(CASE WHEN b$j >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    val tokCte = d match {
      // Spark: cached materialization (tok feeds both vh and the join)
      case SparkSql => "tok AS (SELECT doc_id, t FROM tok_v)"
      case DuckSql => s"""dwa AS (SELECT doc_id, ${d.split("text")} AS w, ${d.len(d.split("text"))} AS nw FROM documents),
ti AS (${d.series("doc_id, w", "nw", "j", "dwa")}),
tok AS (SELECT DISTINCT doc_id, ${d.el("w", "j")} AS t FROM ti)"""
    }
    s"""
WITH $tokCte,
vh AS (SELECT t, $nibble AS v FROM (SELECT DISTINCT t FROM tok)),
bits AS (SELECT doc_id, $bitSums FROM tok JOIN vh USING (t) GROUP BY doc_id),
sim AS (SELECT doc_id, $pack AS simhash FROM bits),
bs AS (${d.seriesTable("2", "bseq")}),
bb AS (SELECT doc_id, simhash, bseq - 1 AS band,
              (${d.shr("simhash", "(bseq - 1) * 16")}) & 65535 AS bv
       FROM sim CROSS JOIN bs),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                a.simhash AS sa, b.simhash AS sb
         FROM bb a JOIN bb b
           ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       CAST(bit_count(${d.xor("sa", "sb")}) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(${d.xor("sa", "sb")}) <= 2
ORDER BY doc_a, doc_b"""
  }

  private def runWithTokens(sql: String)(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    val d = SparkSql
    val tok = spark.sql(s"""WITH dwa AS (SELECT doc_id, ${d.split("text")} AS w, ${d.len(d.split("text"))} AS nw FROM documents),
ti AS (${d.series("doc_id, w", "nw", "j", "dwa")})
SELECT DISTINCT doc_id, ${d.el("w", "j")} AS t FROM ti""")
    tok.cache().createOrReplaceTempView("tok_v")
    spark.sql(sql)
  }

  val qSimhash = Q("q_dedup_simhash", runWithTokens(simhashSql(SparkSql)), Some(simhashSql(DuckSql)))

  // ---- embedding cosine near-dup (12-bit sign-bucket LSH) ----

  private def embedSql(d: SqlDialect): String = {
    val bucket = (1 to 12)
      .map(i => s"(CASE WHEN ${d.el("embedding", i.toString)} >= 0 THEN ${1 << (i - 1)} ELSE 0 END)")
      .mkString(" + ")
    // Spark side: native codegen'd expression; oracle: identical
    // sequential math (see Similarity.normCos)
    val (normExpr, cosExpr) = d match {
      case SparkSql => (
        "CAST(0 AS DOUBLE)",
        "cosine_similarity(ea, eb)")
      case DuckSql => (
        "sqrt((SELECT sum(CAST(list_extract(embedding, i) AS DOUBLE) * CAST(list_extract(embedding, i) AS DOUBLE)) FROM range(1, 65) t(i)))",
        "(SELECT sum(CAST(list_extract(ea, i) AS DOUBLE) * CAST(list_extract(eb, i) AS DOUBLE)) FROM range(1, 65) t(i)) / (na * nb)")
    }
    s"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + $IdShift AS vec_id, embedding FROM embeddings
),
meta AS (SELECT vec_id, embedding, $normExpr AS nrm, $bucket AS bucket FROM corpus),
pairs AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 a.embedding AS ea, b.embedding AS eb, a.nrm AS na, b.nrm AS nb
          FROM meta a JOIN meta b
            ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT vec_a, vec_b FROM pairs
WHERE $cosExpr >= 0.995
ORDER BY vec_a, vec_b"""
  }

  val qEmbed = Q("q_dedup_embedding", run(embedSql(SparkSql)), Some(embedSql(DuckSql)))

  val all: Seq[Q] = Seq(qExact, qNgram, qMinhash, qSimhash, qEmbed)
}
