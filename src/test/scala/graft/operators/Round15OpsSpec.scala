package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 operator laws: the BPE trainer's merge semantics (greedy
  * leftmost, adjacent-occurrence handling, token-boundary safety,
  * frequency weighting, deterministic tie-break — the exact laws the
  * delimiter-doubling encoding must uphold) and the CMS join-size
  * estimate's one-sided guarantee.
  */
class Round15OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(rows: (String, String)*) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((text, lang), i) => (i.toLong, text, lang) }
      .toDF("doc_id", "text", "lang")
  }

  private def train(rows: (String, String)*): Seq[(Long, String, String, String, Long)] =
    Bpe.trainOn(spark, docs(rows: _*)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq

  test("bpe train: overlapping pair merges greedily leftmost, never triple-merges") {
    // 'lll' = [l,l,l]: (l,l) counted at both positions (pcnt 2), but the
    // merge must produce [ll, l] — leftmost first, the middle l is
    // consumed exactly once
    assert(train("lll" -> "en") == Seq(
      (1L, "l", "l", "ll", 2L), (2L, "ll", "l", "lll", 1L)))
  }

  test("bpe train: back-to-back occurrences both merge in one step") {
    // 'abab': both (a,b) occurrences must merge in step 1 — the
    // delimiter-doubling encoding gives each occurrence its own
    // flanking spaces, so non-overlapping replace consumes both
    assert(train("abab" -> "en") == Seq(
      (1L, "a", "b", "ab", 2L), (2L, "ab", "ab", "abab", 1L)))
  }

  test("bpe train: merged multi-char symbols never match across a token boundary") {
    // after step 1 merges (l,l): 'llo'→[ll,o], 'll'→[ll], 'l'→[l].
    // A naive single-space replace would find 'l l' spanning the
    // boundary of [ll, l]; the two-space delimiter cannot. Step 2 must
    // see (ll,o)×2 — NOT any phantom (l,l) or (lll) artifacts.
    assert(train("llo llo ll l" -> "en") == Seq(
      (1L, "l", "l", "ll", 3L), (2L, "ll", "o", "llo", 2L)))
  }

  test("bpe train: pair counts weight by word frequency") {
    assert(train("zq zq zq ab" -> "en").head == (1L, "z", "q", "zq", 3L))
  }

  test("bpe train: equal counts break ties by pair ascending") {
    assert(train("cd ab" -> "en").take(2) == Seq(
      (1L, "a", "b", "ab", 1L), (2L, "c", "d", "cd", 1L)))
  }

  test("bpe segment: per-language token stats honor the merge budget") {
    // 8-char word needs 7 merges; a 6-step budget leaves 2 tokens.
    // en: 1 word -> 2 tokens (20000 bp); fr: 'ab ab' both merge to 1
    // token each in step... ab is merged only if (a,b) wins a step —
    // with the 8-char word saturating the argmax on count 1 ties,
    // 'a b' (count 3: en's adjacency + fr x2) wins step 1, so fr words
    // are 1 token. Pinned at steps=6 (the pre-r17 MergeSteps) so the
    // hand-derived budget-limited shape stays covered now that the
    // default budget fully merges a corpus this small.
    val got = Bpe.segmentOn(spark, docs("abcdefgh" -> "en", "ab ab" -> "fr"),
        steps = 6)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("en", 1L, 2L, 20000L), ("fr", 2L, 2L, 10000L)))
    // the default budget (MergeSteps=64) fully merges both words
    val full = Bpe.segmentOn(spark, docs("abcdefgh" -> "en", "ab ab" -> "fr"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(full.toSeq == Seq(("en", 1L, 1L, 10000L), ("fr", 2L, 2L, 10000L)))
  }

  test("bpe: embedded line terminators stay single-char base symbols") {
    // the (?s)-less '.' skipped \n in BOTH engines, fusing "\nb" into a
    // 2-char base symbol; true BPE starts from per-character symbols.
    // Corpus "a\nb" ×3: base [a, \n, b]; pair ties break ascending, so
    // step 1 merges ("\n","b") (the \n-led pair sorts first), step 2
    // merges ("a","\nb") — a fused base would have skipped step 1.
    val got = train(("a\nb a\nb a\nb", "en"))
    assert(got.map(m => (m._1, m._2, m._3, m._4)).take(2) ==
      Seq((1L, "\n", "b", "\nb"), (2L, "a", "\nb", "a\nb")))
  }

  test("bpe: a harness-registered 'documents' view survives a training run") {
    // trainLoop once registered its input AS 'documents', silently
    // replacing the session-wide StageViews registration for every
    // later catalog query; the view must be untouched afterwards
    import spark.implicits._
    Seq(1L, 2L, 3L).toDF("marker").createOrReplaceTempView("documents")
    try {
      Bpe.trainOn(spark, docs(("x y x y", "en"))).collect()
      assert(spark.table("documents").columns.toSeq == Seq("marker"),
        "bpe training must not clobber the shared 'documents' view")
    } finally spark.catalog.dropTempView("documents")
  }

  test("cms join size: estimate is an admissible overcount of the exact join size") {
    import spark.implicits._
    val orders = Seq(1L, 1L, 2L, 2L, 2L, 4L, 4L, 4L, 4L, 4L).toDF("o_custkey")
    val customer = Seq((1L, "BUILDING"), (2L, "BUILDING"), (3L, "BUILDING"),
      (5L, "AUTOMOBILE")).toDF("c_custkey", "c_mktsegment")
    val r = Sketches.cmsJoinSizeOn(spark, orders, customer).collect().head
    // exact: key1 2*1 + key2 3*1 = 5 (key4 unmatched, key5 not BUILDING)
    assert(r.getLong(0) == 5L)
    assert(r.getBoolean(2), s"estimate ${r.getLong(1)} below exact 5")
    assert(r.getLong(1) - r.getLong(0) == r.getLong(3))
  }

  test("cms join size: empty build side estimates zero, still admissible") {
    import spark.implicits._
    val orders = Seq(1L, 2L).toDF("o_custkey")
    val customer = Seq((1L, "AUTOMOBILE")).toDF("c_custkey", "c_mktsegment")
    val r = Sketches.cmsJoinSizeOn(spark, orders, customer).collect().head
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.getBoolean(2))
  }

  private def edges(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("u", "v")
  }

  private def stats(rows: (Long, Long)*): (Long, Long, Long, Long, Long) = {
    val r = Graph.triangleStats(edges(rows: _*)).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("triangles: complete graph K4 closes every wedge") {
    assert(stats(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
      == (4L, 6L, 4L, 12L, 10000L))
  }

  test("triangles: a path has wedges but no triangles") {
    assert(stats(1L -> 2L, 2L -> 3L, 3L -> 4L) == (4L, 3L, 0L, 2L, 0L))
  }

  test("triangles: hub star with one closed pair counts exactly one") {
    // star 1-{2,3,4,5} + edge (2,3): wedges 6(at hub)+1+1 = 8, one
    // triangle {1,2,3} -> clustering 3*1*10000/8
    assert(stats(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L, 2L -> 3L)
      == (5L, 5L, 1L, 8L, 3750L))
  }

  test("triangles: empty edge set yields a single all-zero census row") {
    assert(stats() == (0L, 0L, 0L, 0L, 0L))
  }

  test("triangles: degree-oriented count equals naive enumeration on a random graph") {
    val rnd = new scala.util.Random(42)
    val n = 40
    val es = (for {
      a <- 0 until n; b <- (a + 1) until n
      if rnd.nextDouble() < 0.15
    } yield (a.toLong, b.toLong)).toSeq
    val eset = es.toSet
    val naive = (for {
      (a, b) <- es; c <- (b + 1) until n
      if eset.contains((a, c.toLong)) && eset.contains((b, c.toLong))
    } yield 1).size.toLong
    assert(naive > 0, "random fixture produced no triangles — densify it")
    val r = Graph.triangleStats(edges(es: _*)).collect().head
    assert(r.getLong(2) == naive,
      s"oriented count ${r.getLong(2)} != naive $naive")
  }
}
