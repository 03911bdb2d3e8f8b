package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class VecPair(a: Seq[Float], b: Seq[Float])

class CosineSimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("matches the HOF formulation bit-for-bit on real embeddings") {
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .limit(50).select($"vec_id", $"embedding")
    val pairs = e.as("x").crossJoin(e.as("y"))
      .select($"x.embedding".as("a"), $"y.embedding".as("b"))
    val hof = expr(
      """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |CAST(0 AS DOUBLE), (acc, p) -> acc + p)
        |/ (sqrt(aggregate(a, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
        |   * sqrt(aggregate(b, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))""".stripMargin)
    val rows = pairs
      .select(CosineSimilarity(col("a"), col("b")).as("native"), hof.as("hof"))
      .collect()
    assert(rows.length == 2500)
    assert(rows.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("interpreted eval agrees with codegen, self-similarity is 1") {
    import spark.implicits._
    val df = Seq(VecPair(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)),
      VecPair(Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),
      VecPair(Seq(0f, 0f, 0f), Seq(1f, 1f, 1f))).toDF()
    val got = df.select(CosineSimilarity(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0)).toSeq
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(got(1) == 0.0)
    assert(got(2) == 0.0) // zero-norm guard
    // interpreted path (no codegen)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val l = Literal.create(Array(3f, 4f), ArrayType(FloatType))
    val x = CosineSimilarity(l, l)
    assert(math.abs(x.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
  }

  test("SQL registration works") {
    import spark.implicits._
    CosineSimilarity.register(spark)
    val r = Seq(VecPair(Seq(1f, 2f), Seq(2f, 4f))).toDF()
      .selectExpr("cosine_similarity(a, b) AS c").collect()
    assert(math.abs(r.head.getDouble(0) - 1.0) < 1e-12)
  }

  test("non-array<float> inputs are rejected at analysis time") {
    import spark.implicits._
    CosineSimilarity.register(spark)
    val df = Seq(("x", Seq(1.0, 2.0))).toDF("s", "d")
    val e1 = intercept[Exception](df.selectExpr("cosine_similarity(s, s)").collect())
    assert(e1.getMessage.contains("array<float>"), e1.getMessage)
    // array<double> is also rejected (no implicit downcast)
    val e2 = intercept[Exception](df.selectExpr("cosine_similarity(d, d)").collect())
    assert(e2.getMessage.contains("array<float>"), e2.getMessage)
  }

  test("ragged arrays truncate to the shorter length (documented deviation)") {
    import spark.implicits._
    val df = Seq(VecPair(Seq(3f, 4f, 99f), Seq(3f, 4f))).toDF()
    val got = df.select(CosineSimilarity(col("a"), col("b")).as("c"))
      .collect().head.getDouble(0)
    // dot AND both norms run over min(len) elements, so the extra 99f is
    // ignored entirely and the truncated vectors are identical -> 1.0
    // (zip_with null-pad would return NULL here instead)
    assert(got == 1.0)
  }

  test("null elements read as 0.0f (documented deviation), both eval paths") {
    import spark.implicits._
    // codegen path: [3, null, 4] · [3, 0, 4] — the null contributes 0 to
    // dot and norm, so similarity is exactly 1.0. The HOF spelling would
    // return NULL (null poisons zip_with/aggregate); engine embeddings
    // are non-null 64-dim so catalog queries never hit the branch.
    val df = Seq((Seq[java.lang.Float](3f, null, 4f), Seq[java.lang.Float](3f, 0f, 4f)))
      .toDF("a", "b")
      .selectExpr("CAST(a AS ARRAY<FLOAT>) AS a", "CAST(b AS ARRAY<FLOAT>) AS b")
    val got = df.select(CosineSimilarity(col("a"), col("b")).as("c"))
      .collect().head.getDouble(0)
    assert(got == 1.0)
    // interpreted path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val withNull = Literal.create(Array[java.lang.Float](3f, null, 4f),
      ArrayType(FloatType, containsNull = true))
    val dense = Literal.create(Array(3f, 0f, 4f), ArrayType(FloatType))
    assert(CosineSimilarity(withNull, dense).eval(null).asInstanceOf[Double] == 1.0)
  }
}
