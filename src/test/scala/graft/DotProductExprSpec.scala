package graft

import org.apache.spark.sql.functions._

import graft.similarity.SimilarityOps

class DotProductExprSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, -0.6f)),
    (3L, null.asInstanceOf[Array[Float]], Array(1.0f, 1.0f, 1.0f))
  ).toDF("id", "a", "b")

  test("codegen dot product is bit-identical to the HOF fold") {
    val both = vecs.where(col("a").isNotNull).select(
      SimilarityOps.dotF(col("a"), col("b")).as("fast"),
      SimilarityOps.dot(col("a"), col("b")).as("slow"))
    both.collect().foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("bit-identical on real embeddings too (all 500 rows)") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val diff = e.select(
      (SimilarityOps.dotF(col("embedding"), col("embedding")) -
        SimilarityOps.dot(col("embedding"), col("embedding"))).as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff == 0.0)
  }

  test("NULL input → NULL output") {
    val r = vecs.where(col("id") === 3)
      .select(SimilarityOps.dotF(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("non-float arrays are rejected at analysis") {
    val bad = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    intercept[Exception] {
      bad.select(SimilarityOps.dotF(col("a"), col("b"))).collect()
    }
  }

  test("known value") {
    val r = vecs.where(col("id") === 1)
      .select(SimilarityOps.dotF(col("a"), col("b"))).as[Double].head()
    assert(r == 32.0) // 4 + 10 + 18
  }
}
