package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKAggregator
import graft.similarity.SimilarityOps

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("bounded-heap top-k equals the window top-k on real candidates") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.where(col("vec_id") < 5)
    // window-based reference result
    val win = SimilarityOps.bruteForceTopK(q, e, "vec_id", "vec_id", "embedding", k = 3)
      .select("query_id", "corpus_id", "cos")
      .as[(Long, Long, Double)].collect().toSet
    // aggregator-based result over the same scored candidates
    val qn = q.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      SimilarityOps.l2NormF(col("embedding")).as("qn"))
    val c = e.select(col("vec_id").as("corpus_id"), col("embedding").as("cv"),
      SimilarityOps.l2NormF(col("embedding")).as("cn"))
    val scored = c.crossJoin(broadcast(qn))
      .where(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        round(SimilarityOps.dotF(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cos"))
    val agg = scored.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues { case (_, cid, cos) => (cos, cid) }
      .agg(TopKAggregator.topK(3).toColumn)
      .flatMap { case (qid, top) => top.map { case (cos, cid) => (qid, cid, cos) } }
      .collect().toSet
    assert(agg == win)
  }

  test("heap evicts worst, merges partial heaps, deterministic tiebreak") {
    val data = Seq(
      (1L, 0.9, 10L), (1L, 0.9, 5L), (1L, 0.1, 7L), (1L, 0.95, 2L), (1L, 0.5, 3L),
      (2L, 0.2, 1L)
    ).toDF("g", "score", "id").repartition(4) // force partial-heap merges
    val out = data.as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, s, id) => (s, id) }
      .agg(TopKAggregator.topK(3).toColumn)
      .collect().toMap
    assert(out(1L) == Seq((0.95, 2L), (0.9, 5L), (0.9, 10L))) // desc, id-asc tiebreak
    assert(out(2L) == Seq((0.2, 1L)))
  }
}
