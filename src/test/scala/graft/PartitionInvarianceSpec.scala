package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** PARTITION-LAYOUT invariance for the order-sensitive operators: the
  * differential tier replays semantics under ONE layout, but a
  * missing tie-break in a rank window, a cumulative sum paired with a
  * diverged bucket assignment, or an order-dependent fold would show
  * up only as results that VARY with the input partitioning — the
  * exact class of bug that passes every single-layout test and then
  * flaps on a cluster. Each operator here runs over the same rows
  * repartitioned 1 / 7 / 32 ways (hash AND coalesced layouts) and
  * must collect identical result sets. Operators chosen for their
  * window/cumsum/fold plans: sequence packing, token-budget
  * selection, epoch shuffle, BM25 top-k, brute-force ANN top-k,
  * sketch quantiles, funnel counts, connected components.
  */
class PartitionInvarianceSpec extends SparkSpec {
  import spark.implicits._

  private def layouts(df: DataFrame): Seq[DataFrame] =
    Seq(df.coalesce(1), df.repartition(7), df.repartition(32, col(df.columns.head)))

  private def invariant(name: String, df: DataFrame)(op: DataFrame => DataFrame): Unit = {
    // schema compared alongside values (r17 verdict #6: a bare
    // Row.toString can mask type-level divergence — with types pinned
    // equal, equal toStrings imply equal typed values)
    val results = layouts(df).map { d =>
      val out = op(d)
      (out.schema.map(f => (f.name, f.dataType.typeName, f.nullable)),
        out.collect().map(_.toString).sorted.toSeq)
    }
    assert(results(0)._1 == results(1)._1 && results(1)._1 == results(2)._1,
      s"$name schema varies with partitioning: ${results.map(_._1)}")
    assert(results(0)._2 == results(1)._2 && results(1)._2 == results(2)._2,
      s"$name varies with partitioning: sizes ${results.map(_._2.size)}; " +
        s"first diff ${results(0)._2.zip(results(1)._2).find(p => p._1 != p._2)}")
  }

  private val rnd = new scala.util.Random(17080)

  test("packSequences and selectToTokenBudget are layout-invariant under score ties") {
    val docs = (0L until 80L).map(id =>
      (id, rnd.nextInt(30).toLong, (rnd.nextInt(4) + 1).toDouble))
      .toDF("doc_id", "tok", "score")
    invariant("packSequences", docs)(d =>
      graft.training.TrainingOps.packSequences(d, "doc_id", "tok", 16, 4, portable = true))
    invariant("selectToTokenBudget", docs)(d =>
      graft.training.TrainingOps.selectToTokenBudget(d, "doc_id", "tok", "score", 300L))
  }

  test("epochShuffle total order is layout-invariant") {
    val docs = (0L until 100L).map(id => Tuple1(id)).toDF("doc_id")
    invariant("epochShuffle", docs)(d =>
      graft.training.TrainingOps.epochShuffle(d, "doc_id", epoch = 3, nBuckets = 8,
        portable = true))
  }

  test("bm25TopK and bruteForceTopK ranks are layout-invariant under exact score ties") {
    val docs = (0L until 40L).map(id =>
      (id, Seq.fill(3)(Seq("ion", "flux")(rnd.nextInt(2))).mkString(" ")))
      .toDF("doc_id", "text")
    val queries = Seq(("q", "ion"), ("q", "flux")).toDF("query_id", "term")
    invariant("bm25TopK", docs)(d =>
      graft.text.RetrievalOps.bm25TopK(d, "doc_id", "text", queries, 10))
    val vecs = (0L until 30L).map(id =>
      (id, Seq.fill(4)((rnd.nextInt(3)).toFloat))).filter(_._2.exists(_ != 0f))
      .toDF("vid", "vec")
    val qv = vecs.limit(2).toDF("vid", "vec")
    invariant("bruteForceTopK", vecs)(d =>
      graft.similarity.SimilarityOps.bruteForceTopK(qv, d, "vid", "vid", "vec", 5))
  }

  test("histQuantiles and funnel are layout-invariant on collision-heavy inputs") {
    val vals = (0 until 200).map(_ => Tuple1((rnd.nextInt(50) + 1).toLong)).toDF("v")
    invariant("histSketch+quantiles", vals) { d =>
      graft.profile.HistSketch.histQuantiles(
        graft.profile.HistSketch.histSketch(d, "v"), Seq(0.5, 0.9))
    }
    val base = 1704100000L
    val evs = (0 until 120).map { i =>
      (s"u${rnd.nextInt(6)}", new java.sql.Timestamp((base + rnd.nextInt(120)) * 1000L),
        Seq("view", "click", "buy")(rnd.nextInt(3)), i.toLong)
    }.toDF("user_id", "ts", "event_type", "event_id")
    invariant("funnel", evs)(d =>
      graft.analytics.EventAnalytics.funnel(d, "user_id", "ts", "event_type",
        Seq("view", "click", "buy"), "event_id"))
  }

  test("asofJoin, rollingAgg and scd2Apply are layout-invariant under ts collisions") {
    val base = 1704100000L
    def ts(off: Int) = new java.sql.Timestamp((base + off) * 1000L)
    val left = (0 until 60).map(i =>
      (s"k${rnd.nextInt(4)}", ts(rnd.nextInt(40)), i.toLong))
      .toDF("k", "ts", "lid")
    val right = (0 until 40).map(i =>
      (s"k${rnd.nextInt(4)}", ts(rnd.nextInt(40)), i * 10L))
      .toDF("k", "ts", "quote")
    invariant("asofJoin", left)(d =>
      graft.relational.RelationalOps.asofJoin(d, right, Seq("k"), "ts", Seq("quote")))
    val series = (0 until 80).map(i =>
      (s"k${rnd.nextInt(3)}", i.toLong, rnd.nextInt(100).toDouble))
      .toDF("k", "t", "v")
    invariant("rollingAgg", series)(d =>
      graft.analytics.TimeSeriesOps.rollingAgg(d, "k", "t", "v", 5))
    val history = (0L until 20L).map(id =>
      (id, s"v${rnd.nextInt(3)}", "2024-01-01 00:00:00", null: String, true))
      .toDF("id", "attr", "valid_from", "valid_to", "is_current")
    val stage = (5L until 25L).map(id => (id, s"v${rnd.nextInt(3)}"))
      .toDF("id", "attr")
    invariant("scd2Apply", history)(h =>
      graft.merge.Merge.scd2Apply(h, stage, Seq("id"), "2024-02-01 00:00:00"))
  }

  test("connectedComponents assignment is layout-invariant") {
    val edges = (0 until 60).map { _ =>
      val a = rnd.nextInt(25).toLong; val b = rnd.nextInt(25).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).toDF("id_a", "id_b")
    invariant("connectedComponents", edges) { d =>
      val out = graft.graph.GraphOps.connectedComponents(d, "id_a", "id_b")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      out
    }
  }
}
