package graft

import scala.collection.mutable

import graft.graph.GraphOps

/** Randomized differential tests for the graph operators whose driver
  * replays so far ran only on KNOWN fixtures (BFS levels, the triangle
  * reference graph) — random digraphs with duplicate/reversed edges and
  * partial value coverage reach wedge/frontier shapes a hand-built
  * fixture never does. Companion to GraphOpsSpec's union-find and
  * PageRank replays and to [[AnalyticsPropertySpec]]'s rationale.
  */
class GraphPropertySpec extends SparkSpec {
  import spark.implicits._

  private val TRIALS = 5
  private val N = 12 // node universe per trial

  /** Random directed multigraph WITH duplicates and self-loops — the
    * operators canonicalize; the generators deliberately don't. */
  private def randomEdges(rnd: scala.util.Random, m: Int): Seq[(Long, Long)] =
    (0 until m).map(_ => (rnd.nextInt(N).toLong, rnd.nextInt(N).toLong))

  test("bfsDistances ≡ driver BFS on random digraphs (seeds, horizons, early stop)") {
    val rnd = new scala.util.Random(13016)
    (1 to TRIALS).foreach { trial =>
      val edges = randomEdges(rnd, 30)
      val seeds = (0 until 1 + rnd.nextInt(3)).map(_ => rnd.nextInt(N).toLong).distinct
      val maxHops = rnd.nextInt(5) // includes 0: seeds only
      // driver BFS over the cleaned edge set (no self-loops, distinct)
      val adj = edges.filter(e => e._1 != e._2).distinct
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val dist = mutable.Map[Long, Long](seeds.map(_ -> 0L): _*)
      var frontier = seeds.toSet
      var h = 0L
      while (h < maxHops && frontier.nonEmpty) {
        h += 1
        frontier = frontier.flatMap(u => adj.getOrElse(u, Set.empty))
          .filterNot(dist.contains)
        frontier.foreach(v => dist(v) = h)
      }
      val got = GraphOps.bfsDistances(edges.toDF("src", "dst"), "src", "dst",
          seeds, maxHops)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == dist.toMap, s"trial $trial seeds=$seeds maxHops=$maxHops edges=$edges")
    }
  }

  test("triangleCounts ≡ driver enumeration on random graphs with dup/reversed/self edges") {
    val rnd = new scala.util.Random(14016)
    (1 to TRIALS).foreach { trial =>
      val edges = randomEdges(rnd, 35)
      val und = edges.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val nbrs = (und ++ und.map(_.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val expect = nbrs.map { case (v, nb) =>
        val deg = nb.size.toLong
        val tris = nb.toSeq.combinations(2)
          .count { case Seq(x, y) => nbrs(x).contains(y) }.toLong
        // Spark round(_, 6) = BigDecimal.valueOf(x).setScale(6, HALF_UP)
        val clustering =
          if (deg >= 2)
            java.math.BigDecimal.valueOf(2.0 * tris / (deg * (deg - 1)))
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          else 0.0
        v -> (deg, tris, clustering)
      }
      val got = GraphOps.triangleCounts(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      assert(got == expect, s"trial $trial edges=$edges")
    }
  }

  test("neighborhoodAgg ≡ driver replay: 1-hop, capped 2-hop, partial value coverage") {
    val rnd = new scala.util.Random(15016)
    (1 to TRIALS).foreach { trial =>
      val edges = randomEdges(rnd, 30)
      // value MAP: unique nodes, ~70% coverage, cent-exact doubles
      val values = (0L until N.toLong).filter(_ => rnd.nextInt(10) < 7)
        .map(v => (v, (rnd.nextInt(500) + 1) / 100.0))
      val vmap = values.toMap
      val hops = 1 + trial % 2
      val maxDegree = if (trial % 2 == 1 && rnd.nextBoolean()) 2 else 0
      val e = edges.filter(x => x._1 != x._2).distinct
      val nbr: Seq[(Long, Long)] =
        if (hops == 1) e
        else {
          val out = e.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
          val capped = out.view.mapValues(ds =>
            if (maxDegree == 0) ds else ds.take(maxDegree)).toMap
          (e ++ e.flatMap { case (u, m) =>
            capped.getOrElse(m, Nil).filter(_ != u).map(d2 => (u, d2))
          }).distinct
        }
      val expect = nbr.filter(p => vmap.contains(p._2)).groupBy(_._1)
        .map { case (u, ps) =>
          val vs = ps.map(p => BigDecimal(vmap(p._2)).setScale(2))
          u -> (ps.size.toLong, vs.sum.toDouble,
            (vs.sum / vs.size).toDouble)
        }
      val got = GraphOps.neighborhoodAgg(edges.toDF("src", "dst"), "src", "dst",
          values.toDF("node", "value"), "node", "value",
          hops = hops, maxDegree = maxDegree)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(got.keySet == expect.keySet,
        s"trial $trial hops=$hops cap=$maxDegree nodes")
      got.foreach { case (u, (n, s, a)) =>
        val (en, es, ea) = expect(u)
        assert(n == en && math.abs(s - es) < 1e-9 && math.abs(a - ea) < 1e-9,
          s"trial $trial hops=$hops cap=$maxDegree node $u: got ($n,$s,$a) want ($en,$es,$ea)")
      }
    }
  }
}
