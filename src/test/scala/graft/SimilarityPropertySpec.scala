package graft

import org.apache.spark.sql.functions.col

import graft.similarity.SimilarityOps

/** Randomized DIFFERENTIAL tests for the vector-similarity family:
  * exact brute-force scoring, IVF list assignment/probing, PQ
  * encode/decode and the LSH sign bucket replayed on the driver by
  * models written straight from the documented arithmetic — the
  * left-to-right double fold dot product, the 6-dp HALF_UP cosine
  * snap, the (distance, index)-ordered argmin. Vectors and centroids
  * are INTEGER-VALUED floats so every distance is exact in double and
  * ties are engineered, not accidental: equidistant centroids and
  * equal-cosine candidates exercise exactly the tie-break arms the
  * fixture's random floats never hit. Fit stages (Lloyd's) are not
  * replayed — the fitted-quantizer tiers take centroids/codebooks as
  * INPUT here, so the differential pins assignment/scoring arithmetic
  * without duplicating the fit.
  */
class SimilarityPropertySpec extends SparkSpec {
  import spark.implicits._

  private def dot(a: Seq[Float], b: Seq[Float]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }

  private def norm(a: Seq[Float]): Double = math.sqrt(dot(a, a))

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  private def cos(a: Seq[Float], b: Seq[Float]): Double =
    round6(dot(a, b) / (norm(a) * norm(b)))

  private def randVecs(rnd: scala.util.Random, n: Int, dim: Int): Seq[(Long, Seq[Float])] =
    (0L until n.toLong).map { id =>
      // small-integer components: exact double arithmetic, dense ties
      // (colinear vectors like (1,2,0) vs (2,4,0) score identical cosine)
      id -> Seq.fill(dim)((rnd.nextInt(5) - 1).toFloat)
    }.filter(_._2.exists(_ != 0f)) // zero vectors have no norm

  test("bruteForceTopK ≡ scored replay: 6-dp snap, id tie-break, self-exclusion") {
    val rnd = new scala.util.Random(17030)
    (1 to 3).foreach { trial =>
      val corpus = randVecs(rnd, 20, 4)
      val queries = corpus.take(3) // shared ids → the self-exclusion arm is live
      val k = 5
      val expect = queries.flatMap { case (qid, qv) =>
        corpus.filter(_._1 != qid)
          .map { case (cid, cv) => (qid, cid, cos(qv, cv)) }
          .sortBy { case (_, cid, c) => (-c, cid) }
          .take(k).zipWithIndex
          .map { case ((q, c, s), i) => (q, c, s, i + 1) }
      }.toSet
      val got = SimilarityOps.bruteForceTopK(
          queries.toDF("qid", "vec"), corpus.toDF("cid", "vec"),
          "qid", "cid", "vec", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
      assert(got == expect, s"trial $trial")
    }
  }

  test("ivfTopK with fixed centroids ≡ home-list/probe replay incl. equidistant ties") {
    val rnd = new scala.util.Random(17031)
    // centroids engineered so some vectors sit EXACTLY between two
    // lists — the (distance, list-id) tie-break must decide
    val cents: Array[(Int, Array[Double])] = Array(
      0 -> Array(2.0, 0.0, 0.0, 0.0),
      1 -> Array(-2.0, 0.0, 0.0, 0.0),
      2 -> Array(0.0, 2.0, 0.0, 0.0),
      3 -> Array(0.0, 0.0, 2.0, 2.0))
    def dist2(v: Seq[Float], c: Array[Double]): Double =
      v.zip(c).foldLeft(0.0) { case (acc, (x, cc)) => val d = x.toDouble - cc; acc + d * d }
    def nearestLists(v: Seq[Float], n: Int): Seq[Int] =
      cents.map { case (i, c) => (dist2(v, c), i) }.sortBy(identity).take(n).map(_._2).toSeq
    (1 to 3).foreach { trial =>
      val corpus = randVecs(rnd, 24, 4)
      val queries = randVecs(rnd, 30, 4).take(4)
      val (k, nProbe) = (4, 2)
      val home = corpus.map { case (id, v) => id -> nearestLists(v, 1).head }.toMap
      val expect = queries.flatMap { case (qid, qv) =>
        val probed = nearestLists(qv, nProbe).toSet
        corpus.filter { case (cid, _) => cid != qid && probed(home(cid)) }
          .map { case (cid, cv) => (qid, cid, cos(qv, cv)) }
          .sortBy { case (_, cid, c) => (-c, cid) }
          .take(k).zipWithIndex
          .map { case ((q, c, s), i) => (q, c, s, i + 1) }
      }.toSet
      val got = SimilarityOps.ivfTopK(
          queries.toDF("qid", "vec"), corpus.toDF("cid", "vec"),
          "qid", "cid", "vec", k, nLists = cents.length, nProbe = nProbe,
          centroids = Some(cents))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
      assert(got == expect, s"trial $trial")
    }
  }

  test("pqEncode/pqDecode with fixed codebooks ≡ (distance, code) argmin replay") {
    val rnd = new scala.util.Random(17032)
    // two subspaces of dim 2, three centroids each — centroid 1 and 2
    // of subspace 0 are equidistant from the origin-centered vectors
    val books: Array[Array[Array[Double]]] = Array(
      Array(Array(0.0, 0.0), Array(2.0, 0.0), Array(0.0, 2.0)),
      Array(Array(1.0, 1.0), Array(-1.0, -1.0), Array(3.0, 3.0)))
    def enc(v: Seq[Float]): Seq[Int] = books.zipWithIndex.map { case (book, s) =>
      val sub = v.slice(s * 2, s * 2 + 2)
      book.zipWithIndex.map { case (c, ci) =>
        (sub.zip(c).foldLeft(0.0) { case (a, (x, cc)) => val d = x.toDouble - cc; a + d * d }, ci)
      }.sortBy(identity).head._2
    }.toSeq
    val vecs = randVecs(rnd, 20, 4) ++ Seq(100L -> Seq(1f, 1f, 0f, 0f)) // exact tie
    val df = vecs.toDF("id", "vec")
    val got = df.select(col("id"),
        SimilarityOps.pqEncode(col("vec"), books).as("codes"),
        SimilarityOps.pqDecode(SimilarityOps.pqEncode(col("vec"), books), books).as("rec"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getSeq[Double](2)))).toMap
    vecs.foreach { case (id, v) =>
      val codes = enc(v)
      val rec = codes.zipWithIndex.flatMap { case (c, s) => books(s)(c) }
      assert(got(id)._1 == codes, s"id $id codes")
      assert(got(id)._2 == rec, s"id $id reconstruction")
    }
  }

  test("signBucket ≡ bit replay: zeros and negatives clear bits") {
    val vecs = Seq(
      0L -> Seq(1f, -1f, 0f, 2f),
      1L -> Seq(0f, 0f, 0f, 0f),
      2L -> Seq(-1f, -2f, -3f, -4f),
      3L -> Seq(5f, 4f, 3f, 2f))
    def model(v: Seq[Float], nbits: Int): Long =
      v.take(nbits).zipWithIndex.map { case (x, i) => if (x > 0) 1L << i else 0L }.sum
    val got = vecs.toDF("id", "vec")
      .select(col("id"), SimilarityOps.signBucket(col("vec"), 4).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.foreach { case (id, v) => assert(got(id) == model(v, 4), s"id $id") }
  }

  test("recallAtK ≡ set-overlap replay; duplicated candidate rows cannot corrupt it") {
    val exact = Seq(("q1", 1L), ("q1", 2L), ("q1", 3L), ("q2", 7L), ("q2", 8L))
    // approx carries DUPLICATES (a multi-probe frame) — the distinct
    // guard must keep recall a pure set overlap
    val approx = Seq(("q1", 2L), ("q1", 2L), ("q1", 9L), ("q2", 7L), ("q2", 7L), ("q2", 8L))
    val got = SimilarityOps.recallAtK(
        approx.toDF("query_id", "corpus_id"), exact.toDF("query_id", "corpus_id"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("q1" -> 1.0 / 3.0, "q2" -> 1.0))
  }
}
