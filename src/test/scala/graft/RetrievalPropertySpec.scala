package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.text.{RetrievalOps, TextOps}

/** Randomized DIFFERENTIAL tests for the retrieval family (r16
  * verdict #1): BM25 scoring/ranking, RRF fusion, and winnowing
  * fingerprints are replayed on the driver by brute-force models
  * written straight from their documented arithmetic, over random
  * tiny-vocabulary corpora with the inputs the fixture lacks — term
  * ties (equal tf AND equal snapped s8 across docs, so rank
  * tie-breaks matter), EMPTY documents (the tokenizer's `split` on an
  * empty string yields one empty-string token — a real term that a
  * query can match), single-term docs, and fingerprint buckets pushed
  * over the `maxBucket` prune. The engine documents these families as
  * exactly deterministic (snapped fixed-point sums, StrictMath libm,
  * md5 portable hashes), so every comparison is bit-equality.
  */
class RetrievalPropertySpec extends SparkSpec {
  import spark.implicits._

  private def portableHash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  /** TextOps.words replay: split(lower(trim(text)), "\\s+") — Spark's
    * split uses Java split(regex, -1), so "" tokenizes to one
    * empty-string term. */
  private def mWords(text: String): Seq[String] =
    text.toLowerCase.trim.split("\\s+", -1).toSeq

  // ---------------- BM25 model ----------------

  /** bm25Scores replay: same expression tree, same association order,
    * StrictMath.log for the one libm op, floor-snap at 1e8 on IDF and
    * per-term score. Returns (query, doc) -> (bm25, n_terms, s8). */
  private def mBm25(docs: Seq[(Long, String)], queries: Seq[(String, String)],
                    k1: Double, b: Double): Map[(String, Long), (Double, Long, Long)] = {
    val qt = queries.distinct
    val qTerms = qt.map(_._2).toSet
    val toks = docs.filter(_._2 != null).map { case (id, t) => id -> mWords(t) }
    val dT = docs.size.toDouble
    val dl = toks.map { case (id, ws) => id -> ws.size.toLong }.toMap
    val tT = dl.values.sum.toDouble
    val tf = toks.flatMap { case (id, ws) =>
      ws.filter(qTerms).groupBy(identity).map { case (t, o) => (id, t, o.size.toLong) }
    }
    val dfm = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val idf8 = dfm.map { case (t, df) =>
      t -> math.floor(StrictMath.log(
        1.0 + ((dT - df.toDouble) + 0.5) / (df.toDouble + 0.5)) * 1e8 + 0.5).toLong
    }
    val out = mutable.Map.empty[(String, Long), (Long, Long)]
    for ((qid, term) <- qt; (id, t, tfc) <- tf if t == term) {
      val idf = idf8(term).toDouble / 1e8
      val num = idf * (tfc.toDouble * (k1 + 1.0))
      val den = tfc.toDouble + (k1 * (1.0 - b)) +
        (((k1 * b) * dl(id).toDouble) * dT) / tT
      val s8 = math.floor(num / den * 1e8 + 0.5).toLong
      val (ps, pn) = out.getOrElse((qid, id), (0L, 0L))
      out((qid, id)) = (ps + s8, pn + 1L)
    }
    out.map { case (k2, (s8, n)) => k2 -> (s8.toDouble / 1e8, n, s8) }.toMap
  }

  private val VOCAB = Vector("ion", "flux", "gate", "node", "arc")

  private def randomCorpus(rnd: scala.util.Random, n: Int): Seq[(Long, String)] =
    (0L until n.toLong).map { id =>
      val len = rnd.nextInt(9) // 0-word docs → the "" token
      id -> Seq.fill(len)(VOCAB(rnd.nextInt(VOCAB.size))).mkString(" ")
    }

  test("bm25Scores ≡ snapped-IDF replay on tie-heavy corpora with empty docs") {
    val rnd = new scala.util.Random(17010)
    (1 to 4).foreach { trial =>
      val docs = randomCorpus(rnd, 12)
      // queries include a term matching empty docs ("") and an absent term
      val queries = Seq("qa" -> "ion", "qa" -> "flux", "qb" -> "gate",
        "qb" -> "", "qb" -> "gate", "qc" -> "zzz")
      val got = RetrievalOps.bm25Scores(docs.toDF("doc_id", "text"), "doc_id",
          "text", queries.toDF("query_id", "term"))
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
      val exp = mBm25(docs, queries, 1.2, 0.75)
      assert(got == exp, s"trial $trial docs=$docs")
    }
  }

  test("bm25TopK rank ≡ (s8 desc, id asc) replay — deterministic under score ties") {
    val rnd = new scala.util.Random(17011)
    (1 to 4).foreach { trial =>
      // one-word docs from a 2-term vocab: many docs with IDENTICAL s8
      val docs = (0L until 10L).map(id => id -> VOCAB(rnd.nextInt(2)))
      val queries = Seq("q" -> "ion", "q" -> "flux")
      val k = 6
      val got = RetrievalOps.bm25TopK(docs.toDF("doc_id", "text"), "doc_id",
          "text", queries.toDF("query_id", "term"), k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .sortBy(x => (x._1, x._4))
      val exp = mBm25(docs, queries, 1.2, 0.75).toSeq
        .groupBy(_._1._1).toSeq.flatMap { case (qid, rows) =>
          rows.sortBy { case ((_, id), (_, _, s8)) => (-s8, id) }
            .zipWithIndex.take(k)
            .map { case (((_, id), (bm, _, _)), i) => (qid, id, bm, i + 1) }
        }.sortBy(x => (x._1, x._4))
      assert(got.toSeq == exp, s"trial $trial")
    }
  }

  test("rrfFuse ≡ snapped reciprocal-rank replay across disjoint candidate sets") {
    val rnd = new scala.util.Random(17012)
    (1 to 4).foreach { trial =>
      val kConst = 60
      // two rankings over overlapping-but-different candidate ids
      def ranking(): Seq[(String, Long, Int)] =
        Seq("qa", "qb").flatMap { q =>
          rnd.shuffle((0L until 8L).toList).take(5).zipWithIndex
            .map { case (id, i) => (q, id, i + 1) }
        }
      val (r1, r2) = (ranking(), ranking())
      val k = 4
      val got = RetrievalOps.rrfFuse(
          Seq(r1.toDF("query_id", "doc_id", "rank"), r2.toDF("query_id", "doc_id", "rank")),
          "doc_id", k, kConst)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getLong(3), r.getInt(4))).sortBy(x => (x._1, x._5))
      val contrib = (r1 ++ r2).map { case (q, id, rank) =>
        (q, id) -> math.floor(1e12 / (kConst.toDouble + rank.toDouble) + 0.5).toLong
      }
      val fused = contrib.groupBy(_._1).view.mapValues { cs =>
        (cs.map(_._2).sum, cs.size.toLong)
      }.toMap
      val exp = fused.toSeq.groupBy(_._1._1).toSeq.flatMap { case (q, rows) =>
        rows.sortBy { case ((_, id), (s12, _)) => (-s12, id) }.take(k).zipWithIndex
          .map { case (((_, id), (s12, n)), i) =>
            (q, id, s12.toDouble / 1e12, n, i + 1) }
      }.sortBy(x => (x._1, x._5))
      assert(got.toSeq == exp, s"trial $trial")
    }
  }

  // ---------------- winnowing model ----------------

  /** winnowFingerprints replay (portable tier): normalize → char
    * k-grams (whole text if shorter) → md5 60-bit hashes → w-window
    * minima → sorted distinct (single global min when fewer than one
    * window of hashes). */
  private def mWinnow(text: String, k: Int, w: Int): Seq[Long] = {
    if (text == null) return null
    val t = text.toLowerCase.replaceAll("\\s+", " ").trim
    val grams = if (t.length >= k) (0 to t.length - k).map(i => t.substring(i, i + k))
      else Seq(t)
    val hs = grams.map(portableHash)
    if (hs.size >= w)
      (0 to hs.size - w).map(p => hs.slice(p, p + w).min).distinct.sorted
    else Seq(hs.min)
  }

  test("winnowFingerprints ≡ window-minima replay incl. short and empty texts") {
    val rnd = new scala.util.Random(17013)
    val (k, w) = (3, 4)
    // tiny alphabet so grams collide; lengths straddle k and k+w-1
    val texts = (0 until 24).map { _ =>
      val n = rnd.nextInt(14)
      Seq.fill(n)("ab "(rnd.nextInt(3)).toString).mkString
    } ++ Seq("", "  ", "aB  bA", null)
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), TextOps.winnowFingerprints(col("text"), k, w, portable = true).as("fp"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val exp = mWinnow(t, k, w)
      val g = got(i.toLong)
      assert((g == null && exp == null) || (g != null && g.toSeq == exp.toSeq),
        s"text ${Option(t).map(x => s"'$x'")} got $g want $exp")
    }
  }

  test("winnowOverlapPairs ≡ brute pair replay with maxBucket pruning live") {
    val rnd = new scala.util.Random(17014)
    val (k, w, minShared, maxBucket) = (3, 2, 2, 4)
    (1 to 3).foreach { trial =>
      // repeated shared phrases force overlaps; "ababab..." runs force
      // hot fingerprints past the maxBucket prune
      val phrases = Vector("the cat sat", "ababababab", "lorem ipsum dolor", "xyz")
      val docs = (0L until 10L).map { id =>
        id -> Seq.fill(1 + rnd.nextInt(3))(phrases(rnd.nextInt(phrases.size))).mkString(" ")
      }
      val fps = docs.map { case (id, t) => id -> mWinnow(t, k, w).toSet }
      val bucketN = fps.toSeq.flatMap { case (id, s) => s.map(fp => fp -> id) }
        .groupBy(_._1).view.mapValues(_.size).toMap
      val pruned = fps.map { case (id, s) => id -> s.filter(bucketN(_) <= maxBucket) }.toMap
      val exp = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        shared = (pruned(a) & pruned(b)).size if shared >= minShared
      } yield (a, b, shared.toLong)).toSet
      val got = TextOps.winnowOverlapPairs(docs.toDF("doc_id", "text"), "doc_id",
          "text", k, w, minShared, portable = true, maxBucket)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      spark.catalog.clearCache()
      assert(got == exp, s"trial $trial docs=$docs")
    }
  }
}
