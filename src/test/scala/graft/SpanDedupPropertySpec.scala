package graft

import graft.dedup.DedupOps

/** Randomized differential test for global span-level dedup: random
  * tiny-vocabulary texts (so spans COLLIDE across documents by
  * construction), replayed by a driver model of the contract — chunk
  * each normalized document into `spanWords`-word spans, keep each
  * distinct span's global first occurrence in (doc id, span index)
  * order, reassemble survivors in document order. Both the text-keyed
  * and hash-keyed tiers must equal the model row for row (the hash
  * tier additionally bets on xxhash64 collision-freedom, the same bet
  * the operator documents).
  */
class SpanDedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private def bruteSpanDedup(docs: Seq[(Long, String)],
                             sw: Int): Map[Long, (String, Long, Long)] = {
    def wordsOf(t: String): Seq[String] = {
      val n = t.toLowerCase.replaceAll("\\s+", " ").trim
      if (n.isEmpty) Seq("") else n.split(" ").toSeq
    }
    val spans = docs.flatMap { case (id, t) =>
      val ws = wordsOf(t)
      (0 to (ws.size - 1) / sw).map(i =>
        (id, i, ws.slice(i * sw, i * sw + sw).mkString(" ")))
    }
    val firstOf = spans.groupBy(_._3).view
      .mapValues(_.map(s => (s._1, s._2)).min).toMap
    docs.map { case (id, _) =>
      val mine = spans.filter(_._1 == id)
      val kept = mine.filter(s => firstOf(s._3) == ((s._1, s._2)))
      id -> (kept.sortBy(_._2).map(_._3).mkString(" "),
        mine.size.toLong, (mine.size - kept.size).toLong)
    }.toMap
  }

  test("spanDedupGlobal ≡ driver replay on collision-heavy random texts, both tiers") {
    val rnd = new scala.util.Random(16016)
    val vocab = Vector("a", "b", "c")
    (1 to 5).foreach { trial =>
      val docs = (0L until 8L).map { id =>
        val n = rnd.nextInt(12) // includes 0-word (empty text) docs
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val sw = 2 + trial % 2
      val expect = bruteSpanDedup(docs, sw)
      Seq(false, true).foreach { hashed =>
        val got = DedupOps.spanDedupGlobal(docs.toDF("doc_id", "text"),
            "doc_id", "text", spanWords = sw, hashSpans = hashed)
          .collect().map(r => r.getLong(0) ->
            (r.getString(1), r.getLong(2), r.getLong(3))).toMap
        assert(got == expect, s"trial $trial sw=$sw hashed=$hashed docs=$docs")
      }
    }
  }
}
