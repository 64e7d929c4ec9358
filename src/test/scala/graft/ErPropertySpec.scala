package graft

import org.apache.spark.sql.functions.{col, lower, substring}

import graft.relational.RelationalOps

/** Randomized DIFFERENTIAL test for the blocked entity-resolution
  * join: candidate generation under BOTH cap tiers (absolute
  * `maxBlock`, frequency `maxKeyShare`, and their composition — the
  * tighter binds), multi-pass union with overlap dedup, and the
  * Levenshtein refine, replayed against a driver model with a
  * classic-DP edit distance. Inputs engineer what the fixture lacks:
  * a degenerate block key covering a large share of one side, a key
  * exactly AT the caps (boundary `<=`), and passes whose candidate
  * sets overlap so the closing dropDuplicates is load-bearing.
  */
class ErPropertySpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** blockedLevenshteinJoin replay over (name, key-functions) pairs. */
  private def model(left: Seq[(Long, String)], right: Seq[(Long, String)],
                    passes: Seq[(String => String, String => String)],
                    maxDist: Int, maxBlock: Int,
                    maxKeyShare: Double): Set[(Long, Long, Int)] = {
    def cap(n: Int): Long = {
      val share = if (maxKeyShare <= 0.0) Long.MaxValue
        else math.max(1L, (maxKeyShare * n).toLong)
      math.min(if (maxBlock > 0) maxBlock.toLong else Long.MaxValue, share)
    }
    val (lc, rc) = (cap(left.size), cap(right.size))
    passes.flatMap { case (lk, rk) =>
      val lBlocks = left.groupBy { case (_, s) => lk(s) }
        .filter { case (_, rows) => lc == Long.MaxValue || rows.size <= lc }
      val rBlocks = right.groupBy { case (_, s) => rk(s) }
        .filter { case (_, rows) => rc == Long.MaxValue || rows.size <= rc }
      for {
        (k, ls) <- lBlocks.toSeq; rs <- rBlocks.get(k).toSeq
        (lid, lName) <- ls; (rid, rName) <- rs
        d = lev(lName, rName) if d <= maxDist
      } yield (lid, rid, d)
    }.toSet
  }

  test("blockedLevenshteinJoin ≡ capped-block replay across overlapping passes") {
    val rnd = new scala.util.Random(17060)
    val bases = Vector("ackermann", "beaumont", "castillo", "delacroix")
    def dirty(s: String): String = {
      val i = rnd.nextInt(s.length)
      rnd.nextInt(3) match {
        case 0 => s.updated(i, 'x')                     // substitution
        case 1 => s.substring(0, i) + s.substring(math.min(i + 1, s.length)) // deletion
        case _ => s                                     // exact dup
      }
    }
    (1 to 3).foreach { trial =>
      // one "unknown" block dominates the left side → share cap binds
      val left = (0L until 18L).map { id =>
        id -> (if (id < 8) "unknown" else dirty(bases(rnd.nextInt(bases.size))))
      }
      val right = (0L until 14L).map { id =>
        id -> (if (id < 3) "unknown" else dirty(bases(rnd.nextInt(bases.size))))
      }
      val (maxDist, maxBlock, share) = (2, 6, 0.3)
      // two passes: full lowercase key, then 4-char prefix (overlapping
      // candidates — the union dedup is live)
      val passes = Seq[(String => String, String => String)](
        (s => s.toLowerCase, s => s.toLowerCase),
        (s => s.toLowerCase.take(4), s => s.toLowerCase.take(4)))
      val expect = model(left, right, passes, maxDist, maxBlock, share)
      val l = left.toDF("lid", "lname")
      val r = right.toDF("rid", "rname")
      val got = RelationalOps.blockedLevenshteinJoin(l, r, "lname", "rname",
          Seq((lower(col("lname")), lower(col("rname"))),
            (substring(lower(col("lname")), 1, 4), substring(lower(col("rname")), 1, 4))),
          maxDist, maxBlock, share)
        .select("lid", "rid", "lev_dist")
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
      assert(got == expect, s"trial $trial left=$left right=$right")
      // the fixture must actually push the degenerate block OVER the
      // share cap (8 rows > max(1, floor(0.3·18)) = 5), so the prune
      // arm the model replays was genuinely live
      val lCap = math.max(1L, (share * left.size).toLong)
      assert(8 > lCap, "fixture must keep the degenerate block over the share cap")
      assert(!got.exists { case (lid, _, _) => lid < 8L },
        "share-capped 'unknown' rows must emit no candidates")
    }
  }

  test("caps compose: absolute cap binds when tighter than the share cap, and at the boundary") {
    // left: key 'aa' has exactly 3 rows, key 'bb' has 4; maxBlock=3 →
    // 'aa' survives AT the boundary, 'bb' is dropped; share cap loose
    val left = Seq((1L, "aa"), (2L, "aa"), (3L, "aa"),
      (4L, "bb"), (5L, "bb"), (6L, "bb"), (7L, "bb"))
    val right = Seq((10L, "aa"), (11L, "bb"))
    val got = RelationalOps.blockedLevenshteinJoin(
        left.toDF("lid", "lname"), right.toDF("rid", "rname"), "lname", "rname",
        Seq((col("lname"), col("rname"))), maxDist = 0, maxBlock = 3,
        maxKeyShare = 0.9)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 10L)), s"got $got")
  }
}
