package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

import graft.merge.Merge
import graft.relational.RelationalOps

/** Randomized differential tests for the two most intricate join-shaped
  * operators the directed specs cover only by example: salted joins
  * (must be row-for-row ≡ the plain join they de-skew) and SCD-2 apply
  * (replayed by a driver model written straight from the versioning
  * contract). Same rationale as [[AnalyticsPropertySpec]] — random
  * inputs with duplicates, null values, and hot keys reach corners a
  * fixture never does.
  */
class MergeSaltPropertySpec extends SparkSpec {
  import spark.implicits._

  private val TRIALS = 5

  // ---- salted joins ≡ plain join ------------------------------------

  /** Random (k, payload) multiset with a deliberately hot key 0 and
    * duplicate full rows (the salt hash keys on every column, so dup
    * rows landing in one salt bucket is itself a corner). */
  private def skewed(rnd: scala.util.Random, n: Int): Seq[(Int, Int)] =
    (0 until n).map { _ =>
      val k = if (rnd.nextInt(3) == 0) 0 else rnd.nextInt(6)
      (k, rnd.nextInt(4)) // small payload domain → frequent dup rows
    }

  private def multiset(df: DataFrame): Map[Seq[Any], Int] =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  test("saltedJoin ≡ plain join for inner/left/semi/anti on skewed duplicate-heavy inputs") {
    val rnd = new scala.util.Random(11016)
    (1 to TRIALS).foreach { trial =>
      val l = skewed(rnd, 40).toDF("k", "lv")
      val r = skewed(rnd, 25).toDF("k", "rv")
      val salt = Seq(2, 4, 7)(trial % 3)
      Seq("inner", "left", "left_semi", "left_anti").foreach { jt =>
        val plain = multiset(l.join(r, Seq("k"), jt))
        val salted = multiset(RelationalOps.saltedJoin(l, r, Seq("k"), salt, jt))
        assert(salted == plain, s"trial $trial saltedJoin $jt salt=$salt")
        val targeted = multiset(RelationalOps.saltedJoinTargeted(
          l, r, Seq("k"), salt, hotThreshold = 5L, jt))
        assert(targeted == plain, s"trial $trial saltedJoinTargeted $jt salt=$salt")
      }
    }
  }

  // ---- scd2Apply ≡ driver versioning model --------------------------

  /** One SCD row: (k, v, w, valid_from, valid_to, is_current) — string
    * timestamps, which the operator's casts keep as strings and whose
    * lexicographic order IS their temporal order. */
  private type Scd = (Int, Option[Int], Option[Int], String, Option[String], Boolean)

  private def d(i: Int) = f"2024-01-${i}%02d 00:00:00"

  private def randomHistory(rnd: scala.util.Random): Seq[Scd] =
    (0 until 8).flatMap { k =>
      val versions = rnd.nextInt(3) // 0..2 closed versions
      val open = rnd.nextBoolean() // both 0 → key absent from history
      val starts = Seq(1, 5, 9).take(versions + (if (open) 1 else 0))
      if (starts.isEmpty) Nil
      else starts.zipWithIndex.map { case (s, i) =>
        val last = i == starts.size - 1
        (k, Some(rnd.nextInt(3)), if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(3)),
          d(s),
          if (last && open) None else Some(d(starts.lift(i + 1).getOrElse(s + 2))),
          last && open)
      }
    }

  private def bruteScd2(history: Seq[Scd], stage: Seq[(Int, Option[Int], Option[Int])],
                        loadTs: String, closeMissing: Boolean): Map[Scd, Int] = {
    val out = mutable.Buffer[Scd]()
    out ++= history.filterNot(_._6) // closed rows pass through
    val stageByK = stage.map(s => s._1 -> s).toMap
    val currentKeys = history.filter(_._6).map(_._1).toSet
    history.filter(_._6).foreach { case c @ (k, v, w, from, _, _) =>
      stageByK.get(k) match {
        case Some((_, sv, sw)) =>
          if (sv != v || sw != w) { // null-safe compare: Option equality
            out += ((k, v, w, from, Some(loadTs), false))
            out += ((k, sv, sw, loadTs, None, true))
          } else out += c
        case None =>
          if (closeMissing) out += ((k, v, w, from, Some(loadTs), false))
          else out += c
      }
    }
    stage.filterNot(s => currentKeys(s._1)).foreach { case (k, sv, sw) =>
      out += ((k, sv, sw, loadTs, None, true))
    }
    out.groupBy(identity).view.mapValues(_.size).toMap
  }

  test("scd2Apply ≡ driver versioning model on random histories and stages (± closeMissing)") {
    val rnd = new scala.util.Random(12016)
    (1 to TRIALS).foreach { trial =>
      val hist = randomHistory(rnd)
      if (hist.nonEmpty) {
        // unique stage keys (the operator's contract); includes brand-new
        // keys 8/9 and Option values so the null-safe compare is live
        val stage = rnd.shuffle((0 to 9).toList).take(4 + rnd.nextInt(4)).map { k =>
          (k, Some(rnd.nextInt(3)), if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(3)))
        }
        val closeMissing = trial % 2 == 0
        val loadTs = d(20)
        val histDf = hist.toDF("k", "v", "w", "valid_from", "valid_to", "is_current")
        val stageDf = stage.toDF("k", "v", "w")
        val got = Merge.scd2Apply(histDf, stageDf, Seq("k"), loadTs,
            closeMissing = closeMissing)
          .collect().map(r => (r.getInt(0),
            Option(r.getAs[java.lang.Integer]("v")).map(_.toInt),
            Option(r.getAs[java.lang.Integer]("w")).map(_.toInt),
            r.getAs[String]("valid_from"),
            Option(r.getAs[String]("valid_to")),
            r.getAs[Boolean]("is_current")))
          .groupBy(identity).view.mapValues(_.length).toMap
        assert(got == bruteScd2(hist, stage, loadTs, closeMissing),
          s"trial $trial closeMissing=$closeMissing hist=$hist stage=$stage")
      }
    }
  }
}
