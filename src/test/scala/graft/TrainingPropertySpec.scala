package graft

import org.apache.spark.sql.functions.col

import graft.training.TrainingOps

/** Randomized DIFFERENTIAL tests for the training-assembly family:
  * every split/sample/selection/packing operator replayed on the
  * driver by a brute-force model written straight from its documented
  * arithmetic (the salted ppm hash gate, the fixed-point weighted
  * threshold, the two-phase global cumulative sum, the concat-pack
  * layout), over random inputs the fixture lacks — duplicate and NULL
  * order scores, zero-token documents landing exactly on sequence
  * boundaries, docs longer than a whole sequence, weights that clamp,
  * mixtures with a binding source. All portable-tier, all bit-exact:
  * these operators document cross-engine determinism, so the specs
  * hold them to the same standard the sketch/retrieval tiers are held
  * to.
  */
class TrainingPropertySpec extends SparkSpec {
  import spark.implicits._

  private val Ppm = 1000000L

  private def portableHash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  private def bucket(id: Long, salt: String): Long =
    portableHash(s"$salt|$id") % Ppm

  test("hashSplit ≡ cumulative-threshold replay; assignments stable under corpus growth") {
    val rnd = new scala.util.Random(17020)
    val splits = Seq(("train", 0.8), ("val", 0.15), ("test", 0.05))
    val cuts = splits.scanLeft(0L) { case (a, (_, w)) => a + math.round(w * Ppm) }
      .tail.zip(splits.map(_._1))
    def expect(id: Long): String =
      cuts.find { case (c, _) => bucket(id, "s17") < c }.map(_._2).getOrElse(cuts.last._2)
    val ids = Seq.fill(60)(rnd.nextLong() & Long.MaxValue)
    val got = TrainingOps.hashSplit(ids.toDF("doc_id"), "doc_id", splits,
        salt = "s17", portable = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    ids.foreach(id => assert(got(id) == expect(id), s"id $id"))
    // growth stability: half the corpus assigns identically
    val gotHalf = TrainingOps.hashSplit(ids.take(30).toDF("doc_id"), "doc_id",
        splits, salt = "s17", portable = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotHalf == got.view.filterKeys(ids.take(30).toSet).toMap)
  }

  test("stratifiedSample ≡ ppm-cut replay incl. default stratum; nested at lower quota") {
    val rnd = new scala.util.Random(17021)
    val rows = (0L until 80L).map(id => (id, Seq("en", "zh", "xx")(rnd.nextInt(3))))
    val fr = Map("en" -> 0.5, "zh" -> 0.25)
    def keep(id: Long, lang: String, f: Map[String, Double], d: Double): Boolean =
      bucket(id, "sample") < math.round(f.getOrElse(lang, d) * Ppm)
    val got = TrainingOps.stratifiedSample(rows.toDF("doc_id", "lang"), "doc_id",
        "lang", fr, default = 0.1, portable = true)
      .collect().map(_.getLong(0)).toSet
    assert(got == rows.filter { case (id, l) => keep(id, l, fr, 0.1) }.map(_._1).toSet)
    // nested-sample property: the 10%/5% sample is a subset of 50%/25%
    val lower = TrainingOps.stratifiedSample(rows.toDF("doc_id", "lang"), "doc_id",
        "lang", Map("en" -> 0.1, "zh" -> 0.05), default = 0.02, portable = true)
      .collect().map(_.getLong(0)).toSet
    assert(lower.subsetOf(got))
  }

  test("weightedSample ≡ fixed-point threshold replay with clamped and zero weights") {
    val rnd = new scala.util.Random(17022)
    // weights: zeros, a dominant clamped weight, 6-decimal fractions, a
    // null, and WILD magnitudes beyond the DECIMAL(18,6) snap envelope
    // (r19 ANSI cast audit: invalid → never keep, job never dies)
    val rows = (0L until 50L).map { id =>
      val w: java.lang.Double =
        if (id == 0) null
        else if (id == 1) 0.0
        else if (id == 2) 500.0 // clamps: share > 1
        else if (id == 3) 9.9e15 // wild positive: unsnappable → never keep
        else if (id == 4) -9.9e15 // wild negative: unsnappable → never keep
        else math.floor(rnd.nextDouble() * 1e6) / 1e6
      (id, w)
    }
    val rate = 0.3
    def u(w: java.lang.Double): Long =
      if (w == null || math.abs(w.doubleValue()) >= 1e12) 0L // unsnappable ≡ null
      else math.max(0L, new java.math.BigDecimal(w.doubleValue())
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .movePointRight(6).toBigInteger.longValueExact())
    val us = rows.map { case (id, w) => id -> u(w) }.toMap
    val s = BigInt(us.values.sum); val n = BigInt(rows.size)
    val r = BigInt(math.floor(rate * Ppm).toLong)
    val expect = rows.filter { case (id, _) =>
      val thr = (BigInt(us(id)) * r * n / s) min BigInt(Ppm)
      BigInt(bucket(id, "wsample")) < thr
    }.map(_._1).toSet
    val got = TrainingOps.weightedSample(rows.toDF("doc_id", "w"), "doc_id", "w",
        rate, portable = true)
      .collect().map(_.getLong(0)).toSet
    assert(got == expect)
    // clamped row's threshold is exactly Ppm → always kept; wild
    // weights behave exactly like null/zero (never keep, contribute
    // nothing to Σw — so they cannot shift anyone else's threshold)
    assert(got.contains(2L) && !got.contains(0L) && !got.contains(1L) &&
      !got.contains(3L) && !got.contains(4L))
  }

  test("sampleToMixture ≡ binding-source replay; missing weighted source fails fast") {
    val rnd = new scala.util.Random(17023)
    val rows = (0L until 120L).map(id =>
      (id, Seq("web", "web", "web", "code", "acad")(rnd.nextInt(5))))
    val weights = Map("web" -> 0.6, "code" -> 0.25, "acad" -> 0.15)
    val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val t = weights.map { case (s0, w) => counts(s0) / w }.min
    val expect = rows.filter { case (id, s0) =>
      weights.contains(s0) &&
        bucket(id, "mix") < math.round(weights(s0) * t / counts(s0) * Ppm)
    }.map(_._1).toSet
    val got = TrainingOps.sampleToMixture(rows.toDF("doc_id", "src"), "doc_id",
        "src", weights, portable = true)
      .collect().map(_.getLong(0)).toSet
    assert(got == expect)
    // the binding source (largest nₛ/wₛ deficit) keeps every row
    val binding = weights.minBy { case (s0, w) => counts(s0) / w }._1
    assert(rows.filter(_._2 == binding).map(_._1).toSet.subsetOf(got))
    val e = intercept[IllegalArgumentException] {
      TrainingOps.sampleToMixture(rows.toDF("doc_id", "src"), "doc_id", "src",
        weights + ("typo" -> 0.1), portable = true)
    }
    assert(e.getMessage.contains("typo"))
  }

  test("selectToTokenBudget ≡ global-sort cumsum replay on ties, nulls, zero-token docs") {
    val rnd = new scala.util.Random(17024)
    (1 to 3).foreach { trial =>
      val rows = (0L until 60L).map { id =>
        val score: java.lang.Double =
          if (rnd.nextInt(10) == 0) null
          else (rnd.nextInt(5) + 1).toDouble // heavy ties
        val tok = if (rnd.nextInt(6) == 0) 0L else rnd.nextInt(50).toLong
        (id, tok, score)
      }
      // model: (score desc NULLS LAST, id asc), cum incl. current ≤ budget
      val sorted = rows.sortWith { case ((i1, _, s1), (i2, _, s2)) =>
        (s1, s2) match {
          case (null, null) => i1 < i2
          case (null, _) => false
          case (_, null) => true
          case (a, b) => if (a.doubleValue() != b.doubleValue())
            a.doubleValue() > b.doubleValue() else i1 < i2
        }
      }
      val budget = sorted.map(_._2).sum / 2
      var cum = 0L
      val expect = sorted.takeWhile { case (_, tok, _) => cum += tok; cum <= budget }
        .map(_._1).toSet
      val got = TrainingOps.selectToTokenBudget(
          rows.toDF("doc_id", "tok", "score"), "doc_id", "tok", "score", budget)
        .collect().map(_.getLong(0)).toSet
      assert(got == expect, s"trial $trial budget=$budget")
    }
  }

  test("quantileGate ≡ exact top-floor(n·frac) by (score desc, id) under ties") {
    val rnd = new scala.util.Random(17025)
    val rows = (0L until 40L).map(id => (id, (rnd.nextInt(4) + 1).toDouble))
    val frac = 0.37
    val k = math.floor(rows.size * frac).toLong
    val expect = rows.sortBy { case (id, s0) => (-s0, id) }.take(k.toInt).map(_._1).toSet
    val got = TrainingOps.quantileGate(rows.toDF("doc_id", "score"), "doc_id",
        "score", frac)
      .collect().map(_.getLong(0)).toSet
    assert(got == expect)
  }

  test("packSequences ≡ concat-pack replay: boundary-straddling, multi-seq and empty docs") {
    val rnd = new scala.util.Random(17026)
    val maxTokens = 16
    val nShards = 4
    // token profile engineered for every edge: zeros (boundary clamp),
    // > maxTokens (multi-sequence straddle), exact-fit documents
    val rows = (0L until 40L).map { id =>
      val tok = rnd.nextInt(5) match {
        case 0 => 0L
        case 1 => maxTokens.toLong
        case 2 => (maxTokens * 2 + rnd.nextInt(10)).toLong
        case _ => rnd.nextInt(maxTokens).toLong
      }
      (id, tok)
    }
    val expect = rows
      .groupBy { case (id, _) => (portableHash(s"pack|$id") % nShards).toInt }
      .flatMap { case (shard, docs) =>
        var cum = 0L
        docs.sortBy(_._1).map { case (id, tok) =>
          cum += tok
          val start = math.floor((cum - tok).toDouble / maxTokens).toLong
          val end = math.max(start, math.floor((cum - 1).toDouble / maxTokens).toLong)
          id -> ((shard, start, end, (cum - tok) % maxTokens))
        }
      }
    val got = TrainingOps.packSequences(rows.toDF("doc_id", "tok"), "doc_id", "tok",
        maxTokens, nShards, portable = true)
      .select("doc_id", "shard", "seq_start", "seq_end", "offset")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect)
  }

  test("epochShuffle ≡ seeded-hash order replay; epochs decorrelate, same epoch reproduces") {
    val rnd = new scala.util.Random(17027)
    val ids = Seq.fill(50)(rnd.nextLong() & Long.MaxValue).distinct
    val nBuckets = 8
    def order(epoch: Int): Seq[Long] = ids
      .map(id => (id, portableHash(s"shuffle|$epoch|$id")))
      .map { case (id, h) => (id, h % nBuckets, h) }
      .sortBy { case (id, b, h) => (b, h, id) }
      .map(_._1)
    def got(epoch: Int): Seq[Long] =
      TrainingOps.epochShuffle(ids.toDF("doc_id"), "doc_id", epoch,
          nBuckets, portable = true)
        .orderBy(col("shuffle_bucket"), col("shuffle_rank"))
        .collect().map(_.getLong(0)).toSeq
    assert(got(1) == order(1))
    assert(got(1) == got(1), "same epoch must reproduce")
    assert(got(2) == order(2))
    assert(order(1) != order(2), "different epochs must reshuffle")
  }
}
