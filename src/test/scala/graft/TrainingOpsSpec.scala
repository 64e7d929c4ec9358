package graft

import org.apache.spark.sql.functions._

import graft.text.TextOps
import graft.training.TrainingOps

class TrainingOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("weightedSample: rate honored, inclusion tracks weight, zero/null never kept, deterministic") {
    val n = 4000
    // two weight classes: ids < 2000 weight 1, >= 2000 weight 3; plus
    // zero- and null-weight rows that must never survive
    val rows = (0L until n.toLong).map(i => (i, Option(if (i < 2000) 1.0 else 3.0))) ++
      Seq((9001L, Option(0.0)), (9002L, Option(-5.0)), (9003L, Option.empty[Double]))
    val df = rows.toDF("id", "w")
    val kept = TrainingOps.weightedSample(df, "id", "w", rate = 0.4)
      .select("id").as[Long].collect().toSet
    assert(!kept.contains(9001L) && !kept.contains(9002L) && !kept.contains(9003L))
    val loRate = kept.count(_ < 2000).toDouble / 2000
    val hiRate = kept.count(i => i >= 2000 && i < 4000).toDouble / 2000
    // expected: p_lo = 1·0.4·N/Σw = 0.4·4000/8000 = 0.2; p_hi = 0.6
    assert(math.abs(loRate - 0.2) < 0.04, s"lo $loRate")
    assert(math.abs(hiRate - 0.6) < 0.04, s"hi $hiRate")
    assert(math.abs(hiRate / loRate - 3.0) < 0.6, s"ratio ${hiRate / loRate}")
    // deterministic: the same call reproduces the identical keep set
    assert(TrainingOps.weightedSample(df, "id", "w", rate = 0.4)
      .select("id").as[Long].collect().toSet == kept)
    // uniform weights degrade to plain rate sampling
    val uni = TrainingOps.weightedSample(
      (0L until 5000L).map(i => (i, 1.0)).toDF("id", "w"), "id", "w", rate = 0.25)
    assert(math.abs(uni.count() / 5000.0 - 0.25) < 0.03)
    // clamp: a dominating weight is kept outright, never oversampled
    val skew = (0L until 100L).map(i => (i, if (i == 0) 1e9 else 1.0)).toDF("id", "w")
    val sk = TrainingOps.weightedSample(skew, "id", "w", rate = 0.5)
      .select("id").as[Long].collect().toSet
    assert(sk.contains(0L))
    intercept[IllegalArgumentException](
      TrainingOps.weightedSample(df, "id", "w", rate = 0.0))
  }

  test("hashSplit: exhaustive labels, roughly proportional, validates weights") {
    val out = TrainingOps.hashSplit(docs, "doc_id",
      Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    assert(n == docs.count())
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train").toDouble / n > 0.8) // 90% nominal, small-n slack
    intercept[IllegalArgumentException](
      TrainingOps.hashSplit(docs, "doc_id", Seq(("a", 0.5), ("b", 0.3))))
  }

  test("hashSplit is stable under corpus growth: a doc keeps its split") {
    val full = TrainingOps.hashSplit(docs, "doc_id", Seq(("a", 0.5), ("b", 0.5)))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val subset = TrainingOps.hashSplit(docs.where(col("doc_id") % 3 === 0), "doc_id",
      Seq(("a", 0.5), ("b", 0.5)))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    subset.foreach { case (id, s) => assert(full(id) == s) }
  }

  test("stratifiedSample: nested samples + per-stratum rate, rejects bad fractions") {
    val small = TrainingOps.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.1), default = 0.05)
      .select("doc_id").as[Long].collect().toSet
    val big = TrainingOps.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.5), default = 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(big), "same salt => smaller quota is a subset of larger")
    val zeroDefault = TrainingOps.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0), default = 0.0)
    assert(zeroDefault.select("lang").distinct().as[String].collect().toSeq == Seq("en"))
    intercept[IllegalArgumentException](
      TrainingOps.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 1.5)))
  }

  test("packSequences: contiguous concat-and-chunk layout within each shard") {
    val withTokens = docs.select(col("doc_id"),
      TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
    val packed = TrainingOps.packSequences(withTokens, "doc_id", "n_tokens",
      maxTokens = 128, nShards = 4)
      .select("doc_id", "shard", "n_tokens", "seq_start", "seq_end", "offset")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(packed.length == withTokens.count())
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._1)
      var cum = 0L
      ordered.foreach { case (_, _, nTok, seqStart, seqEnd, offset) =>
        assert(offset == cum % 128, "doc starts where the previous one ended")
        assert(seqStart == cum / 128)
        assert(seqEnd == (cum + nTok - 1) / 128)
        assert(seqStart <= seqEnd)
        cum += nTok
      }
    }
  }

  test("packSequences: zero-token doc on a sequence boundary keeps seq_start <= seq_end") {
    // doc 1 fills sequence 0 exactly (cum = maxTokens); doc 2 is empty,
    // so its cum stays on the boundary and the raw seq_end formula
    // floor((cum-1)/max) would invert the range without the clamp
    val df = Seq((1L, 128L), (2L, 0L), (3L, 5L)).toDF("doc_id", "n_tokens")
    val out = TrainingOps.packSequences(df, "doc_id", "n_tokens",
      maxTokens = 128, nShards = 1)
      .select("doc_id", "seq_start", "seq_end", "offset")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    out.values.foreach { case (s, e, _) => assert(s <= e) }
    assert(out(2L) == ((1L, 1L, 0L)))
    assert(out(3L) == ((1L, 1L, 0L)))
  }

  test("capPerGroup: at most n per group, best kept, deterministic on ties") {
    val df = Seq(
      (1L, "a", 100L), (2L, "a", 300L), (3L, "a", 200L), (4L, "a", 300L),
      (5L, "b", 50L), (6L, "c", 10L)).toDF("doc_id", "source", "n_chars")
    val out = TrainingOps.capPerGroup(df, "source", "doc_id", "n_chars", n = 2)
      .select("doc_id").as[Long].collect().toSet
    // source a: ties at 300 resolve by doc_id asc -> 2 then 4; b, c keep all
    assert(out == Set(2L, 4L, 5L, 6L))
    val counts = TrainingOps.capPerGroup(df, "source", "doc_id", "n_chars", n = 1)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 1L))
  }

  test("selectToTokenBudget == naive single-window form; boundary doc excluded") {
    import org.apache.spark.sql.expressions.Window
    val withTokens = docs.select(col("doc_id"),
      TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
      col("n_chars"))
    for (budget <- Seq(0L, 500L, 5000L, 1000000L)) {
      val got = TrainingOps.selectToTokenBudget(withTokens, "doc_id", "n_tokens",
        "n_chars", budget).select("doc_id").as[Long].collect().toSet
      // the scale-hostile reference implementation (fine at spec scale)
      val naive = withTokens.withColumn("__cum",
        sum("n_tokens").over(Window.orderBy(col("n_chars").desc, col("doc_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .where(col("__cum") <= budget).select("doc_id").as[Long].collect().toSet
      assert(got == naive, s"budget=$budget")
    }
    // ascending tier (smallest-first) also agrees
    val gotAsc = TrainingOps.selectToTokenBudget(withTokens, "doc_id", "n_tokens",
      "n_chars", 300L, descending = false).select("doc_id").as[Long].collect().toSet
    val naiveAsc = withTokens.withColumn("__cum",
      sum("n_tokens").over(Window.orderBy(col("n_chars").asc, col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("__cum") <= 300L).select("doc_id").as[Long].collect().toSet
    assert(gotAsc == naiveAsc)
  }

  test("redactPii masks emails/phones/IPs, leaves clean text untouched") {
    val df = Seq(
      "mail a.b+c@x-site.org and x@y.io now",
      "call +32 (0)2 555-0199 or 0477 11 22 33",
      "server 192.168.0.1 responded",
      "no pii here at all").toDF("t")
    val out = df.select(TextOps.redactPii(col("t")).as("r")).as[String].collect()
    assert(out(0) == "mail <EMAIL> and <EMAIL> now")
    assert(out(1) == "call <PHONE> or <PHONE>")
    assert(out(2) == "server <IP> responded")
    assert(out(3) == "no pii here at all")
  }

  test("cleanWebText: script/style payload dropped, tags stripped, entities unescaped once") {
    val df = Seq(
      "<html><head><style>p { color: red }</style></head><body><p>hello  world</p></body></html>",
      "before<script type=\"text/javascript\">var x = 1 && 2;</script>after",
      "a &lt;b&gt; c &amp; d&nbsp;e &quot;f&quot; &#39;g&#39;",
      "&amp;lt; stays escaped one level",
      "plain text untouched").toDF("t")
    val out = df.select(TextOps.cleanWebText(col("t")).as("r")).as[String].collect()
    assert(out(0) == "hello world")
    assert(out(1) == "before after")
    assert(out(2) == "a <b> c & d e \"f\" 'g'")
    assert(out(3) == "&lt; stays escaped one level")
    assert(out(4) == "plain text untouched")
  }

  test("contaminationCheck: full/partial/zero overlap + shingle-less docs") {
    val mk = (id: Long, t: String) => (id, t)
    val corpus = Seq(
      mk(1, "a b c d e f g h i j"),        // = benchmark doc -> full overlap
      mk(2, "x x x a b c d e f g h zz"),   // contains benchmark 8-grams
      mk(3, "q r s t u v w x y z"),        // disjoint
      mk(4, "too short")                   // < 8 words -> 0 shingles
    ).toDF("doc_id", "text")
    val benchmark = corpus.where(col("doc_id") === 1)
    val out = graft.dedup.DedupOps.contaminationCheck(corpus, benchmark, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((3L, 3L)))  // 10 words -> 3 distinct 8-grams, all shared
    assert(out(2L)._2 > 0 && out(2L)._2 < out(2L)._1)
    assert(out(3L) == ((3L, 0L)))
    assert(out(4L) == ((0L, 0L)))
  }

  test("repetitionSignals: counts multiplicity, drops gram-less docs") {
    val df = Seq(
      (1L, "a a a b"),   // bigrams: "a a","a a","a b" -> total 3, top 2, distinct 2
      (2L, "x y z"),     // all distinct -> dup 0, top 1/2
      (3L, "solo")       // < 2 words -> dropped
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionSignals(df, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((3L, 0.666667, 0.333333)))
    assert(out(2L) == ((2L, 0.5, 0.0)))
  }

  test("epochShuffle: total order is reproducible per epoch, different across epochs") {
    val df = (1L to 200L).toDF("id")
    def order(epoch: Int) =
      TrainingOps.epochShuffle(df, "id", epoch, nBuckets = 8)
        .orderBy("shuffle_bucket", "shuffle_rank").select("id")
        .as[Long].collect().toSeq
    val e1 = order(1)
    assert(e1 == order(1))                       // same epoch → same order
    assert(e1 != order(2))                       // new epoch → reshuffled
    assert(e1.sorted == (1L to 200L))            // a permutation, nothing lost
    // ranks are dense and 1-based within each bucket
    val byBucket = TrainingOps.epochShuffle(df, "id", 1, nBuckets = 8)
      .groupBy("shuffle_bucket")
      .agg(count(lit(1)).as("n"), max("shuffle_rank").as("mx"), min("shuffle_rank").as("mn"))
      .as[(Int, Long, Int, Int)].collect()
    assert(byBucket.forall { case (_, n, mx, mn) => mn == 1 && mx == n })
  }

  test("quantileGate: exact top-fraction with id tiebreak; degenerate fractions") {
    val df = Seq((1L, 10.0), (2L, 30.0), (3L, 20.0), (4L, 30.0), (5L, 5.0))
      .toDF("id", "score")
    // floor(5 * 0.4) = 2: the two best are the tied 30s, id-tiebroken
    assert(TrainingOps.quantileGate(df, "id", "score", 0.4)
      .select("id").as[Long].collect().toSet == Set(2L, 4L))
    // ascending keeps the worst
    assert(TrainingOps.quantileGate(df, "id", "score", 0.2, descending = false)
      .select("id").as[Long].collect().toSet == Set(5L))
    assert(TrainingOps.quantileGate(df, "id", "score", 0.0).count() == 0)
    assert(TrainingOps.quantileGate(df, "id", "score", 1.0).count() == 5)
    intercept[IllegalArgumentException] {
      TrainingOps.quantileGate(df, "id", "score", 1.5)
    }
  }

  test("contaminationCheckViaBloom ≡ exact check (planted contamination + clean corpus)") {
    import graft.dedup.DedupOps
    val dir = tempDir("graft_decontam") + "/b"
    try {
      val corpus = Tables(spark, "/root/testdata/sf0.001", "documents")
      val bench = corpus.where(col("doc_id") < 25)
      DedupOps.benchmarkShingleBloom(bench, "text", dir, "s0", shingleN = 8)
      // identical output on a corpus that CONTAINS the benchmark
      assertSameRows(
        DedupOps.contaminationCheckViaBloom(corpus, bench, dir, "doc_id", "text", 8),
        DedupOps.contaminationCheck(corpus, bench, "doc_id", "text", 8))
      // and on an id-disjoint slice (the fixture plants near-dups, so
      // shingle hits can legitimately survive — equivalence, not
      // emptiness, is the contract) plus genuinely novel text
      val clean = corpus.where(col("doc_id") >= 100)
        .unionByName(Seq((99001L, "entirely novel words nowhere in any benchmark " +
          "suite text at all here today", "xx", "x", 0L))
          .toDF("doc_id", "text", "lang", "source", "n_chars"))
      assertSameRows(
        DedupOps.contaminationCheckViaBloom(clean, bench, dir, "doc_id", "text", 8),
        DedupOps.contaminationCheck(clean, bench, "doc_id", "text", 8))
      // a second suite appends as its own tranche (OR merge) and the
      // gate sees both suites' shingles
      val suite2 = corpus.where(col("doc_id") >= 100 && col("doc_id") < 110)
      DedupOps.benchmarkShingleBloom(suite2, "text", dir, "s1", shingleN = 8)
      assertSameRows(
        DedupOps.contaminationCheckViaBloom(corpus, bench.unionByName(suite2), dir,
          "doc_id", "text", 8),
        DedupOps.contaminationCheck(corpus, bench.unionByName(suite2),
          "doc_id", "text", 8))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir).getParentFile)
  }

  test("leakageSafeSplit: whole dup clusters land in one split; singletons ≡ hashSplit") {
    val ids = (1L to 2000L).toDF("id")
    // clusters: {1..5}→1, {10,11}→10; everything else singleton
    val cc = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
      (10L, 10L), (11L, 10L)).toDF("node", "component")
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val got = TrainingOps.leakageSafeSplit(ids, "id", cc, splits, salt = "t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // CLUSTER INTEGRITY: every member shares its group's split
    assert((1L to 5L).map(got(_)).toSet.size == 1)
    assert(Seq(10L, 11L).map(got(_)).toSet.size == 1)
    // group ids are the component mins; singletons are their own group
    assert(got(3L)._1 == 1L && got(11L)._1 == 10L && got(77L)._1 == 77L)
    // singletons get exactly the id-hash split (group_id == id)
    val plain = TrainingOps.hashSplit(ids, "id", splits, salt = "t")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (12L to 2000L).foreach(i => assert(got(i)._2 == plain(i), s"id $i"))
    // and the id-hash split DOES scatter the cluster the group split
    // protects (the leakage this operator exists to prevent) — with
    // 7 cluster members at these weights a scatter is near-certain
    val scattered = ((1L to 5L) ++ Seq(10L, 11L)).map(plain).toSet.size > 2
    assert(scattered, "fixture surprise: id-hash kept clusters together")
    // proportions still roughly honored over the group universe
    val frac = got.values.count(_._2 == "train").toDouble / 2000
    assert(frac > 0.75 && frac < 0.85, s"train frac $frac")
  }
}
