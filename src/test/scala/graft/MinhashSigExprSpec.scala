package graft

import org.apache.spark.sql.functions._

import graft.dedup.DedupOps
import graft.functions.MinhashSigExpr

/** The fused MinHash kernel must be bit-identical to the composable
  * HOF formulation it replaces, on both hash tiers. */
class MinhashSigExprSpec extends SparkSpec {
  import spark.implicits._

  private def shingled = Tables(spark, "/root/testdata/sf0.001", "documents")
    .select(col("doc_id"), DedupOps.wordShingles(col("text"), 3).as("sh"))

  test("fused kernel == HOF fold, portable tier (md5)") {
    val both = shingled.select(
      MinhashSigExpr.minhashSig(col("sh"), 16, portable = true).as("fused"),
      DedupOps.minhashSignatureFromHashes(
        DedupOps.shingleHashes(col("sh"), portable = true), 16).as("hof"))
    assert(both.where(col("fused") =!= col("hof")).count() == 0)
  }

  test("fused kernel == HOF fold, fast tier (xxhash64)") {
    val both = shingled.select(
      MinhashSigExpr.minhashSig(col("sh"), 8, portable = false).as("fused"),
      DedupOps.minhashSignatureFromHashes(
        DedupOps.shingleHashes(col("sh"), portable = false), 8).as("hof"))
    assert(both.where(col("fused") =!= col("hof")).count() == 0)
  }

  test("fused shingler == composable HOF form, incl. edge shapes") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text")).unionByName(Seq(
        "", " ", "one", "one two", "one two three",
        "A  b\tC   d", "é Ü ß x y", "dup dup dup dup",
        // trailing/leading NON-SPACE whitespace: Spark split (limit -1)
        // keeps the empty tokens that Java String.split drops — the
        // fused kernel must match Spark, not Java
        "one two\n", "a b\t", "\nx y", "\t tab wrapped \n",
        "crawl text ends here\n\n",
        // astral plane / CJK / RTL / combining marks: the fused
        // kernels walk UTF8String bytes while the composable forms go
        // through Java regex over code points — surrogate-pair
        // handling must agree (r19 unicode-hardening pass)
        "\uD83D\uDE00 smile \uD83C\uDF89", "ok\uD83D\uDE00ok x", "\uD83C\uDF89\uD83C\uDF89\uD83C\uDF89",
        "\u65E5\u672C\u8A9E \u30C6\u30B9\u30C8 words", "\u05E2\u05D1\u05E8\u05D9\u05EA test",
        "e\u0301 combining e\u0301", "\uD835\uDD18\uD835\uDD2B\uD835\uDD26 code points").toDF("text"))
    for (n <- Seq(2, 3, 5)) {
      val both = docs.select(
        DedupOps.wordShingles(col("text"), n).as("fused"),
        DedupOps.wordShinglesComposable(col("text"), n).as("hof"))
      assert(both.where(col("fused") =!= col("hof")).count() == 0, s"n=$n")
    }
    // non-distinct variant: multiplicity preserved in order
    val reps = Seq("a b a b a").toDF("text")
      .select(graft.text.TextOps.wordNgrams(col("text"), 2).as("g"))
      .as[Seq[String]].head()
    assert(reps == Seq("a b", "b a", "a b", "b a"))
  }

  test("fused simhash == composable HOF form on both tiers") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text")).unionByName(Seq(
        "", "one", "a b a", "one two\n", "a b\t", "\nx y",
        "\uD83D\uDE00 smile \uD83C\uDF89", "\u65E5\u672C\u8A9E \u30C6\u30B9\u30C8", "e\u0301 x e\u0301",
        "ok\uD83D\uDE00ok \uD835\uDD18\uD835\uDD2B").toDF("text"))
    for (portable <- Seq(true, false); bits <- Seq(16, 60)) {
      val both = docs.select(
        DedupOps.simhash(col("text"), bits, portable).as("fused"),
        DedupOps.simhashComposable(col("text"), bits, portable).as("hof"))
      assert(both.where(col("fused") =!= col("hof")).count() == 0,
        s"portable=$portable bits=$bits")
    }
  }

  test("fused text counts == composable counts, incl. trailing whitespace") {
    import graft.text.TextOps
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text")).unionByName(Seq(
        "", " ", "the cat\n", "und der\t", "\nle mot",
        "the end of the line\n\n",
        "the \uD83D\uDE00 cat \uD83C\uDF89!", "\u65E5\u672C\u8A9E the \u30C6\u30B9\u30C8",
        "e\u0301 the e\u0301", "ok\uD83D\uDE00ok").toDF("text"))
    val both = docs.select(
      graft.functions.TextCountsExpr.textCounts(col("text")).as("tc"),
      size(TextOps.words(col("text"))).as("c_words"),
      size(filter(TextOps.words(col("text")),
        w => w.isin(TextOps.EnStopwords.map(x => x: Any): _*))).as("c_stop"),
      regexp_count(col("text"), lit("[^\\w\\s]")).as("c_punct"))
    assert(both.where(col("tc.n_words") =!= col("c_words")
      || col("tc.n_stop") =!= col("c_stop")
      || col("tc.n_punct") =!= col("c_punct")).count() == 0)
    val langCols = TextOps.LangMarkers.map { case (lang, ms) =>
      (col(s"tc.$lang"),
        size(filter(TextOps.words(col("text")),
          w => w.isin(ms.map(x => x: Any): _*))).as(s"c_$lang"))
    }
    val langBoth = docs.select(
      graft.functions.TextCountsExpr.textCounts(col("text")).as("tc") +:
        langCols.map(_._2): _*)
    val mismatch = TextOps.LangMarkers.map(_._1).map(l =>
      col(s"tc.$l") =!= col(s"c_$l")).reduce(_ || _)
    assert(langBoth.where(mismatch).count() == 0)
  }

  test("empty shingle array yields the init vector; nulls are skipped") {
    val df = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq("a", "b"))).toDF("id", "sh")
    val out = df.select(col("id"),
      MinhashSigExpr.minhashSig(col("sh"), 4, portable = true).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L) == Seq.fill(4)(DedupOps.MinhashP))
    assert(out(2L).forall(_ < DedupOps.MinhashP))
    val withNull = Seq((3L, Seq[String]("a", null, "b"))).toDF("id", "sh")
      .select(MinhashSigExpr.minhashSig(col("sh"), 4, portable = true).as("sig"))
    val noNull = Seq((3L, Seq("a", "b"))).toDF("id", "sh")
      .select(MinhashSigExpr.minhashSig(col("sh"), 4, portable = true).as("sig"))
    assert(withNull.head() == noNull.head())
  }
}
