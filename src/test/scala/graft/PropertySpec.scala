package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.clean.CleanOps
import graft.merge.Merge
import graft.relational.RelationalOps
import graft.schema.SchemaOps

/** Property-based laws (SURVEY.md §5): upsert idempotency, union-drift,
  * lenient-cast totality, schema-apply closure. Raw ScalaCheck driven
  * through Test.check (no scalatestplus bridge in the build).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), prop)
    assert(res.passed, s"$name: $res")
  }

  private val kvGen: Gen[List[(Int, Int)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0, 9), Gen.choose(0, 100)))

  test("upsert idempotency: upsert(upsert(t,s),s) == upsert(t,s)") {
    check("upsert-idempotent", Prop.forAll(kvGen, kvGen) { (t, s) =>
      val target = t.toDF("k", "v")
      val stage = s.distinctBy(_._1).toDF("k", "v") // stage keys unique (staging contract)
      val once = Merge.upsertFrame(target, stage, Seq("k"))
      val twice = Merge.upsertFrame(once, stage, Seq("k"))
      once.collect().toSet == twice.collect().toSet
    }, n = 10)
  }

  test("upsert result: stage keys have stage values; non-stage rows untouched") {
    check("upsert-semantics", Prop.forAll(kvGen, kvGen) { (t, s) =>
      val target = t.toDF("k", "v")
      val stage = s.distinctBy(_._1).toDF("k", "v")
      val out = Merge.upsertFrame(target, stage, Seq("k")).as[(Int, Int)].collect()
      val stageMap = s.distinctBy(_._1).toMap
      val expected = t.filterNot(r => stageMap.contains(r._1)) ++ stageMap.toList
      out.toSet == expected.toSet && out.length == expected.length
    }, n = 10)
  }

  test("upsertOnDiff: model equivalence (keep/update/insert/survive) + idempotency") {
    // rows carry (k, v, meta): meta is OUTSIDE compareCols, so it must
    // prove which side a row came from
    check("upsert-on-diff", Prop.forAll(kvGen, kvGen) { (t, s) =>
      val tRows = t.distinctBy(_._1).map { case (k, v) => (k, v, "t") }
      val sRows = s.distinctBy(_._1).map { case (k, v) => (k, v, "s") }
      val target = tRows.toDF("k", "v", "meta")
      val stage = sRows.toDF("k", "v", "meta")
      val out = Merge.upsertOnDiffFrame(target, stage, Seq("k"), compareCols = Seq("v"))
        .as[(Int, Int, String)].collect().toSet
      val tMap = tRows.map(r => r._1 -> r).toMap
      val sMap = sRows.map(r => r._1 -> r).toMap
      val expected = (tMap.keySet ++ sMap.keySet).map { k =>
        (tMap.get(k), sMap.get(k)) match {
          case (Some(tr), Some(sr)) => if (tr._2 == sr._2) tr else sr
          case (Some(tr), None) => tr
          case (None, Some(sr)) => sr
        }
      }
      val once = out == expected
      val again = Merge.upsertOnDiffFrame(
        out.toSeq.toDF("k", "v", "meta"), stage, Seq("k"), compareCols = Seq("v"))
        .as[(Int, Int, String)].collect().toSet
      once && again == expected
    }, n = 10)
  }

  test("uniteByName: row counts add, missing columns null-fill, column union") {
    val colsGen = Gen.someOf("a", "b", "c").suchThat(_.nonEmpty)
    check("union-drift", Prop.forAll(colsGen, colsGen) { (c1, c2) =>
      def mk(cs: Seq[String]) =
        Seq.fill(3)(cs.map(_ => 1)).map {
          case Seq(x) => Tuple1(x); case Seq(x, y) => (x, y); case Seq(x, y, z) => (x, y, z)
        } match {
          case rows: Seq[_] if cs.size == 1 => rows.asInstanceOf[Seq[Tuple1[Int]]].toDF(cs: _*)
          case rows if cs.size == 2 => rows.asInstanceOf[Seq[(Int, Int)]].toDF(cs: _*)
          case rows => rows.asInstanceOf[Seq[(Int, Int, Int)]].toDF(cs: _*)
        }
      val (d1, d2) = (mk(c1.toSeq), mk(c2.toSeq))
      val u = RelationalOps.uniteByName(Seq(d1, d2))
      u.count() == 6 && u.columns.toSet == (c1.toSet ++ c2.toSet)
    }, n = 10)
  }

  test("stringToInt is total: never throws, junk → null, integral strings roundtrip") {
    val strGen = Gen.oneOf(
      Gen.alphaNumStr, Gen.numStr.map(_.take(8)),
      Gen.oneOf("", "nan", "NaN", "Infinity", "-Infinity", "1.5", "-3.9", " 42 "))
    check("string-to-int-total", Prop.forAll(Gen.listOfN(20, strGen)) { ss =>
      val out = CleanOps.stringToInt(ss.toDF("s"), Seq("s")).collect()
      out.length == ss.length // no throw, one row per input
    }, n = 15)
  }

  test("applySchema closure: output schema is exactly the target schema") {
    val schemaGen = Gen.someOf(
      StructField("a", IntegerType), StructField("b", StringType),
      StructField("x", DoubleType), StructField("t", TimestampNTZType)
    ).suchThat(_.nonEmpty).map(fs => StructType(fs.toSeq))
    check("apply-schema-closure", Prop.forAll(schemaGen) { target =>
      val df = Seq(("1", "s", "bad")).toDF("a", "b", "other")
      SchemaOps.applySchema(df, target).schema == target
    }, n = 15)
  }

  test("explode/collect roundtrip preserves the multiset") {
    val arrGen = Gen.listOfN(5, Gen.listOf(Gen.choose(0, 20)).map(_.take(6)))
    check("explode-roundtrip", Prop.forAll(arrGen) { arrs =>
      val df = arrs.zipWithIndex.map { case (a, i) => (i, a) }.toDF("id", "arr")
      val back = df.select(col("id"), explode(col("arr")).as("v"))
        .groupBy("id").agg(sort_array(collect_list(col("v"))).as("arr"))
        .as[(Int, Seq[Int])].collect().toMap
      arrs.zipWithIndex.forall { case (a, i) =>
        back.getOrElse(i, Nil) == a.sorted // empty arrays vanish on explode (inner)
      }
    }, n = 10)
  }

  test("rangeJoin ≡ nested-loop join for arbitrary intervals and bin widths") {
    val pointsGen = Gen.listOfN(12, Gen.choose(-50L, 150L))
    val intervalsGen = Gen.listOfN(6, Gen.zip(Gen.choose(-60L, 140L), Gen.choose(0L, 80L)))
    val bwGen = Gen.oneOf(1L, 3L, 17L, 64L, 1000L)
    check("range-join", Prop.forAll(pointsGen, intervalsGen, bwGen) { (ps, ivs, bw) =>
      val points = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
      val intervals = ivs.zipWithIndex.map { case ((lo, len), i) => (i.toLong, lo, lo + len) }
        .toDF("iid", "lo", "hi")
      val naive = points.crossJoin(intervals)
        .where(col("p") >= col("lo") && col("p") <= col("hi"))
        .select("pid", "iid").collect().map(_.toString).sorted.toSeq
      val binned = RelationalOps.rangeJoin(points, intervals, "p", "lo", "hi", bw)
        .select("pid", "iid").collect().map(_.toString).sorted.toSeq
      binned == naive
    }, n = 10)
  }

  test("asofJoin ≡ per-row latest-at-or-before scan for arbitrary event sets") {
    def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val sideGen = Gen.listOfN(10, Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 30L)))
    check("asof-join", Prop.forAll(sideGen, sideGen) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, m), i) => (i.toLong, s"k$k", ts(m)) }
        .toDF("id", "k", "ts")
      // unique (k, ts) on the right per the operator's determinism contract
      val rRows = rs.distinctBy(t => (t._1, t._2))
        .zipWithIndex.map { case ((k, m), i) => (s"k$k", ts(m), i * 1.5) }
      val right = rRows.toDF("k", "ts", "v")
      val out = RelationalOps.asofJoin(left, right, Seq("k"), "ts", Seq("v"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      ls.zipWithIndex.forall { case ((k, m), i) =>
        val expected = rRows.filter(r => r._1 == s"k$k" && !r._2.after(ts(m)))
          .sortBy(_._2.getTime).lastOption.map(_._3)
        out(i.toLong) == expected
      }
    }, n = 10)
  }

  test("hashSplit covers every row with a declared label, independent of layout") {
    val idsGen = Gen.listOfN(40, Gen.choose(0L, 100000L))
    check("hash-split", Prop.forAll(idsGen) { ids =>
      val df = ids.distinct.toDF("id")
      val out = graft.training.TrainingOps.hashSplit(df, "id",
        Seq(("a", 0.5), ("b", 0.3), ("c", 0.2)))
      val labels = out.select("split").collect().map(_.getString(0))
      labels.length == ids.distinct.length && labels.forall(Set("a", "b", "c"))
    }, n = 10)
  }

  test("chunkDocuments reconstructs the document: head chunk + each tail chunk's non-overlap suffix") {
    // the stop rule (no chunk starts inside the previous overlap tail)
    // guarantees every tail chunk is LONGER than the overlap, so
    // dropping the first `overlap` words of chunks 1..n and
    // concatenating yields exactly the original word sequence
    val docGen = for {
      n <- Gen.choose(1, 60)
      ws <- Gen.listOfN(n, Gen.choose(0, 9).map(d => s"t$d"))
    } yield ws.mkString(" ")
    val cfgGen = for {
      cw <- Gen.choose(2, 12)
      ov <- Gen.choose(0, cw - 1)
    } yield (cw, ov)
    check("chunk-reconstruct", Prop.forAll(Gen.listOfN(5, docGen), cfgGen) {
      case (docs, (cw, ov)) =>
        val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        val chunks = graft.text.TextOps.chunkDocuments(df, "id", "text", cw, ov)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
          .groupBy(_._1)
        docs.zipWithIndex.forall { case (t, i) =>
          val cs = chunks(i.toLong).sortBy(_._2)
          val rebuilt = cs.head._3.split(" ").toSeq ++
            cs.tail.toSeq.flatMap(c => c._3.split(" ").drop(ov).toSeq)
          rebuilt == t.split("\\s+").toSeq &&
            cs.forall(c => c._4 == c._3.split(" ").length) &&
            cs.tail.forall(c => c._4 > ov)
        }
    }, n = 15)
  }
}
