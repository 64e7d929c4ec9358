package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps

/** Randomized STREAMED ≡ BATCH differentials for the streaming tier —
  * the last intricate family without one (r17 verdict #1 → r18 lead).
  * Each incremental pipeline's end-state is replayed against a driver
  * model written straight from its documented semantics (plain-Scala
  * union-find, set-algebra shingle overlap, a 30-line SCD-2 ledger —
  * never calls back into the engine), over random event sequences with
  * key churn, duplicate deliveries, and timestamp collisions, cut at
  * RANDOM batch boundaries (1..n batches per seed). The claim under
  * test is the one each stream's own scaladoc makes: the streamed
  * end-state is bit-identical to the one-shot batch apply, for ANY
  * batch layout, and replaying a batch converges instead of
  * corrupting. The layouts sweep drives the exposed per-epoch bodies
  * (`processScd2Epoch` etc. — the `processIndexedDedupEpoch` pattern,
  * deterministic and stream-machinery-free); one MemoryStream run per
  * family then proves the real streamed path WITH a mid-stream
  * restart lands on the same end-state.
  */
class StreamingPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Cut `xs` into `n` slices at random boundaries (empty slices
    * allowed — they exercise the empty-batch guards). Order preserved:
    * a stream never reorders across micro-batches. */
  private def cut[T](xs: Seq[T], n: Int, rnd: scala.util.Random): Seq[Seq[T]] = {
    if (n <= 1) Seq(xs)
    else {
      val bounds = (Seq.fill(n - 1)(rnd.nextInt(xs.size + 1)).sorted :+ xs.size)
        .scanLeft(0)((_, b) => b).sliding(2).toSeq
      bounds.map { case Seq(a, b) => xs.slice(a, b) }
    }
  }

  // ------------------------------------------------------------- scd2Stream

  private case class Ev(k: String, ts: String, v: Int)
  private case class Ver(k: String, v: Int, from: String, to: Option[String],
                         cur: Boolean)

  /** Random churn sequence: ts nondecreasing (the scd2Stream load-order
    * contract), COLLIDING across events (increment 0 or 1 minute), the
    * value a pure function of (key, ts) so colliding deliveries of one
    * key are identical rows, and ~15% adjacent duplicate re-deliveries
    * (which random cuts then push across batch boundaries). */
  private def churn(rnd: scala.util.Random, nKeys: Int, n: Int): Seq[Ev] = {
    var minute = 0
    val out = scala.collection.mutable.ArrayBuffer[Ev]()
    while (out.size < n) {
      minute += rnd.nextInt(2)
      val k = s"k${rnd.nextInt(nKeys)}"
      out += Ev(k, f"2024-01-01 00:$minute%02d:00", (k.hashCode.abs + minute * 3) % 4)
      if (rnd.nextDouble() < 0.15) out += out.last
    }
    out.toSeq
  }

  /** The SCD-2 ledger re-derived in plain Scala from scd2Apply's doc:
    * per nonempty batch, latest-per-key becomes the stage, loadTs is
    * the batch max ts, new keys open, changed keys close-and-open,
    * unchanged pass untouched. */
  private def scd2Model(batches: Seq[Seq[Ev]]): Seq[Ver] = {
    val hist = scala.collection.mutable.ArrayBuffer[Ver]()
    for (b <- batches if b.nonEmpty) {
      val loadTs = b.map(_.ts).max
      val latest = b.groupBy(_.k).values.map(_.maxBy(_.ts))
      for (e <- latest) {
        hist.indices.find(i => hist(i).k == e.k && hist(i).cur) match {
          case None => hist += Ver(e.k, e.v, loadTs, None, cur = true)
          case Some(i) if hist(i).v != e.v =>
            hist(i) = hist(i).copy(to = Some(loadTs), cur = false)
            hist += Ver(e.k, e.v, loadTs, None, cur = true)
          case _ => ()
        }
      }
    }
    hist.toSeq
  }

  private def evDf(b: Seq[Ev]): DataFrame =
    b.map(e => (e.k, e.ts, e.v)).toDF("k", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))

  private def readDim(dir: String): Seq[Ver] = {
    val df = graft.merge.Merge.readTarget(spark, dir)
    // type-level assert, not Row.toString (r17 verdict #6): the SCD
    // bookkeeping must stay NTZ timestamps + boolean across every layout
    assert(df.schema("valid_from").dataType.typeName == "timestamp_ntz")
    assert(df.schema("valid_to").dataType.typeName == "timestamp_ntz")
    assert(df.schema("is_current").dataType.typeName == "boolean")
    df.select(col("k"), col("v"), col("valid_from").cast("string"),
        col("valid_to").cast("string"), col("is_current"))
      .as[(String, Int, String, Option[String], Boolean)].collect().toSeq
      .map(t => Ver(t._1, t._2, t._3, t._4, t._5))
  }

  private def canon(vs: Seq[Ver]): Seq[Ver] = vs.sortBy(_.toString)

  test("scd2Stream ≡ driver SCD-2 ledger over random churn × random batch layouts; replay idempotent") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(18000 + seed)
      val evs = churn(rnd, nKeys = 6, n = 40)
      val layouts = Seq(1, 2 + rnd.nextInt(2), 4 + rnd.nextInt(2))
      for ((nB, li) <- layouts.zipWithIndex) {
        val dim = tempDir(s"graft_sprop_scd2_${seed}_$li")
        val batches = cut(evs, nB, rnd)
        batches.foreach(b => StreamingOps.processScd2Epoch(evDf(b), dim, Seq("k"), "ts"))
        val want = canon(scd2Model(batches))
        assert(canon(readDim(dim)) == want, s"seed=$seed layout=$nB")
        // exactly one open version per key, ever (the non-overlap root)
        val open = readDim(dim).filter(_.cur).groupBy(_.k).values.map(_.size)
        assert(open.forall(_ == 1), s"seed=$seed layout=$nB open-version dup")
        // replay the last nonempty batch: scd2Apply's algebraic
        // idempotency claim — the dimension must be bit-identical
        batches.reverse.find(_.nonEmpty).foreach { b =>
          StreamingOps.processScd2Epoch(evDf(b), dim, Seq("k"), "ts")
          assert(canon(readDim(dim)) == want, s"seed=$seed layout=$nB replay drift")
        }
      }
    }
  }

  test("scd2Stream current snapshot is layout-invariant and equals latest-per-key of the raw events") {
    for (seed <- 6 to 8) {
      val rnd = new scala.util.Random(18100 + seed)
      val evs = churn(rnd, nKeys = 5, n = 30)
      val wantCur = evs.groupBy(_.k).view.mapValues(_.maxBy(_.ts).v).toMap
      for ((nB, li) <- Seq(1, 3).zipWithIndex) {
        val dim = tempDir(s"graft_sprop_scd2cur_${seed}_$li")
        cut(evs, nB, rnd).foreach(b =>
          StreamingOps.processScd2Epoch(evDf(b), dim, Seq("k"), "ts"))
        val got = readDim(dim).filter(_.cur).map(v => v.k -> v.v).toMap
        assert(got == wantCur, s"seed=$seed layout=$nB")
      }
    }
  }

  test("scd2 out-of-order guard end-to-end: a dup re-delivered AFTER an intervening change fails loudly, dimension untouched") {
    // the churn generator injects duplicates only ADJACENT to their
    // originals (its own note) — random cuts can split them across
    // batch boundaries but never land one AFTER an intervening change
    // of the same key. This directed case pins exactly that delivery:
    // k0 changes 1→2, then the OLD (ts1, v=1) row arrives alone in a
    // later epoch — its loadTs predates the open version's valid_from,
    // so scd2Apply's in-plan raise_error must surface through
    // processScd2Epoch with the documented message, and the failed
    // epoch must leave the at-rest dimension byte-identical (the
    // atomic-swap write never commits).
    val dim = tempDir("graft_sprop_scd2_ooo")
    StreamingOps.processScd2Epoch(
      evDf(Seq(Ev("k0", "2024-01-01 00:01:00", 1))), dim, Seq("k"), "ts")
    StreamingOps.processScd2Epoch(
      evDf(Seq(Ev("k0", "2024-01-01 00:05:00", 2))), dim, Seq("k"), "ts")
    val before = canon(readDim(dim))
    val e = intercept[Throwable] {
      StreamingOps.processScd2Epoch(
        evDf(Seq(Ev("k0", "2024-01-01 00:01:00", 1))), dim, Seq("k"), "ts")
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("out-of-order/replayed stage"),
      s"guard message missing from failure chain:\n$msgs")
    assert(canon(readDim(dim)) == before, "failed epoch mutated the dimension")
    // the idempotent sibling: re-delivering the CURRENT version (same
    // ts, same value) is the documented no-op — loadTs == valid_from
    // never trips the guard, content is unchanged
    StreamingOps.processScd2Epoch(
      evDf(Seq(Ev("k0", "2024-01-01 00:05:00", 2))), dim, Seq("k"), "ts")
    assert(canon(readDim(dim)) == before)
  }

  // --------------------------------------------------------- decontamStream

  private def mkDocs(rnd: scala.util.Random, vocab: IndexedSeq[String],
                     bench: Seq[String], n: Int): Seq[(Long, String)] =
    (0L until n).map { id =>
      val len = 5 + rnd.nextInt(16) // some < 8 tokens → zero shingles → clean
      val base = Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
      val words =
        if (rnd.nextDouble() < 0.3 && len >= 8) {
          val src = bench(rnd.nextInt(bench.size)).split(" ")
          val off = rnd.nextInt(src.length - 7)
          val at = rnd.nextInt(len - 7)
          base.patch(at, src.slice(off, off + 8), 8)
        } else base
      (id, words.mkString(" "))
    }

  private def shingles8(text: String): Set[String] = {
    val w = text.split(" ")
    if (w.length < 8) Set.empty else w.sliding(8).map(_.mkString(" ")).toSet
  }

  test("decontamStream clean set ≡ driver shingle model ≡ exact batch check, over random layouts incl. a restart") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(18200 + seed)
      val vocab = (0 until 40).map(i => s"w$i")
      val bench = Seq.fill(3)(Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val docs = mkDocs(rnd, vocab, bench, 30)
      val benchSh = bench.flatMap(shingles8).toSet
      val wantClean = docs.filter(d => shingles8(d._2).intersect(benchSh).isEmpty)
        .map(_._1).toSet
      val base = tempDir(s"graft_sprop_dec_$seed")
      val benchDf = bench.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      graft.dedup.DedupOps.benchmarkShingleBloom(benchDf, "text", s"$base/bloom", "suite")
      // the engine's own one-shot exact apply agrees with the model first
      val exact = graft.dedup.DedupOps.contaminationCheck(
          docs.toDF("doc_id", "text"), benchDf, "doc_id", "text", 8)
        .where(col("n_contaminated") === 0)
        .select("doc_id").as[Long].collect().toSet
      assert(exact == wantClean, s"seed=$seed exact-vs-model")
      for ((nB, li) <- Seq(1, 2 + rnd.nextInt(2), 4).zipWithIndex) {
        val out = s"$base/out$li"
        cut(docs, nB, rnd).zipWithIndex.foreach { case (b, e) =>
          StreamingOps.processDecontamEpoch(b.toDF("doc_id", "text"), e.toLong,
            s"$base/bloom", benchDf, out, "doc_id", "text")
        }
        val got = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
        assert(got == wantClean, s"seed=$seed layout=$nB")
        // replay an epoch: own-tranche overwrite must converge
        StreamingOps.processDecontamEpoch(
          cut(docs, nB, rnd).head.toDF("doc_id", "text"), 0L,
          s"$base/bloom", benchDf, out, "doc_id", "text")
        assert(spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
          .subsetOf(wantClean), s"seed=$seed layout=$nB replay")
      }
    }
  }

  // -------------------------------------------------------- groupIndexStream

  /** Plain union-find (path-halving), independent of the engine's
    * star-contraction and of its driver-tier localComponents. */
  private def dsuComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) { parent(r) = parent.getOrElse(parent(r), parent(r)); r = parent(r) }
      r
    }
    val real = edges.filter(e => e._1 != e._2)
    for ((a, b) <- real) {
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = real.flatMap(e => Seq(e._1, e._2)).distinct
    val groups = nodes.groupBy(find)
    groups.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }
  }

  private def readAssign(dir: String): Map[Long, Long] =
    graft.graph.GraphOps.readGroupIndex(spark, dir)
      .as[(Long, Long)].collect().toMap

  test("groupIndexStream converges to the batch CC build for any batch layout; replayed batches no-op") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(18300 + seed)
      val edges = Seq.fill(50)((rnd.nextInt(20).toLong,
        if (rnd.nextDouble() < 0.1) rnd.nextInt(20).toLong else rnd.nextInt(20).toLong))
      val want = dsuComponents(edges)
      // the engine's one-shot batch build agrees with the model first
      val batchCc = graft.graph.GraphOps.connectedComponents(
          edges.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long)].collect().toMap
      assert(batchCc == want, s"seed=$seed batch-vs-model")
      for ((nB, li) <- Seq(1, 2 + rnd.nextInt(3), 5).zipWithIndex) {
        val dir = tempDir(s"graft_sprop_cc_${seed}_$li")
        val batches = cut(edges, nB, rnd).filter(_.nonEmpty)
        batches.foreach(b => graft.graph.GraphOps.updateGroupIndex(
          spark, dir, b.toDF("src", "dst"), "src", "dst"))
        assert(readAssign(dir) == want, s"seed=$seed layout=$nB")
        // replay the last batch: fixpoint-of-fixpoint algebra
        batches.lastOption.foreach { b =>
          graft.graph.GraphOps.updateGroupIndex(
            spark, dir, b.toDF("src", "dst"), "src", "dst")
          assert(readAssign(dir) == want, s"seed=$seed layout=$nB replay")
        }
      }
    }
  }

  test("groupIndexStream distributed tier (localThreshold=0): warm-started epochs still land on the batch fixpoint") {
    val rnd = new scala.util.Random(18350)
    val edges = Seq.fill(40)((rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
    val want = dsuComponents(edges)
    val dir = tempDir("graft_sprop_ccdist")
    cut(edges, 2, rnd).filter(_.nonEmpty).foreach(b =>
      graft.graph.GraphOps.updateGroupIndex(spark, dir, b.toDF("src", "dst"),
        "src", "dst", localThreshold = 0))
    assert(readAssign(dir) == want)
  }

  // ----------------------------------------------------- sketch/hist streams

  test("sketchStream register state ≡ batch hllSketch for any layout, across replay and consolidation") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(18400 + seed)
      val keys = Seq.fill(200)(rnd.nextInt(60).toLong)
      val wantRegs = graft.profile.Sketches.hllSketch(keys.toDF("k"), "k")
        .as[(Int, Int)].collect().toSet
      for ((nB, li) <- Seq(1, 3, 6).zipWithIndex) {
        val dir = tempDir(s"graft_sprop_hll_${seed}_$li")
        val batches = cut(keys, nB, rnd)
        batches.zipWithIndex.foreach { case (b, e) =>
          graft.profile.Sketches.writeSketchTranche(
            graft.profile.Sketches.hllSketch(b.toDF("k"), "k"), dir, e.toString)
          // consolidate mid-stream on one layout: max algebra, no manifest
          if (li == 2 && e == 2)
            graft.profile.Sketches.consolidateSketch(spark, dir)
        }
        // replay epoch 0 (own-tranche overwrite; redundant after a fold)
        graft.profile.Sketches.writeSketchTranche(
          graft.profile.Sketches.hllSketch(batches.head.toDF("k"), "k"), dir, "0")
        val got = graft.profile.Sketches.readSketch(spark, dir)
          .as[(Int, Int)].collect().toSet
        assert(got == wantRegs, s"seed=$seed layout=$nB")
      }
    }
  }

  // ------------------------------------------- real streamed paths + restart

  test("scd2Stream over MemoryStream with a mid-stream restart ≡ driver ledger of the delivered batches") {
    val rnd = new scala.util.Random(18500)
    val evs = churn(rnd, nKeys = 5, n = 24)
    val (b1, b2) = evs.splitAt(12)
    val base = tempDir("graft_sprop_scd2_stream")
    val dim = s"$base/dim"; val ck = s"$base/ck"
    val mem = MemoryStream[(String, String, Int)](spark, 1)
    val src = mem.toDF.toDF("k", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val q1 = StreamingOps.scd2Stream(src, dim, Seq("k"), "ts", ck)
    try {
      mem.addData(b1.map(e => (e.k, e.ts, e.v)): _*)
      q1.processAllAvailable()
    } finally q1.stop()
    // mid-stream restart: a NEW query on the same checkpoint resumes at
    // the committed offset — b1 is never re-applied, b2 arrives fresh
    val q2 = StreamingOps.scd2Stream(src, dim, Seq("k"), "ts", ck)
    try {
      mem.addData(b2.map(e => (e.k, e.ts, e.v)): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(canon(readDim(dim)) == canon(scd2Model(Seq(b1, b2))))
  }

  test("decontamStream over MemoryStream with a mid-stream restart emits exactly the model's clean set") {
    val rnd = new scala.util.Random(18510)
    val vocab = (0 until 40).map(i => s"w$i")
    val bench = Seq.fill(3)(Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val docs = mkDocs(rnd, vocab, bench, 24)
    val benchSh = bench.flatMap(shingles8).toSet
    val want = docs.filter(d => shingles8(d._2).intersect(benchSh).isEmpty).map(_._1).toSet
    val base = tempDir("graft_sprop_dec_stream")
    val benchDf = bench.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    graft.dedup.DedupOps.benchmarkShingleBloom(benchDf, "text", s"$base/bloom", "suite")
    val (d1, d2) = docs.splitAt(12)
    val mem = MemoryStream[(Long, String)](spark, 1)
    val src = mem.toDF.toDF("doc_id", "text")
    val q1 = StreamingOps.decontamStream(src, s"$base/bloom", benchDf,
      s"$base/out", "doc_id", "text", s"$base/ck")
    try { mem.addData(d1: _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = StreamingOps.decontamStream(src, s"$base/bloom", benchDf,
      s"$base/out", "doc_id", "text", s"$base/ck")
    try { mem.addData(d2: _*); q2.processAllAvailable() } finally q2.stop()
    val got = spark.read.parquet(s"$base/out").select("doc_id").as[Long].collect().toSet
    assert(got == want)
  }

  // ------------------------------------------ sum-algebra tranche families

  test("sigmaStatsStream artifact ≡ driver fixed-point model ≡ one-shot statsSketch, any layout + fold + replay") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(18600 + seed)
      // values with >4 decimal digits (snapping exercised), nulls, and
      // one unsnappable magnitude (DECIMAL(18,4) overflow -> excluded)
      val rows: Seq[(String, Option[Double])] = (0 until 60).map { i =>
        val k = s"g${rnd.nextInt(4)}"
        val v = rnd.nextInt(10) match {
          case 0 => None
          case 1 => Some(9.9e15)
          case _ => Some((rnd.nextInt(2000001) - 1000000) / 97.0)
        }
        (k, v)
      }
      // the driver ledger: HALF_UP snap to 1e-4 fixed point, exact
      // BigInt sums, null/unsnappable excluded from n, S and Q alike
      val model = rows.groupBy(_._1).map { case (k, ks) =>
        val snapped = ks.flatMap(_._2).flatMap { v =>
          // DECIMAL(18,4): unscaled magnitude must fit 18 digits —
          // beyond it the engine's snap overflows to null (excluded)
          val u = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP) * 10000
          if (u.abs >= BigDecimal(10).pow(18)) None else Some(u.toBigInt)
        }
        k -> (BigInt(snapped.size), snapped.sum, snapped.map(x => x * x).sum)
      }
      val df = rows.toDF("k", "v").withColumn("v", col("v").cast("double"))
      val ops = graft.analytics.AnomalyOps
      def statsMap(stats: DataFrame): Map[(String, String), BigInt] =
        stats.select(col("k"), col("stat"), col("val").cast("string"))
          .as[(String, String, String)].collect()
          .map { case (k, s, v) => (k, s) -> BigInt(v) }.toMap
      val oneShot = statsMap(ops.statsSketch(df, "k", "v"))
      model.foreach { case (k, (n, s, q)) =>
        assert(oneShot((k, "n")) == n && oneShot((k, "s")) == s &&
          oneShot((k, "q")) == q, s"seed=$seed key=$k one-shot-vs-model")
      }
      for ((nB, li) <- Seq(1, 4).zipWithIndex) {
        val dir = tempDir(s"graft_sprop_stats_${seed}_$li")
        val batches = cut(rows, nB, rnd)
        batches.zipWithIndex.foreach { case (b, e) =>
          ops.writeStatsTranche(ops.statsSketch(
            b.toDF("k", "v").withColumn("v", col("v").cast("double")), "k", "v"),
            dir, e.toString)
          if (li == 1 && e == 1) ops.consolidateStats(spark, dir, "k")
        }
        // replay epoch 0 after the fold: own-tranche overwrite converges
        ops.writeStatsTranche(ops.statsSketch(
          batches.head.toDF("k", "v").withColumn("v", col("v").cast("double")),
          "k", "v"), dir, "0")
        assert(statsMap(ops.readStats(spark, dir, "k")) == oneShot,
          s"seed=$seed layout=$nB")
      }
    }
  }

  test("histStream artifact ≡ one-shot histSketch for any layout (bucket-sum algebra) + replay") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(18700 + seed)
      val vals = Seq.fill(200)((rnd.nextGaussian() * 1000).round / 10.0 *
        (if (rnd.nextBoolean()) 1 else -1))
      val hs = graft.profile.HistSketch
      val want = hs.histSketch(vals.toDF("v"), "v")
        .as[(Long, Long)].collect().toMap
      for ((nB, li) <- Seq(2, 5).zipWithIndex) {
        val dir = tempDir(s"graft_sprop_hist_${seed}_$li")
        val batches = cut(vals, nB, rnd)
        batches.zipWithIndex.foreach { case (b, e) =>
          hs.writeHistTranche(hs.histSketch(b.toDF("v"), "v"), dir, e.toString)
        }
        hs.writeHistTranche(hs.histSketch(batches.head.toDF("v"), "v"), dir, "0")
        val got = hs.readHist(spark, dir).as[(Long, Long)].collect().toMap
        assert(got == want, s"seed=$seed layout=$nB")
      }
    }
  }

  test("coocStream artifact lift ≡ one-shot coOccurrenceLift when epochs partition the groups") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(18800 + seed)
      val rows = (0 until 120).map { _ =>
        (s"grp${rnd.nextInt(12)}", s"item${rnd.nextInt(8)}")
      }
      val go = graft.graph.GraphOps
      def liftSet(df: DataFrame): Set[(String, String, Long, Double)] =
        df.select(col("item_a"), col("item_b"), col("n_groups"), col("lift"))
          .as[(String, String, Long, Double)].collect().toSet
      val want = liftSet(go.coOccurrenceLift(rows.toDF("g", "i"), "g", "i"))
      for ((nE, li) <- Seq(1, 3).zipWithIndex) {
        // the artifact CONTRACT: a group arrives wholly inside one
        // epoch — partition GROUPS across epochs, not rows
        val groupOf = rows.map(_._1).distinct
          .map(g => g -> rnd.nextInt(nE)).toMap
        val dir = tempDir(s"graft_sprop_cooc_${seed}_$li")
        (0 until nE).foreach { e =>
          val slice = rows.filter(r => groupOf(r._1) == e)
          if (slice.nonEmpty)
            go.writeCoocTranche(slice.toDF("g", "i"), "g", "i", dir, e.toString)
        }
        assert(liftSet(go.coocLiftFromIndex(spark, dir)) == want,
          s"seed=$seed epochs=$nE")
      }
    }
  }

  test("day-keyed stream artifacts (mix / HLL / centroid): rolling gauges from the index ≡ in-run gauges, days split across epochs") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(19000 + seed)
      // events across 6 days, ROW-level random cuts so days routinely
      // split across epochs — the per-(day,key) sum / register-max
      // claim each artifact's doc makes
      val rows = Seq.fill(150)((
        f"2024-02-${1 + rnd.nextInt(6)}%02d ${rnd.nextInt(24)}%02d:00:00",
        s"u${rnd.nextInt(25)}",
        // ~1/20 vectors carry one WILD component (r19 ANSI audit:
        // beyond the 1e6-scale long snap — excluded from that dim's
        // sum on BOTH the tranche and in-run paths, job never dies)
        Array.fill(4)((rnd.nextInt(2001) - 1000) / 1000.0f) match {
          case a => if (rnd.nextInt(20) == 0) a.updated(rnd.nextInt(4), 9.9e15f) else a
        }))
      def df(xs: Seq[(String, String, Array[Float])]) =
        xs.toDF("ts", "k", "vec").withColumn("ts", col("ts").cast("timestamp_ntz"))
      val all = df(rows)
      val nB = 2 + rnd.nextInt(3)
      val base = tempDir(s"graft_sprop_day_$seed")
      cut(rows, nB, rnd).zipWithIndex.foreach { case (b, e) =>
        graft.text.TextOps.writeDayMixTranche(df(b), "k", "ts", s"$base/mix", e.toString)
        graft.profile.Sketches.writeDayHllTranche(df(b), "k", "ts", s"$base/hll", e.toString)
        graft.similarity.SimilarityOps.writeCentroidTranche(df(b), "vec", "ts",
          s"$base/cen", e.toString)
      }
      assertSameRows(
        graft.text.TextOps.jsRollingFromIndex(spark, s"$base/mix", 3),
        graft.text.TextOps.jsRollingDivergence(all, "k", "ts", 3))
      assertSameRows(
        graft.profile.Sketches.hllRollingFromIndex(spark, s"$base/hll", 3),
        graft.profile.Sketches.hllRollingEstimate(all, "k", "ts", 3))
      assertSameRows(
        graft.similarity.SimilarityOps.centroidRollingFromIndex(spark, s"$base/cen", 3),
        graft.similarity.SimilarityOps.centroidRollingDrift(all, "vec", "ts", 3))
    }
  }

  // -------------------------------- indexedDedupStream layout-aware model

  test("indexedDedupStream exact tier ≡ driver jaccard/fingerprint ledger over random layouts") {
    // vocabulary + controlled mutations: exact re-crawls differ only in
    // case/whitespace (fingerprint normalizes), near-dups substitute one
    // middle word of a 12-word doc (J = 7/13 over 3-gram shingles — well
    // off the 0.5 threshold boundary in both directions)
    def norm(t: String) = t.toLowerCase.trim.replaceAll("\\s+", " ")
    def sh3(t: String): Set[String] = {
      val w = norm(t).split(" ")
      if (w.length < 3) Set.empty else w.sliding(3).map(_.mkString(" ")).toSet
    }
    def jac(a: Set[String], b: Set[String]): Double =
      if (a.isEmpty || b.isEmpty) 0.0
      else a.intersect(b).size.toDouble / a.union(b).size
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(18900 + seed)
      val vocab = (0 until 60).map(i => s"t$i")
      def freshDoc() = Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val seedDocs = Seq((1L, freshDoc()), (2L, freshDoc()))
      // arrival sequence: fresh docs, near-dup mutations of a random
      // EARLIER doc (incl. the index seeds), exact re-crawls with
      // case/whitespace drift
      val arrivals = scala.collection.mutable.ArrayBuffer[(Long, String)]()
      var id = 10L
      while (arrivals.size < 18) {
        val pool = seedDocs ++ arrivals
        val r = rnd.nextInt(10)
        val text =
          if (r < 5 || pool.isEmpty) freshDoc()
          else if (r < 8) { // near-dup: swap one middle word
            val w = norm(pool(rnd.nextInt(pool.size))._2).split(" ").toSeq
            w.updated(5, vocab(rnd.nextInt(vocab.size))).mkString(" ")
          } else { // exact re-crawl with surface drift
            val t = pool(rnd.nextInt(pool.size))._2
            "  " + t.toUpperCase.replace(" ", "   ")
          }
        arrivals += ((id, text)); id += 1
      }
      for ((nB, li) <- Seq(1, 3).zipWithIndex) {
        val base = tempDir(s"graft_sprop_idx_${seed}_$li")
        val idx = s"$base/idx"; val out = s"$base/out"
        graft.dedup.DedupOps.writeDedupIndex(seedDocs.toDF("doc_id", "text"),
          idx, "doc_id", "text")
        // the driver ledger mirrors the epoch structure: survivors are
        // judged against the index AT EPOCH START (within-batch dups
        // both survive — the documented history-only contract), then
        // every survivor joins the index
        var index = seedDocs.toVector
        val expected = scala.collection.mutable.Set[Long]()
        val batches = cut(arrivals.toSeq, nB, rnd)
        // quietStorageLogs: per-epoch handle releases race in-flight
        // block fetches (benign, recovered) — keep real errors visible
        for ((b, e) <- batches.zipWithIndex) quietStorageLogs {
          val survivors = b.filter { case (_, t) =>
            !index.exists(h => norm(h._2) == norm(t)) &&
              !index.exists(h => jac(sh3(t), sh3(h._2)) >= 0.5)
          }
          expected ++= survivors.map(_._1)
          index ++= survivors
          StreamingOps.processIndexedDedupEpoch(
            b.toDF("doc_id", "text"), e.toLong, idx, out, "doc_id", "text")
        }
        val got = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
        assert(got == expected.toSet, s"seed=$seed layout=$nB")
      }
    }
  }

  test("groupIndexStream over MemoryStream with a mid-stream restart converges to the batch CC build") {
    val rnd = new scala.util.Random(18520)
    val edges = Seq.fill(40)((rnd.nextInt(18).toLong, rnd.nextInt(18).toLong))
    val want = dsuComponents(edges)
    val base = tempDir("graft_sprop_cc_stream")
    val (e1, e2) = edges.splitAt(20)
    val mem = MemoryStream[(Long, Long)](spark, 1)
    val src = mem.toDF.toDF("src", "dst")
    val q1 = StreamingOps.groupIndexStream(src, s"$base/idx", "src", "dst", s"$base/ck")
    try { mem.addData(e1: _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = StreamingOps.groupIndexStream(src, s"$base/idx", "src", "dst", s"$base/ck")
    try { mem.addData(e2: _*); q2.processAllAvailable() } finally q2.stop()
    assert(readAssign(s"$base/idx") == want)
  }
}
