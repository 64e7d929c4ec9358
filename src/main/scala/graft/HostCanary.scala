package graft

/** Fixed host-speed microbenchmark — the drift-adjudication canary
  * (r15 verdict #2). Every `regressed?` adjudication so far has ended
  * at "host drift", proven by an EXPENSIVE archival-binary A/B (r15
  * burned three binaries × spawns on q_pagerank/q_label_prop; memory:
  * same-day host swings of 25–35% are normal on this VM). The canary
  * makes host speed a MEASURED input instead: a pure-CPU + parquet-
  * bytes workload with zero dependence on engine code, run
  *
  *   - at FLOOR-SETTLE time ([[Scratch]] records it as
  *     `"__host_canary_sec"` inside `floors.json`), and
  *   - at BENCH time ([[Bench]] records `host_canary_sec` and
  *     `host_factor` = now/floor in `bench_detail.json`),
  *
  * so the drift cascade can scale a floor by how much slower the host
  * measurably is TODAY than when the floor was settled, and label the
  * gap `suite-noise(host)` without any archival build.
  *
  * Workload (all deterministic, result consumed so nothing folds away):
  *   1. single-core: 40M splitmix64 mixes — scalar ALU speed;
  *   2. 16-way parallel: the same loop on 16 threads — core
  *      AVAILABILITY under co-tenant load, which single-core misses;
  *   3. parquet bytes: first 32 MiB of the biggest table file XOR-
  *      folded through a heap buffer — page-cache/memcpy bandwidth.
  * Each part is min-of-reps (reps chosen so the whole canary costs
  * ~1.5 s); the published figure is the SUM of the three mins.
  */
object HostCanary {

  @volatile private var sink: Long = 0L // defeats dead-code elimination

  private def mix(iters: Int): Long = {
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < iters) {
      x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
      x ^= x >>> 27; x *= 0x94D049BB133111EBL
      x ^= x >>> 31; x += 0x9E3779B97F4A7C15L
      i += 1
    }
    x
  }

  private def timed(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  private def cpu1Rep(): Double = timed { sink = mix(40000000) }

  private def cpuNRep(threads: Int = 16): Double = timed {
    val ts = (1 to threads).map { _ =>
      val t = new Thread(() => { sink = mix(40000000) })
      t.start(); t
    }
    ts.foreach(_.join())
  }

  /** XOR-fold the first ≤32 MiB of the largest `*.parquet` under
    * `sfDir` (a directory-style table's own part files included). */
  private def ioRep(sfDir: String): Double = {
    val root = new java.io.File(sfDir)
    def parquets(f: java.io.File): Seq[java.io.File] =
      if (f.isFile) { if (f.getName.endsWith(".parquet")) Seq(f) else Nil }
      else Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
        .flatMap(parquets)
    val target = parquets(root).sortBy(-_.length()).headOption
    timed {
      target.foreach { f =>
        val ch = java.nio.channels.FileChannel.open(f.toPath,
          java.nio.file.StandardOpenOption.READ)
        try {
          val buf = java.nio.ByteBuffer.allocate(1 << 20)
          var acc = 0L
          var read = 0L
          val cap = 32L << 20
          var n = ch.read(buf)
          while (n > 0 && read < cap) {
            read += n
            buf.flip()
            while (buf.remaining() >= 8) acc ^= buf.getLong()
            buf.clear()
            n = ch.read(buf)
          }
          sink = acc
        } finally ch.close()
      }
    }
  }

  /** QUICK in-suite host sample (r16 verdict #2): one cpu1 + one
    * cpu16 rep, ~0.4 s — cheap enough to interleave through a bench
    * suite. NOT comparable to [[sec]] (different reps, no io leg):
    * compare quick samples only against OTHER quick samples from the
    * same process (the bench records one at open and a strip across
    * the suite, and publishes the ratios). Rationale: the open/
    * adjudication canaries measure two INSTANTS, but the r16-class
    * warm-suite inflation (in-suite warm ~2× the same-session
    * isolated figure, unreproducible on a quiet host under the exact
    * same query sequence at any heap size — `graft.SuiteEffect`) is
    * consistent only with load that comes and goes DURING the
    * minutes-long suite window; this strip is the per-run witness
    * that names it with data instead of inference. */
  def quick(): Double = cpu1Rep() + cpuNRep()

  /** The canary figure: Σ of per-part minimums. `sfDir` feeds the
    * parquet leg; a dir with no parquet degrades to CPU-only (still
    * comparable as long as floor-settle and bench use the SAME dir
    * family, which the workflow does — both run on the sf dirs). */
  def sec(sfDir: String): Double = {
    sink = sink ^ 1L // touch
    val c1 = (1 to 5).map(_ => cpu1Rep()).min
    val cn = (1 to 3).map(_ => cpuNRep()).min
    val io = (1 to 3).map(_ => ioRep(sfDir)).min
    System.err.println(
      f"[canary] cpu1 $c1%.3f s  cpu16 $cn%.3f s  io $io%.3f s  -> ${c1 + cn + io}%.3f s")
    c1 + cn + io
  }

  /** floors.json key the floor-time canary is stored under — shaped
    * like a query floor so [[Scratch.writeFloors]]/[[Bench.settledFloors]]
    * carry it unchanged; no real query name starts with `__`. */
  val FloorKey = "__host_canary_sec"

  /** PER-FLOOR canary stamp key (r16 verdict #4): each floor settled
    * by a `GRAFT_SCRATCH_JSON` Scratch run carries the canary of ITS
    * OWN settle window as `__canary_<query>`, so the drift cascade
    * normalizes every floor against the host speed it was actually
    * cut on. Floors from before this schema have no stamp and fall
    * back to the single global [[FloorKey]] (the latest settle's
    * canary) — the pre-r17 approximation, which re-settling any floor
    * now upgrades in place. */
  def floorKeyFor(query: String): String = "__canary_" + query

  /** Bench-time host factor vs the floor-settle canary: >1 = host is
    * measurably SLOWER now than when floors were settled. Capped at
    * 1.6 — the proven drift band is 25–35%, so a canary claiming much
    * more is itself suspect and must not auto-absorb a real
    * regression; below-floor speed never TIGHTENS floors (min 1.0 —
    * floors are minima already). */
  def factor(nowSec: Double, floorSec: Option[Double], cap: Double = 1.6): Double =
    floorSec.filter(_ > 0).fold(1.0)(f => math.min(cap, math.max(1.0, nowSec / f)))
}
