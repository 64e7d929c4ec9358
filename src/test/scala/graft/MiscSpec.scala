package graft

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.extract.Extract
import graft.merge.Merge
import graft.meta.MetaOps
import graft.pipeline.Pipeline

class MiscSpec extends SparkSpec {
  import spark.implicits._

  test("partitionKey formats the hive-style path per granularity") {
    val dt = LocalDateTime.of(2024, 3, 7, 5, 9, 2)
    assert(MetaOps.partitionKey(dt) == "year=2024/month=03/day=07/")
    assert(MetaOps.partitionKey(dt, "hour") == "year=2024/month=03/day=07/hour=05/")
    assert(MetaOps.partitionKey(dt, "second") ==
      "year=2024/month=03/day=07/hour=05/minute=09/second=02/")
    intercept[IllegalArgumentException](MetaOps.partitionKey(dt, "week"))
  }

  test("withPartitionColumns derives year/month/day for partitioned writes") {
    val df = Seq(java.sql.Timestamp.valueOf("2024-03-07 05:09:02")).toDF("ts")
    val out = MetaOps.withPartitionColumns(df, "ts")
    assert(out.select("year", "month", "day").as[(String, String, String)].head() ==
      (("2024", "03", "07")))
  }

  test("listFiles: type/size filters, empty-file toggle, unquoted absolute paths") {
    val dir = java.nio.file.Paths.get(tempDir("graft_listing"))
    def touch(name: String, bytes: Int): Unit =
      Files.write(dir.resolve(name), Array.fill[Byte](bytes)(1))
    touch("a.csv", 10)
    touch("b.parquet", 10)
    touch("empty.csv", 0)
    touch("report 2024.csv", 5) // space → %20 in the Hadoop path URI
    val base = dir.toString

    val all = graft.io.Readers.listFiles(spark, base)
    assert(all.size == 4)
    assert(all.forall(_.startsWith("file:")), "paths must be absolute URIs")
    // unquote: the space survives, no %20 leaks to the caller
    assert(all.exists(_.endsWith("report 2024.csv")))
    assert(!all.exists(_.contains("%20")))

    val csvs = graft.io.Readers.listFiles(spark, base, fileType = Some("csv"))
    assert(csvs.size == 3)
    val nonEmpty = graft.io.Readers.listFiles(spark, base, fileType = Some("csv"),
      includeEmpty = false)
    assert(nonEmpty.size == 2 && !nonEmpty.exists(_.contains("empty")))
    val big = graft.io.Readers.listFiles(spark, base, minBytes = 5)
    assert(big.size == 2) // strictly bigger than 5
    assert(graft.io.Readers.listFiles(spark, base, maxFiles = 2).size == 2)
    assert(graft.io.Readers.listFiles(spark, s"$base/missing").isEmpty)
  }

  test("downloadToLocal copies a file byte-identically") {
    val dir = java.nio.file.Paths.get(tempDir("graft_dl"))
    val src = dir.resolve("src.bin")
    Files.write(src, Array[Byte](1, 2, 3, 4, 5))
    val dst = dir.resolve("dst.bin").toString
    val out = graft.io.Readers.downloadToLocal(spark, src.toString, dst)
    assert(java.util.Arrays.equals(
      Files.readAllBytes(java.nio.file.Paths.get(out)), Array[Byte](1, 2, 3, 4, 5)))
  }

  test("rangeBatches slices by contiguous key ranges, covers all rows") {
    val df = spark.range(0, 100).toDF("id")
    val batches = Extract.rangeBatches(df, "id", batchSize = 30).toSeq
    assert(batches.map(_.count()).sum == 100)
    assert(batches.size >= 3)
    assert(Extract.rangeBatches(df.where(lit(false)), "id", 10).isEmpty)
  }

  test("pipeline spec runs source → steps → upsert target as one job") {
    val base = tempDir("graft_pipe")
    val srcDir = s"$base/src"
    val targetDir = s"$base/target"
    Seq((1L, "nan", "2020-01-01 00:00:00"), (2L, "keep", "1700-01-01 00:00:00"))
      .toDF("id", "s", "ts").write.parquet(srcDir)

    val spec = Pipeline.Spec(
      task = "t",
      source = Pipeline.ParquetSource(srcDir, Some(StructType(Seq(
        StructField("id", LongType), StructField("s", StringType),
        StructField("ts", TimestampNTZType))))),
      steps = Seq(
        Pipeline.NanToNull,
        Pipeline.CleanOldDates(Seq("ts")),
        Pipeline.Custom(_.withColumn("doubled", col("id") * 2))),
      target = Pipeline.Target(targetDir, Merge.Upsert(Seq("id"))),
      executionDate = LocalDateTime.of(2024, 1, 1, 0, 0))

    spec.run(spark)
    val out = Merge.readTarget(spark, targetDir)
    assert(out.count() == 2)
    assert(out.columns.contains(MetaOps.FileName)) // META attached
    assert(out.where(col("s") === "nan").count() == 0) // cleaned
    assert(out.where(col("id") === 2).select("ts").head().get(0).toString
      .startsWith("1900-01-01")) // clamped
    assert(out.where(col("id") === 1).select("doubled").as[Long].head() == 2L)

    spec.run(spark) // idempotent re-run (same keys upserted)
    assert(Merge.readTarget(spark, targetDir).count() == 2)
  }

  test("approx group quantiles: same shape as exact, bounded divergence") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val exact = Extract.groupQuantiles(docs, Seq("lang"), "n_chars", Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val approx = Extract.groupQuantilesApprox(docs, Seq("lang"), "n_chars", Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(approx.keySet == exact.keySet)
    // KLL at accuracy 10000 on groups this small lands within a tight
    // relative band of the exact value (it is exact-rank up to 1e-4·n)
    approx.foreach { case (k, v) =>
      assert(math.abs(v - exact(k)) <= math.max(1.0, 0.05 * exact(k)), s"$k: $v vs ${exact(k)}")
    }
  }

  test("sanity: flagship entry returns aggregated rows with META columns") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("revenue") && df.columns.contains(MetaOps.PartitionDate))
  }

  test("Bench.priorWarms parses compact and pretty-printed detail files; corrupt → empty") {
    val dir = java.nio.file.Paths.get(tempDir("graft_priorwarm"))
    def write(name: String, body: String): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p, body.getBytes("UTF-8")); p.toString
    }
    val compact = write("c.json",
      """{"metric":"detail","queries":{"q_a":{"sec":2.5,"warm":1.25,"gc":0.1,"peak_mb":12},""" +
        """"q_b":{"sec":-1,"warm":-1,"gc":0.0,"peak_mb":3},""" +
        """"q_c":{"sec":0.7,"warm":0.5,"gc":0.0,"peak_mb":4,"prior_warm":0.4,"isolated":0.45}}}""")
    val got = graft.Bench.priorWarms(compact)
    assert(got == Map("q_a" -> 1.25, "q_c" -> 0.5))   // failed (-1) excluded
    val pretty = write("p.json",
      """{ "queries": { "q_a": { "sec": 2.5, "warm": 1.25 }, "q_b": { "sec": 1.0, "warm": 0.9 } } }""")
    assert(graft.Bench.priorWarms(pretty) == Map("q_a" -> 1.25, "q_b" -> 0.9))
    assert(graft.Bench.priorWarms(write("x.json", "not json")).isEmpty)
    assert(graft.Bench.priorWarms(dir.resolve("missing.json").toString).isEmpty)
  }

  test("Bench.driftVerdict: floor first, then PRIOR warm — confirmed regressions reachable") {
    import graft.Bench.driftVerdict
    assert(driftVerdict(-1.0, 1.0, Some(0.9)) == "spawn-failed")
    // isolated at/near its settled floor → suite-order noise
    assert(driftVerdict(1.0, 1.0, Some(0.9)) == "suite-noise(floor)")
    // the r13 ADVICE #1 scenario: prior 1.0 s, in-suite warm 2.0 s,
    // isolated 1.9 s, floor 0.9 s — the old `iso <= warm` branch read
    // this as suite-noise; it is a CONFIRMED regression (the fresh-JVM
    // figure itself doubled vs the prior round)
    assert(driftVerdict(1.9, 1.0, Some(0.9)) == "regressed?")
    // isolated back at the prior round's figure → the suite run was hot
    assert(driftVerdict(1.1, 1.0, Some(0.5)) == "suite-noise(prior)")
    // no floor on file: prior comparison still adjudicates both ways
    assert(driftVerdict(1.1, 1.0, None) == "suite-noise(prior)")
    assert(driftVerdict(1.9, 1.0, None) == "regressed?")
  }

  test("Bench.driftVerdict host normalization: measured canary slowdown absorbs exactly its own band (r16)") {
    import graft.Bench.driftVerdict
    // floor 1.493, iso 1.899 (the r15 q_bloom_index shape): 1.27× floor
    // blows the 1.25 bound un-normalized...
    assert(driftVerdict(1.899, 1.529, Some(1.493)) == "regressed?")
    // ...but a canary-measured 1.3× host slowdown explains it
    assert(driftVerdict(1.899, 1.529, Some(1.493), floorHostUp = 1.3) == "suite-noise(host)")
    // a regression LARGER than the measured slowdown still surfaces
    assert(driftVerdict(2.6, 1.529, Some(1.493), floorHostUp = 1.3) == "regressed?")
    // factor 1.0 (host unchanged) reproduces the old cascade bit for bit
    assert(driftVerdict(1.899, 1.529, Some(1.493), floorHostUp = 1.0, priorHostUp = 1.0) == "regressed?")
    // prior-relative leg: no floor on file, prior 1.0, iso 1.45 —
    // above the 1.2 prior bound, inside it once the host is 1.3× slower
    assert(driftVerdict(1.45, 1.0, None) == "regressed?")
    assert(driftVerdict(1.45, 1.0, None, priorHostUp = 1.3) == "suite-noise(host)")
    // floor match wins before any host reasoning (label stability)
    assert(driftVerdict(1.0, 1.0, Some(0.9), floorHostUp = 1.3) == "suite-noise(floor)")
  }

  test("Bench.floorTolOf: per-query tolerance from floors metadata, defaulted and capped (r16)") {
    import graft.Bench.{driftVerdict, floorTolOf}
    val floors = Map("q_mm_dedup_index" -> 1.06, "__tol_q_mm_dedup_index" -> 1.45,
      "__tol_q_wild" -> 9.0, "q_wild" -> 1.0)
    assert(floorTolOf(floors, "q_mm_dedup_index") == 1.45)
    assert(floorTolOf(floors, "q_other") == 1.25)       // default
    assert(floorTolOf(floors, "q_wild") == 1.6)         // capped
    // the r16 close shape: iso 1.486 vs floor 1.06 — regressed? at the
    // default bound, suite-noise under the committed 1.45 tolerance
    assert(driftVerdict(1.486, 1.027, Some(1.06)) == "regressed?")
    assert(driftVerdict(1.486, 1.027, Some(1.06), floorTol = 1.45) == "suite-noise(floor)")
    // a genuine 2x regression still surfaces under the widest cap
    assert(driftVerdict(2.2, 1.027, Some(1.06), floorTol = 1.6) == "regressed?")
  }

  test("Bench.driftVerdict absorb cap: tol x host product clamped below 2x (r16 self-review)") {
    import graft.Bench.{driftVerdict, AbsorbCap}
    assert(AbsorbCap < 2.0)
    // worst committable combination: tol 1.6 x host 1.6 = 2.56 un-capped.
    // A genuine 2x regression (iso = 2.0 x floor) MUST stay regressed?
    assert(driftVerdict(2.0, 0.9, Some(1.0), floorHostUp = 1.6, floorTol = 1.6)
      == "regressed?")
    // ...while 1.85x (inside the 1.9 clamp) is still absorbable
    assert(driftVerdict(1.85, 0.9, Some(1.0), floorHostUp = 1.6, floorTol = 1.6)
      == "suite-noise(host)")
    // prior leg: 1.2 x host 1.6 = 1.92 un-capped; 1.91x prior must surface
    assert(driftVerdict(1.91, 1.0, None, priorHostUp = 1.6) == "regressed?")
    assert(driftVerdict(1.89, 1.0, None, priorHostUp = 1.6) == "suite-noise(host)")
  }

  test("Bench.driftVerdict absorb cap boundary: exactly 1.9x absorbs, a hair above surfaces (r17)") {
    import graft.Bench.driftVerdict
    // iso == floor·AbsorbCap sits ON the clamped bound (<=) — absorbed;
    // the next representable step above must stay regressed?
    assert(driftVerdict(1.9, 0.9, Some(1.0), floorHostUp = 1.6, floorTol = 1.6)
      == "suite-noise(host)")
    assert(driftVerdict(1.9 + 1e-9, 0.9, Some(1.0), floorHostUp = 1.6, floorTol = 1.6)
      == "regressed?")
    // prior leg at the same boundary
    assert(driftVerdict(1.9, 1.0, None, priorHostUp = 1.6) == "suite-noise(host)")
    assert(driftVerdict(1.9 + 1e-9, 1.0, None, priorHostUp = 1.6) == "regressed?")
  }

  test("per-floor canary stamps: payload stamps only this run's floors; cascade prefers the stamp (r17)") {
    import graft.{Bench, HostCanary, Scratch}
    // Scratch payload: global key + one __canary_<q> per measured floor
    val p = Scratch.floorsPayload(Seq("q_a" -> 1.0, "q_b" -> 2.0), Some(0.4)).toMap
    assert(p == Map("q_a" -> 1.0, "q_b" -> 2.0,
      HostCanary.FloorKey -> 0.4, "__canary_q_a" -> 0.4, "__canary_q_b" -> 0.4))
    // no canary taken (no GRAFT_SCRATCH_JSON) → no stamps at all
    assert(Scratch.floorsPayload(Seq("q_a" -> 1.0), None).toMap == Map("q_a" -> 1.0))
    // merge keeps OTHER floors' older stamps, replaces this run's
    val tmp = tempDir("floors_stamp") + "/floors.json"
    Scratch.writeFloors(tmp, Scratch.floorsPayload(Seq("q_a" -> 1.0, "q_b" -> 2.0), Some(0.4)))
    Scratch.writeFloors(tmp, Scratch.floorsPayload(Seq("q_b" -> 1.8), Some(0.6)))
    val merged = Bench.settledFloors(tmp)
    assert(merged("__canary_q_a") == 0.4 && merged("__canary_q_b") == 0.6 &&
      merged(HostCanary.FloorKey) == 0.6 && merged("q_a") == 1.0 && merged("q_b") == 1.8,
      s"merged=$merged")
    // cascade lookup: per-floor stamp wins, global is the fallback
    assert(Bench.floorCanaryOf(merged, "q_a").contains(0.4))
    assert(Bench.floorCanaryOf(merged, "q_b").contains(0.6))
    assert(Bench.floorCanaryOf(merged, "q_unstamped").contains(0.6))
    assert(Bench.floorCanaryOf(Map("q_x" -> 1.0), "q_x").isEmpty)
  }

  test("HostCanary.factor: 1-floored, capped, robust to missing floor canary (r16)") {
    import graft.HostCanary.factor
    assert(factor(2.0, Some(1.5)) > 1.33 && factor(2.0, Some(1.5)) < 1.34)
    assert(factor(1.0, Some(1.5)) == 1.0)   // faster host never tightens
    assert(factor(9.0, Some(1.5)) == 1.6)   // capped: a wild canary must not absorb real regressions
    assert(factor(2.0, None) == 1.0)        // pre-canary floors file
    assert(factor(2.0, Some(0.0)) == 1.0)   // degenerate floor canary
  }

  test("Bench.priorHostFactor reads the detail header; absent/corrupt → 1.0 (r16)") {
    val dir = java.nio.file.Paths.get(tempDir("graft_hostfactor"))
    def write(name: String, body: String): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p, body.getBytes("UTF-8")); p.toString
    }
    assert(graft.Bench.priorHostFactor(write("h.json",
      """{"metric":"detail","host_canary_sec":1.2,"host_factor":1.25,"queries":{}}""")) == 1.25)
    assert(graft.Bench.priorHostFactor(write("n.json",
      """{"metric":"detail","queries":{}}""")) == 1.0)
    assert(graft.Bench.priorHostFactor(dir.resolve("missing.json").toString) == 1.0)
  }

  test("Scratch.writeFloors merges with the existing file instead of truncating") {
    val dir = java.nio.file.Paths.get(tempDir("graft_floors"))
    val path = dir.resolve("floors.json").toString
    // the documented loop: one query per Scratch run, SAME target file
    assert(graft.Scratch.writeFloors(path, Seq("q_a" -> 1.234)) == 1)
    assert(graft.Scratch.writeFloors(path, Seq("q_b" -> 0.5)) == 2)
    // a re-measure REPLACES (deliberate plan change may loosen a floor)
    assert(graft.Scratch.writeFloors(path, Seq("q_a" -> 2.0)) == 2)
    val got = graft.Bench.settledFloors(path)
    assert(got == Map("q_a" -> 2.0, "q_b" -> 0.5), s"merged floors: $got")
  }

  test("Bench.isolatedSec spawns a fresh-JVM Scratch run and parses the min") {
    // the adjudication spawn path end-to-end on the smallest fixture:
    // one rep of a trivial query (~20 s JVM+session boot dominated)
    val got = graft.Bench.isolatedSec("q_filter_equals",
      "/root/testdata/sf0.001", "4", reps = 1)
    assert(got.exists(s => s > 0 && s < 120), s"isolatedSec returned $got")
  }
}
