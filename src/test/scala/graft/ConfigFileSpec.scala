package graft

import java.nio.file.{Files, Path}
import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.pipeline.ConfigFile
import graft.pipeline.ConfigFile.ConfigError

/** YAML config resolution (reference config.py:37-62,151-259):
  * upward search, safe parsing, env/task binding, partition-key
  * derivation, and the file → Spec → run e2e path.
  */
class ConfigFileSpec extends SparkSpec {
  import spark.implicits._

  private def write(dir: Path, name: String, body: String): Path = {
    Files.createDirectories(dir)
    Files.write(dir.resolve(name), body.getBytes("UTF-8"))
  }

  private val exec = LocalDateTime.of(2024, 3, 7, 5, 9, 2)

  private def baseYaml(sourcePath: String, targetDir: String,
                       insertType: String = "overwrite",
                       extraTransform: String = "",
                       extraTarget: String = "") =
    s"""general:
       |  pipeline_name: p1
       |  pipeline_bucket: bkt
       |  pipeline_type: [full, incremental]
       |  prefix_env: {dev: lake-dev, prd: lake-prd}
       |  prefix_logs: logs
       |  prefix_raw: raw
       |  prefix_processed: processed
       |  tasks: [t1]
       |source:
       |  type: parquet
       |  path: {t1: $sourcePath}
       |transform:
       |  nan_to_null: true
       |$extraTransform
       |target:
       |  dir: $targetDir
       |  insert_type: {t1: {full: $insertType}}
       |  upsert_keys: {t1: [id]}
       |$extraTarget""".stripMargin

  test("partitionKey matches the reference per granularity; rejects unknown") {
    assert(ConfigFile.partitionKey(exec) == "year=2024/month=03/day=07/")
    assert(ConfigFile.partitionKey(exec, "hour") == "year=2024/month=03/day=07/hour=05/")
    assert(ConfigFile.partitionKey(exec, "minute") ==
      "year=2024/month=03/day=07/hour=05/minute=09/")
    assert(ConfigFile.partitionKey(exec, "second") ==
      "year=2024/month=03/day=07/hour=05/minute=09/second=02/")
    intercept[ConfigError](ConfigFile.partitionKey(exec, "week"))
  }

  test("searchUpwards prefers startDir/src, then walks ancestors") {
    val root = java.nio.file.Paths.get(tempDir("graft_cfg_search"))
    val deep = root.resolve("a/b/c")
    Files.createDirectories(deep)
    assert(ConfigFile.searchUpwards("config.yml", deep).isEmpty)
    val atRoot = write(root, "config.yml", "general: {}")
    assert(ConfigFile.searchUpwards("config.yml", deep).contains(atRoot))
    val inSrc = write(deep.resolve("src"), "config.yml", "general: {}")
    assert(ConfigFile.searchUpwards("config.yml", deep).contains(inSrc))
  }

  test("safe-load: plain data parses; arbitrary-object tags are rejected") {
    val dir = java.nio.file.Paths.get(tempDir("graft_cfg_safe"))
    val ok = write(dir, "ok.yml", "general:\n  a: 1\n  b: [x, y]\n")
    val conf = ConfigFile.load(ok)
    assert(conf.str("general.a") == "1")
    assert(conf.list("general.b") == Seq("x", "y"))
    val evil = write(dir, "evil.yml",
      "general: !!javax.script.ScriptEngineManager [!!java.net.URLClassLoader []]\n")
    intercept[Exception](ConfigFile.load(evil))
  }

  test("resolve validates required keys, task membership, env binding, derived prefixes") {
    val dir = java.nio.file.Paths.get(tempDir("graft_cfg_resolve"))
    val conf = ConfigFile.load(write(dir, "config.yml", baseYaml("/tmp/x", "/tmp/y")))
    val r = ConfigFile.resolve(conf, "dev", "t1", "full", exec)
    assert(r.partitionRaw == "lake-dev/p1/full/raw/t1/year=2024/month=03/day=07/")
    assert(r.partitionProcessed == "lake-dev/p1/full/processed/t1/year=2024/month=03/day=07/")
    val prd = ConfigFile.resolve(conf, "prd", "t1", "incremental", exec,
      partitionGranularity = "hour", reportingYear = Some(2023))
    assert(prd.partitionRaw ==
      "lake-prd/p1/reporting_year=2023/incremental/raw/t1/year=2024/month=03/day=07/hour=05/")

    val pinned = ConfigFile.resolve(conf, "dev", "t1", "full", exec,
      logClock = () => exec)
    assert(pinned.logPath ==
      "logs/lake-dev/p1/full/t1/year=2024/month=03/day=07/2024-03-07T05:09:02.log")

    intercept[ConfigError](ConfigFile.resolve(conf, "dev", "nope", "full", exec))
    intercept[ConfigError](ConfigFile.resolve(conf, "qa", "t1", "full", exec)) // unbound env
    val broken = ConfigFile.load(write(dir, "broken.yml",
      baseYaml("/tmp/x", "/tmp/y").replace("  prefix_raw: raw\n", "")))
    intercept[ConfigError](ConfigFile.resolve(broken, "dev", "t1", "full", exec))
  }

  test("file → Spec → run: transforms bound per task, upsert target written") {
    val base = java.nio.file.Paths.get(tempDir("graft_cfg_e2e"))
    val srcDir = s"$base/src_data"
    val targetDir = s"$base/target"
    Seq((1L, 2.0, "nan"), (2L, 7.9, "keep")).toDF("id", "f", "s")
      .write.parquet(srcDir)
    val yaml = baseYaml(srcDir, targetDir, insertType = "upsert",
      extraTransform = "  convert_float_to_int: {t1: [f]}\n")
    val cfgPath = write(base, "config.yml", yaml)
    val spec = ConfigFile.toSpec(
      ConfigFile.resolve(ConfigFile.load(cfgPath), "dev", "t1", "full", exec),
      "t1", "full", exec, addMeta = false)
    spec.run(spark)
    val out = graft.merge.Merge.readTarget(spark, targetDir)
    // float→int truncation applied; "nan" string normalized to NULL
    assert(out.select("id", "f").as[(Long, Long)].collect().toSet == Set((1L, 2L), (2L, 7L)))
    assert(out.where(col("s").isNull).count() == 1)
    // upsert again: idempotent (same keys replace, no duplication)
    spec.run(spark)
    assert(graft.merge.Merge.readTarget(spark, targetDir).count() == 2)
  }

  test("target.commit: pointer routes the config pipeline through the manifest protocol") {
    val base = java.nio.file.Paths.get(tempDir("graft_cfg_ptr"))
    val srcDir = s"$base/src_data"
    val targetDir = s"$base/target"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(srcDir)
    val yaml = baseYaml(srcDir, targetDir, insertType = "upsert",
      extraTarget = "  commit: pointer\n")
    val spec = ConfigFile.toSpec(
      ConfigFile.resolve(ConfigFile.load(write(base, "config.yml", yaml)),
        "dev", "t1", "full", exec), "t1", "full", exec, addMeta = false)
    spec.run(spark)
    assert(new java.io.File(targetDir, "_current").exists(), "manifest published")
    assert(graft.merge.Merge.readTarget(spark, targetDir).count() == 2)
    spec.run(spark) // idempotent through the pointer protocol too
    assert(graft.merge.Merge.readTarget(spark, targetDir).count() == 2)
    // unknown commit value fails loudly at resolve-to-spec time
    val bad = baseYaml(srcDir, targetDir, extraTarget = "  commit: s3magic\n")
    intercept[ConfigError](ConfigFile.toSpec(
      ConfigFile.resolve(ConfigFile.load(write(base, "config2.yml", bad)),
        "dev", "t1", "full", exec), "t1", "full", exec))
  }

  test("loadSpec is the one-call front door (search → load → resolve → spec)") {
    val base = java.nio.file.Paths.get(tempDir("graft_cfg_front"))
    val deep = base.resolve("jobs/x")
    Files.createDirectories(deep)
    val srcDir = s"$base/src_data"
    Seq((1L, "a")).toDF("id", "v").write.parquet(srcDir)
    write(base, "config.yml", baseYaml(srcDir, s"$base/target"))
    val spec = ConfigFile.loadSpec(deep, "dev", "t1", executionDate = exec)
    assert(spec.task == "t1")
    spec.run(spark)
    assert(spark.read.parquet(s"$base/target").count() == 1)
    intercept[ConfigError](ConfigFile.loadSpec(
      java.nio.file.Paths.get(tempDir("graft_cfg_missing")), "dev", "t1"))
  }
}
