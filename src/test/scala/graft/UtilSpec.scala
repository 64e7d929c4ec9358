package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.types.Flyway
import graft.util.Retry

/** Retry utility (reference custom_decorators.py:13-77) + Flyway
  * migration versioning (reference parser.py:215-227). No Spark needed.
  */
class UtilSpec extends AnyFunSuite {

  private val noSleep: Double => Unit = _ => ()

  test("retry returns first success, injects the attempt number") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = Retry.retry(5, sleep = noSleep) { attempt =>
      seen += attempt
      if (attempt < 2) sys.error(s"boom $attempt") else "ok"
    }
    assert(out == "ok")
    assert(seen.toSeq == Seq(0, 1, 2)) // cleanup code can branch on attempt
  }

  test("retry exhausts after `retries` attempts and carries every error") {
    val e = intercept[Retry.RetryExhausted] {
      Retry.retry(3, sleep = noSleep)(a => sys.error(s"fail $a"))
    }
    assert(e.attempts == 3)
    assert(e.errors.map(_.getMessage) == Seq("fail 0", "fail 1", "fail 2"))
    assert(e.getCause.getMessage == "fail 2") // last error is the cause
  }

  test("retryV2 runs retries + 1 attempts (initial + retries)") {
    var n = 0
    intercept[Retry.RetryExhausted] {
      Retry.retryV2(2, sleep = noSleep)(_ => { n += 1; sys.error("x") })
    }
    assert(n == 3)
  }

  test("backoff is quadratic (attempt+1)^2 and skipped after the final attempt") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Double]
    intercept[Retry.RetryExhausted] {
      Retry.retry(3, sleep = sleeps.+=(_))(_ => sys.error("x"))
    }
    assert(sleeps.toSeq == Seq(1.0, 4.0)) // no sleep after the last failure
  }

  test("retry rejects zero attempts and does not catch fatal errors") {
    intercept[IllegalArgumentException](Retry.retry(0, sleep = noSleep)(_ => 1))
    intercept[OutOfMemoryError] {
      Retry.retry(3, sleep = noSleep)(_ => throw new OutOfMemoryError("fatal"))
    }
  }

  // ------------------------------------------------------------- flyway

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("flyway DDL carries placeholders, quoted sanitized columns, audit column") {
    val ddl = Flyway.flywayDdl(schema, "customers")
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS ${ingest_schema}.customers"))
    assert(ddl.contains("\"id\""))
    assert(ddl.contains("DISTSTYLE AUTO;"))
    assert(ddl.contains("ALTER TABLE ${ingest_schema}.customers owner to ${username};"))
    assert(ddl.contains("META_loading_date_utc"))
  }

  test("migration versioning: starts at V001, bumps past the highest, re-emit is idempotent") {
    val dir = graft.SparkSpec.tempDir("graft_flyway")
    val p1 = Flyway.emitMigration(dir, schema, "customers")
    assert(p1.getFileName.toString == "V001_1__create_customers.sql")

    // identical schema re-emit: no new file
    val p2 = Flyway.emitMigration(dir, schema, "customers")
    assert(p2 == p1)
    assert(Files.list(Paths.get(dir)).count() == 1)

    // another table bumps the GLOBAL version counter
    val p3 = Flyway.emitMigration(dir, schema, "orders")
    assert(p3.getFileName.toString == "V002_1__create_orders.sql")

    // schema change on the first table bumps again
    val wider = StructType(schema.fields :+ StructField("extra", IntegerType))
    val p4 = Flyway.emitMigration(dir, wider, "customers")
    assert(p4.getFileName.toString == "V003_1__create_customers.sql")
    assert(Flyway.currentVersion(Paths.get(dir)) == 3)

    // foreign migrations (hand-written, higher seq) are respected
    Files.write(Paths.get(dir, "V010_2__manual_fix.sql"), "SELECT 1;".getBytes)
    val p5 = Flyway.emitMigration(dir, schema, "nations")
    assert(p5.getFileName.toString == "V011_1__create_nations.sql")
  }

  test("re-emit picks the latest version numerically once past the %03d padding") {
    val dir = java.nio.file.Paths.get(graft.SparkSpec.tempDir("graft_flyway_wide"))
    val ddl = Flyway.flywayDdl(schema, "customers")
    // lexicographically "V1000..." < "V999...", numerically the reverse —
    // the idempotence check must compare against V1000, not V999
    Files.write(dir.resolve("V999_1__create_customers.sql"), "stale".getBytes("UTF-8"))
    Files.write(dir.resolve("V1000_1__create_customers.sql"), ddl.getBytes("UTF-8"))
    val p = Flyway.emitMigration(dir.toString, schema, "customers")
    assert(p.getFileName.toString == "V1000_1__create_customers.sql")
    val s = Files.list(dir)
    try assert(s.count() == 2) finally s.close()
    assert(Flyway.currentVersion(dir) == 1000)
  }

  test("log sink: capture respects level, flushes one object, caps the buffer") {
    import java.util.logging.{Level, Logger}
    val logger = Logger.getLogger("graft.test.logsink")
    logger.setUseParentHandlers(false)
    logger.setLevel(Level.ALL)
    val dir = java.nio.file.Paths.get(graft.SparkSpec.tempDir("graft_logsink"))
    val path = dir.resolve("run/2024/task.log").toString
    val got = graft.util.LogSink.withCapture(logger, path) {
      logger.info("pipeline started")
      logger.fine("debug noise below the capture level") // filtered
      logger.log(Level.WARNING, "late rows", new IllegalStateException("watermark"))
      42
    }
    assert(got == 42)
    val body = new String(Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    val lines = body.linesIterator.toSeq
    assert(lines.size == 2)
    assert(lines(0).matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3} \[INFO    \] pipeline started"""))
    assert(lines(1).contains("[WARNING ] late rows (java.lang.IllegalStateException: watermark)"))
    assert(logger.getHandlers.isEmpty) // detached after the scope

    // runaway logging hits the cap, notes the drop, driver heap bounded
    val capped = graft.util.LogSink.attach(logger, Level.INFO, maxChars = 200)
    (1 to 100).foreach(i => logger.info(s"spam $i"))
    assert(capped.contents.length < 1000)
    assert(capped.contents.contains("lines dropped"))
    graft.util.LogSink.detach(logger, capped)
  }

  test("Scratch.reapOrphans deletes dead-pid graft dirs, keeps live-pid and foreign entries (r15 verdict #3)") {
    val root = java.nio.file.Files.createTempDirectory("graft_reap_root").toFile
    try {
      val mypid = ProcessHandle.current().pid()
      // a pid FAR past Linux's default pid_max cannot be alive
      val dead = new java.io.File(root, "graft_idx_abc123_p999999999")
      val live = new java.io.File(root, s"graft_idx_def456_p$mypid")
      val foreign = new java.io.File(root, "someone_elses_dir")
      val noPid = new java.io.File(root, "graft_idx_nopid")
      Seq(dead, live, foreign, noPid).foreach { d =>
        assert(d.mkdir())
        java.nio.file.Files.writeString(new java.io.File(d, "f").toPath, "x")
      }
      val n = graft.util.Scratch.reapOrphans(root)
      assert(n == 1, s"exactly the dead-pid dir reaped, got $n")
      assert(!dead.exists(), "dead-pid dir deleted")
      assert(live.exists(), "current JVM's dir untouched")
      assert(foreign.exists(), "non-graft entry untouched")
      assert(noPid.exists(), "pattern-less graft entry untouched")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(root)
  }

  test("currentVersion of a missing or empty dir is 0") {
    assert(Flyway.currentVersion(Paths.get("/tmp/graft_flyway_nonexistent")) == 0)
    val empty = java.nio.file.Paths.get(graft.SparkSpec.tempDir("graft_flyway_empty"))
    assert(Flyway.currentVersion(empty) == 0)
  }
}
