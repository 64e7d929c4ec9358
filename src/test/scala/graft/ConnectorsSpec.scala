package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.functions._

import graft.api.ApiFanout
import graft.api.ApiFanout.{Response, RetryPolicy, Transport}
import graft.connectors.Connectors
import graft.io.Jdbc

object SleepLog {
  val q = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
}

class ConnectorsSpec extends SparkSpec {
  import spark.implicits._

  test("fanout succeeds, passes params through, attempts=1") {
    val params = Seq(1L, 2L, 3L).toDF("id")
    val out = ApiFanout.fanout(params, new Transport {
      def fetch(p: String): Response = Response(200, "ok:" + p)
    }).collect()
    assert(out.length == 3 && out.forall(r => r.ok && r.attempts == 1))
    assert(out.map(_.params).toSet == Set("""{"id":1}""", """{"id":2}""", """{"id":3}"""))
  }

  test("fanout retries 5xx with backoff then succeeds; 4xx fails fast; errors collected not raised") {
    val calls = new ConcurrentHashMap[String, Integer]()
    val flaky = new Transport {
      def fetch(p: String): Response = {
        val n = calls.merge(p, 1, (a, b) => a + b)
        if (p.contains("\"id\":1")) { if (n < 3) Response(503, "boom") else Response(200, "recovered") }
        else if (p.contains("\"id\":2")) Response(404, "nope")
        else Response(200, "fine")
      }
    }
    var slept = Vector.empty[Long]
    val out = ApiFanout.fanout(Seq(1L, 2L, 3L).toDF("id").coalesce(1), flaky,
      RetryPolicy(maxRetries = 3, baseBackoffMs = 1, jitter = true),
      sleeper = ms => slept :+= ms).collect().sortBy(_.params)
    val r1 = out.find(_.params.contains("\"id\":1")).get
    assert(r1.ok && r1.attempts == 3 && r1.body == "recovered")
    val r2 = out.find(_.params.contains("\"id\":2")).get
    assert(!r2.ok && r2.attempts == 1 && r2.status == 404) // 4xx: no retry
    assert(out.count(_.ok) == 2) // stage did NOT fail: error is data
  }

  test("fanout honors Retry-After") {
    SleepLog.q.clear()
    val calls = new ConcurrentHashMap[String, Integer]()
    val out = ApiFanout.fanout(Seq(9L).toDF("id").coalesce(1), new Transport {
      def fetch(p: String): Response = {
        val n = calls.merge(p, 1, (a, b) => a + b)
        if (n == 1) Response(429, "slow down", retryAfterMs = Some(12345L))
        else Response(200, "done")
      }
    }, sleeper = ms => SleepLog.q.add(ms)).collect()
    assert(out.head.ok && out.head.attempts == 2)
    // sleeper runs executor-side; SleepLog is a JVM-static shared in local mode
    assert(SleepLog.q.toArray.toSeq == Seq(12345L))
  }

  test("withParams re-attaches typed param columns") {
    val params = Seq((7L, "x")).toDF("id", "tag")
    val res = ApiFanout.fanout(params, new Transport {
      def fetch(p: String): Response = Response(200, "b")
    })
    val out = ApiFanout.withParams(res, params.schema)
    assert(out.columns.toSeq == Seq("id", "tag", "ok", "status", "body", "error", "attempts"))
    assert(out.select("id", "tag").as[(Long, String)].head() == ((7L, "x")))
  }

  test("jdbc roundtrip on embedded Derby incl. scalar fetch and partitioned read") {
    val url = s"jdbc:derby:${java.nio.file.Paths.get(tempDir("graft_derby"))}/db;create=true"
    val df = Seq((1L, "a", 10.5), (2L, "b", 20.5), (3L, "c", 30.5)).toDF("id", "name", "v")
    Jdbc.write(df, url, "T1")
    assert(Jdbc.read(spark, url, "SELECT * FROM T1").count() == 3)
    assert(Jdbc.fetchScalar(spark, url, """SELECT max("id") AS mx FROM T1""").contains(3L))
    val part = Jdbc.readPartitioned(spark, url, "T1", "id", 1, 3, 2)
    assert(part.rdd.getNumPartitions == 2)
    assert(part.count() == 3)
    val (rows, schema) = Jdbc.rowsAndSchema(spark, url, """SELECT "id", "name" FROM T1""")
    assert(rows.size == 3 && schema.fieldNames.map(_.toLowerCase).toSeq == Seq("id", "name"))
  }

  test("pagedSource drains until short page") {
    var fetches = 0
    val ds = Connectors.pagedSource(spark, limit = 10) { (limit, offset) =>
      fetches += 1
      (offset until math.min(offset + limit, 25)).map(i => (i, s"row$i"))
    }
    assert(ds.count() == 25)
    assert(fetches == 3) // 10 + 10 + 5(short → stop)
  }

  test("pagedSource retries a flaky page without skipping or duplicating it") {
    var failuresLeft = 2
    val offsetsServed = scala.collection.mutable.ArrayBuffer.empty[Int]
    val ds = Connectors.pagedSource(spark, limit = 10, pageRetries = 3,
      sleep = _ => ()) { (limit, offset) =>
      if (offset == 10 && failuresLeft > 0) { failuresLeft -= 1; sys.error("flaky") }
      offsetsServed += offset
      (offset until math.min(offset + limit, 25)).map(i => (i, s"row$i"))
    }
    assert(ds.collect().map(_._1).sorted.toSeq == (0 until 25))
    assert(offsetsServed.toSeq == Seq(0, 10, 20)) // page 10 served once, after retries
    // exhaustion surfaces RetryExhausted, not a partial dataset
    intercept[graft.util.Retry.RetryExhausted] {
      Connectors.pagedSource(spark, limit = 10, pageRetries = 1,
        sleep = _ => ())((_, _) => sys.error("always down")): Unit
    }
  }

  test("page drain is lazy: a page is fetched only when consumed") {
    var fetches = 0
    val it = Connectors.drainPages[(Int, String)](limit = 10, maxPages = 1000,
      pageRetries = 0, sleep = _ => ()) { (limit, offset) =>
      fetches += 1
      (offset until offset + limit).map(i => (i, s"row$i"))
    }
    assert(fetches == 0) // nothing fetched before consumption
    it.next()
    assert(fetches == 1) // one consumed -> exactly one fetched
    it.next(); it.next()
    assert(fetches == 3)
  }

  test("long drain spills in page-bounded chunks and reproduces every row") {
    // 40 pages x 10 rows with a 7-page spill bound: driver buffer can
    // never hold more than 7 pages; the staged readback must still be
    // the exact drain content
    val ds = Connectors.pagedSource(spark, limit = 10, spillEveryPages = 7) {
      (limit, offset) =>
        (offset until math.min(offset + limit, 400)).map(i => (i, s"row$i"))
    }
    assert(ds.collect().map(_._1).sorted.toSeq == (0 until 400))
    // short drain (one chunk) stays on the no-spill fast path: the plan
    // is a LocalRelation, not a file read
    val small = Connectors.pagedSource(spark, limit = 10, spillEveryPages = 7) {
      (limit, offset) => (offset until math.min(offset + limit, 15)).map(i => (i, s"r$i"))
    }
    assert(small.queryExecution.optimizedPlan.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]))
    assert(small.count() == 15)
  }

  test("fuzzyBestMatch picks minimum levenshtein with deterministic tiebreak") {
    val files = Seq("report_2024.csv", "summary.txt").toDF("wanted")
    val listing = Seq("report-2024.csv", "report_2023.csv", "summary_final.txt").toDF("found")
    val out = Connectors.fuzzyBestMatch(files, "wanted", listing, "found")
      .select("wanted", "found").as[(String, String)].collect().toMap
    assert(out("report_2024.csv") == "report-2024.csv")
    assert(out("summary.txt") == "summary_final.txt")
  }

  test("fuzzyBestMatch enforces the bounded-candidates contract") {
    val files = Seq("a.csv").toDF("wanted")
    val listing = Seq("a1.csv", "a2.csv", "a3.csv").toDF("found")
    intercept[IllegalArgumentException] {
      Connectors.fuzzyBestMatch(files, "wanted", listing, "found", maxCandidates = 2)
    }
  }

  test("fuzzyBestMatch keeps one match PER ROW even for duplicate left rows") {
    val files = Seq("a.csv", "a.csv", "b.csv").toDF("wanted")
    val listing = Seq("a_1.csv", "b_1.csv").toDF("found")
    val out = Connectors.fuzzyBestMatch(files, "wanted", listing, "found")
    assert(out.count() == 3) // both duplicate rows survive
  }
}
