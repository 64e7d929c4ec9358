package graft

import org.apache.spark.sql.functions._

import graft.util.Materialize

/** The swept-entry-point contract for long-lived gauge callers (r17
  * verdict #3): the rolling/drift gauges materialize bounded frames
  * internally (`Materialize.bounded`) with no release point of their
  * own — `Materialize.scoped` collects those handles and frees
  * exactly the blocks the wrapped calls persisted, returning the
  * session's persistent-RDD set to its pre-call state (the
  * DecontamPipelineSpec block-count precedent, generalized).
  */
class MaterializeScopeSpec extends SparkSpec {
  import spark.implicits._

  private def mixRows = Seq(
    ("2024-01-01 10:00:00", "a", "g1", 1.0), ("2024-01-01 11:00:00", "b", "g1", 2.0),
    ("2024-01-02 10:00:00", "a", "g1", 3.0), ("2024-01-02 11:00:00", "b", "g1", 9.0),
    ("2024-01-03 10:00:00", "a", "g1", 1.5), ("2024-01-03 12:00:00", "c", "g1", 4.0)
  ).toDF("ts", "k", "g", "v").withColumn("ts", col("ts").cast("timestamp_ntz"))

  test("scoped frees every block the wrapped gauges materialized; pre-call state restored") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val ((js, psi), release) = Materialize.scoped {
      (graft.text.TextOps.jsRollingDivergenceBy(mixRows, Seq("g"), "k", "ts", 2),
        graft.profile.HistSketch.histRollingPsi(mixRows, "v", "ts", 2))
    }
    assert(js.count() >= 1 && psi.count() >= 1)
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).nonEmpty,
      "the gauges' bounded frames are persisted behind the results")
    release()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
    assert(leaked.isEmpty, s"blocks left persisted after scope release: $leaked")
    // releasing twice is harmless (unpersist idempotence)
    release()
  }

  test("scoped never touches blocks a concurrent caller persisted (no-sweep contract)") {
    val other = mixRows.persist()
    other.count()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (gauge, release) = Materialize.scoped {
      graft.profile.HistSketch.histRollingPsi(mixRows, "v", "ts", 2)
    }
    gauge.count()
    release()
    assert(spark.sparkContext.getPersistentRDDs.keySet == before,
      "scope release must free only its own materializations")
    other.unpersist(blocking = true)
  }

  test("release on a throwing body frees the frames it materialized; acting after release fails loudly") {
    // r18 ADVICE #1: frames a failing body already materialized are by
    // definition unconsumed — scoped must release them, not leak until
    // session teardown
    val before = spark.sparkContext.getPersistentRDDs.keySet
    intercept[RuntimeException] {
      Materialize.scoped {
        val f = Materialize.bounded(mixRows.groupBy("k").agg(sum("v").as("s")))
        assert(f.count() >= 1) // materialized before the failure
        throw new RuntimeException("boom")
      }
    }
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).isEmpty,
      "a failing scope body must not leak its materialized frames")
    // r18 verdict #5a, adjudicated by measurement: a localCheckpoint
    // severs lineage, so a post-release action cannot silently
    // recompute (the verdict's guess) — it THROWS
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. Pinned so the failure mode
    // stays loud-never-wrong if the materialization strategy changes.
    val (f, release) = Materialize.boundedReleasable(
      mixRows.groupBy("k").agg(sum("v").as("s")))
    assert(f.count() >= 1)
    release()
    val e = intercept[Throwable](quietStorageLogs(f.count()))
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(_.toString).mkString("\n")
    assert(msgs.contains("CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND") ||
      msgs.toLowerCase.contains("checkpoint block"),
      s"expected a loud checkpoint-block failure, got:\n$msgs")
  }

  test("nested scopes capture into the innermost; bounded outside any scope keeps its own handle") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val ((innerRelease, outerDf), outerRelease) = Materialize.scoped {
      val (innerDf, rel) = Materialize.scoped {
        Materialize.bounded(mixRows.groupBy("k").agg(sum("v").as("s")))
      }
      assert(innerDf.count() >= 1)
      (rel, Materialize.bounded(mixRows.groupBy("g").agg(count(lit(1)).as("n"))))
    }
    assert(outerDf.count() == 1)
    innerRelease()
    outerRelease()
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).isEmpty)
    // outside any scope: the explicit-handle contract is unchanged
    val (df, rel) = Materialize.boundedReleasable(mixRows.select("k").distinct())
    assert(df.count() == 3)
    rel()
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).isEmpty)
  }
}
