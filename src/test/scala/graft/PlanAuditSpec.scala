package graft

import java.nio.file.{Files, Paths}

import graft.PlanAudit.{Shape, diff, parse, render, shapeOf}

/** The ENFORCED plan gate (r12 verdict #1). Every registered query is
  * planned (never executed — only plan-construction side effects run)
  * at sf0.001 under the canonical session, and its
  * exchange/BNLJ/cartesian shape is compared against the committed
  * `plan_snapshot.json`. A silently degraded plan — a join that lost
  * its broadcast and gained an exchange, a new BNLJ, any cartesian —
  * now fails `sbt test` instead of hiding inside noisy bench
  * wall-time.
  *
  * Plans are built CACHE-FREE (clearCache + RDD sweep before each
  * query), so the shape is a function of the code and the fixtures,
  * never of which suite ran earlier in the JVM.
  *
  * On intentional plan changes regenerate with
  * `GRAFT_PLAN_SNAPSHOT_UPDATE=1 sbt "testOnly graft.PlanAuditSpec"`
  * and commit the diff with the change that caused it.
  */
class PlanAuditSpec extends SparkSpec {

  private def currentShapes(): Seq[(String, Shape)] = {
    val sfDir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val plan =
        try fn(spark, sfDir).queryExecution.executedPlan.toString()
        catch { case e: Throwable =>
          fail(s"plan gate: $name failed to plan: ${e.toString.take(300)}")
        }
      name -> shapeOf(plan)
    }
  }

  test("plan gate: zero cartesians; exchange/BNLJ shapes match the committed snapshot") {
    val shapes = currentShapes()
    val cartesians = shapes.collect { case (n, s) if s.cartesian > 0 => n }
    assert(cartesians.isEmpty,
      s"CartesianProduct planned in: ${cartesians.mkString(", ")}")
    if (sys.env.get("GRAFT_PLAN_SNAPSHOT_UPDATE").contains("1")) {
      Files.writeString(Paths.get(PlanAudit.SnapshotFile), render(shapes))
      info(s"snapshot rewritten: ${shapes.size} queries")
    } else {
      assert(Files.exists(Paths.get(PlanAudit.SnapshotFile)),
        s"missing ${PlanAudit.SnapshotFile}; generate with " +
          "GRAFT_PLAN_SNAPSHOT_UPDATE=1 sbt \"testOnly graft.PlanAuditSpec\"")
      val snap = parse(Files.readString(Paths.get(PlanAudit.SnapshotFile)))
      val drifts = diff(snap, shapes.toMap)
      assert(drifts.isEmpty,
        s"""plan drift in ${drifts.size} queries:
           |  ${drifts.mkString("\n  ")}
           |If intentional, regenerate the snapshot with
           |GRAFT_PLAN_SNAPSHOT_UPDATE=1 sbt "testOnly graft.PlanAuditSpec"
           |and commit it with the change.""".stripMargin)
    }
  }

  test("comparator flags planted regressions: extra exchange, new BNLJ, added/removed query") {
    val snap = Map("a" -> Shape(3, 0, 0), "b" -> Shape(1, 1, 0), "gone" -> Shape(2, 0, 0))
    val cur = Map("a" -> Shape(4, 0, 0), "b" -> Shape(1, 2, 0), "new" -> Shape(0, 0, 0))
    val d = diff(snap, cur)
    assert(d.exists(_.startsWith("a: exchanges 3->4")))
    assert(d.exists(_.startsWith("b: exchanges 1->1, bnlj 1->2")))
    assert(d.exists(_.startsWith("gone: in snapshot")))
    assert(d.exists(_.startsWith("new: new query")))
    assert(diff(snap, snap).isEmpty)
    // render/parse roundtrip preserves every shape
    assert(parse(render(snap.toSeq)) == snap.map { case (k, s) => k -> s.copy(cartesian = 0) })
  }

  test("committed floors.json parses and every floor names a registered query") {
    val p = Paths.get("floors.json")
    assert(Files.exists(p), "floors.json missing — regenerate with the " +
      "fresh-JVM-per-query Scratch loop (see Bench.settledFloors doc)")
    val floors = Bench.settledFloors("floors.json")
    assert(floors.nonEmpty, "floors.json parsed to zero entries")
    val stale = floors.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"floors for unregistered queries (renamed/removed?): ${stale.toSeq.sorted.mkString(", ")}")
    assert(floors.values.forall(v => v > 0 && v < 600),
      "floor outside sane (0, 600)s range")
  }

  test("shapeOf counts the three signals and skips synthetic-column shuffles") {
    val plan =
      """*(3) Project
        |+- Exchange hashpartitioning(k#12, 4)
        |   +- BroadcastNestedLoopJoin BuildRight, Inner
        |      :- Exchange hashpartitioning(__salt#9, 4)
        |      +- CartesianProduct
        |         +- ReusedExchange [k#3]""".stripMargin
    val s = shapeOf(plan)
    // the __salt exchange is operator-controlled and excluded; the
    // ReusedExchange counts (reuse vanishing is a plan change)
    assert(s == Shape(exchanges = 2, bnlj = 1, cartesian = 1))
  }
}
