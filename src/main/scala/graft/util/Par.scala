package graft.util

/** Overlap INDEPENDENT Spark jobs from driver threads (r19
  * optimization; guide §2.6 "Overlap independent jobs"). A Spark
  * driver schedules actions sequentially only because caller code
  * invokes them sequentially; artifact writers that produce several
  * independent outputs from the same (cached or re-scannable) input
  * were paying one full job-orchestration latency per artifact —
  * measured ~0.15–0.2 s of driver/commit gap per job on this host,
  * ~35 jobs in the dedup-index lifecycle alone, with total executor
  * task-time under half the wall. Running the independent chains on a
  * few driver threads back-fills those gaps (and at cluster scale
  * lets the next job's tasks fill executors freed by the current
  * job's tail — the §2.6 rationale; FIFO scheduling gives exactly the
  * back-fill behaviour).
  *
  * Semantics: runs every thunk to completion (no cancellation — a
  * crashed sibling must not carve an artifact set no failure mode
  * documents; each writer's crash contract is stated per WAVE at the
  * call site), then rethrows the first failure in argument order.
  * Plain threads, not a shared pool: callers are rare, chains are
  * few, and Spark's scheduler state (job group/description) is
  * thread-local and deliberately NOT inherited — these maintenance
  * jobs carry their own callsites.
  */
object Par {
  def jobs(thunks: (() => Unit)*): Unit = {
    if (thunks.sizeIs <= 1) { thunks.foreach(_.apply()); return }
    val errs = new java.util.concurrent.atomic.AtomicReferenceArray[Throwable](thunks.size)
    val ts = thunks.zipWithIndex.map { case (f, i) =>
      new Thread(() => try f() catch { case t: Throwable => errs.set(i, t) },
        s"graft-par-$i")
    }
    ts.foreach(_.start())
    ts.foreach(_.join())
    (0 until thunks.size).foreach { i =>
      val t = errs.get(i)
      if (t != null) throw t
    }
  }
}
