package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool (r19 optimization round): per-stage attribution for one
  * registered query — the local stand-in for the Spark UI's stage
  * table (guide §1.1/§7.1; the sandbox has no UI). Runs the named
  * query like [[Scratch]] (same confs, cold + warm reps) with a
  * listener that aggregates per stage: wall span, summed task time,
  * executor CPU, shuffle read/write bytes and records, spill, and the
  * number of tasks — printed per stage, descending by task time, with
  * the stage's callsite name so rows map back to operators.
  *
  *   /tmp/run_java.sh graft.StageProfile q_pagerank /root/testdata/sf0.1 2
  *
  * Reporting only — never used by Bench/Verify/queries.
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_agg")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    Graft.coreTune()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Graft.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))

    final case class Agg(var tasks: Int = 0, var taskMs: Long = 0,
                         var cpuNs: Long = 0, var srBytes: Long = 0,
                         var srRecs: Long = 0, var swBytes: Long = 0,
                         var swRecs: Long = 0, var spill: Long = 0,
                         var inBytes: Long = 0, var firstMs: Long = 0,
                         var lastMs: Long = 0, var site: String = "",
                         val durs: scala.collection.mutable.ArrayBuffer[Long] =
                           scala.collection.mutable.ArrayBuffer.empty[Long],
                         var deserMs: Long = 0, var gcMs: Long = 0)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, Agg]()
    var collect = false
    val listener = new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        if (collect) {
          val a = stages.computeIfAbsent(s.stageInfo.stageId, _ => Agg())
          a.site = s.stageInfo.name
          a.firstMs = System.currentTimeMillis()
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (collect) Option(stages.get(s.stageInfo.stageId)).foreach {
          _.lastMs = System.currentTimeMillis()
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (collect && t.taskMetrics != null) {
          val a = stages.computeIfAbsent(t.stageId, _ => Agg())
          a.tasks += 1
          a.taskMs += t.taskMetrics.executorRunTime
          a.cpuNs += t.taskMetrics.executorCpuTime
          a.srBytes += t.taskMetrics.shuffleReadMetrics.totalBytesRead
          a.srRecs += t.taskMetrics.shuffleReadMetrics.recordsRead
          a.swBytes += t.taskMetrics.shuffleWriteMetrics.bytesWritten
          a.swRecs += t.taskMetrics.shuffleWriteMetrics.recordsWritten
          a.spill += t.taskMetrics.diskBytesSpilled
          a.inBytes += t.taskMetrics.inputMetrics.bytesRead
          a.deserMs += t.taskMetrics.executorDeserializeTime
          a.gcMs += t.taskMetrics.jvmGCTime
          a.durs.synchronized { a.durs += t.taskMetrics.executorRunTime }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      if (i == reps) { stages.clear(); collect = true } // profile the warmest rep
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name run $i: $s%.3f s")
    }
    collect = false
    import scala.jdk.CollectionConverters._
    val rows = stages.asScala.toSeq.sortBy(-_._2.taskMs)
    val totTask = rows.map(_._2.taskMs).sum
    println(f"[profile] ${rows.size} stages, total task-time ${totTask / 1e3}%.1f s")
    println(f"[profile] ${"stage"}%-7s ${"taskS"}%7s ${"cpuS"}%7s ${"wallS"}%6s " +
      f"${"tasks"}%5s ${"maxMs"}%6s ${"medMs"}%6s ${"deserS"}%6s ${"gcS"}%5s ${"shRdMB"}%7s ${"shWrMB"}%7s ${"inMB"}%7s  site")
    rows.take(60).foreach { case (id, a) =>
      val wall = if (a.lastMs > 0 && a.firstMs > 0) (a.lastMs - a.firstMs) / 1e3 else -1.0
      val ds = a.durs.sorted
      val mx = if (ds.nonEmpty) ds.last else 0L
      val md = if (ds.nonEmpty) ds(ds.size / 2) else 0L
      println(f"[profile] $id%-7d ${a.taskMs / 1e3}%7.2f ${a.cpuNs / 1e9}%7.2f " +
        f"$wall%6.2f ${a.tasks}%5d $mx%6d $md%6d ${a.deserMs / 1e3}%6.2f ${a.gcMs / 1e3}%5.2f ${a.srBytes / 1e6}%7.1f " +
        f"${a.swBytes / 1e6}%7.1f ${a.inBytes / 1e6}%7.1f  ${a.site.take(45)}")
    }
    spark.stop()
  }
}
