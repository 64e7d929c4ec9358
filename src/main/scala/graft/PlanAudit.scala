package graft

/** Dev tool: physical-plan audit across every registered query.
  * Flags accidental cartesian products and counts shuffles — the
  * quick check that a change didn't silently degrade a plan
  * (SCALING.md records the expected shapes).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Graft.session("local[4]", 4)
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString()
        val exchanges = "Exchange(?! hashpartitioning\\(__)".r.findAllIn(plan).size
        val cartesian = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin")
        val flags = Seq(
          if (cartesian) Some("CARTESIAN!") else None,
          if (bnlj) Some("bnlj") else None).flatten.mkString(",")
        println(f"AUDIT $name%-28s exchanges=$exchanges%-3d $flags")
      } catch {
        case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
