package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session keeps
  * `sbt test` fast; suites must not mutate global conf destructively).
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = Graft.session("local[4]", shufflePartitions = 4)
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  import org.apache.spark.sql.DataFrame

  /** Order-insensitive full comparison of small frames. */
  def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.columns.sorted.toSeq == b.columns.sorted.toSeq,
      s"columns differ: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    val cols = a.columns.sorted.toIndexedSeq
    val as = a.select(cols.map(org.apache.spark.sql.functions.col): _*).collect().map(_.toString).sorted
    val bs = b.select(cols.map(org.apache.spark.sql.functions.col): _*).collect().map(_.toString).sorted
    assert(as.toSeq == bs.toSeq)
  }
}
