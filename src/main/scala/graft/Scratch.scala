package graft
import org.apache.spark.sql.SparkSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings")) {
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        println(s"=== $t rows=${df.count()}")
        df.printSchema()
        df.show(3, 60)
      } catch { case e: Throwable => println(s"=== $t FAILED: ${e.getMessage.take(300)}") }
    }
    spark.stop()
  }
}
