package graft

import org.apache.spark.sql.functions._

import graft.functions.Hashes

class Md5Hash64Spec extends SparkSpec {
  import spark.implicits._

  test("codegen md5-prefix hash is bit-identical to conv(substr(md5)) on real text") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val diff = docs.select(
      (Hashes.portable(col("text")) - Hashes.portableViaConv(col("text"))).as("d"))
      .agg(max(abs(col("d")))).head().getLong(0)
    assert(diff == 0L)
  }

  test("known value + duckdb cross-check constant") {
    // duckdb: ('0x' || substr(md5('abc'),1,15))::BIGINT = 648541476951500027
    val v = Seq("abc").toDF("s").select(Hashes.portable(col("s"))).as[Long].head()
    assert(v == 648541476951500027L)
  }

  test("non-string input rejected; NULL maps to NULL") {
    intercept[Exception] {
      Seq(1).toDF("i").select(Hashes.portable(col("i"))).collect()
    }
    val r = Seq(Option.empty[String]).toDF("s").select(Hashes.portable(col("s"))).head()
    assert(r.isNullAt(0))
  }
}
