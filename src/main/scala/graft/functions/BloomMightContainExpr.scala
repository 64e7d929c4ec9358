package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built [[BloomFilter]] sketch — the
  * expression side of bloom pre-join pruning
  * ([[graft.relational.RelationalOps.bloomPrefilteredJoin]]). The
  * sketch rides into codegen as a referenced object (the same
  * mechanism literals use), so the probe stays inside whole-stage
  * codegen: one xxhash-style probe per row, no UDF, no fallback.
  *
  * May return true for absent keys (that is what a Bloom filter is);
  * callers follow with an exact join. Never returns false for a
  * present key, so pre-filtering loses nothing.
  */
case class BloomMightContainExpr(child: Expression, filter: BloomFilter)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ShortType | IntegerType | LongType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName supports short/int/long/string keys, got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType => filter.mightContainString(input.asInstanceOf[UTF8String].toString)
    case ShortType => filter.mightContainLong(input.asInstanceOf[Short].toLong)
    case IntegerType => filter.mightContainLong(input.asInstanceOf[Int].toLong)
    case _ => filter.mightContainLong(input.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$ref.mightContainString($c.toString())")
      case _ =>
        defineCodeGen(ctx, ev, c => s"$ref.mightContainLong((long) $c)")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContainExpr {
  def mightContain(key: Column, filter: BloomFilter): Column =
    GraftColumnBridge.column(
      BloomMightContainExpr(GraftColumnBridge.expression(key), filter))
}
