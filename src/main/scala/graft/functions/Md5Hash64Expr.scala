package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit md5-prefix hash of a string, as a BIGINT.
  *
  * Bit-identical to `conv(substring(md5(s), 1, 15), 16, 10)` — the
  * first 15 hex characters of the md5 are exactly the top 60 bits of
  * the first 8 digest bytes — but without materializing the hex string
  * or running `conv`'s BigInteger parse. This is the portable
  * (oracle-reproducible: DuckDB `('0x'||substr(md5(s),1,15))::BIGINT`)
  * hash tier's hot path: minhash evaluates it once per shingle over
  * the whole corpus.
  */
case class Md5Hash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash64"

  override def nullSafeEval(input: Any): Any =
    Md5Hash64Expr.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Hash64Expr.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Hash64Expr {
  // getInstance + allocation per row would cost a large fraction of the
  // md5 itself on the per-shingle hot path; digests aren't thread-safe,
  // so one reusable instance per executor thread
  private val digestTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(bytes) as a non-negative long. */
  def hash(bytes: Array[Byte]): Long = {
    val md = digestTL.get()
    md.reset()
    val d = md.digest(bytes)
    val top = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }

  def md5Hash64(c: Column): Column =
    GraftColumnBridge.column(Md5Hash64Expr(GraftColumnBridge.expression(c)))
}
