package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused SimHash kernel: string → 64-bit-bounded simhash in one pass.
  *
  * Semantics identical to the composable form in
  * [[graft.dedup.DedupOps.simhashComposable]] (parity unit-proven):
  * whitespace tokens of the lowercased/trimmed text, each occurrence's
  * hash voting ±1 per bit, sign → bit. The HOF form walks a
  * `bits`-wide interpreted expression tree per token; this is one
  * hash + `bits` shift-mask-adds per token in a static loop.
  */
case class SimhashExpr(child: Expression, bits: Int, portable: Boolean)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if bits > 0 && bits <= 60 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires 0 < bits <= 60 (portable hash width), got $bits")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def nullSafeEval(input: Any): Any =
    SimhashExpr.compute(input.asInstanceOf[UTF8String], bits, portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimhashExpr.compute($c, $bits, $portable)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashExpr {

  private val Xxh64Seed = 42L

  def compute(text: UTF8String, bits: Int, portable: Boolean): Long = {
    val words = Tokenize.words(text)
    val votes = new Array[Int](bits)
    var i = 0
    while (i < words.length) {
      val u = UTF8String.fromString(words(i))
      val h =
        if (portable) Md5Hash64Expr.hash(u.getBytes)
        else math.abs(org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, Xxh64Seed))
      var b = 0
      while (b < bits) {
        votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  def simhash(text: Column, bits: Int, portable: Boolean): Column =
    GraftColumnBridge.column(
      SimhashExpr(GraftColumnBridge.expression(text), bits, portable))
}
