package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused word n-gram shingler: string → `array<string>` of n-word
  * shingles in one imperative pass.
  *
  * Semantics identical to the composable form (unit-proven parity):
  * `array_distinct(transform(sequence(1, size(ws)-(n-1)), i =>
  * concat_ws(" ", slice(ws, i, n))))` over
  * `ws = split(lower(trim(text)), "\s+")`, with fewer-than-n-word
  * texts yielding an empty array — but without the per-index
  * interpreted lambda (each shingle cost a slice + concat_ws
  * expression-tree walk) or the intermediate word/shingle arrays'
  * double materialization. Shingling is the front of every dedup
  * pipeline (jaccard / minhash / curation), so this is the second
  * hot kernel after the signature fold ([[MinhashSigExpr]]).
  */
case class WordShinglesExpr(child: Expression, n: Int, distinct: Boolean)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires n > 0, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShinglesExpr.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShinglesExpr.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShinglesExpr {

  /** One pass: trim+lower (UTF8String semantics — same kernel Spark's
    * `lower`/`trim` expressions call), whitespace split, n-gram join,
    * optional first-occurrence dedup. Static: called from generated
    * code. */
  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val words = Tokenize.words(text)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val m = words.length - n + 1
    val out = new java.util.ArrayList[Any](m)
    val seen = if (distinct) new java.util.HashSet[String](m * 2) else null
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val s = sb.toString
      if (!distinct || seen.add(s)) out.add(UTF8String.fromString(s))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def wordShingles(text: Column, n: Int, distinct: Boolean): Column =
    GraftColumnBridge.column(
      WordShinglesExpr(GraftColumnBridge.expression(text), n, distinct))
}
