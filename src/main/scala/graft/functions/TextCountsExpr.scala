package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused text-count kernel: every integer count the quality-scoring and
  * language-ID operators need, in ONE pass over the text —
  * `struct<n_words, n_punct, n_stop, en, de, fr, es>`.
  *
  * The composable forms tokenize the text once per metric and walk an
  * interpreted `filter` lambda per marker set (quality: split + filter;
  * langid: split + 4 filters). Counts are integers, so fusing them
  * cannot perturb the derived double metrics — those stay as the exact
  * Column math the oracle mirrors. Regex counts use the same
  * `java.util.regex` engine Spark's `regexp_count` calls, with the
  * identical pattern.
  */
case class TextCountsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = TextCountsExpr.Schema
  override def prettyName: String = "text_counts"

  override def nullSafeEval(input: Any): Any =
    TextCountsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextCountsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextCountsExpr {

  val Schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("en", IntegerType, nullable = false),
    StructField("de", IntegerType, nullable = false),
    StructField("fr", IntegerType, nullable = false),
    StructField("es", IntegerType, nullable = false)))

  // same pattern string the composable form passes to regexp_count —
  // java.util.regex semantics on both paths
  private val Punct = java.util.regex.Pattern.compile("[^\\w\\s]")

  private def set(ws: Seq[String]) = {
    val s = new java.util.HashSet[String](ws.size * 2)
    ws.foreach(s.add); s
  }
  private lazy val Stop = set(graft.text.TextOps.EnStopwords)
  private lazy val Markers: Array[java.util.HashSet[String]] =
    graft.text.TextOps.LangMarkers.map(m => set(m._2)).toArray

  def compute(text: UTF8String): GenericInternalRow = {
    val raw = text.toString
    val words = Tokenize.words(text)
    var stop = 0
    val lang = new Array[Int](Markers.length)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (Stop.contains(w)) stop += 1
      var l = 0
      while (l < Markers.length) {
        if (Markers(l).contains(w)) lang(l) += 1
        l += 1
      }
      i += 1
    }
    var punct = 0
    val m = Punct.matcher(raw)
    while (m.find()) punct += 1
    new GenericInternalRow(Array[Any](
      words.length, punct, stop, lang(0), lang(1), lang(2), lang(3)))
  }

  def textCounts(text: Column): Column =
    GraftColumnBridge.column(TextCountsExpr(GraftColumnBridge.expression(text)))
}
