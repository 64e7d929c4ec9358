package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Fused vector-quantizer kernels for the ANN index-build path.
  *
  * Both the IVF coarse assignment and the PQ encoding were composable
  * expression trees (`argmin over aggregate(zip_with(...))` per
  * centroid): correct, but interpreted — the IVF assignment walks
  * nLists × dim lambda evaluations per row and PQ encoding m × k × sub
  * more, and both run over EVERY corpus row at index build. Fusing them
  * into one static loop with the centroid matrix attached as a
  * reference object is the same trade the text kernels made
  * ([[MinhashSigExpr]]): ~100× on the hot projection, semantics
  * bit-identical (same left-to-right double accumulation, same
  * (distance, index) tiebreak as `array_sort` on the struct).
  */

/** `n` nearest centroid ids for an `array<float>` vector, by squared L2
  * distance, ties broken by ascending id — `array<int>`, nearest first. */
case class NearestCentroidsExpr(child: Expression,
                                centroids: Array[Array[Double]],
                                ids: Array[Int], n: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if n > 0 && centroids.nonEmpty &&
      centroids.length == ids.length => TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires n > 0 and matching centroid/id counts")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override def nullSafeEval(input: Any): Any =
    NearestCentroidsExpr.compute(input.asInstanceOf[ArrayData], centroids, ids, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val idRef = ctx.addReferenceObj("ids", ids, "int[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NearestCentroidsExpr.compute($c, $cRef, $idRef, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroidsExpr {

  def compute(vec: ArrayData, centroids: Array[Array[Double]],
              ids: Array[Int], n: Int): ArrayData = {
    val k = centroids.length
    val d2 = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = centroids(c)
      val dim = math.min(vec.numElements(), cent.length)
      var acc = 0.0
      var i = 0
      while (i < dim) {
        val t = vec.getFloat(i).toDouble - cent(i)
        acc += t * t
        i += 1
      }
      d2(c) = acc
      c += 1
    }
    // partial selection of the n smallest (d, id) — n is tiny (probes)
    val taken = new Array[Boolean](k)
    val out = new Array[Any](math.min(n, k))
    var j = 0
    while (j < out.length) {
      var best = -1
      var c2 = 0
      while (c2 < k) {
        if (!taken(c2) && (best < 0 || d2(c2) < d2(best) ||
          (d2(c2) == d2(best) && ids(c2) < ids(best)))) best = c2
        c2 += 1
      }
      taken(best) = true
      out(j) = ids(best)
      j += 1
    }
    new GenericArrayData(out)
  }

  def nearest(vec: Column, centroids: Array[(Int, Array[Double])], n: Int): Column =
    GraftColumnBridge.column(NearestCentroidsExpr(
      GraftColumnBridge.expression(vec),
      centroids.map(_._2), centroids.map(_._1), n))
}

/** PQ codes for an `array<float>` vector: per subspace `s`, the index of
  * the nearest codebook centroid (squared L2 over the subvector, ties to
  * the lower code) — `array<int>` of length m. */
case class PqEncodeExpr(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if codebooks.nonEmpty &&
      codebooks.forall(_.nonEmpty) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires non-empty codebooks")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any =
    PqEncodeExpr.compute(input.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqEncodeExpr.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncodeExpr {

  def compute(vec: ArrayData, codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val m = codebooks.length
    val out = new Array[Any](m)
    var s = 0
    var base = 0
    while (s < m) {
      val book = codebooks(s)
      val sub = book(0).length
      var bestC = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var acc = 0.0
        var i = 0
        while (i < sub && base + i < vec.numElements()) {
          val t = vec.getFloat(base + i).toDouble - cent(i)
          acc += t * t
          i += 1
        }
        if (acc < bestD) { bestD = acc; bestC = c } // strict < keeps the lower code on ties
        c += 1
      }
      out(s) = bestC
      base += sub
      s += 1
    }
    new GenericArrayData(out)
  }

  def encode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.column(PqEncodeExpr(GraftColumnBridge.expression(vec), codebooks))
}
