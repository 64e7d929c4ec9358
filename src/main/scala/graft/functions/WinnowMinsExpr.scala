package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sorted distinct sliding-window minima of a long array — the
  * winnowing selection step ([[graft.text.TextOps.winnowFingerprints]])
  * as one imperative pass. The composable form
  * `array_sort(array_distinct(transform(seq, p -> array_min(slice(hs,
  * p, w)))))` allocates a w-element slice per position and re-scans it
  * — O(n·w) work and O(n) allocations per document; this kernel is the
  * classic monotonic-deque sliding minimum: O(n) with two fixed
  * scratch arrays. Bit-parity with the composable form is unit-proven.
  *
  * Fewer elements than one window yield the single global minimum
  * (the short-document floor); an empty array yields an empty result.
  */
case class WinnowMinsExpr(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0, s"WinnowMinsExpr: window must be > 0, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_mins"

  override def nullSafeEval(input: Any): Any =
    WinnowMinsExpr.mins(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowMinsExpr.mins($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowMinsExpr {

  /** Sorted distinct minima of every `w`-window of `arr`. Null
    * elements are SKIPPED (the same stance `array_min` takes inside
    * the composable form) — [[graft.text.TextOps.winnowFingerprints]]
    * null-guards at the text level so in practice no null reaches
    * here, but a hash array that does carry one must not be silently
    * read as the bogus fingerprint 0. */
  def mins(arr: ArrayData, w: Int): ArrayData = {
    val n0 = arr.numElements()
    var nn = 0
    var i0 = 0
    while (i0 < n0) { if (!arr.isNullAt(i0)) nn += 1; i0 += 1 }
    val hs = new Array[Long](nn)
    var j0 = 0
    i0 = 0
    while (i0 < n0) {
      if (!arr.isNullAt(i0)) { hs(j0) = arr.getLong(i0); j0 += 1 }
      i0 += 1
    }
    val n = nn
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    if (n < w) {
      var m = hs(0); var i = 1
      while (i < n) { if (hs(i) < m) m = hs(i); i += 1 }
      return new GenericArrayData(Array(m))
    }
    // monotonic deque of candidate indices: front is the current
    // window's minimum; values behind a smaller newcomer can never win
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0
    val res = new Array[Long](n - w + 1)
    var i = 0
    while (i < n) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) res(i - w + 1) = hs(deque(head))
      i += 1
    }
    java.util.Arrays.sort(res)
    var m = 0
    var j = 0
    while (j < res.length) {
      if (m == 0 || res(m - 1) != res(j)) { res(m) = res(j); m += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(res, m))
  }

  def winnowMins(hashes: Column, w: Int): Column =
    GraftColumnBridge.column(WinnowMinsExpr(GraftColumnBridge.expression(hashes), w))
}
