package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused MinHash signature kernel: `array<string>` shingles →
  * `array<long>` k-minima signature in one imperative pass.
  *
  * Bit-identical to the composable form
  * `DedupOps.minhashSignatureFromHashes(shingleHashes(sh), k)` (unit-
  * proven), but ~an order of magnitude less per-row overhead: Catalyst
  * higher-order functions evaluate their lambda body through the
  * INTERPRETED expression walker for every element — per shingle that
  * was one tree-walk for the base hash plus a k-wide zip_with/transform
  * tree for the minima update. Here the whole fold is a tight JVM loop
  * (one md5/xxhash call + k multiply-add-compares per shingle) invoked
  * once per row from generated code, so the surrounding projection
  * stays inside whole-stage codegen.
  *
  * Semantics preserved exactly: empty array → init vector (all
  * [[graft.dedup.DedupOps.MinhashP]]); affine family
  * h_j = ((2j+1)·h + j² + 7) mod P over the 60-bit base hash
  * ([[Md5Hash64Expr]] portable tier / xxhash64 fast tier) reduced
  * mod P; null elements skipped.
  */
case class MinhashSigExpr(child: Expression, k: Int, portable: Boolean)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k > 0, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinhashSigExpr.compute(input.asInstanceOf[ArrayData], k, portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinhashSigExpr.compute($c, $k, $portable)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSigExpr {

  private val P = graft.dedup.DedupOps.MinhashP
  private val Xxh64Seed = 42L // Spark's xxhash64(...) default seed

  /** One pass over the shingle array: base-hash each element, fold the
    * k affine minima. Called from generated code — must stay static
    * and allocation-light. */
  def compute(shingles: ArrayData, k: Int, portable: Boolean): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, P)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        val base =
          if (portable) Md5Hash64Expr.hash(s.getBytes) % P // hash() is non-negative
          else {
            val x = org.apache.spark.sql.catalyst.expressions.XXH64
              .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Xxh64Seed)
            ((x % P) + P) % P
          }
        var j = 0
        while (j < k) {
          val v = ((2L * j + 1L) * base + j.toLong * j + 7L) % P
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  def minhashSig(shingles: Column, k: Int, portable: Boolean): Column =
    GraftColumnBridge.column(
      MinhashSigExpr(GraftColumnBridge.expression(shingles), k, portable))
}
