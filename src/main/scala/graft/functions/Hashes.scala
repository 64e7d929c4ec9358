package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic 60-bit string hashes used by dedup / fingerprint /
  * LSH operators.
  *
  * Two tiers:
  *   - [[fast]]: `xxhash64` — native, codegen'd, the 100 TB path.
  *   - [[portable]]: first 15 hex chars of md5 as a BIGINT — slower but
  *     reproducible in any engine (DuckDB: `('0x' || substr(md5(s),1,15))::BIGINT`),
  *     so oracle-checked queries use this tier. Both are uniform enough
  *     for minhash/simhash/LSH banding.
  */
object Hashes {

  /** xxhash64 of the column (any type), fixed default seed. */
  def fast(c: Column): Column = xxhash64(c)

  /** Seeded fast hash: mixes an integer seed into the hash input. */
  def fastSeeded(seed: Int, c: Column): Column = xxhash64(lit(seed), c)

  /** Cross-engine 60-bit hash: BIGINT of md5(s)[0,15) hex chars —
    * computed by the codegen'd [[Md5Hash64Expr]] (bit-identical to
    * `conv(substring(md5(c),1,15),16,10)` without the hex string or
    * BigInteger parse). */
  def portable(c: Column): Column = Md5Hash64Expr.md5Hash64(c)

  /** The composable form of [[portable]] (kept for cross-checking the
    * custom expression in tests). */
  def portableViaConv(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Seeded portable hash — seed prefixed into the hashed string. */
  def portableSeeded(seed: Int, c: Column): Column =
    portable(concat(lit(seed.toString), lit("|"), c))
}

/** Expression-level let-binding.
  *
  * Catalyst has no `let`: referencing a subexpression twice evaluates
  * it twice, and a lambda body referencing an outer expression
  * re-evaluates it PER ELEMENT (e.g. `transform(seq, i -> slice(ws, i,
  * n))` recomputes `ws` for every i — turning an O(words) shingle op
  * into O(words²)). [[Let.bind]] forces single evaluation by routing
  * the value through a one-element array and binding it to a lambda
  * variable, which IS cheap to reference.
  */
object Let {
  def bind(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), x => f(x)), 1)

  def bind2(e1: Column, e2: Column)(f: (Column, Column) => Column): Column =
    bind(e1)(x1 => bind(e2)(x2 => f(x1, x2)))
}
