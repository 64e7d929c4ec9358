package graft.functions

import java.util.regex.Pattern

import org.apache.spark.unsafe.types.UTF8String

/** The ONE whitespace tokenizer every fused text kernel uses, with
  * semantics bit-identical to the composable form
  * `split(lower(trim(text)), "\s+")` (Spark's split keeps a limit of
  * -1: trailing empty tokens are PRESERVED). Java's `String.split`
  * defaults to limit 0 and silently drops trailing empties, so text
  * ending in '\n'/'\t' (ubiquitous in crawled corpora) would make the
  * fused kernels diverge from the composable/oracle path — exactly the
  * kind of silent signature drift a dedup pipeline can't tolerate.
  */
private[functions] object Tokenize {

  private val Ws = Pattern.compile("\\s+")

  /** trim + lower (same UTF8String kernels Spark's `trim`/`lower`
    * call) + whitespace split with Spark `split` semantics (limit -1). */
  def words(text: UTF8String): Array[String] =
    Ws.split(text.trim().toLowerCase().toString, -1)
}
