package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * Extension surface beyond the reference (BASELINE.json north star).
  * Everything is a native Catalyst expression over string columns —
  * shuffle-free per-row projections that scale linearly with splits and
  * stay inside whole-stage codegen; no UDFs, no driver collects.
  */
object TextOps {

  /** Whitespace-token split (lowercased, trimmed). */
  def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-ish subword proxy: words plus standalone punctuation marks —
    * the shape of a byte-pair tokenizer's pre-tokenization regex. */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("\\w+|[^\\w\\s]"))

  /** English stopword markers for quality scoring. */
  val EnStopwords: Seq[String] =
    Seq("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")

  private def countIn(ws: Column, set: Seq[String]): Column =
    size(filter(ws, w => w.isin(set.map(x => x: Any): _*)))

  /** Per-document quality metrics + a composite score in [0,1].
    * All double math is the same expression tree the oracle runs, so
    * results are bit-identical across engines.
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val ws = words(t)
    val nChars = length(t).cast(DoubleType)
    val nWords = size(ws).cast(DoubleType)
    val punct = regexp_count(t, lit("[^\\w\\s]")).cast(DoubleType)
    val stop = countIn(ws, EnStopwords).cast(DoubleType)
    df.withColumn("n_chars", nChars)
      .withColumn("n_words", nWords)
      .withColumn("avg_word_len",
        round(length(regexp_replace(t, "\\s", "")).cast(DoubleType) / nWords, 4))
      .withColumn("punct_ratio", round(punct / nChars, 6))
      .withColumn("stopword_ratio", round(stop / nWords, 6))
      .withColumn("quality_score",
        round(least(lit(1.0), greatest(lit(0.0),
          lit(0.2)
            + lit(2.0) * (stop / nWords)
            + when(nWords >= 20 && nWords <= 2000, lit(0.3)).otherwise(lit(0.0))
            - lit(1.5) * (punct / nChars))), 6))
  }

  /** Marker-word sets for the n-gram/stopword language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a", "that"),
    "de" -> Seq("der", "die", "und", "ist", "das", "ein", "nicht"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans", "que"),
    "es" -> Seq("el", "los", "y", "es", "una", "por", "como"))

  /** Heuristic language ID: argmax of marker-word hit counts, ties and
    * zero-hits resolving in `LangMarkers` order / to "und" (undetermined
    * — ISO 639-2's code for exactly this).
    */
  def langId(df: DataFrame, textCol: String, out: String = "lang_pred"): DataFrame = {
    val ws = words(col(textCol))
    val scores = LangMarkers.map { case (lang, markers) => lang -> countIn(ws, markers) }
    // strictly-greater chain → first language in declared order wins ties
    val best = scores.foldLeft((lit("und"), lit(0))) { case ((bl, bs), (lang, sc)) =>
      (when(sc > bs, lit(lang)).otherwise(bl), greatest(sc, bs))
    }._1
    df.withColumn(out, best)
  }

  /** Canonical text normalization for content identity: lowercase,
    * collapse whitespace runs, trim. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Content fingerprint: md5 of the normalized text — the exact-dedup
    * identity (reference precedent: sha256 hash identity,
    * `/root/reference/src/pyveb/dbt_client.py:45-58`). */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** 60-bit integer content fingerprint (for compact joins/buckets). */
  def fingerprint64(text: Column): Column =
    graft.functions.Hashes.portable(normalize(text))
}
