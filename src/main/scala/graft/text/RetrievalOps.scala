package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Lexical retrieval scoring + rank fusion — the missing half of the
  * hybrid-search stack the ANN family already provides. A curation
  * pipeline that mines "documents like these seed queries" wants BOTH
  * a lexical ranking (exact keyword evidence, BM25) and a semantic one
  * (embedding cosine, `SimilarityOps`), fused rank-wise (RRF) so
  * neither score scale has to be calibrated against the other.
  *
  * Reference scope: the reference engine has no retrieval scoring at
  * all (its text surface stops at extraction/cleaning) — this family
  * is beyond-reference capability in the LLM-pipeline tier, designed
  * Spark-first like `TextOps.tfidf` (explode → map-side-combinable
  * aggregations → broadcast-sized term joins).
  */
object RetrievalOps {

  /** Okapi BM25 scores for every (query, document) pair with at least
    * one matching term.
    *
    * `queries` is a DataFrame of `(query_id: String, term: String)`
    * rows — DISTINCT query terms (classic BM25 ignores query-side term
    * frequency). It is expected to be tiny (a seed set, not a corpus)
    * and is broadcast into every join, so the corpus-side plan is:
    * explode → filter-to-query-terms BEFORE any shuffle → one
    * (doc, term) count, plus one corpus-wide doc-length aggregation.
    * Document frequency `df` is computed ONLY for query terms (a
    * ≤|terms| row frame, broadcast back). At 100 TB the only full
    * corpus passes are the token explode and the length aggregation —
    * both map-side combinable, nothing corpus-sized ever sits on the
    * build side of a join.
    *
    * Scoring — Lucene-shaped BM25:
    * {{{
    *   idf(t)    = ln(1 + (D − df + 0.5)/(df + 0.5))
    *   s(t, d)   = idf(t) · tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl·D/T)
    *   bm25(q,d) = Σ_{t ∈ q} s(t, d)
    * }}}
    * with `D` docs, `T` total tokens (so `avgdl = T/D` — folded in as
    * `dl·D/T` to keep every operand exact-integer-derived), `dl` the
    * doc's token count. `D`/`T` are bounded scalars fitted at
    * plan-build time (the `tfidf` precedent).
    *
    * Cross-engine determinism (the `TextOps.unigramLogProb` contract,
    * applied at the right altitude): the ONLY libm op is the `ln` in
    * `idf`, and `idf` depends on nothing but `df` — so the IDF is
    * snapped to 1e-8 fixed point immediately (`floor(idf·1e8 + 0.5)`),
    * leaving at most |query terms| cross-engine boundary checks in the
    * whole operator. Everything downstream of the snapped IDF —
    * multiplies, the length-normalized division, the second 1e-8 score
    * snap — is a fixed IEEE expression tree over exact-integer-derived
    * operands, bit-identical in any engine; the per-doc sum runs over
    * snapped integers, so summation ORDER can never flip a digit.
    * (First cut snapped only the final per-term score: ~45k boundary
    * checks at sf0.01 and one real flip in the oracle gate; snapping
    * the IDF collapsed the exposure to the ≤8 distinct df values.)
    * The snapped integer sum is also the ranking key in [[bm25TopK]],
    * so ranks are bit-deterministic too.
    *
    * Output: `(query_id, <idCol>, bm25: double — the exact snapped sum
    * / 1e8, deliberately NOT re-rounded: a decimal round of a value
    * that can sit exactly on the half boundary is where engines'
    * rounding conventions diverge; one IEEE division of an exact
    * integer is bit-identical everywhere — n_terms: long matched query
    * terms, s8: long — the exact fixed-point sum, kept for
    * deterministic downstream ranking)`.
    */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
                 queries: DataFrame, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qt = queries.select(col("query_id").cast(StringType).as("query_id"),
      col("term")).distinct()
    val toks = docs.select(col(idCol), explode(TextOps.words(col(textCol))).as("term"))
    // corpus stats: one map-side-combinable agg (dl), two bounded scalars
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val dT = docs.count().toDouble       // D: corpus size
    val tT = {                            // T: total tokens
      val r = dl.agg(sum("dl")).head
      if (r.isNullAt(0)) 0.0 else r.getLong(0).toDouble
    }
    // corpus side filtered to query terms BEFORE the (doc, term) shuffle
    val tf = toks.join(broadcast(qt.select("term").distinct()), "term")
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("__idf8", floor(
        log(lit(1.0) + (lit(dT) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * lit(1e8) + lit(0.5)).cast(LongType))
    val idf = col("__idf8").cast(DoubleType) / lit(1e8)
    val score = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1 * (1.0 - b)) + (lit(k1 * b) * col("dl") * lit(dT)) / lit(tT))
    tf.join(broadcast(dfT), "term")
      .join(dl, idCol)
      .join(broadcast(qt), "term")
      .select(col("query_id"), col(idCol),
        floor(score * lit(1e8) + lit(0.5)).cast(LongType).as("__s8"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("__s8")).as("s8"), count(lit(1)).as("n_terms"))
      .select(col("query_id"), col(idCol),
        (col("s8").cast(DoubleType) / lit(1e8)).as("bm25"),
        col("n_terms"), col("s8"))
  }

  /** Top-k BM25 ranking per query. Rank order is the exact fixed-point
    * sum descending, id ascending — fully deterministic, replayable in
    * any engine. One extra shuffle on `query_id` for the rank window
    * (per-query partitions; the query set is small so a TopK
    * aggregator would save nothing — the expensive part is upstream).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("s8").desc, col(idCol))
    bm25Scores(docs, idCol, textCol, queries, k1, b)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("bm25"), col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009): fuse N per-query
    * rankings of (possibly different) candidate sets into one, scoring
    * each candidate `Σ_r 1/(K + rank_r)` over the rankings that
    * contain it. Rank-based, so a BM25 ranking and a cosine ranking
    * fuse without any score calibration — the standard hybrid-search
    * combiner.
    *
    * Inputs: each DataFrame carries `(queryCol, idCol, rankCol)`;
    * ranks are 1-based and assumed deterministic (both this module's
    * [[bm25TopK]] and `SimilarityOps`' top-k shapes tie-break by id).
    * Plan: union the (tiny, already-top-k'd) rankings → one
    * (query, id) aggregation → one per-query rank window. Inputs are
    * k·|queries| rows each, so at ANY corpus scale this stage is
    * bounded by the serving budget, not the data.
    *
    * Determinism: each contribution is snapped to fixed-point 1e-12
    * units (`floor(1e12/(K+rank) + 0.5)` — one IEEE division, then
    * exact integers), summed order-free, and the snapped sum is the
    * ranking key (ties by id). `rrf` is the snapped sum / 1e12 — one
    * IEEE division, not re-rounded (same half-boundary rationale as
    * [[bm25Scores]]).
    *
    * Output: `(query_id, <idCol>, rrf: double, n_sources: long,
    * rank: int)` rows with `rank ≤ k`.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, k: Int,
              kConst: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val normalized = rankings.map(_.select(
      col("query_id").cast(StringType).as("query_id"),
      col(idCol).cast(LongType).as(idCol),
      floor(lit(1e12) / (lit(kConst.toDouble) + col("rank")) + lit(0.5))
        .cast(LongType).as("__c12")))
    val unioned = normalized.reduce(_ unionAll _)
    val w = Window.partitionBy("query_id").orderBy(col("__s12").desc, col(idCol))
    unioned.groupBy(col("query_id"), col(idCol))
      .agg(sum("__c12").as("__s12"), count(lit(1)).as("n_sources"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol),
        (col("__s12").cast(DoubleType) / lit(1e12)).as("rrf"),
        col("n_sources"), col("rank"))
  }
}
