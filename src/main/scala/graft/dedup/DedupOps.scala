package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Hashes
import graft.text.TextOps

/** Document deduplication operators: exact (content fingerprint),
  * MinHash+LSH, SimHash, and exact n-gram Jaccard.
  *
  * Extension surface beyond the reference (BASELINE.json north star).
  *
  * Scale design (100 TB posture): no cross joins anywhere. Candidate
  * generation is shingle/band-bucket **equi-joins** — each pair of
  * near-duplicates meets in at least one bucket, so the join shuffles
  * on bucket keys and never materializes the O(N²) pair space. Hot
  * buckets (stop-shingles) are the skew risk: `maxBucket` caps them
  * (drop buckets larger than the cap — a bucket that common carries no
  * dedup signal), and AQE skew-join splits the rest. Signatures are
  * per-row projections (codegen'd HOFs, no UDFs).
  *
  * Hash tiers: `portable = true` routes through the md5-based
  * cross-engine hash (oracle-checkable); production default is
  * xxhash64 ([[Hashes]]).
  */
object DedupOps {

  // ---------------------------------------------------------------- shingles

  /** Distinct word n-gram shingles of a text column (lowercased,
    * whitespace-tokenized). Texts with fewer than n words → empty array.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val ws = TextOps.words(text)
    array_distinct(
      when(size(ws) >= n,
        transform(sequence(lit(1), size(ws) - (n - 1)),
          i => concat_ws(" ", slice(ws, i, lit(n)))))
        .otherwise(array().cast(ArrayType(StringType))))
  }

  /** Distinct character n-gram shingles (whitespace collapsed). */
  def charShingles(text: Column, n: Int): Column = {
    val t = TextOps.normalize(text)
    array_distinct(
      when(length(t) >= n,
        transform(sequence(lit(1), length(t) - (n - 1)),
          i => substr(t, i, lit(n))))
        .otherwise(array().cast(ArrayType(StringType))))
  }

  // ---------------------------------------------------------------- exact

  /** Exact dedup by content fingerprint, deterministic first-wins on
    * `order`. One shuffle on the fingerprint. */
  def exactDedup(df: DataFrame, textCol: String, order: Seq[Column]): DataFrame =
    graft.relational.RelationalOps.dedupByKeyFirst(
      df.withColumn("__fp", TextOps.fingerprint(col(textCol))),
      Seq("__fp"), order).drop("__fp")

  /** Group rows by content identity: fingerprint, representative id
    * (min), multiplicity. */
  def contentGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextOps.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_copies"))

  // ---------------------------------------------------------------- minhash

  private def seededHash(portable: Boolean)(j: Column, s: Column): Column =
    if (portable) Hashes.portable(concat(j.cast(StringType), lit("|"), s))
    else xxhash64(j, s)

  /** k-element MinHash signature of a shingle-array column. Empty
    * shingle arrays yield an all-null signature (filtered by callers).
    */
  def minhashSignature(shingles: Column, k: Int, portable: Boolean = false): Column =
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(shingles, s => seededHash(portable)(j, s))))

  /** LSH band keys: the signature cut into `bands` slices of `rowsPer`
    * hashes, each rendered to a join key. */
  def bandKeys(sig: Column, bands: Int, rowsPer: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat_ws(",", slice(sig, b * lit(rowsPer) + 1, lit(rowsPer))))

  /** Estimated Jaccard from two signatures: fraction of agreeing
    * positions. */
  def estJaccard(a: Column, b: Column, k: Int): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast(DoubleType) / k

  /** MinHash+LSH near-duplicate pairs: shingle → signature → band
    * buckets → bucket equi-join → estimated-Jaccard filter. Returns
    * (id_a, id_b, est_jaccard) with id_a < id_b.
    *
    * @param maxBucket drop buckets with more members than this (stop-
    *   shingle skew guard; a bucket that hot is noise, not signal).
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          shingleN: Int = 3, k: Int = 16, bands: Int = 8,
                          threshold: Double = 0.5, portable: Boolean = false,
                          maxBucket: Int = 1000): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val rowsPer = k / bands
    val sigs = df
      .select(col(idCol).as("__id"), wordShingles(col(textCol), shingleN).as("__sh"))
      .where(size(col("__sh")) > 0)
      .select(col("__id"), minhashSignature(col("__sh"), k, portable).as("__sig"))
    val buckets = sigs
      .select(col("__id"), col("__sig"),
        posexplode(bandKeys(col("__sig"), bands, rowsPer)).as(Seq("__band", "__key")))
    val pruned = buckets.withColumn("__bn",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("__band", "__key")))
      .where(col("__bn") <= maxBucket).drop("__bn")
    val a = pruned.select(col("__band"), col("__key"), col("__id").as("id_a"), col("__sig").as("__sig_a"))
    val b = pruned.select(col("__band"), col("__key"), col("__id").as("id_b"), col("__sig").as("__sig_b"))
    a.join(b, Seq("__band", "__key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        estJaccard(col("__sig_a"), col("__sig_b"), k).as("est_jaccard"))
      .distinct()
      .where(col("est_jaccard") >= threshold)
  }

  // ---------------------------------------------------------------- jaccard

  /** Exact n-gram Jaccard near-duplicate pairs via shingle equi-join
    * (candidates = pairs sharing ≥1 shingle; exact similarity computed
    * from intersection counts — never a cross join).
    * Returns (id_a, id_b, jaccard) with id_a < id_b.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, threshold: Double = 0.5,
                        maxBucket: Int = 1000): DataFrame = {
    val sh = df.select(col(idCol).as("__id"),
      explode(wordShingles(col(textCol), shingleN)).as("__s"))
    val sizes = sh.groupBy("__id").agg(count(lit(1)).as("__n"))
    val shPruned = sh.withColumn("__bn",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("__s")))
      .where(col("__bn") <= maxBucket).drop("__bn")
    val inter = shPruned.select(col("__id").as("id_a"), col("__s"))
      .join(shPruned.select(col("__id").as("id_b"), col("__s")), Seq("__s"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("__inter"))
    inter
      .join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("__n", "__na"), "id_a")
      .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("__n", "__nb"), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("__inter").cast(DoubleType) /
          (col("__na") + col("__nb") - col("__inter"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  // ---------------------------------------------------------------- simhash

  /** SimHash of the whitespace tokens: per-bit vote of token hashes
    * (each occurrence votes ±1), sign → bit. `bits` ≤ 60 (portable
    * hash width). One codegen'd projection, no shuffle.
    */
  def simhash(text: Column, bits: Int = 32, portable: Boolean = false): Column = {
    val ws = TextOps.words(text)
    val h: Column => Column =
      if (portable) Hashes.portable else (c: Column) => abs(xxhash64(c))
    val votes = aggregate(
      ws,
      array_repeat(lit(0), bits),
      (acc, t) => zip_with(acc,
        transform(sequence(lit(0), lit(bits - 1)),
          b => when(call_function("shiftright", h(t), b) % 2 === 1, 1).otherwise(-1)),
        (a, v) => a + v))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(bits - 1)),
        (v, b) => when(v > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two simhash values. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
