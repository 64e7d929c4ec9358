package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Union / dedup / join operators (SURVEY.md §2.3, §2.4, §2.6).
  *
  * The reference performs its joins either as warehouse SQL (DELETE
  * USING / NOT EXISTS, `src/pyveb/rs_client.py:242-283,174-233`) or as
  * pure-Python dict hash joins (`src/pyveb/common.py:326-354`); here
  * they are native `Dataset.join`s so Catalyst picks broadcast-hash vs
  * sort-merge from statistics, and AQE re-plans skew at runtime.
  */
object RelationalOps {

  /** Fold N frames with union-by-name, tolerating per-file schema drift
    * (missing columns become NULL).
    * Reference: `_unite_dfs` `src/pyveb/spark_client.py:430-432`. */
  def uniteByName(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "uniteByName: no inputs")
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Distinct over full records.
    * Reference: `remove_duplicate_from_list_of_dicts` `src/pyveb/common.py:290-292`. */
  def dedupExact(df: DataFrame): DataFrame = df.distinct()

  /** Dedup by key, keeping the first row per key in `order` — the
    * deterministic form of the reference's seen-set first-wins dedup
    * (`remove_duplicates_from_list_of_dicts_by_key`
    * `src/pyveb/common.py:294-303`; order there = list order, which has
    * no distributed analog, so the caller names the ordering column).
    * One shuffle on `keys`; at scale prefer keys that match the table's
    * existing partitioning to make it map-side.
    */
  def dedupByKeyFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Keys that occur more than once (empty ⇔ no duplicates) — the
    * engine-side form of the reference's hash-identity duplicate check
    * (`check_duplicates` `src/pyveb/dbt_client.py:649-658`). */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).count().where(col("count") > 1)

  /** Enrichment join with the strict contract of the reference's
    * `merge_dicts` (`src/pyveb/common.py:326-354`): every left row MUST
    * find a build-side match (KeyError there). Spark joins don't throw
    * on misses, so when `strict` we count the anti-join remainder (cheap:
    * the join is usually broadcast) and fail if non-zero.
    */
  def strictEnrichJoin(left: DataFrame, right: DataFrame, key: Seq[String],
                       addCols: Seq[String], strict: Boolean = true): DataFrame = {
    val build = right.select((key ++ addCols).distinct.map(col): _*)
    if (strict) {
      // merge_dicts is a dict lookup: a duplicated build key could never
      // produce two matches there, so fan-out must fail loudly too
      val dupKeys = duplicateKeys(build, key).limit(1).count()
      if (dupKeys > 0)
        throw new IllegalStateException(
          s"strictEnrichJoin: duplicate build-side keys on ${key.mkString(",")}")
      val missing = left.join(broadcast(build), key, "left_anti").limit(1).count()
      if (missing > 0)
        throw new IllegalStateException(
          s"strictEnrichJoin: left rows with no match on ${key.mkString(",")}")
    }
    left.join(broadcast(build), key, "inner")
  }

  /** Skew-resistant equi-join: the left (fact) side gets a salt in
    * [0, salt), the right side is exploded `salt`× with every salt
    * value, and the join key becomes (keys…, salt). A key that would
    * land 10⁹ rows in one reducer now spreads across `salt` reducers;
    * results are row-for-row identical to the plain join (each left row
    * matches exactly its salt copy of the right row). AQE's skew-join
    * splitting handles moderate skew automatically — this operator is
    * for the pathological keys AQE can't split (single hot key bigger
    * than an executor). Right side grows `salt`× in the shuffle: use
    * for big-fact ⋈ modest-dim joins where the dim outgrew broadcast.
    *
    * The salt is derived by hashing the full left row (deterministic,
    * retry-safe) — rows identical in every column share a salt, which
    * is harmless (they are indistinguishable anyway).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salt: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt must be > 1")
    // right/full-outer would emit `salt` null-padded copies of every
    // unmatched right row (it was exploded salt ways) — reject rather
    // than silently duplicate
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti").contains(jt),
      s"saltedJoin supports inner/left/left_semi/left_anti, not $joinType")
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(salt)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** [[saltedJoin]] with the salt applied ONLY to hot keys: a
    * frequency pre-pass over the left (fact) side finds keys with more
    * than `hotThreshold` rows, and only those are salted — the right
    * side is exploded `salt`× for hot keys alone, while the long tail
    * joins unsalted. Universal salting taxes EVERY row with a `salt`×
    * right-side shuffle blow-up even when the keys aren't skewed; here
    * the blow-up is `salt × |hot keys|` rows, which is what makes the
    * operator usable as a default at 100 TB (the pre-pass itself is one
    * partial-aggregated count shuffle of (key, count) pairs — far
    * smaller than the data). There are at most |left| / hotThreshold
    * hot keys by construction, so the hot-key set broadcasts.
    *
    * Row-for-row identical to the plain join: a hot left row carries
    * one salt in [0, salt) and meets exactly the matching salted copy
    * of its right rows; a cold row carries salt 0 and meets the single
    * unsalted copy.
    */
  def saltedJoinTargeted(left: DataFrame, right: DataFrame, keys: Seq[String],
                         salt: Int = 16, hotThreshold: Long = 1000000L,
                         joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti").contains(jt),
      s"saltedJoinTargeted supports inner/left/left_semi/left_anti, not $joinType")
    val hot = left.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__kn"))
      .where(col("__kn") > hotThreshold)
      .select(keys.map(col): _*).withColumn("__hot", lit(true))
    val l = left.join(broadcast(hot), keys, "left")
      .withColumn("__salt",
        when(col("__hot"),
          pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(salt)).cast("int"))
          .otherwise(lit(0)))
      .drop("__hot")
    val r = right.join(broadcast(hot), keys, "left")
      .withColumn("__salt", explode(
        when(col("__hot"), sequence(lit(0), lit(salt - 1)))
          .otherwise(array(lit(0)))))
      .drop("__hot")
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Backward as-of (point-in-time) join: for every left row, attach
    * the payload of the LATEST right row with the same keys and
    * `right.ts <= left.ts` (inclusive, like pandas `merge_asof` and
    * DuckDB/kdb ASOF JOIN); left rows with no prior right row keep NULL
    * payloads (left-join semantics). The canonical feature-store /
    * slowly-changing-dimension lookup.
    *
    * Scale shape: the naive formulation — equi-join on keys + `l.ts >=
    * r.ts` filter + latest-wins window — materializes every (left,
    * right) pair per key before pruning, O(|l|·|r|) per key. Here the
    * two sides are UNIONED instead, tagged, and sorted once per key by
    * (ts, side): a running `last(payload, ignoreNulls)` window then
    * hands every left row its most recent right payload in O((|l|+|r|)
    * log) with exactly ONE shuffle on the keys and no pair blow-up.
    * Within a timestamp tie, right sorts before left (inclusive match)
    * and payload order breaks right-vs-right ties deterministically.
    *
    * @param payload right-side columns to attach (suffixed on output).
    * @param toleranceSecs match only right rows within this many
    *   seconds before the left row (`tolerance` in merge_asof) — older
    *   matches become NULL.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
               payload: Seq[String], suffix: String = "_asof",
               toleranceSecs: Option[Long] = None): DataFrame = {
    require(payload.nonEmpty, "asofJoin: no payload columns")
    val keyAndTs = keys :+ tsCol
    // the payload struct carries the right row's ts for the tolerance
    // check; it also makes the whole match one ignoreNulls-last value
    val rPayload = struct((col(tsCol).as("__rts") +: payload.map(col)): _*)
    val rTagged0 = right
      .select((keyAndTs.map(col) :+ rPayload.as("__p")): _*)
      .withColumn("__src", lit(0))
    val leftExtra = left.columns.filterNot(keyAndTs.contains)
    val rTagged = leftExtra.foldLeft(rTagged0)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val lTagged = left
      .withColumn("__p", lit(null).cast(rTagged0.schema("__p").dataType))
      .withColumn("__src", lit(1))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__src").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
    val inTolerance = toleranceSecs.fold(lit(true))(t =>
      unix_timestamp(col(tsCol)) - unix_timestamp(col("__m.__rts")) <= t)
    val outPayload = payload.map(c =>
      when(col("__m").isNotNull && inTolerance, col(s"__m.$c")).as(s"$c$suffix"))
    matched.where(col("__src") === 1)
      .select((left.columns.map(col) ++ outPayload).toSeq: _*)
  }

  /** Range (interval) join: pair every point row with every interval
    * row whose `[lo, hi]` contains it (inclusive). Spark plans a bare
    * `points JOIN intervals ON p BETWEEN lo AND hi` as a broadcast-
    * nested-loop or cartesian — O(|points|·|intervals|) compares. Here
    * both sides are BINNED: a point lands in bin floor(p/binWidth), an
    * interval is exploded to every bin it overlaps, and candidates meet
    * in an equi-join on the bin before the exact containment filter.
    * A point has exactly one bin, and probed bins are disjoint, so each
    * qualifying pair meets exactly once — no dedup shuffle.
    *
    * `binWidth` tunes fan-out: intervals explode to
    * ceil(len/binWidth)+1 bins, so pick binWidth ≈ the typical interval
    * length (explosion ~2×) — far below the pair blow-up it replaces.
    * One shuffle on the bin key; AQE splits hot bins.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointCol: String, loCol: String, hiCol: String,
                binWidth: Long): DataFrame = {
    require(binWidth > 0, "rangeJoin: binWidth must be > 0")
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth))
    val i = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    p.join(i, Seq("__bin"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Equality filter with the reference's case modes
    * (`filter_list_of_dicts_on_key_value` `src/pyveb/common.py:375-384`). */
  /** Bloom-filter pre-join pruning: probe every big-side row against a
    * compact sketch of the small side's keys and drop certain misses
    * BEFORE the join's shuffle — the classic selective-join move at
    * 100 TB, where the join keeps 1% of the fact table and the other
    * 99% should never cross the wire. The sketch is built in one pass
    * over the small side (driver-held, size bounded by
    * `expectedItems`/`fpp` — ~1 MB per million keys at 3%), probed
    * inside whole-stage codegen
    * ([[graft.functions.BloomMightContainExpr]]), and the surviving
    * rows go through an EXACT join — false positives cost only wasted
    * shuffle, never a wrong row, so the result is exactly the plain
    * join's.
    *
    * Only join types where dropping non-matching big-side rows is
    * sound are allowed (`inner`, `left_semi` with big on the left);
    * an outer flavor would need the dropped rows back.
    *
    * `expectedItems` ≤ 0 (the default) sizes the sketch from
    * `small.count()` — one cheap action against the already-small side.
    * A fixed guess that undershoots the real cardinality saturates the
    * filter: the result stays exact (the join behind it is), but the
    * probe starts passing nearly everything and the pre-shuffle prune —
    * the operator's entire reason to exist — silently evaporates.
    */
  def bloomPrefilteredJoin(big: DataFrame, small: DataFrame,
                           bigKey: String, smallKey: String,
                           joinType: String = "inner",
                           expectedItems: Long = -1L,
                           fpp: Double = 0.03): DataFrame = {
    require(Set("inner", "left_semi", "leftsemi").contains(joinType.toLowerCase),
      s"bloomPrefilteredJoin: pre-dropping big-side rows is only sound for " +
        s"inner/left_semi joins, got '$joinType'")
    // auto-size: saturation-proof by construction. Count and sketch
    // build are two EAGER passes over the small side — cache a
    // function-owned identity projection (its own analyzed plan, so
    // its own cache entry) across the pair and release it before
    // returning. Persisting the caller's frame directly would mutate
    // its storage level and leak an entry into a long-lived session
    // cache (the engine's release-thunk contract: whoever persists,
    // unpersists). The join below re-reads `small` once uncached —
    // one extra scan of the already-small side, never a leak.
    val (items, sketchSrc, release): (Long, DataFrame, () => Unit) =
      if (expectedItems > 0) (expectedItems, small, () => ())
      else {
        val owned = small.select(small.columns.toIndexedSeq.map(col): _*)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (math.max(1L, owned.count()), owned, () => { owned.unpersist(); () })
      }
    val sketch = sketchSrc.stat.bloomFilter(smallKey, items, fpp)
    release()
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    if (log.isDebugEnabled) log.debug(
      s"[graft.bloom] expectedItems=$items fpp=$fpp bitSize=${sketch.bitSize()}")
    val pruned = big.where(
      graft.functions.BloomMightContainExpr.mightContain(col(bigKey), sketch))
    pruned.join(small, pruned(bigKey) === small(smallKey), joinType)
  }

  /** Explicit-values PIVOT: `rowKeys` down the side, one output column
    * per `pivotValues` entry, each holding `aggExpr` over the rows
    * where `pivotCol` equals that value — the reporting cross-tab.
    * The value list is a REQUIRED literal: Spark's value-discovering
    * `pivot(col)` first runs a distinct+collect over the pivot column
    * (a hidden corpus action and an unbounded driver list — exactly
    * what a 100 TB plan must not bury inside a report query), and a
    * drifting value set silently changes the output schema. With
    * literals the plan is one groupBy shuffle with map-side partials,
    * the schema is a contract, and values outside the list are
    * dropped BY DECLARATION (count them first with an
    * [[graft.schema.Expectations.InSet]] rule if they must be zero).
    */
  def pivotAgg(df: DataFrame, rowKeys: Seq[String], pivotCol: String,
               pivotValues: Seq[String], aggExpr: Column): DataFrame = {
    require(rowKeys.nonEmpty, "pivotAgg: need at least one row key")
    require(pivotValues.nonEmpty, "pivotAgg: explicit pivotValues required " +
      "(value discovery is a hidden corpus scan + unbounded collect)")
    df.groupBy(rowKeys.map(col): _*)
      .pivot(pivotCol, pivotValues)
      .agg(aggExpr)
  }

  /** Blocked fuzzy (entity-resolution) join: candidate pairs meet in
    * equi-joins on caller-supplied BLOCKING keys, then an exact
    * Levenshtein refine keeps pairs with `lev(leftCol, rightCol) <=
    * maxDist`. The classic two-phase record-linkage shape (Fellegi–
    * Sunter blocking + edit-distance compare): an unblocked fuzzy join
    * is the O(|L|·|R|) cartesian Spark would plan for a bare
    * `levenshtein(l, r) <= k` predicate — at 100 TB the blocking IS
    * the operator.
    *
    * `blockKeys` is one (leftKey, rightKey) expression pair per PASS;
    * a true match missed by one pass (the perturbation hit that key)
    * is recovered by another — multi-pass blocking is how linkage
    * systems buy recall without widening any single block. The
    * Levenshtein refine runs IN-STAGE on each pass's join output
    * (codegen'd, before anything shuffles again), and only then are
    * passes unioned and full-row-deduplicated — so the one pair-keyed
    * shuffle carries the MATCH set, not the candidate set (at real
    * blocking selectivity 10–100× smaller; `lev_dist` is a pure
    * function of the names, so deduplicating after scoring is
    * match-for-match identical to deduplicating before). A pair
    * surviving several passes is still emitted once.
    *
    * `maxBlock > 0` drops blocks larger than `maxBlock` rows on
    * EITHER side before the join (single-pass count window, no
    * self-join) — the [[graft.dedup.DedupOps]] `maxBucket` stop-word
    * stance: a degenerate key ("", "UNKNOWN") would otherwise emit
    * |block|² candidates; dropping it is a documented recall trade,
    * bounded fan-out by construction.
    *
    * `maxKeyShare ∈ (0, 1]` is the FREQUENCY-PRUNED key variant (r13
    * verdict #5): a block key is dropped on a side when it covers more
    * than that SHARE of the side's rows — `count(key) > max(1,
    * ⌊share·n⌋)`. The absolute `maxBlock` cap stops binding correctly
    * when data grows (a fixed-vocabulary key like a type-suffix holds
    * a constant share, so its absolute block size grows linearly and
    * pairs quadratically — the measured `q_er_blocked` 100×-pairs
    * blow-up); a share threshold is scale-STABLE: the same key set is
    * degenerate at every corpus size, so recall on the non-degenerate
    * remainder is preserved as data grows instead of being re-decided
    * by an absolute constant. Both caps compose (the tighter binds).
    * Costs one `count()` per side (driver-side row counts, one cheap
    * job each), not a self-join.
    *
    * Shuffle plan per pass: one equi-join on the block key (AQE splits
    * hot blocks); then one pair-set-sized dedup shuffle; the refine is
    * Spark's codegen'd `levenshtein` — no UDF. The per-side count
    * window pre-partitions each side on `__bk`, a partitioning the
    * join itself reuses. Column names of `left` and `right` must be
    * disjoint; output = left.* ++ right.* ++ `lev_dist`.
    */
  def blockedLevenshteinJoin(left: DataFrame, right: DataFrame,
                             leftCol: String, rightCol: String,
                             blockKeys: Seq[(Column, Column)],
                             maxDist: Int, maxBlock: Int = 0,
                             maxKeyShare: Double = 0.0): DataFrame = {
    require(blockKeys.nonEmpty, "blockedLevenshteinJoin: no blocking passes")
    require(maxDist >= 0, s"blockedLevenshteinJoin: maxDist=$maxDist < 0")
    require(maxKeyShare >= 0.0 && maxKeyShare <= 1.0,
      s"blockedLevenshteinJoin: maxKeyShare=$maxKeyShare outside [0, 1]")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "blockedLevenshteinJoin: left/right column names must be disjoint")
    // share cap per side: floor(share * n), never below 1 (a singleton
    // key is never degenerate). Counted once, reused by every pass.
    def shareCap(df: DataFrame): Long =
      if (maxKeyShare <= 0.0) Long.MaxValue
      else math.max(1L, (maxKeyShare * df.count()).toLong)
    val (lCap, rCap) = (shareCap(left), shareCap(right))
    def capped(df: DataFrame, key: Column, cap: Long) = {
      val keyed = df.withColumn("__bk", key)
      val bound = math.min(if (maxBlock > 0) maxBlock.toLong else Long.MaxValue, cap)
      if (bound == Long.MaxValue) keyed
      else keyed
        .withColumn("__bn", count(lit(1)).over(Window.partitionBy(col("__bk"))))
        .where(col("__bn") <= bound).drop("__bn")
    }
    blockKeys.map { case (lk, rk) =>
      capped(left, lk, lCap).join(capped(right, rk, rCap), Seq("__bk")).drop("__bk")
        .withColumn("lev_dist", levenshtein(col(leftCol), col(rightCol)))
        .where(col("lev_dist") <= maxDist)
    }.reduce(_.unionByName(_)).dropDuplicates()
  }

  def filterEquals(df: DataFrame, c: String, value: String,
                   mode: String = "lower"): DataFrame = mode match {
    case "lower"     => df.where(lower(col(c)) === value.toLowerCase)
    case "upper"     => df.where(upper(col(c)) === value.toUpperCase)
    case "sensitive" => df.where(col(c) === value)
    case other       => throw new IllegalArgumentException(s"filterEquals mode $other")
  }
}
