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
      val missing = left.join(broadcast(build), key, "left_anti").limit(1).count()
      if (missing > 0)
        throw new IllegalStateException(
          s"strictEnrichJoin: left rows with no match on ${key.mkString(",")}")
    }
    left.join(broadcast(build), key, "inner")
  }

  /** Equality filter with the reference's case modes
    * (`filter_list_of_dicts_on_key_value` `src/pyveb/common.py:375-384`). */
  def filterEquals(df: DataFrame, c: String, value: String,
                   mode: String = "lower"): DataFrame = mode match {
    case "lower"     => df.where(lower(col(c)) === value.toLowerCase)
    case "upper"     => df.where(upper(col(c)) === value.toUpperCase)
    case "sensitive" => df.where(col(c) === value)
    case other       => throw new IllegalArgumentException(s"filterEquals mode $other")
  }
}
