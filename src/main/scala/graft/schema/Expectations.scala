package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-contract gate (the Great-Expectations role,
  * engine-side): a rule set checked over a frame and reported as
  * `(rule, target, n_violations, pass)` — the report an operator
  * reads before letting a load mutate anything (compose with
  * [[graft.merge.Merge.upsert]] / [[graft.merge.Merge.scd2]]: gate
  * first, merge after). The reference enforces schema shape only
  * (`enforce_schema` `src/pyveb/spark_client.py:418-428`) and checks
  * key duplication out-of-band (`check_duplicates`
  * `src/pyveb/dbt_client.py:649-658`); this unifies both with value
  * contracts under one report schema.
  *
  * Scale shape: every ROW-level rule (not-null / range / regex /
  * accepted-set) fuses into a SINGLE scan — one conditional-sum
  * aggregate with map-side-combinable partials, unpivoted to report
  * rows with `stack` (the `ProfileOps.columnProfile` idiom; fully
  * lazy, nothing driver-side). Adding a row rule costs one codegen'd
  * expression, never another pass. [[Expectations.Unique]] needs its
  * own keyed aggregate by nature (one count shuffle per unique rule,
  * the `duplicateKeys` shape); its violation count = rows in excess
  * of one per key, so `n_violations` always means "rows you would
  * have to drop to make the contract hold".
  */
object Expectations {

  sealed trait Expectation { def rule: String; def target: String }
  /** Column must be non-null. */
  final case class NotNull(col: String) extends Expectation {
    val rule = "not_null"; def target = col
  }
  /** `lo <= col <= hi`; nulls are NOT violations — compose [[NotNull]]. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Expectation {
    val rule = "in_range"; def target = col
  }
  /** Non-null values must match the regex IN FULL (anchored here, so
    * the rule reads like a shape contract, not a substring probe). */
  final case class Matches(col: String, regex: String) extends Expectation {
    val rule = "matches"; def target = col
  }
  /** Non-null values must be in the literal set. */
  final case class InSet(col: String, values: Seq[String]) extends Expectation {
    val rule = "in_set"; def target = col
  }
  /** Composite key occurs at most once. */
  final case class Unique(cols: Seq[String]) extends Expectation {
    val rule = "unique"; def target = cols.mkString(",")
  }
  /** Catch-all row contract: an arbitrary SQL predicate that must
    * hold (cross-column rules — `"a <= b"`, conditional shapes). A
    * row violates when the predicate is FALSE or NULL — a contract
    * you cannot evaluate is a contract not met, the strict reading;
    * express "nulls exempt" inside the predicate itself. `name` is
    * the report target (the predicate text is a poor key). */
  final case class Satisfies(name: String, predicate: String) extends Expectation {
    val rule = "satisfies"; def target = name
  }

  private def rowViolation(e: Expectation): Option[Column] = e match {
    case NotNull(c) => Some(col(c).isNull)
    case InRange(c, lo, hi) =>
      Some(col(c).isNotNull && (col(c) < lo || col(c) > hi))
    case Matches(c, re) =>
      Some(col(c).isNotNull && !col(c).rlike("^(?:" + re + ")$"))
    case InSet(c, vs) =>
      Some(col(c).isNotNull && !col(c).isin(vs.map(x => x: Any): _*))
    case Satisfies(_, p) => Some(!coalesce(expr(p), lit(false)))
    case _: Unique => None
  }

  /** Typed-Column unpivot of the fused violation sums: one struct per
    * rule, exploded to `(rule, target, n_violations)` rows. Rule and
    * target travel as `lit` values, never spliced into SQL text — a
    * Satisfies name or regex containing quotes (or anything else) can
    * neither break the parse nor inject into the report. */
  private def unpivot(rowRules: Seq[(Expectation, Column)]): Column =
    explode(array(rowRules.zipWithIndex.map { case ((e, _), i) =>
      struct(lit(e.rule).as("rule"), lit(e.target).as("target"),
        coalesce(col(s"__v$i"), lit(0L)).as("n_violations"))
    }: _*))

  /** One report row per expectation: `(rule, target, n_violations,
    * pass)`. Rule order in the output follows the fused plan (row
    * rules first, then unique rules) — sort on read if display order
    * matters; the driver compare canonicalizes anyway. */
  def report(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "Expectations.report: no rules")
    val rowRules = rules.flatMap(e => rowViolation(e).map(v => (e, v)))
    val rowPart: Option[DataFrame] =
      if (rowRules.isEmpty) None
      else {
        val aggs = rowRules.zipWithIndex.map { case ((_, v), i) =>
          sum(when(v, 1L).otherwise(0L)).as(s"__v$i")
        }
        // empty frame → sums are NULL → coalesce to 0 (vacuously true)
        Some(df.agg(aggs.head, aggs.tail: _*)
          .select(unpivot(rowRules).as("__r")).select(col("__r.*")))
      }
    val uniqueParts = rules.collect { case u: Unique =>
      graft.relational.RelationalOps.duplicateKeys(df, u.cols)
        .agg(coalesce(sum(col("count") - 1L), lit(0L)).as("n_violations"))
        .select(lit(u.rule).as("rule"), lit(u.target).as("target"),
          col("n_violations"))
    }
    (rowPart.toSeq ++ uniqueParts).reduce(_.unionByName(_))
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** [[report]] per GROUP: `(group…, rule, target, n_violations,
    * pass)` — the per-load-partition contract view ("which day broke
    * the feed"), read next to the drift dashboards. Row rules stay
    * ONE grouped conditional-sum scan (the fused plan, now keyed by
    * `groupCols`) unpivoted in-project; each [[Unique]] rule is a
    * two-level count (key-within-group, then group). Groups with a
    * clean unique rule still get their zero row: the excess counts
    * left-join a distinct-groups frame (bounded by group
    * cardinality), so the report is dense — a missing row can never
    * be misread as a pass. */
  def reportBy(df: DataFrame, groupCols: Seq[String],
               rules: Seq[Expectation]): DataFrame = {
    require(groupCols.nonEmpty, "Expectations.reportBy: no group columns")
    require(rules.nonEmpty, "Expectations.reportBy: no rules")
    val rowRules = rules.flatMap(e => rowViolation(e).map(v => (e, v)))
    val rowPart: Option[DataFrame] =
      if (rowRules.isEmpty) None
      else {
        val aggs = rowRules.zipWithIndex.map { case ((_, v), i) =>
          sum(when(v, 1L).otherwise(0L)).as(s"__v$i")
        }
        Some(df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
          .select(groupCols.map(col) :+ unpivot(rowRules).as("__r"): _*)
          .select(groupCols.map(col) :+ col("__r.rule").as("rule") :+
            col("__r.target").as("target") :+
            col("__r.n_violations").as("n_violations"): _*))
      }
    lazy val groups = df.select(groupCols.map(col): _*).distinct()
    val uniqueParts = rules.collect { case u: Unique =>
      val excess = df
        .groupBy((groupCols ++ u.cols).map(col): _*).agg(count(lit(1)).as("__c"))
        .where(col("__c") > 1)
        .groupBy(groupCols.map(col): _*)
        .agg(sum(col("__c") - 1L).as("__nv"))
      groups.join(excess, groupCols, "left")
        .select(groupCols.map(col) :+ lit(u.rule).as("rule") :+
          lit(u.target).as("target") :+
          coalesce(col("__nv"), lit(0L)).as("n_violations"): _*)
    }
    (rowPart.toSeq ++ uniqueParts).reduce(_.unionByName(_))
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** Quarantine ROUTER — the third stance after observe ([[report]])
    * and abort ([[requireAll]]): tag every row with the rules it
    * violates and split the frame into `(passing, quarantined)`, the
    * engine-side form of a load gate that ships clean rows onward
    * (compose with [[graft.merge.Merge.insert]]) and parks the rest
    * for triage instead of poisoning the target or failing the load.
    *
    * Tags are `"rule:target"` strings in a `violated` array column on
    * the quarantined side (the passing side carries no extra column).
    * Row rules evaluate in the SAME single codegen'd projection — no
    * extra pass, no shuffle. Each [[Unique]] rule quarantines the rows
    * IN EXCESS of one per key — first-wins by `keepOrder`, which must
    * be a total order within a key so the kept row is deterministic
    * (required when any [[Unique]] rule is present; the
    * `exactDedup` contract) — so per-tag quarantine counts equal
    * [[report]]'s `n_violations` exactly, for unique rules included.
    *
    * Law: `passing ∪ quarantined.drop("violated") ≡ input` (row-level
    * partition, nothing dropped or duplicated).
    *
    * The two returned frames share one tagged subtree; routing both to
    * sinks evaluates it twice (two scans). For one-shot routing,
    * persist [[splitTagged]]'s output and filter it yourself, or write
    * the quarantine first and anti-join — at 100 TB the double scan is
    * usually still cheaper than a persist of the full load. */
  def split(df: DataFrame, rules: Seq[Expectation],
            keepOrder: Seq[Column] = Nil): (DataFrame, DataFrame) = {
    val tagged = splitTagged(df, rules, keepOrder)
    (tagged.where(size(col("violated")) === 0).drop("violated"),
      tagged.where(size(col("violated")) > 0))
  }

  /** The single-frame form of [[split]]: input columns plus a
    * `violated` array<string> of `"rule:target"` tags (empty = clean).
    * One windowed shuffle per [[Unique]] rule; row rules are free. */
  def splitTagged(df: DataFrame, rules: Seq[Expectation],
                  keepOrder: Seq[Column] = Nil): DataFrame = {
    require(rules.nonEmpty, "Expectations.split: no rules")
    val uniques = rules.collect { case u: Unique => u }
    require(uniques.isEmpty || keepOrder.nonEmpty,
      "Expectations.split: Unique rules need a deterministic keepOrder " +
        "(total order within a key) to pick the surviving row")
    val rowTags = rules.flatMap(e => rowViolation(e).map(v =>
      when(v, lit(s"${e.rule}:${e.target}"))))
    val uniqueTags = uniques.map { u =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(u.cols.map(col): _*).orderBy(keepOrder: _*)
      when(row_number().over(w) > 1, lit(s"${u.rule}:${u.target}"))
    }
    df.withColumn("violated",
      array_compact(array(rowTags ++ uniqueTags: _*)))
  }

  /** Fail-fast form: throws listing every violated rule — the
    * pre-merge contract gate (the strictEnrichJoin stance: a broken
    * contract fails loudly, never merges quietly). */
  def requireAll(df: DataFrame, rules: Seq[Expectation]): Unit = {
    val bad = report(df, rules).where(!col("pass"))
      .collect().map(r => s"${r.getString(0)}(${r.getString(1)})=${r.getLong(2)}")
    if (bad.nonEmpty)
      throw new IllegalStateException(s"expectations failed: ${bad.mkString(", ")}")
  }
}
