package graft.pipeline

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.clean.CleanOps
import graft.io.{Readers, Writers}
import graft.merge.Merge
import graft.meta.MetaOps
import graft.schema.SchemaOps

/** Typed pipeline spec — the engine-side replacement for the reference's
  * YAML `Config` resolution (`src/pyveb/config.py:117-259`): a declared
  * source → transform chain → target, bound to an environment and a
  * partition window, executed as ONE Catalyst plan (the reference ran
  * extract/transform/load as three separate substrates; here the whole
  * job is a single lazy DataFrame lineage so pushdown and pruning span
  * end-to-end).
  */
object Pipeline {

  sealed trait Source { def read(spark: SparkSession): DataFrame }
  /** `mergeSchema = true` opts into footer-merging for multi-part
    * sources whose parts carry DISJOINT column subsets (a column present
    * only in later parts would otherwise read as all-NULL when a
    * declared schema null-fills it). Costly at scale — leave off unless
    * the source is known to drift that way; per-file TYPE conflicts
    * need [[Readers.multipleParquet]] instead. */
  final case class ParquetSource(path: String, schema: Option[StructType] = None,
                                 mergeSchema: Boolean = false) extends Source {
    def read(spark: SparkSession): DataFrame = Readers.parquet(spark, path, schema, mergeSchema)
  }
  final case class CsvSource(paths: Seq[String], schema: Option[StructType] = None,
                             header: Boolean = true, delimiter: String = ";") extends Source {
    def read(spark: SparkSession): DataFrame =
      Readers.multipleCsv(spark, paths, schema, header, delimiter)
  }

  /** Transform steps, mirroring the reference's configurable transform
    * arguments (`_parse_transform` `src/pyveb/config.py:218-237`:
    * `convert_float_to_int`, `convert_old_timestamps` column lists) plus
    * the rest of the cleaning surface.
    */
  sealed trait Step { def apply(df: DataFrame): DataFrame }
  final case class ApplySchema(schema: StructType) extends Step {
    def apply(df: DataFrame): DataFrame = SchemaOps.applySchema(df, schema)
  }
  final case class FloatToInt(cols: Seq[String]) extends Step {
    def apply(df: DataFrame): DataFrame = CleanOps.floatToInt(df, cols)
  }
  final case class CleanOldDates(cols: Seq[String]) extends Step {
    def apply(df: DataFrame): DataFrame = CleanOps.cleanOldDates(df, cols)
  }
  case object NanToNull extends Step {
    def apply(df: DataFrame): DataFrame = CleanOps.nanToNull(df)
  }
  final case class PartitionWindow(col: String, start: String, end: String) extends Step {
    def apply(df: DataFrame): DataFrame =
      graft.extract.Extract.partitionWindow(df, col, start, end)
  }
  final case class Custom(f: DataFrame => DataFrame) extends Step {
    def apply(df: DataFrame): DataFrame = f(df)
  }

  /** `commit` picks the target's publish protocol: rename-swap
    * (default; atomic on HDFS/local) or the manifest-pointer commit
    * for object stores, where rename is copy+delete
    * ([[graft.merge.Merge.PointerCommit]] — config key
    * `target.commit: pointer`). One commit mode per directory. */
  final case class Target(dir: String, mode: Merge.InsertMode,
                          partitionBy: Seq[String] = Nil,
                          commit: Merge.Commit = Merge.RenameCommit)

  /** A bound pipeline: the analog of one resolved `config.yml` task.
    * `pipelineType` ∈ {full, incremental, event, full_refresh}
    * (`src/pyveb/common.py:272`).
    */
  final case class Spec(task: String,
                        source: Source,
                        steps: Seq[Step],
                        target: Target,
                        pipelineType: String = "full",
                        executionDate: LocalDateTime = LocalDateTime.of(2024, 1, 1, 0, 0),
                        addMeta: Boolean = true) {

    /** Build the full lazy plan (no action). */
    def plan(spark: SparkSession): DataFrame = {
      val base = steps.foldLeft(source.read(spark))((df, s) => s(df))
      if (addMeta) MetaOps.addMetadata(base, executionDate) else base
    }

    /** Execute: plan → target dir with the declared insert semantics. */
    def run(spark: SparkSession): Unit =
      Merge.insert(plan(spark), target.dir, target.mode, target.commit)
  }
}
