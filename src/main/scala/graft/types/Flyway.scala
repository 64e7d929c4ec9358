package graft.types

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.StructType

/** Flyway-style DDL migration emission with version bump — the
  * engine-side form of the reference's migration-file protocol
  * (`/root/reference/src/pyveb/parser.py:120-227`, bump at `:215-227`):
  * migration files are named `V{version}_{seq}__{description}.sql`, the
  * next version is one past the highest already in the directory, and
  * the DDL body uses `${placeholder}` substitution variables resolved
  * by the migration runner, not the emitter.
  */
object Flyway {

  private val MigrationName = """V(\d+)_(\d+)__.*\.sql""".r

  /** Warehouse DDL in the reference's Flyway shape
    * (`pyspark_to_flyway_ddl`, `parser.py:120-141`): schema and owner
    * are `${}` placeholders bound at migration time, distribution is
    * left to the warehouse (`DISTSTYLE AUTO`), and the engine's
    * loading-date audit column is appended.
    */
  def flywayDdl(schema: StructType, targetTable: String,
                flywaySchema: String = "ingest_schema"): String = {
    val cols = schema.fields.map(f =>
      s"""  "${graft.schema.SchemaOps.sanitizeName(f.name)}" ${TypeMaps.sparkToWarehouse(f.dataType)}""")
    val body = (cols :+ "  \"META_loading_date_utc\" TIMESTAMP DEFAULT sysdate").mkString(",\n")
    s"""CREATE TABLE IF NOT EXISTS $${$flywaySchema}.$targetTable (
       |$body
       |)
       |DISTSTYLE AUTO;
       |
       |ALTER TABLE $${$flywaySchema}.$targetTable owner to $${username};
       |""".stripMargin
  }

  /** Directory listing with the stream closed (Files.list holds an fd
    * open until the stream is closed — leaking one per emit adds up in
    * a long-lived driver). */
  private def listFiles(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.filter(Files.isRegularFile(_)).toVector
    finally s.close()
  }

  /** Highest migration version currently in `dir` (0 if none). */
  def currentVersion(dir: Path): Int = {
    if (!Files.isDirectory(dir)) return 0
    listFiles(dir)
      .map(_.getFileName.toString)
      .collect { case MigrationName(v, _) => v.toInt }
      .foldLeft(0)(math.max)
  }

  /** Write `ddl` as the next migration `V{n+1}%03d_1__create_{table}.sql`
    * (reference `write_flyway_ddl_to_file`, `parser.py:215-227`).
    *
    * Idempotent re-emit: if the HIGHEST-versioned existing migration for
    * this table already carries byte-identical DDL, no new file is
    * written and the existing path is returned — re-running a pipeline
    * whose schema didn't change must not spam migrations (Flyway would
    * re-apply nothing, but the directory would still grow unboundedly).
    * Any schema change produces a fresh version bump.
    */
  def writeMigration(dir: String, ddl: String, targetTable: String): Path = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    // latest = highest PARSED version, not lexicographic filename order
    // (V1000 sorts before V999 as a string once versions outgrow the
    // %03d padding, which would defeat the idempotent re-emit check)
    val tablePattern =
      s"""V(\\d+)_\\d+__create_${java.util.regex.Pattern.quote(targetTable)}\\.sql""".r
    val latestForTable = listFiles(d)
      .flatMap { p =>
        p.getFileName.toString match {
          case tablePattern(v) => Some((v.toInt, p))
          case _ => None
        }
      }
      .sortBy(_._1).lastOption.map(_._2)
    latestForTable match {
      case Some(p) if new String(Files.readAllBytes(p), "UTF-8") == ddl => p
      case _ =>
        val next = currentVersion(d) + 1
        val out = d.resolve(f"V$next%03d_1__create_$targetTable.sql")
        Files.write(out, ddl.getBytes("UTF-8"))
        out
    }
  }

  /** Convenience: schema → DDL → versioned migration file. */
  def emitMigration(dir: String, schema: StructType, targetTable: String,
                    flywaySchema: String = "ingest_schema"): Path =
    writeMigration(dir, flywayDdl(schema, targetTable, flywaySchema), targetTable)
}
