package graft.pipeline

import java.nio.file.{Files, Path, Paths}
import java.time.LocalDateTime
import scala.jdk.CollectionConverters._

/** YAML config-file resolution — the file-driven front door of the
  * reference (`/root/reference/src/pyveb/config.py:37-62,151-259`):
  * jobs are declared in a `config.yml` with `general / source /
  * transform / target` sections, values keyed per environment
  * (`prefix_env: {dev: …, prd: …}`) or per task
  * (`table: {task_a: …}`), resolved at launch into one bound job.
  *
  * [[Pipeline.Spec]] stays the typed in-engine representation; this
  * loader produces one FROM a file, so reference users keep their
  * config-file workflow. snakeyaml does the parsing (already on the
  * Spark classpath — Spark itself ships it).
  *
  * Deviations from the reference, on purpose:
  *   - resolution errors throw (`ConfigError`) instead of
  *     `sys.exit(1)` — a library must not kill the JVM;
  *   - the `/app/config.yml` container fallback is a parameter, not a
  *     hardcoded path.
  */
object ConfigFile {

  final class ConfigError(msg: String) extends RuntimeException(msg)

  /** Dotted-path view over parsed YAML (the reference's `AttrDict`).
    * `get("source.lynx.table")` walks nested maps; absent → None. */
  final case class Conf(data: Map[String, Any]) {
    def get(path: String): Option[Any] =
      path.split('.').foldLeft(Option[Any](data)) {
        case (Some(m: Map[String @unchecked, Any @unchecked]), k) => m.get(k)
        case _ => None
      }
    def str(path: String): String = get(path) match {
      case Some(s: String) if s.nonEmpty => s
      case Some(other) if other != null => other.toString
      case _ => throw new ConfigError(s"key $path is missing, empty or NULL")
    }
    def strOpt(path: String): Option[String] = get(path).collect {
      case s: String if s.nonEmpty => s
      case other if other != null && !other.isInstanceOf[Map[_, _]] && !other.isInstanceOf[Seq[_]] =>
        other.toString
    }
    def list(path: String): Seq[String] = get(path) match {
      case Some(xs: Seq[Any @unchecked]) => xs.map(String.valueOf)
      case _ => throw new ConfigError(s"key $path is not a list")
    }
    def listOpt(path: String): Option[Seq[String]] =
      get(path).collect { case xs: Seq[Any @unchecked] => xs.map(String.valueOf) }
    def section(path: String): Conf = get(path) match {
      case Some(m: Map[String @unchecked, Any @unchecked]) => Conf(m)
      case _ => throw new ConfigError(s"mandatory section $path not found")
    }
  }

  /** Search `startDir/src/filename`, then `startDir/filename` and every
    * ancestor up to the root (reference `search_upwards_for_file`,
    * `config.py:37-62`). */
  def searchUpwards(filename: String, startDir: Path = Paths.get(".").toAbsolutePath.normalize)
      : Option[Path] = {
    val srcPath = startDir.resolve("src").resolve(filename)
    if (Files.exists(srcPath)) return Some(srcPath)
    var d: Path = startDir
    while (d != null) {
      val attempt = d.resolve(filename)
      if (Files.exists(attempt)) return Some(attempt)
      d = d.getParent
    }
    None
  }

  /** Parse a YAML file into a [[Conf]] (snakeyaml safe-load: plain
    * maps/lists/scalars only — no object construction, so an untrusted
    * config cannot instantiate classes). */
  def load(path: Path): Conf = {
    val yaml = new org.yaml.snakeyaml.Yaml(new org.yaml.snakeyaml.constructor.SafeConstructor(
      new org.yaml.snakeyaml.LoaderOptions()))
    val in = Files.newInputStream(path)
    try {
      val raw = yaml.load[java.util.Map[String, Any]](in)
      if (raw == null) throw new ConfigError(s"empty config file $path")
      Conf(deepScala(raw).asInstanceOf[Map[String, Any]])
    } finally in.close()
  }

  private def deepScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => String.valueOf(k) -> deepScala(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(deepScala).toSeq
    case other => other
  }

  /** The reference's tumbling partition key (`create_partition_key`,
    * `config.py:77-108`): zero-padded `year=/month=/day=[/hour=…]`
    * directories at the requested granularity. */
  def partitionKey(executionDate: LocalDateTime, granularity: String = "day"): String = {
    val y = executionDate.getYear
    val mo = f"${executionDate.getMonthValue}%02d"
    val d = f"${executionDate.getDayOfMonth}%02d"
    val h = f"${executionDate.getHour}%02d"
    val mi = f"${executionDate.getMinute}%02d"
    val s = f"${executionDate.getSecond}%02d"
    granularity match {
      case "day"    => s"year=$y/month=$mo/day=$d/"
      case "hour"   => s"year=$y/month=$mo/day=$d/hour=$h/"
      case "minute" => s"year=$y/month=$mo/day=$d/hour=$h/minute=$mi/"
      case "second" => s"year=$y/month=$mo/day=$d/hour=$h/minute=$mi/second=$s/"
      case other => throw new ConfigError(
        s"partition granularity $other not in day/hour/minute/second")
    }
  }

  private val RequiredGeneralKeys = Seq("pipeline_name", "pipeline_bucket", "pipeline_type",
    "prefix_env", "prefix_logs", "prefix_raw", "prefix_processed", "tasks")

  /** One fully-bound job (the reference `Config.__init__` output): the
    * general section with env prefix resolved and the derived
    * raw/processed partition paths, plus the raw source/transform/target
    * sections for connector-specific binding.
    */
  final case class Resolved(general: Conf, source: Conf, transform: Conf, target: Conf,
                            partitionRaw: String, partitionProcessed: String,
                            logPath: String)

  /** Resolve a parsed config for one (env, task, pipelineType,
    * executionDate) binding — reference `_parse_general`
    * (`config.py:151-186`): validate required keys, bind
    * `prefix_env.{env}`, derive the partitioned raw/processed prefixes.
    */
  def resolve(file: Conf, env: String, task: String, pipelineType: String,
              executionDate: LocalDateTime,
              partitionGranularity: String = "day",
              reportingYear: Option[Int] = None,
              logClock: () => LocalDateTime = () => LocalDateTime.now()): Resolved = {
    val general = file.section("general")
    RequiredGeneralKeys.foreach { k =>
      if (general.get(k).isEmpty) throw new ConfigError(s"Key '$k' not found in config")
    }
    val tasks = general.list("tasks")
    if (!tasks.contains(task))
      throw new ConfigError(s"task '$task' not in declared tasks ${tasks.mkString(",")}")
    val prefixEnv = general.str(s"prefix_env.$env")
    val name = general.str("pipeline_name")
    val pk = partitionKey(executionDate, partitionGranularity)
    val commonPrefix = reportingYear match {
      case Some(y) => s"$prefixEnv/$name/reporting_year=$y/$pipelineType"
      case None    => s"$prefixEnv/$name/$pipelineType"
    }
    val raw = s"$commonPrefix/${general.str("prefix_raw")}/$task/$pk"
    val processed = s"$commonPrefix/${general.str("prefix_processed")}/$task/$pk"
    // reference `_parse_general` also derives the per-run log key
    // (`config.py:184`); the wall-clock suffix is injectable so tests
    // and reruns can pin it
    val logs = s"${general.str("prefix_logs")}/$commonPrefix/$task/$pk${logClock()}.log"
    Resolved(general, file.section("source"), file.section("transform"), file.section("target"),
      raw, processed, logs)
  }

  /** Build a runnable [[Pipeline.Spec]] from a resolved config — the
    * engine-native subset of source/transform/target declarations:
    *
    * {{{
    * source:    {type: parquet|csv, path: …, per-task override path: {taskA: …}}
    * transform: {convert_float_to_int: {taskA: [col, …]},
    *             convert_old_timestamps: {taskA: [col, …]},
    *             nan_to_null: true,
    *             partition_window: {col: …, start: …, end: …}}
    * target:    {dir: …, insert_type: {taskA: {full: append|overwrite|upsert}},
    *             upsert_keys: {taskA: [col, …]}, partition_by: [col, …],
    *             commit: rename|pointer}
    * }}}
    *
    * Warehouse/API connector declarations (`lynx`, `redshift`, dbt) are
    * bound by their own clients off the `Resolved` sections; this
    * builder covers the file-based lake path end-to-end.
    */
  def toSpec(r: Resolved, task: String, pipelineType: String,
             executionDate: LocalDateTime, addMeta: Boolean = true): Pipeline.Spec = {
    def perTask(c: Conf, base: String): Option[String] =
      c.strOpt(s"$base.$task").orElse(c.strOpt(base))
    val source: Pipeline.Source = r.source.str("type") match {
      case "parquet" => Pipeline.ParquetSource(perTask(r.source, "path")
        .getOrElse(throw new ConfigError("source.path missing")))
      case "csv" => Pipeline.CsvSource(
        Seq(perTask(r.source, "path").getOrElse(throw new ConfigError("source.path missing"))),
        delimiter = r.source.strOpt("delimiter").getOrElse(";"))
      case other => throw new ConfigError(s"source.type $other not file-based; bind it via its client")
    }
    val steps = Seq.newBuilder[Pipeline.Step]
    // the reference tolerates absent transform bindings per task
    // (`_parse_transform` swallows lookup failures, config.py:222-232)
    r.transform.listOpt(s"convert_float_to_int.$task")
      .foreach(cols => steps += Pipeline.FloatToInt(cols))
    r.transform.listOpt(s"convert_old_timestamps.$task")
      .foreach(cols => steps += Pipeline.CleanOldDates(cols))
    if (r.transform.get("nan_to_null").contains(true)) steps += Pipeline.NanToNull
    for {
      c <- r.transform.strOpt("partition_window.col")
      s <- r.transform.strOpt("partition_window.start")
      e <- r.transform.strOpt("partition_window.end")
    } steps += Pipeline.PartitionWindow(c, s, e)
    val insertType = r.target.strOpt(s"insert_type.$task.$pipelineType")
      .orElse(r.target.strOpt("insert_type")).getOrElse("append")
    val mode: graft.merge.Merge.InsertMode = insertType match {
      case "append"    => graft.merge.Merge.Append
      case "overwrite" => graft.merge.Merge.Overwrite
      case "upsert"    => graft.merge.Merge.Upsert(r.target.listOpt(s"upsert_keys.$task")
        .getOrElse(throw new ConfigError(s"upsert task $task needs target.upsert_keys.$task")))
      case other => throw new ConfigError(s"insert_type $other")
    }
    // object-store deployments declare `target.commit: pointer` once in
    // config — the S3-safe manifest protocol; rename stays the default
    val commit: graft.merge.Merge.Commit =
      r.target.strOpt("commit").getOrElse("rename") match {
        case "rename"  => graft.merge.Merge.RenameCommit
        case "pointer" => graft.merge.Merge.PointerCommit
        case other => throw new ConfigError(
          s"target.commit $other (expected rename|pointer)")
      }
    Pipeline.Spec(task, source, steps.result(),
      Pipeline.Target(r.target.str("dir"), mode,
        r.target.listOpt("partition_by").getOrElse(Nil), commit),
      pipelineType, executionDate, addMeta)
  }

  /** One-call front door: search upwards for `config.yml`, load,
    * resolve, build the Spec. */
  def loadSpec(startDir: Path, env: String, task: String,
               pipelineType: String = "full",
               executionDate: LocalDateTime = LocalDateTime.of(2024, 1, 1, 0, 0),
               filename: String = "config.yml"): Pipeline.Spec = {
    val path = searchUpwards(filename, startDir)
      .getOrElse(throw new ConfigError(s"Config file $filename not found from $startDir"))
    val resolved = resolve(load(path), env, task, pipelineType, executionDate)
    toSpec(resolved, task, pipelineType, executionDate)
  }
}
