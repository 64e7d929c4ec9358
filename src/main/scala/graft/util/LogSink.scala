package graft.util

import java.util.logging.{Handler, Level, Logger, LogRecord}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** In-memory log capture flushed to a filesystem path — the engine-side
  * form of the reference's S3 log sink
  * (`/root/reference/src/pyveb/logger.py:100-134`): there a `StringIO`
  * stream handler rides on the process logger and `s3Logger.send_logs`
  * `put_object`s the whole buffer to a per-run key at pipeline end. Here
  * the buffer is a bounded `StringBuilder` behind a `java.util.logging`
  * handler, and the flush writes one object through the Hadoop
  * FileSystem API — `file://` in tests, `s3a://` (or any FS) in
  * production, no egress dependency in the engine. The per-run key
  * comes from config resolution ([[graft.pipeline.ConfigFile.Resolved]]
  * `logPath`), mirroring the reference's `s3_log_key`.
  *
  * The buffer is CAPPED: a runaway debug loop must not grow the driver
  * heap without bound (the reference's StringIO has exactly that
  * failure mode). Past `maxChars` the capture drops further lines and
  * appends one truncation marker at flush.
  */
final class CapturedLog private[util] (level: Level, maxChars: Int) extends Handler {

  setLevel(level)
  private val buf = new StringBuilder
  private var dropped = 0L

  private val ts = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss,SSS").withZone(java.time.ZoneOffset.UTC)

  override def publish(r: LogRecord): Unit = synchronized {
    if (isLoggable(r)) {
      if (buf.length >= maxChars) { dropped += 1 }
      else {
        // the reference's log_line_template shape: timestamp, padded
        // level, message (logger.py's LogFormatter)
        buf ++= ts.format(java.time.Instant.ofEpochMilli(r.getMillis))
        buf ++= f" [${r.getLevel.getName}%-8s] "
        buf ++= r.getMessage
        Option(r.getThrown).foreach { t => buf ++= s" (${t.getClass.getName}: ${t.getMessage})" }
        buf += '\n'
      }
    }
  }
  override def flush(): Unit = ()
  override def close(): Unit = ()

  def contents: String = synchronized {
    if (dropped == 0) buf.toString
    else buf.toString + s"... [$dropped lines dropped: capture cap $maxChars chars]\n"
  }

  /** Write the captured buffer as ONE object at `path` (overwrite), the
    * reference's `send_logs` put_object. Any Hadoop FS scheme works. */
  def flushTo(path: String, conf: Configuration = new Configuration()): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(contents.getBytes("UTF-8"))
    finally out.close()
  }
}

object LogSink {

  /** Attach a fresh capture to `logger` at `level`. Detach with
    * [[detach]] (or `logger.removeHandler`) when the run ends. */
  def attach(logger: Logger, level: Level = Level.INFO,
             maxChars: Int = 16 * 1024 * 1024): CapturedLog = {
    val h = new CapturedLog(level, maxChars)
    logger.addHandler(h)
    h
  }

  def detach(logger: Logger, capture: CapturedLog): Unit =
    logger.removeHandler(capture)

  /** Capture around a run and flush to the per-run path in one move —
    * the whole reference protocol (attach at setup, send at teardown)
    * as a scope. */
  def withCapture[A](logger: Logger, path: String, level: Level = Level.INFO,
                     conf: Configuration = new Configuration())(body: => A): A = {
    val h = attach(logger, level)
    try { val a = body; h.flushTo(path, conf); a }
    finally detach(logger, h)
  }
}
