package graft.io

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.{InetSocketAddress, Socket}

/** Minimal FTP (RFC 959) upload client — the engine-side form of the
  * reference's `ftpClient` (`/root/reference/src/pyveb/ftp_client.py`):
  * connect + login (`_create_ftp_session` `:46-57`), optional working
  * folder (`cwd`), binary STOR with a "226 Transfer Complete" check
  * (`upload_to_ftp` `:67-77`), QUIT with hard-close fallback
  * (`close_ftp_session` `:59-65`).
  *
  * Implemented over raw sockets (passive mode) so the PROTOCOL is real
  * and offline-testable against a loopback server — the live endpoint
  * is the only thing the sandbox can't reach. Passive mode only: data
  * connections originate from the client, the 100 TB-era firewall
  * reality. This is a driver-side report/delivery edge like the Excel
  * sink — bulk data belongs in parquet, not on an FTP drop.
  */
final class FtpClient(host: String, port: Int = 21,
                      timeoutMs: Int = 120000) extends AutoCloseable {

  private val sock = new Socket()
  sock.connect(new InetSocketAddress(host, port), timeoutMs)
  sock.setSoTimeout(timeoutMs)
  private val in = new BufferedReader(new InputStreamReader(sock.getInputStream, "ISO-8859-1"))
  private val out = new OutputStreamWriter(sock.getOutputStream, "ISO-8859-1")
  expect(220, reply()) // service ready

  /** One FTP reply, handling multi-line form (`123-...` until `123 `). */
  private def reply(): String = {
    val first = in.readLine()
    if (first == null) throw new java.io.IOException("FTP: connection closed")
    if (first.length >= 4 && first.charAt(3) == '-') {
      val code = first.take(3)
      val sb = new StringBuilder(first)
      var line = in.readLine()
      while (line != null && !(line.startsWith(code) && line.length >= 4 && line.charAt(3) == ' ')) {
        sb += '\n' ++= line
        line = in.readLine()
      }
      sb += '\n' ++= Option(line).getOrElse("")
      sb.toString
    } else first
  }

  private def expect(code: Int, resp: String): String = {
    if (!resp.startsWith(code.toString))
      throw new java.io.IOException(s"FTP: expected $code, got: $resp")
    resp
  }

  private def cmd(line: String): String = {
    out.write(line + "\r\n"); out.flush()
    reply()
  }

  def login(user: String, password: String, folder: Option[String] = None): Unit = {
    val u = cmd(s"USER $user")
    if (u.startsWith("331")) expect(230, cmd(s"PASS $password"))
    else expect(230, u) // some servers skip the password step
    folder.foreach(f => expect(250, cmd(s"CWD $f")))
  }

  /** Parse `227 Entering Passive Mode (h1,h2,h3,h4,p1,p2)`. NAT'd
    * servers routinely advertise a private/unroutable address in the
    * 227 reply while the data port itself is reachable at the control
    * connection's host — so, like mainstream clients (curl's default
    * `--ftp-skip-pasv-ip` behavior), the advertised host is honored
    * only when it matches the control-connection peer; otherwise the
    * control host is reused with the advertised port. */
  private def pasv(): (String, Int) = {
    val resp = expect(227, cmd("PASV"))
    val nums = "\\d+".r.findAllIn(resp.dropWhile(_ != '(')).map(_.toInt).toSeq
    require(nums.length >= 6, s"FTP: unparseable PASV reply: $resp")
    val advertised = nums.take(4).mkString(".")
    val controlHost = sock.getInetAddress.getHostAddress
    val host = if (advertised == controlHost) advertised else controlHost
    (host, nums(4) * 256 + nums(5))
  }

  /** Binary STOR; returns the final transfer reply, which the caller can
    * check for "226 Transfer Complete" exactly like the reference. */
  def upload(name: String, bytes: Array[Byte]): String = {
    expect(200, cmd("TYPE I"))
    val (dHost, dPort) = pasv()
    val data = new Socket()
    data.connect(new InetSocketAddress(dHost, dPort), timeoutMs)
    try {
      val opening = cmd(s"STOR $name")
      if (!opening.startsWith("150") && !opening.startsWith("125"))
        throw new java.io.IOException(s"FTP: STOR refused: $opening")
      data.getOutputStream.write(bytes)
      data.getOutputStream.flush()
    } finally data.close() // EOF on the data socket ends the transfer
    val done = reply()
    if (!done.toUpperCase.startsWith("226"))
      throw new java.io.IOException(s"FTP: transfer not confirmed: $done")
    done
  }

  /** QUIT; on any failure fall back to a hard socket close (the
    * reference's `close_ftp_session` protocol). */
  override def close(): Unit =
    try { cmd("QUIT"); sock.close() }
    catch { case _: Throwable => try sock.close() catch { case _: Throwable => } }
}

object Ftp {

  /** The reference's env-dependent delivery name
    * (`upload_to_ftp` `:69-72`): production files carry `prefix`, any
    * other environment marks the file as test output. */
  def stagedName(file: String, env: String, prefix: String = "OUT_"): String = {
    val base = file.split('/').last
    if (env == "prd") s"$prefix$base" else s"${prefix}TEST_$base"
  }

  /** Deliver a DataFrame as ONE csv file over FTP: written through the
    * engine's csv writer (header, same quoting as every other csv
    * output) into a single part, then STOR'd. Driver-side edge — size
    * bounded by the delivery format, not a data path. */
  def uploadCsv(df: org.apache.spark.sql.DataFrame, client: FtpClient, name: String): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ftp_stage").toString + "/csv"
    graft.io.Writers.csv(df.coalesce(1), tmp)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
    val file = try {
      scala.jdk.CollectionConverters.IteratorHasAsScala(part.iterator()).asScala
        .find(_.getFileName.toString.endsWith(".csv"))
        .getOrElse(throw new IllegalStateException("csv stage produced no part file"))
    } finally part.close()
    client.upload(name, java.nio.file.Files.readAllBytes(file))
  }
}
