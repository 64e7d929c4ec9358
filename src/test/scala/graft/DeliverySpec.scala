package graft

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.{InetAddress, InetSocketAddress, ServerSocket}
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}

import com.sun.net.httpserver.HttpServer

import graft.connectors.Sharepoint
import graft.io.{Ftp, FtpClient}

/** Delivery-edge connectors driven end-to-end against LOOPBACK servers:
  * the FTP sink speaks real RFC 959 (login, CWD, PASV, binary STOR,
  * 226 confirmation, QUIT) to an in-test control+data server, and the
  * SharePoint upload runs its full OAuth client-credentials + REST
  * `Files/add` protocol against an in-test HTTP server. The live
  * endpoints are the ONLY thing the sandbox can't reach — the protocol
  * logic itself is exercised for real here.
  */
class DeliverySpec extends SparkSpec {
  import spark.implicits._

  /** One-shot mini FTP server: handles a single client session. */
  private final class MiniFtp(user: String, pass: String) {
    val control = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val commands = new ConcurrentLinkedQueue[String]()
    @volatile var stored: (String, Array[Byte]) = _
    @volatile var cwd: String = ""
    private val done = new CountDownLatch(1)

    private val thread = new Thread(() => {
      val s = control.accept()
      val in = new BufferedReader(new InputStreamReader(s.getInputStream, "ISO-8859-1"))
      val out = new OutputStreamWriter(s.getOutputStream, "ISO-8859-1")
      def send(line: String): Unit = { out.write(line + "\r\n"); out.flush() }
      // multi-line greeting exercises the reply folding in the client
      out.write("220-graft test server\r\n"); send("220 ready")
      var data: ServerSocket = null
      var line = in.readLine()
      while (line != null) {
        commands.add(line)
        val (cmd, arg) = line.split(" ", 2) match {
          case Array(c, a) => (c, a); case Array(c) => (c, "")
        }
        cmd match {
          case "USER" => send(if (arg == user) "331 need password" else "530 no")
          case "PASS" => send(if (arg == pass) "230 logged in" else "530 bad password")
          case "CWD" => cwd = arg; send("250 ok")
          case "TYPE" => send("200 binary")
          case "PASV" =>
            data = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
            val p = data.getLocalPort
            send(s"227 Entering Passive Mode (127,0,0,1,${p / 256},${p % 256})")
          case "STOR" =>
            send("150 opening data connection")
            val d = data.accept()
            val bytes = d.getInputStream.readAllBytes()
            d.close(); data.close()
            stored = (arg, bytes)
            send("226 Transfer Complete")
          case "QUIT" => send("221 bye"); line = null
          case _ => send("502 not implemented")
        }
        if (line != null) line = in.readLine()
      }
      s.close()
      done.countDown()
    })
    thread.setDaemon(true); thread.start()
    def port: Int = control.getLocalPort
    def awaitClose(): Unit = assert(done.await(10, TimeUnit.SECONDS), "ftp session did not end")
  }

  test("FTP sink: login, CWD, passive binary STOR, 226 check, QUIT") {
    val server = new MiniFtp("loader", "hunter2")
    val client = new FtpClient("127.0.0.1", server.port)
    client.login("loader", "hunter2", folder = Some("drop/zone"))
    val resp = client.upload("report.csv", "k;v\n1;a\n".getBytes("UTF-8"))
    assert(resp.startsWith("226"))
    client.close()
    server.awaitClose()
    assert(server.cwd == "drop/zone")
    assert(server.stored._1 == "report.csv")
    assert(new String(server.stored._2, "UTF-8") == "k;v\n1;a\n")
    assert(server.commands.toArray.map(_.toString.split(" ")(0)).toSeq ==
      Seq("USER", "PASS", "CWD", "TYPE", "PASV", "STOR", "QUIT"))
  }

  test("FTP sink: bad credentials and refused STOR surface as errors") {
    val server = new MiniFtp("loader", "hunter2")
    val client = new FtpClient("127.0.0.1", server.port)
    intercept[java.io.IOException](client.login("loader", "wrong"))
    client.close()
  }

  test("uploadCsv delivers the engine's csv format as one file") {
    val server = new MiniFtp("u", "p")
    val client = new FtpClient("127.0.0.1", server.port)
    client.login("u", "p")
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    Ftp.uploadCsv(df, client, Ftp.stagedName("s3://bucket/path/out.csv", env = "dev"))
    client.close()
    server.awaitClose()
    assert(server.stored._1 == "OUT_TEST_out.csv")
    val body = new String(server.stored._2, "UTF-8")
    assert(body.linesIterator.toSeq.head == "k;v")
    assert(body.contains("1;a") && body.contains("2;b"))
    assert(Ftp.stagedName("path/out.csv", env = "prd") == "OUT_out.csv")
  }

  test("Excel-over-HTTP source: flaky download retried, first sheet lands as DF") {
    // serve a real workbook produced by the engine's own writer
    val xlsx = java.nio.file.Paths.get(tempDir("graft_http_src")).resolve("wb.xlsx")
    val df = Seq(("a", 1L), ("b", 2L)).toDF("name", "qty")
    graft.io.Excel.write(df, xlsx.toString)
    val bytes = java.nio.file.Files.readAllBytes(xlsx)
    val srv = HttpServer.create(new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger()
    srv.createContext("/report.xlsx", ex => {
      if (hits.incrementAndGet() == 1) { // first attempt fails -> retry path
        ex.sendResponseHeaders(503, -1); ex.close()
      } else {
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes); ex.close()
      }
    })
    srv.start()
    try {
      val url = s"http://127.0.0.1:${srv.getAddress.getPort}/report.xlsx"
      val (local, back) = graft.io.Excel.downloadToDf(spark, url, "bpost_file",
        retries = 3, sleep = _ => ())
      assert(hits.get() == 2)
      assert(local.contains("_bpost_file.xlsx"))
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(local)))
      assert(back.columns.toSeq == Seq("name", "qty"))
      assert(back.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
        Set(("a", "1"), ("b", "2")))
    } finally srv.stop(0)
  }

  test("SharePoint upload: token flow, OData path escaping, suffix naming") {
    val srv = HttpServer.create(new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)
    @volatile var tokenBody: String = null
    @volatile var uploadPath: String = null
    @volatile var uploadAuth: String = null
    @volatile var uploadBytes: Array[Byte] = null
    srv.createContext("/token", ex => {
      tokenBody = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val resp = """{"token_type":"Bearer","access_token":"tok-123"}""".getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp); ex.close()
    })
    srv.createContext("/site/_api/web/", ex => {
      uploadPath = ex.getRequestURI.toString
      uploadAuth = ex.getRequestHeaders.getFirst("Authorization")
      uploadBytes = ex.getRequestBody.readAllBytes()
      val resp = """{"ServerRelativeUrl":"/site/Facturatie/B&O/terra_extract_2022-03-07.xlsx"}"""
        .getBytes("UTF-8")
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp); ex.close()
    })
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.getAddress.getPort}"
      val token = Sharepoint.acquireToken(s"$base/token", "app-id", "s3cr3t+/=", "Sites.ReadWrite")
      assert(token == "tok-123")
      assert(tokenBody.contains("grant_type=client_credentials"))
      assert(tokenBody.contains("client_id=app-id"))
      assert(tokenBody.contains("client_secret=s3cr3t%2B%2F%3D")) // form-encoded

      val clock = () => java.time.Instant.parse("2022-03-07T10:00:00Z")
      val url = Sharepoint.upload(s"$base/site", "Facturatie/B&O 's", "terra_extract", "xlsx",
        Array[Byte](1, 2, 3), token, fileSuffixType = Some("current_date"), clock = clock)
      assert(url == "/site/Facturatie/B&O/terra_extract_2022-03-07.xlsx")
      assert(uploadAuth == "Bearer tok-123")
      // folder: quote doubled for OData (then %27-escaped in the URI),
      // spaces %20, name carries the date suffix
      assert(uploadPath.contains("GetFolderByServerRelativeUrl('Facturatie%2FB%26O%20%27%27s')"))
      assert(uploadPath.contains("/Files/add(url='terra_extract_2022-03-07.xlsx',overwrite=true)"))
      assert(uploadBytes.toSeq == Seq[Byte](1, 2, 3))

      assert(Sharepoint.targetName("x", ".csv", Sharepoint.UnixTimestamp, clock) ==
        s"x_${clock().getEpochSecond}.csv")
      intercept[IllegalArgumentException](Sharepoint.suffixType(Some("bogus")))
    } finally srv.stop(0)
  }
}
