package graft.connectors

import java.net.{HttpURLConnection, URI, URLEncoder}

/** SharePoint upload client — the engine-side form of the reference's
  * `sharepointClient.upload_to_sharepoint`
  * (`/root/reference/src/pyveb/sharepoint_client.py:162-204`) and its
  * client-credential auth (`:60-75`): an OAuth2 client-credentials
  * token, then a `Files/add(url='…',overwrite=true)` POST against the
  * site's REST API, returning the server-relative URL of the uploaded
  * file. Naming follows the reference exactly: an optional
  * `current_date` / `unix_timestamp` suffix between file name and
  * extension, invalid suffix types rejected.
  *
  * Implemented over `HttpURLConnection` with the base URLs
  * parameterized, so the PROTOCOL (auth flow, headers, OData-escaped
  * resource path, response parsing) is real and offline-testable
  * against a loopback HTTP server — only the live tenant is out of the
  * sandbox's reach. JSON in/out goes through the Jackson shipped with
  * Spark; no extra dependency.
  */
object Sharepoint {

  sealed trait Suffix
  case object NoSuffix extends Suffix
  case object CurrentDate extends Suffix
  case object UnixTimestamp extends Suffix

  /** Parse the reference's config strings (`:194-199`), rejecting
    * anything outside the accepted set like its `ValueError`. */
  def suffixType(s: Option[String]): Suffix = s match {
    case None => NoSuffix
    case Some("current_date") => CurrentDate
    case Some("unix_timestamp") => UnixTimestamp
    case Some(other) => throw new IllegalArgumentException(
      s"Invalid file suffix '$other'. Accepted values: current_date, unix_timestamp, or none")
  }

  /** `terra_extract` + `xlsx` + CurrentDate → `terra_extract_2022-03-07.xlsx`
    * (`upload_to_sharepoint` `:193-203`). */
  def targetName(fileName: String, fileExtension: String, suffix: Suffix,
                 clock: () => java.time.Instant = () => java.time.Instant.now()): String = {
    val ext = fileExtension.stripPrefix(".")
    suffix match {
      case NoSuffix => s"$fileName.$ext"
      case CurrentDate =>
        val d = java.time.LocalDate.ofInstant(clock(), java.time.ZoneOffset.UTC)
        s"${fileName}_$d.$ext"
      case UnixTimestamp => s"${fileName}_${clock().getEpochSecond}.$ext"
    }
  }

  private lazy val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m
  }

  private def post(url: String, headers: Map[String, String], body: Array[Byte]): (Int, String) = {
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    // a stalled token endpoint or upload must fail, not hang the driver
    // (the FtpClient applies the same bound via soTimeout)
    conn.setConnectTimeout(15000)
    conn.setReadTimeout(120000)
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    conn.getOutputStream.write(body)
    conn.getOutputStream.close()
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val text = if (stream == null) "" else new String(stream.readAllBytes(), "UTF-8")
    conn.disconnect()
    (code, text)
  }

  /** OAuth2 client-credentials grant (the reference's Entra-app
    * authentication, `:43-45`): form-POST to the token endpoint, returns
    * the bearer token. */
  def acquireToken(tokenUrl: String, clientId: String, clientSecret: String,
                   scope: String): String = {
    def enc(s: String) = URLEncoder.encode(s, "UTF-8")
    val form = s"grant_type=client_credentials&client_id=${enc(clientId)}" +
      s"&client_secret=${enc(clientSecret)}&scope=${enc(scope)}"
    val (code, body) = post(tokenUrl,
      Map("Content-Type" -> "application/x-www-form-urlencoded"), form.getBytes("UTF-8"))
    if (code != 200) throw new java.io.IOException(s"token endpoint returned $code: $body")
    val node = mapper.readTree(body)
    Option(node.get("access_token")).map(_.asText())
      .getOrElse(throw new java.io.IOException(s"no access_token in: $body"))
  }

  /** Upload `bytes` into `folderPrefix` under `siteUrl` as `name`
    * (overwrite semantics, like the reference's `upload_file`). Returns
    * the file's server-relative URL from the response. Single quotes in
    * OData string literals are doubled; the path segment is otherwise
    * URL-encoded. */
  def uploadBytes(siteUrl: String, folderPrefix: String, name: String,
                  bytes: Array[Byte], token: String): String = {
    def odata(s: String) = URLEncoder.encode(s.replace("'", "''"), "UTF-8")
      .replace("+", "%20")
    val url = s"${siteUrl.stripSuffix("/")}/_api/web/GetFolderByServerRelativeUrl" +
      s"('${odata(folderPrefix)}')/Files/add(url='${odata(name)}',overwrite=true)"
    val (code, body) = post(url, Map(
      "Authorization" -> s"Bearer $token",
      "Accept" -> "application/json;odata=nometadata",
      "Content-Type" -> "application/octet-stream"), bytes)
    if (code < 200 || code >= 300)
      throw new java.io.IOException(s"sharepoint upload returned $code: $body")
    val node = mapper.readTree(body)
    Option(node.get("ServerRelativeUrl")).map(_.asText())
      .orElse(Option(node.get("d")).flatMap(d => Option(d.get("ServerRelativeUrl"))).map(_.asText()))
      .getOrElse(throw new java.io.IOException(s"no ServerRelativeUrl in: $body"))
  }

  /** The reference's full upload entry point: suffix the name, upload,
    * return the server-relative URL. */
  def upload(siteUrl: String, folderPrefix: String, fileName: String,
             fileExtension: String, bytes: Array[Byte], token: String,
             fileSuffixType: Option[String] = None,
             clock: () => java.time.Instant = () => java.time.Instant.now()): String =
    uploadBytes(siteUrl, folderPrefix,
      targetName(fileName, fileExtension, suffixType(fileSuffixType), clock), bytes, token)
}
