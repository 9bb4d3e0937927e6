package graft.files

import java.io.OutputStream
import java.net.{InetAddress, InetSocketAddress, URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter
import java.util.Comparator

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Minimal in-JVM WebDAV server (RFC 4918 subset) over the JDK's
  * `com.sun.net.httpserver` — this container's stand-in for the
  * reference's dockerized WebDAV fixture (onetl test setup for
  * webdav.py:49). Speaks the real wire protocol so the client side is
  * tested end-to-end: Basic auth, OPTIONS, PROPFIND (Depth 0/1 with
  * multistatus XML), GET, PUT, MKCOL, DELETE (recursive), and MOVE
  * (Destination header, Overwrite semantics).
  *
  * Serves a directory tree rooted at `root`; URL paths are normalized so
  * traversal cannot escape the root. Not for production — a test double
  * with honest protocol behavior, like [[MiniFtpServer]].
  */
final class MiniWebDavServer(root: Path, user: String, password: String) {
  private val server = HttpServer.create(
    new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 16)

  def port: Int = server.getAddress.getPort
  def host: String = server.getAddress.getAddress.getHostAddress

  private val httpDate =
    DateTimeFormatter.RFC_1123_DATE_TIME.withZone(ZoneOffset.UTC)

  private val expectedAuth = "Basic " + java.util.Base64.getEncoder
    .encodeToString(s"$user:$password".getBytes(UTF_8))

  server.createContext("/", (ex: HttpExchange) => handle(ex))
  // daemon worker threads + explicit shutdown: a lingering non-daemon
  // pool would keep the whole JVM alive after stop()
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(4,
    (r: Runnable) => { val t = new Thread(r, "mini-webdav"); t.setDaemon(true); t })
  server.setExecutor(pool)
  server.start()

  def stop(): Unit = { server.stop(0); pool.shutdownNow(); () }

  // ---- request handling ---------------------------------------------------

  private def handle(ex: HttpExchange): Unit = {
    try {
      if (ex.getRequestHeaders.getFirst("Authorization") != expectedAuth) {
        ex.getResponseHeaders.set("WWW-Authenticate", "Basic realm=\"graft\"")
        respond(ex, 401, Array.emptyByteArray)
        return
      }
      val p = resolve(ex.getRequestURI.getPath)
      ex.getRequestMethod match {
        case "OPTIONS"  => options(ex)
        case "PROPFIND" => propfind(ex, p)
        case "GET"      => get(ex, p)
        case "PUT"      => put(ex, p)
        case "MKCOL"    => mkcol(ex, p)
        case "DELETE"   => delete(ex, p)
        case "MOVE"     => move(ex, p)
        case _          => respond(ex, 405, Array.emptyByteArray)
      }
    } catch {
      case _: Throwable => try respond(ex, 500, Array.emptyByteArray) catch { case _: Throwable => () }
    } finally ex.close()
  }

  /** URL path → filesystem path under root; normalization keeps traversal
    * inside the served tree. */
  private def resolve(urlPath: String): Path = {
    val decoded = URLDecoder.decode(urlPath, UTF_8)
    val norm = Paths.get(decoded).normalize().toString.stripPrefix("/")
    root.resolve(norm).normalize()
  }

  private def urlOf(p: Path): String = {
    val rel = root.relativize(p).toString
    "/" + rel.split('/').filter(_.nonEmpty)
      .map(URLEncoder.encode(_, UTF_8).replace("+", "%20")).mkString("/")
  }

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte]): Unit = {
    // HttpExchange: length 0 means chunked/streaming, -1 means empty
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) {
      val os: OutputStream = ex.getResponseBody
      os.write(body); os.close()
    }
  }

  private def options(ex: HttpExchange): Unit = {
    ex.getResponseHeaders.set("DAV", "1,2")
    ex.getResponseHeaders.set("Allow",
      "OPTIONS, PROPFIND, GET, PUT, MKCOL, DELETE, MOVE")
    respond(ex, 200, Array.emptyByteArray)
  }

  // ---- PROPFIND -----------------------------------------------------------

  private def propEntry(p: Path): String = {
    val dir = Files.isDirectory(p)
    val href = urlOf(p) + (if (dir && p != root) "/" else "")
    val len = if (dir) "" else
      s"<D:getcontentlength>${Files.size(p)}</D:getcontentlength>"
    val mtime = httpDate.format(Files.getLastModifiedTime(p).toInstant)
    val rtype = if (dir) "<D:collection/>" else ""
    s"""<D:response>
       |<D:href>${if (href.isEmpty) "/" else href}</D:href>
       |<D:propstat><D:prop>
       |<D:resourcetype>$rtype</D:resourcetype>
       |$len
       |<D:getlastmodified>$mtime</D:getlastmodified>
       |</D:prop><D:status>HTTP/1.1 200 OK</D:status></D:propstat>
       |</D:response>""".stripMargin
  }

  private def propfind(ex: HttpExchange, p: Path): Unit = {
    if (!Files.exists(p)) { respond(ex, 404, Array.emptyByteArray); return }
    val depth = Option(ex.getRequestHeaders.getFirst("Depth")).getOrElse("1")
    val targets =
      if (depth == "0" || !Files.isDirectory(p)) Seq(p)
      else {
        val s = Files.list(p)
        val kids = try {
          val it = s.iterator()
          val b = Seq.newBuilder[Path]
          while (it.hasNext) b += it.next()
          b.result().sortBy(_.toString)
        } finally s.close()
        p +: kids
      }
    val xml =
      s"""<?xml version="1.0" encoding="utf-8"?>
         |<D:multistatus xmlns:D="DAV:">
         |${targets.map(propEntry).mkString("\n")}
         |</D:multistatus>""".stripMargin
    ex.getResponseHeaders.set("Content-Type", "application/xml; charset=utf-8")
    respond(ex, 207, xml.getBytes(UTF_8))
  }

  // ---- plain transfer methods --------------------------------------------

  private def get(ex: HttpExchange, p: Path): Unit =
    if (!Files.isRegularFile(p)) respond(ex, 404, Array.emptyByteArray)
    else respond(ex, 200, Files.readAllBytes(p))

  private def put(ex: HttpExchange, p: Path): Unit = {
    if (!Files.isDirectory(p.getParent)) { respond(ex, 409, Array.emptyByteArray); return }
    val created = !Files.exists(p)
    val in = ex.getRequestBody
    try Files.write(p, in.readAllBytes()) finally in.close()
    respond(ex, if (created) 201 else 204, Array.emptyByteArray)
  }

  private def mkcol(ex: HttpExchange, p: Path): Unit =
    if (Files.exists(p)) respond(ex, 405, Array.emptyByteArray)
    else if (!Files.isDirectory(p.getParent)) respond(ex, 409, Array.emptyByteArray)
    else { Files.createDirectory(p); respond(ex, 201, Array.emptyByteArray) }

  private def delete(ex: HttpExchange, p: Path): Unit =
    if (!Files.exists(p)) respond(ex, 404, Array.emptyByteArray)
    else {
      // RFC 4918 §9.6: DELETE on a collection acts as Depth: infinity
      if (Files.isDirectory(p)) {
        val s = Files.walk(p)
        try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
        finally s.close()
      } else Files.delete(p)
      respond(ex, 204, Array.emptyByteArray)
    }

  private def move(ex: HttpExchange, p: Path): Unit = {
    val destHeader = Option(ex.getRequestHeaders.getFirst("Destination"))
    if (destHeader.isEmpty || !Files.exists(p)) {
      respond(ex, if (destHeader.isEmpty) 400 else 404, Array.emptyByteArray); return
    }
    // Destination may be absolute-URI or absolute-path (RFC 4918 §10.3)
    val destPath = destHeader.get match {
      case abs if abs.startsWith("http") => new java.net.URI(abs).getPath
      case path                          => path
    }
    val dest = resolve(destPath)
    val overwrote = Files.exists(dest)
    if (Option(ex.getRequestHeaders.getFirst("Overwrite")).contains("F") && overwrote) {
      respond(ex, 412, Array.emptyByteArray); return
    }
    Files.move(p, dest, StandardCopyOption.REPLACE_EXISTING)
    respond(ex, if (overwrote) 204 else 201, Array.emptyByteArray)
  }
}
