package graft.files

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Wire-protocol test: SftpFileConnection speaks SFTP v3 (SSH_FXP
  * packets) to MiniSftpServer over a real loopback TCP socket. Framing,
  * request-id discipline, chunked offset-addressed READ/WRITE, READDIR
  * paging, and STATUS codes all cross the wire — only the SSH encryption
  * that would carry these bytes in production is absent. */
class SftpConnectionSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val root = Files.createTempDirectory("sftp_spec_root")
  private val srv = new MiniSftpServer(root)
  private def connect() =
    new SftpFileConnection(() => new TcpSftpTransport(srv.host, srv.port))
  private lazy val c = connect()

  override def beforeAll(): Unit = {
    Files.writeString(root.resolve("top.csv"), "k,v\n1,a\n")
    Files.createDirectory(root.resolve("sub"))
    Files.writeString(root.resolve("sub/inner.csv"), "k,v\n2,b\n")
    Files.writeString(root.resolve("sub/skip.json"), "{}")
    // a file spanning multiple 32 KiB read/write chunks
    Files.write(root.resolve("big.bin"),
      Array.tabulate[Byte](100 * 1024)(i => (i % 251).toByte))
  }
  override def afterAll(): Unit = srv.stop()

  test("check() completes the INIT/VERSION handshake and a REALPATH round trip") {
    c.check()
  }

  test("a cleanup-side CLOSE failure never masks the transfer exception") {
    // transport that drops the channel the moment the first FXP_READ is
    // sent — the READ dies AND the finally-side FXP_CLOSE dies; the
    // exception that surfaces must be the READ's, with the CLOSE failure
    // attached as suppressed (not replacing it)
    class DroppingTransport(failOnType: Int) extends SftpTransport {
      private val inner = new TcpSftpTransport(srv.host, srv.port)
      val input: java.io.InputStream = inner.input
      val output: java.io.OutputStream = new java.io.OutputStream {
        private val header = new Array[Int](5)
        private var hi = 0
        private var frameRemaining = 0
        private var dead = false
        override def write(b: Int): Unit = {
          if (dead) throw new java.io.IOException("injected: channel dropped")
          if (frameRemaining > 0) { frameRemaining -= 1; inner.output.write(b) }
          else {
            header(hi) = b & 0xff; hi += 1
            if (hi == 5) {
              val len = (header(0) << 24) | (header(1) << 16) |
                (header(2) << 8) | header(3)
              val tpe = header(4)
              hi = 0
              if (tpe == failOnType) {
                dead = true
                throw new java.io.IOException(
                  s"injected: channel dropped on packet type $tpe")
              }
              frameRemaining = len - 1
              header.foreach(inner.output.write)
            }
          }
        }
        override def flush(): Unit = inner.output.flush()
      }
      def close(): Unit = inner.close()
    }
    val flaky = new SftpFileConnection(
      () => new DroppingTransport(failOnType = 5)) // 5 = SSH_FXP_READ
    val local = Files.createTempDirectory("sftp_spec_mask").resolve("x.csv")
    val e = intercept[java.io.IOException](
      flaky.downloadFile("/top.csv", local))
    assert(e.getMessage.contains("packet type 5"),
      s"surfaced exception must be the READ failure, got: ${e.getMessage}")
    assert(e.getSuppressed.exists(_.getMessage.contains("injected")),
      "the CLOSE failure must ride along as suppressed")
  }

  test("listDir, stat, exists over STAT/OPENDIR/READDIR") {
    assert(c.listDir("/").map(_.name).toSet === Set("top.csv", "sub", "big.bin"))
    assert(c.stat("/top.csv").size === Files.size(root.resolve("top.csv")))
    assert(c.stat("/top.csv").mtime.getEpochSecond > 0)
    assert(c.isDir("/sub"))
    assert(!c.isDir("/top.csv"))
    assert(c.exists("/sub/inner.csv"))
    assert(!c.exists("/sub/ghost.csv"))
  }

  test("multi-chunk download is byte-exact") {
    val loc = Files.createTempDirectory("sftp_spec_big")
    c.downloadFile("/big.bin", loc.resolve("big.bin"))
    assert(Files.readAllBytes(loc.resolve("big.bin")).toSeq ===
      Files.readAllBytes(root.resolve("big.bin")).toSeq)
  }

  test("multi-chunk upload is byte-exact") {
    val loc = Files.createTempDirectory("sftp_spec_up")
    val data = Array.tabulate[Byte](80 * 1024)(i => ((i * 7) % 249).toByte)
    Files.write(loc.resolve("out.bin"), data)
    c.uploadFile(loc.resolve("out.bin"), "/out.bin")
    assert(Files.readAllBytes(root.resolve("out.bin")).toSeq === data.toSeq)
    c.removeFile("/out.bin")
  }

  test("walk applies filters across directories") {
    val (files, stopped) = c.walk("/", filters = Seq(Glob("*.csv")))
    assert(files.map(_.path).toSet === Set("/top.csv", "/sub/inner.csv"))
    assert(!stopped)
  }

  test("mkdirs, rename, recursive removeDir") {
    c.mkdirs("/a/b")
    assert(c.isDir("/a/b"))
    val loc = Files.createTempDirectory("sftp_spec_mv")
    Files.writeString(loc.resolve("f.txt"), "z")
    c.uploadFile(loc.resolve("f.txt"), "/a/b/f.txt")
    c.renameFile("/a/b/f.txt", "/a/b/g.txt")
    assert(!c.exists("/a/b/f.txt") && c.exists("/a/b/g.txt"))
    val in = c.open("/a/b/g.txt")
    try assert(new String(in.readAllBytes()) === "z") finally in.close()
    c.removeDir("/a", recursive = true)
    assert(!c.exists("/a"))
  }

  test("FileDownloader pulls a filtered tree through the SFTP packet stack") {
    val loc = Files.createTempDirectory("sftp_spec_dl").toString
    val result = FileDownloader(c, "/", loc,
      filters = Seq(Glob("*.csv")), workers = 2,
      ifExists = FileIfExists.ReplaceFile).run()
    result.raiseIfFailed()
    assert(result.successful.size === 2)
    assert(Files.readString(java.nio.file.Paths.get(loc, "top.csv")) === "k,v\n1,a\n")
    assert(Files.readString(java.nio.file.Paths.get(loc, "sub/inner.csv")) === "k,v\n2,b\n")
  }
}
