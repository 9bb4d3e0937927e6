package graft.files

import java.io.InputStream
import java.net.URI
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.Instant

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Stat of a remote entry (reference onetl/impl/remote_path_stat.py). */
final case class PathStat(size: Long, mtime: Instant)

/** One entry of a remote listing (reference onetl/impl/remote_file.py). */
final case class RemoteEntry(path: String, stat: PathStat, isDir: Boolean) {
  def name: String = path.substring(path.lastIndexOf('/') + 1)
}

/** File-protocol client SPI.
  *
  * Mirrors the reference's FileConnection SPI
  * (onetl/connection/file_connection/file_connection.py:769-810:
  * `_download_file/_upload_file/_scan_entries/...`). The reference ships 7
  * protocol clients (FTP/FTPS/SFTP/S3/HDFS/WebDAV/Samba) over Python
  * libs. Coverage here:
  *  - local / hdfs:// / s3a://: [[HadoopFsConnection]] (one impl, three
  *    schemes — live-tested for local).
  *  - ftp://: [[FtpFileConnection]] over Hadoop's FTPFileSystem —
  *    live-gated against [[MiniFtpServer]].
  *  - WebDAV: [[WebDavFileConnection]], pure-JDK RFC 4918 client —
  *    live-gated against [[MiniWebDavServer]] (WebDAV is plain HTTP, so
  *    no driver library is needed at all).
  *  - SFTP: [[SftpFileConnection]], a real SSH_FXP v3 packet client over
  *    the [[SftpTransport]] seam — the encrypted SSH carrier is the only
  *    stubbed layer (no SSH library ships in this container); live-gated
  *    at the packet level against [[MiniSftpServer]].
  *  - FTPS: [[FtpsFileConnection]], a native RFC 959/4217 client (AUTH
  *    TLS control upgrade + TLS-wrapped PASV data channels, MLSD/MLST
  *    listings) — live-gated against [[MiniFtpServer]] with TLS enabled
  *    and certificate verification on both channels.
  *  - Samba: [[SmbFileConnection]] over the [[SmbShare]] seam — the SPI
  *    logic, SMB path discipline (UNC parsing, backslash wire paths,
  *    reserved characters) and transfer-engine integration are
  *    machine-checked against the [[DirSmbShare]] contract double; the
  *    SMB2 wire binding itself is the seam's production implementation
  *    (smbj/jcifs-ng, absent in this container — SMB2/3 crypto+credit
  *    machinery is not reimplementable responsibly, unlike SFTP/FTPS
  *    above). An OS-mounted CIFS share through [[LocalFileConnection]]
  *    remains the zero-dependency production route.
  */
trait FileConnection {
  def check(): this.type
  def exists(path: String): Boolean
  def isDir(path: String): Boolean
  def stat(path: String): PathStat
  def listDir(path: String): Seq[RemoteEntry]
  def mkdirs(path: String): Unit
  def removeFile(path: String): Unit
  def removeDir(path: String, recursive: Boolean = false): Unit
  def renameFile(source: String, target: String): Unit
  def downloadFile(remote: String, local: Path): Unit
  def uploadFile(local: Path, remote: String): Unit
  def open(path: String): InputStream

  /** Recursive walk applying filters (to files) and limits (short-circuit
    * during traversal, not post-hoc) — reference
    * file_connection.py:438-533. Returns matched files and whether a limit
    * stopped the walk early. */
  def walk(root: String,
           filters: Seq[FileFilter] = Nil,
           limits: Seq[FileLimit] = Nil): (Seq[RemoteEntry], Boolean) = {
    limits.foreach(_.reset())
    val out = Seq.newBuilder[RemoteEntry]
    var stopped = false

    def visit(dir: String): Unit = {
      if (stopped) return
      val entries = listDir(dir)
      entries.iterator.takeWhile(_ => !stopped).foreach { e =>
        if (e.isDir) {
          if (!filters.exists(_.prunesDir(e.path))) visit(e.path)
        } else if (FileFilter.matchesAll(filters, e)) {
          if (limits.exists(_.stopsAt(e))) stopped = true
          else out += e
        }
      }
    }

    visit(root)
    (out.result(), stopped)
  }
}

/** `java.nio`-backed local client (reference's LocalFS side of transfers). */
final class LocalFileConnection extends FileConnection {
  private def p(s: String): Path = Paths.get(s)
  def check(): this.type = this
  def exists(path: String): Boolean = Files.exists(p(path))
  def isDir(path: String): Boolean = Files.isDirectory(p(path))
  def stat(path: String): PathStat =
    PathStat(Files.size(p(path)), Files.getLastModifiedTime(p(path)).toInstant)
  def listDir(path: String): Seq[RemoteEntry] = {
    val s = Files.list(p(path))
    try s.iterator().asScala.map { f =>
      val dir = Files.isDirectory(f)
      RemoteEntry(f.toString,
        if (dir) PathStat(0L, Instant.EPOCH) else stat(f.toString), dir)
    }.toSeq.sortBy(_.path)
    finally s.close()
  }
  def mkdirs(path: String): Unit = Files.createDirectories(p(path))
  def removeFile(path: String): Unit = Files.delete(p(path))
  def removeDir(path: String, recursive: Boolean): Unit =
    if (!recursive) Files.delete(p(path))
    else {
      val s = Files.walk(p(path))
      try s.sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
      finally s.close()
    }
  def renameFile(source: String, target: String): Unit =
    Files.move(p(source), p(target), StandardCopyOption.ATOMIC_MOVE)
  def downloadFile(remote: String, local: Path): Unit =
    Files.copy(p(remote), local, StandardCopyOption.REPLACE_EXISTING)
  def uploadFile(local: Path, remote: String): Unit =
    Files.copy(local, p(remote), StandardCopyOption.REPLACE_EXISTING)
  def open(path: String): InputStream = Files.newInputStream(p(path))

  private implicit class IterScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}

/** FTP protocol client (reference onetl/connection/file_connection/ftp.py:47)
  * over Hadoop's `ftp://` FileSystem, which rides the commons-net FTPClient
  * shipped inside hadoop-client-runtime — no extra driver package, the same
  * way the reference leans on its bundled ftputil.
  *
  * Configured for passive-mode stream transfers: passive because the
  * client side (Spark driver/executors) usually sits behind NAT where
  * active-mode callbacks can't reach it, stream mode because Hadoop's
  * default block mode needs a MODE B server, which plain FTP daemons
  * rarely enable. Hadoop opens one FTP session per filesystem call —
  * correct and robust (no stale-connection state); a long `walk` over a
  * huge remote tree would want a pooled client, which the SPI allows
  * swapping in without touching the transfer engine.
  *
  * Live-gated end-to-end against [[MiniFtpServer]] (`ftp_download_roundtrip`).
  */
final class FtpFileConnection(host: String, port: Int = 21,
                              user: String = "anonymous",
                              password: String = "") extends FileConnection {
  private val inner: HadoopFsConnection = {
    val conf = new Configuration()
    conf.set("fs.ftp.host", host)
    conf.setInt("fs.ftp.host.port", port)
    conf.set(s"fs.ftp.user.$host", user)
    conf.set(s"fs.ftp.password.$host", password)
    conf.set("fs.ftp.data.connection.mode", "PASSIVE_LOCAL_DATA_CONNECTION_MODE")
    conf.set("fs.ftp.transfer.mode", "STREAM_TRANSFER_MODE")
    // one FileSystem per (host, port, credentials) — the JVM-wide cache
    // would hand every FtpFileConnection for a host the first credentials
    conf.setBoolean("fs.ftp.impl.disable.cache", true)
    new HadoopFsConnection(s"ftp://$host:$port/", conf)
  }

  /** A real round trip (root listing), not FileSystem.getStatus — whose
    * default implementation answers from the client without touching the
    * server at all. */
  def check(): this.type = {
    require(inner.isDir("/"), s"ftp://$host:$port/ root not listable")
    this
  }
  def exists(path: String): Boolean = inner.exists(path)
  def isDir(path: String): Boolean = inner.isDir(path)
  def stat(path: String): PathStat = inner.stat(path)
  def listDir(path: String): Seq[RemoteEntry] = inner.listDir(path)
  def mkdirs(path: String): Unit = inner.mkdirs(path)
  def removeFile(path: String): Unit = inner.removeFile(path)
  def removeDir(path: String, recursive: Boolean): Unit = inner.removeDir(path, recursive)
  def renameFile(source: String, target: String): Unit = inner.renameFile(source, target)
  def downloadFile(remote: String, local: Path): Unit = inner.downloadFile(remote, local)
  def uploadFile(local: Path, remote: String): Unit = inner.uploadFile(local, remote)
  def open(path: String): InputStream = inner.open(path)
}

/** Hadoop-FileSystem-backed client: one implementation for `file://`,
  * `hdfs://`, `s3a://` (SURVEY §2.3 — Hadoop FS covers HDFS+S3+local in one
  * SPI, replacing the reference's per-protocol Python clients). */
final class HadoopFsConnection(baseUri: String,
                               conf: Configuration = new Configuration())
  extends FileConnection {
  private val fs: FileSystem = FileSystem.get(URI.create(baseUri), conf)
  private def hp(s: String) = new HPath(s)

  def check(): this.type = { fs.getStatus; this }
  def exists(path: String): Boolean = fs.exists(hp(path))
  def isDir(path: String): Boolean = fs.getFileStatus(hp(path)).isDirectory
  def stat(path: String): PathStat = {
    val st = fs.getFileStatus(hp(path))
    PathStat(st.getLen, Instant.ofEpochMilli(st.getModificationTime))
  }
  def listDir(path: String): Seq[RemoteEntry] =
    fs.listStatus(hp(path)).toSeq.sortBy(_.getPath.toString).map { st =>
      RemoteEntry(st.getPath.toUri.getPath,
        PathStat(st.getLen, Instant.ofEpochMilli(st.getModificationTime)),
        st.isDirectory)
    }
  def mkdirs(path: String): Unit = fs.mkdirs(hp(path))
  def removeFile(path: String): Unit = fs.delete(hp(path), false)
  def removeDir(path: String, recursive: Boolean): Unit = fs.delete(hp(path), recursive)
  def renameFile(source: String, target: String): Unit = {
    if (!fs.rename(hp(source), hp(target)))
      throw new java.io.IOException(s"rename $source -> $target failed")
  }
  def downloadFile(remote: String, local: Path): Unit =
    fs.copyToLocalFile(hp(remote), new HPath(local.toString))
  def uploadFile(local: Path, remote: String): Unit =
    fs.copyFromLocalFile(new HPath(local.toString), hp(remote))
  def open(path: String): InputStream = fs.open(hp(path))
}
