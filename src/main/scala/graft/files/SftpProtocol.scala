package graft.files

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** SFTP version-3 packet codec (draft-ietf-secsh-filexfer-02 — the
  * dialect OpenSSH speaks). Shared by [[SftpFileConnection]] (client) and
  * [[MiniSftpServer]] (test double): both sides encode and decode the
  * SAME wire format, so the client is exercised against real SSH_FXP
  * packets, not a mock of itself.
  *
  * In production the byte stream runs inside an encrypted SSH channel
  * (what JSch / Apache MINA SSHD provide); that transport layer is the
  * [[SftpTransport]] seam. Only the crypto handshake is out of scope in
  * this container — the file-transfer protocol itself is fully real.
  */
object SftpProtocol {
  // packet types (§3)
  val FXP_INIT = 1; val FXP_VERSION = 2
  val FXP_OPEN = 3; val FXP_CLOSE = 4; val FXP_READ = 5; val FXP_WRITE = 6
  val FXP_LSTAT = 7; val FXP_OPENDIR = 11; val FXP_READDIR = 12
  val FXP_REMOVE = 13; val FXP_MKDIR = 14; val FXP_RMDIR = 15
  val FXP_REALPATH = 16; val FXP_STAT = 17; val FXP_RENAME = 18
  val FXP_STATUS = 101; val FXP_HANDLE = 102; val FXP_DATA = 103
  val FXP_NAME = 104; val FXP_ATTRS = 105

  // status codes (§7)
  val FX_OK = 0; val FX_EOF = 1; val FX_NO_SUCH_FILE = 2; val FX_FAILURE = 4

  // open pflags (§6.3)
  val FXF_READ = 0x01; val FXF_WRITE = 0x02; val FXF_CREAT = 0x08; val FXF_TRUNC = 0x10

  // ATTRS flag bits (§5)
  val ATTR_SIZE = 0x01; val ATTR_UIDGID = 0x02
  val ATTR_PERMISSIONS = 0x04; val ATTR_ACMODTIME = 0x08

  val S_IFDIR = 0x4000

  val ProtocolVersion = 3

  /** §5 file attributes; times are POSIX seconds as on the wire. */
  final case class Attrs(size: Option[Long] = None,
                         permissions: Option[Int] = None,
                         mtimeSec: Option[Long] = None) {
    def isDir: Boolean = permissions.exists(p => (p & 0xF000) == S_IFDIR)
  }

  /** Growable big-endian packet writer mirroring the wire grammar:
    * byte / uint32 / uint64 / string (uint32 length + bytes). */
  final class PacketBuilder {
    private val buf = new ByteArrayOutputStream()
    private val out = new DataOutputStream(buf)
    def byte(b: Int): this.type = { out.writeByte(b); this }
    def u32(v: Long): this.type = { out.writeInt(v.toInt); this }
    def u64(v: Long): this.type = { out.writeLong(v); this }
    def string(s: String): this.type = bytes(s.getBytes(UTF_8))
    def bytes(b: Array[Byte]): this.type = { out.writeInt(b.length); out.write(b); this }
    def raw(b: Array[Byte], off: Int, len: Int): this.type = { out.write(b, off, len); this }
    def attrs(a: Attrs): this.type = {
      var flags = 0
      if (a.size.isDefined) flags |= ATTR_SIZE
      if (a.permissions.isDefined) flags |= ATTR_PERMISSIONS
      if (a.mtimeSec.isDefined) flags |= ATTR_ACMODTIME
      u32(flags)
      a.size.foreach(u64)
      a.permissions.foreach(p => u32(p))
      a.mtimeSec.foreach { m => u32(m); u32(m) } // atime, mtime
      this
    }
    def result(): Array[Byte] = buf.toByteArray
  }

  /** Cursor over a received packet payload. */
  final class PacketReader(data: Array[Byte]) {
    private var pos = 0
    def u32(): Long = {
      val v = ((data(pos) & 0xffL) << 24) | ((data(pos + 1) & 0xffL) << 16) |
        ((data(pos + 2) & 0xffL) << 8) | (data(pos + 3) & 0xffL)
      pos += 4; v
    }
    def u64(): Long = (u32() << 32) | u32()
    def bytes(): Array[Byte] = {
      val n = u32().toInt
      val b = java.util.Arrays.copyOfRange(data, pos, pos + n)
      pos += n; b
    }
    def string(): String = new String(bytes(), UTF_8)
    def attrs(): Attrs = {
      val flags = u32().toInt
      val size = if ((flags & ATTR_SIZE) != 0) Some(u64()) else None
      if ((flags & ATTR_UIDGID) != 0) { u32(); u32() }
      val perms = if ((flags & ATTR_PERMISSIONS) != 0) Some(u32().toInt) else None
      val mtime = if ((flags & ATTR_ACMODTIME) != 0) { u32(); Some(u32()) } else None
      Attrs(size, perms, mtime)
    }
    def remaining: Int = data.length - pos
  }

  /** Frame a packet: uint32 length, byte type, payload. */
  def writePacket(out: OutputStream, tpe: Int, payload: Array[Byte]): Unit = {
    val d = new DataOutputStream(out)
    d.writeInt(payload.length + 1)
    d.writeByte(tpe)
    d.write(payload)
    d.flush()
  }

  /** Read one framed packet; EOFException on orderly close. */
  def readPacket(in: InputStream): (Int, Array[Byte]) = {
    val d = new DataInputStream(in)
    val len = d.readInt()
    if (len < 1) throw new EOFException(s"bad SFTP frame length $len")
    val tpe = d.readUnsignedByte()
    val payload = new Array[Byte](len - 1)
    d.readFully(payload)
    (tpe, payload)
  }
}

/** The SSH transport seam: yields the byte streams of an open SFTP
  * subsystem channel. Production implementations wrap an encrypted SSH
  * session (reference sftp.py:50 rides paramiko the same way); the
  * in-container implementation is a loopback TCP socket to
  * [[MiniSftpServer]]. */
trait SftpTransport extends AutoCloseable {
  def input: InputStream
  def output: OutputStream
}

/** Plain-TCP transport — carries the SFTP subsystem over an unencrypted
  * socket (for the in-JVM test server; a real deployment substitutes an
  * SSH-channel-backed implementation with identical byte semantics). */
final class TcpSftpTransport(host: String, port: Int) extends SftpTransport {
  private val socket = new java.net.Socket(host, port)
  socket.setTcpNoDelay(true)
  val input: InputStream = socket.getInputStream
  val output: OutputStream = socket.getOutputStream
  def close(): Unit = socket.close()
}
