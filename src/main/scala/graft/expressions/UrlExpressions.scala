package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GraftStringInput, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §6.2.2 percent-encoding normalization: `%41` and `%61`-style
  * escapes of UNRESERVED characters (ALPHA / DIGIT / `-._~`) decode to the
  * character, every other escape keeps its encoding but with UPPERCASE hex
  * digits (`%3f` → `%3F`). A `%` not followed by two hex digits passes
  * through untouched (crawl data contains bare percents).
  *
  * These are the two biggest dedup-miss sources in real crawl URLs after
  * case/port/utm handling: `a%7Eb` vs `a~b` and `%3f` vs `%3F` name the
  * same resource but survive exact-URL dedup as distinct keys. Reserved
  * characters are NEVER decoded — `%2F` must not become `/`, which would
  * change the path structure — so applying this to a whole URL cannot move
  * component boundaries.
  *
  * Codegen'd single pass (no UDF), same static-helper pattern as
  * [[TextHashImpl]].
  */
case class PercentNormalize(child: Expression)
  extends UnaryExpression with GraftStringInput {
  override def dataType: DataType = StringType
  override def prettyName: String = "percent_normalize"
  protected override def nullSafeEval(input: Any): Any =
    UrlNormImpl.percentNormalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.UrlNormImpl.percentNormalize($c)")
  override protected def withNewChildInternal(newChild: Expression): PercentNormalize =
    copy(child = newChild)
}

/** IDN (internationalized domain name) host → ASCII Compatible Encoding
  * via the JDK's RFC 3490 implementation: `münchen.example.com` →
  * `xn--mnchen-3ya.example.com`. The same resource is reachable under
  * the unicode and punycode spellings, so crawl URL dedup must pick one
  * canonical form — ACE, because it is what DNS actually resolves.
  * Already-ASCII hosts pass through unchanged (fast path); inputs the
  * IDN rules reject (empty labels, length overflows) pass through
  * rather than failing the batch. */
case class IdnAscii(child: Expression)
  extends UnaryExpression with GraftStringInput {
  override def dataType: DataType = StringType
  override def prettyName: String = "idn_ascii"
  protected override def nullSafeEval(input: Any): Any =
    UrlNormImpl.idnAscii(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.UrlNormImpl.idnAscii($c)")
  override protected def withNewChildInternal(newChild: Expression): IdnAscii =
    copy(child = newChild)
}

/** Static helper invoked from generated code — keep signatures stable. */
object UrlNormImpl {

  def idnAscii(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var ascii = true
    var i = 0
    while (i < n && ascii) { if ((s.getByte(i) & 0x80) != 0) ascii = false; i += 1 }
    if (ascii) return s // common case: no non-ASCII byte, nothing to encode
    try UTF8String.fromString(java.net.IDN.toASCII(s.toString))
    catch { case _: IllegalArgumentException => s }
  }

  private def hexVal(b: Byte): Int = b match {
    case d if d >= '0' && d <= '9' => d - '0'
    case a if a >= 'a' && a <= 'f' => a - 'a' + 10
    case a if a >= 'A' && a <= 'F' => a - 'A' + 10
    case _ => -1
  }

  private def isUnreserved(c: Int): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
    (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private final val HexUpper = "0123456789ABCDEF".getBytes

  def percentNormalize(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    // fast path: no '%' at all → return the input untouched (common case)
    var has = false
    var i = 0
    while (i < n && !has) { if (s.getByte(i) == '%') has = true; i += 1 }
    if (!has) return s
    val out = new Array[Byte](n) // output never grows: escapes only shrink
    var o = 0
    i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b == '%' && i + 2 < n &&
          hexVal(s.getByte(i + 1)) >= 0 && hexVal(s.getByte(i + 2)) >= 0) {
        val v = (hexVal(s.getByte(i + 1)) << 4) | hexVal(s.getByte(i + 2))
        if (isUnreserved(v)) { out(o) = v.toByte; o += 1 }
        else {
          out(o) = '%'; out(o + 1) = HexUpper(v >> 4); out(o + 2) = HexUpper(v & 0xf)
          o += 3
        }
        i += 3
      } else { out(o) = b; o += 1; i += 1 }
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }
}
