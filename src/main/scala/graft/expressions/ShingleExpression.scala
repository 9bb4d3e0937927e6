package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GraftStringInput, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass whitespace tokenization + word n-gram shingling:
  * string → array<string> of space-joined n-grams.
  *
  * Composing this from built-ins (`split` + `transform` + `slice` +
  * `array_join`) works but Spark's higher-order functions are
  * CodegenFallback — they kick the entire projection out of whole-stage
  * codegen and re-walk the token array once per shingle (O(tokens·n)
  * with boxing). This expression does one UTF-8 scan and stays codegen'd,
  * which is the difference that matters when shingling 100 TB of text.
  *
  * Blank/short input → empty array (same contract as
  * [[graft.functions.TextFunctions.wordShingles]]).
  */
case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression with GraftStringInput {
  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  protected override def nullSafeEval(input: Any): Any =
    ShingleImpl.shingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleImpl.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object ShingleImpl {
  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\t' || b == '\r' || b == '\f' || b == 0x0b

  /** Tokenize on ASCII whitespace runs (multi-byte UTF-8 chars never
    * contain ASCII bytes, so this is UTF-8 safe) and emit n-grams. */
  def shingles(s: UTF8String, n: Int): GenericArrayData = {
    val len = s.numBytes()
    // collect token boundaries
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    while (i < len) {
      while (i < len && isSpace(s.getByte(i))) i += 1
      if (i < len) {
        starts.add(i)
        while (i < len && !isSpace(s.getByte(i))) i += 1
        ends.add(i)
      }
    }
    val t = starts.size()
    if (t < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](t - n + 1)
    var k = 0
    while (k <= t - n) {
      // one substring from token k's start to token (k+n-1)'s end keeps the
      // original inner whitespace; normalize runs to single spaces
      val from = starts.get(k)
      val to = ends.get(k + n - 1)
      out(k) = normalizeSpaces(s, from, to)
      k += 1
    }
    new GenericArrayData(out)
  }

  private def normalizeSpaces(s: UTF8String, from: Int, to: Int): UTF8String = {
    val bytes = new Array[Byte](to - from)
    var w = 0
    var i = from
    var lastSpace = false
    while (i < to) {
      val b = s.getByte(i)
      if (isSpace(b)) {
        if (!lastSpace) { bytes(w) = ' '; w += 1 }
        lastSpace = true
      } else {
        bytes(w) = b; w += 1
        lastSpace = false
      }
      i += 1
    }
    UTF8String.fromBytes(bytes, 0, w)
  }
}
