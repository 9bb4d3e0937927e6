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

/** `word_shingle_hashes(text, n)`: xx64 of each word n-gram, one pass, no
  * string array — the scale path for the dedup pipeline's widest column. */
case class WordShingleHashes(child: Expression, n: Int, seed: Long = 42L)
  extends UnaryExpression with GraftStringInput {
  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  protected override def nullSafeEval(input: Any): Any =
    ShingleImpl.shingleHashes(input.asInstanceOf[UTF8String], n, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.ShingleImpl.shingleHashes($c, $n, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

/** `char_ngrams(text, n)`: every n-CHARACTER substring, one linear pass.
  *
  * Composing this from `transform(sequence(...), i -> substring(s,i,n))`
  * is quadratic twice over: the lambda re-evaluates any non-attribute
  * child per position, and UTF-8 `substring` re-scans from byte 0 to
  * find character i every call (measured 88 s for 1.5M chars at sf0.1;
  * this expression does the same work in one scan). Code-point byte
  * offsets are collected once, then each gram is a byte-range copy.
  * Inputs shorter than n characters yield an empty array.
  */
case class CharNgrams(child: Expression, n: Int)
  extends UnaryExpression with GraftStringInput {
  require(n >= 1, "ngram size must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  protected override def nullSafeEval(input: Any): Any =
    ShingleImpl.charNgrams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleImpl.charNgrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
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

  /** xx64 of each normalized n-gram WITHOUT materializing the string
    * array — one scratch buffer reused across shingles. At scale the
    * string shingle array is the widest intermediate in the dedup
    * pipeline; this keeps only 8 bytes per shingle. Hash values equal
    * `xx64(shingles(s, n)(k), seed)` exactly. */
  def shingleHashes(s: UTF8String, n: Int, seed: Long): GenericArrayData = {
    val len = s.numBytes()
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
    var scratch = new Array[Byte](64)
    val out = new Array[Any](t - n + 1)
    var k = 0
    while (k <= t - n) {
      val from = starts.get(k)
      val to = ends.get(k + n - 1)
      if (to - from > scratch.length) scratch = new Array[Byte](to - from)
      // normalize whitespace runs to single spaces into the scratch buffer
      var w = 0
      var j = from
      var lastSpace = false
      while (j < to) {
        val b = s.getByte(j)
        if (isSpace(b)) {
          if (!lastSpace) { scratch(w) = ' '; w += 1 }
          lastSpace = true
        } else {
          scratch(w) = b; w += 1
          lastSpace = false
        }
        j += 1
      }
      out(k) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        scratch, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, w, seed)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** All n-character substrings in one scan: code-point byte offsets
    * first (UTF-8 char steps via the first-byte length table), then one
    * byte-range copy per gram — O(bytes + grams·n), never a re-scan. */
  def charNgrams(s: UTF8String, n: Int): GenericArrayData = {
    val numBytes = s.numBytes()
    // collect byte offsets of each code point start, plus the end
    val offs = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < numBytes) {
      offs.add(i)
      i += UTF8String.numBytesForFirstByte(s.getByte(i))
    }
    offs.add(numBytes)
    val chars = offs.size() - 1
    if (chars < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](chars - n + 1)
    var k = 0
    while (k <= chars - n) {
      val from = offs.get(k)
      val to = offs.get(k + n)
      val bytes = new Array[Byte](to - from)
      var j = 0
      while (j < to - from) { bytes(j) = s.getByte(from + j); j += 1 }
      out(k) = UTF8String.fromBytes(bytes)
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
