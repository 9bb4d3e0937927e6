package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GraftStringInput, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern automaton (Aho & Corasick, CACM 1975):
  * matches EVERY pattern at EVERY position of a text in one left-to-right
  * pass — O(len + matches) per document, independent of the pattern
  * count. This is the scale-correct backbone for phrase blocklists and
  * safety wordlists: the contains-any formulation is O(patterns · len)
  * per document and loses two to three orders of magnitude once the list
  * has thousands of entries; token-equality joins
  * ([[graft.operators.Corpus.blocklistHitStats]]) miss phrases that span
  * token boundaries and hits inside words. Occurrences are counted
  * OVERLAPPING (a match is reported at every end position, nested
  * patterns included) — the automaton's natural semantics and the one a
  * positional-scan oracle can replay.
  *
  * The automaton builds once per expression instance on the driver
  * (wordlists are KBs–MBs) and ships serialized inside the codegen'd
  * plan, so per-row work is just the state walk — no per-row setup, no
  * regex compilation, and the expression stays inside whole-stage
  * codegen like every other hot-path expression here.
  */
final class AhoCorasick(patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty, "pattern list must not be empty")
  require(patterns.forall(_.nonEmpty), "empty pattern matches everywhere")
  require(patterns.distinct.size == patterns.size,
    "duplicate patterns would double-count; dedup the list first")

  // --- trie over UTF-8 BYTES -------------------------------------------
  // The automaton walks the row's UTF8String bytes in place
  // (getByte(i)) — no per-row toString/UTF-16 copy in the hot path the
  // class exists to optimize — and byte-level matching is exact for ANY
  // Unicode pattern (non-BMP included): UTF-8 is self-synchronizing, so
  // a valid pattern's first byte (ASCII or lead) can never align with a
  // continuation byte mid-codepoint.
  private val children =
    scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[java.lang.Byte, Integer]())
  private val endCounts = scala.collection.mutable.ArrayBuffer(0)
  private val endIds =
    scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
  patterns.zipWithIndex.foreach { case (p, pid) =>
    var node = 0
    p.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      val next = children(node).get(b)
      if (next != null) node = next
      else {
        children += new java.util.HashMap[java.lang.Byte, Integer]()
        endCounts += 0
        endIds += Nil
        children(node).put(b, children.size - 1)
        node = children.size - 1
      }
    }
    endCounts(node) += 1
    endIds(node) ::= pid
  }

  // --- BFS failure links + suffix closure ------------------------------
  private val fail = Array.fill(children.size)(0)
  // cumOut(n) = patterns ending at n or any suffix of n's path
  private val cumOut = Array.tabulate(children.size)(endCounts)
  private val closureIds: Array[Array[Int]] = {
    val ids = Array.fill[Array[Int]](children.size)(null)
    ids(0) = endIds(0).toArray
    val queue = new java.util.ArrayDeque[Integer]()
    children(0).forEach { (_, c) => fail(c) = 0; queue.add(c) }
    while (!queue.isEmpty) {
      val n = queue.poll()
      cumOut(n) += cumOut(fail(n))
      ids(n) = (endIds(n) ++ (if (ids(fail(n)) == null) Nil
                              else ids(fail(n)).toList)).toArray
      children(n).forEach { (ch, c) =>
        var f = fail(n)
        while (f != 0 && !children(f).containsKey(ch)) f = fail(f)
        val t = children(f).get(ch)
        fail(c) = if (t != null && t != c) t else 0
        queue.add(c)
      }
    }
    ids
  }

  private def step(state: Int, b: Byte): Int = {
    var s = state
    var next = children(s).get(b)
    while (next == null && s != 0) {
      s = fail(s)
      next = children(s).get(b)
    }
    if (next != null) next else 0
  }

  /** Total count of (pattern, end-position) matches — overlapping. */
  def countMatches(text: UTF8String): Long = {
    if (text == null) return 0L
    val n = text.numBytes()
    var state = 0
    var total = 0L
    var i = 0
    while (i < n) {
      state = step(state, text.getByte(i))
      total += cumOut(state)
      i += 1
    }
    total
  }

  /** How many DISTINCT patterns occur at least once. */
  def distinctMatches(text: UTF8String): Long = {
    if (text == null) return 0L
    val n = text.numBytes()
    val seen = new java.util.BitSet(patterns.size)
    var state = 0
    var i = 0
    while (i < n) {
      state = step(state, text.getByte(i))
      if (cumOut(state) > 0) {
        val ids = closureIds(state)
        var j = 0
        while (j < ids.length) { seen.set(ids(j)); j += 1 }
      }
      i += 1
    }
    seen.cardinality().toLong
  }
}

/** Total overlapping occurrences of any of `patterns` in the string —
  * one automaton pass per row, O(len + matches). */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
  extends UnaryExpression with GraftStringInput {
  override def dataType: DataType = LongType
  override def prettyName: String = "multi_pattern_count"
  @transient private lazy val ac = new AhoCorasick(patterns)
  protected override def nullSafeEval(input: Any): Any =
    ac.countMatches(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftAc", ac,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countMatches($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): MultiPatternCount =
    copy(child = newChild)
}

/** Count of DISTINCT patterns from `patterns` present in the string. */
case class MultiPatternDistinct(child: Expression, patterns: Seq[String])
  extends UnaryExpression with GraftStringInput {
  override def dataType: DataType = LongType
  override def prettyName: String = "multi_pattern_distinct"
  @transient private lazy val ac = new AhoCorasick(patterns)
  protected override def nullSafeEval(input: Any): Any =
    ac.distinctMatches(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftAc", ac,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$ref.distinctMatches($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): MultiPatternDistinct =
    copy(child = newChild)
}
