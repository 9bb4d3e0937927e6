package graft.operators

import graft.SparkSpec
import graft.expressions.GraftExpressions
import org.apache.spark.sql.functions._

/** Fold-before-MinHash cross-lingual near-dup: MatchFold semantics and
  * the pairing behavior on diacritic/transliteration variants. */
class CrossLingualSpec extends SparkSpec {
  import spark.implicits._

  private def fold(s: String): String = {
    val df = Seq(s).toDF("t")
      .select(GraftExpressions.matchFold(col("t")).as("f"))
    df.as[String].head()
  }

  test("MatchFold: diacritics strip, case folds, holdouts transliterate") {
    assert(fold("Café RÉSUMÉ naïve") === "cafe resume naive")
    // composed and decomposed spellings fold identically
    assert(fold("café") === fold("café"))
    // non-decomposable Latin holdouts
    assert(fold("Straße Œuvre Øre Łódź Þing") ===
      "strasse oeuvre ore lodz thing")
    // ASCII passes through with only the lowercase pass
    assert(fold("Already ASCII text 123!") === "already ascii text 123!")
  }

  test("accented transliterated twin pairs with its original at 1.0") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val twin = base.map {
      case 'a' => 'á'; case 'e' => 'é'; case 'i' => 'í'
      case 'o' => 'ö'; case 'u' => 'ü'; case c => c
    }.toUpperCase
    val docs = Seq(
      (1L, base),
      (2L, twin),
      (3L, "a completely different document about spark partitioning"))
    val pairs = Dedup.crossLingualDupPairs(docs.toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.7)
      .select(col("id1"), col("id2"), col("jaccard"))
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(pairs.head._3 === 1.0)
    // the raw (unfolded) pipeline misses the same pair entirely
    val raw = Dedup.minhashDupPairs(docs.toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.7).count()
    assert(raw === 0L)
  }
}
