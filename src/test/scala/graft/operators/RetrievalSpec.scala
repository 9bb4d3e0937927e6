package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple apple banana"),         // tf(apple)=2, dl=3
    (2L, "apple cherry cherry cherry"), // tf(apple)=1, dl=4
    (3L, "banana banana banana"),
    (4L, "durian")                      // the only durian doc, dl=1
  ).toDF("doc_id", "text")

  private val queries = Seq(
    (0L, "apple"),
    (1L, "durian"),
    (2L, "Apple, APPLE apple!"), // dedup + tokenization → same as qid 0
    (3L, "missing")              // term absent from the corpus
  ).toDF("qid", "qtext")

  private def run(k: Int = 10) =
    Retrieval.bm25TopK(docs, "doc_id", "text", queries, "qid", "qtext", k)

  test("bm25: tf beats lower tf, rare term retrieves its doc, absent " +
       "term retrieves nothing") {
    val rows = run().collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val q0 = rows.filter(_._1 == 0L).sortBy(_._2)
    // only docs 1 and 2 contain 'apple'; doc 1 has higher tf AND shorter
    // dl, so it must outrank doc 2
    assert(q0.map(t => (t._2, t._3)).toSeq == Seq((1, 1L), (2, 2L)))
    assert(q0.head._4 > q0.last._4)
    // 'durian' appears in exactly one doc
    val q1 = rows.filter(_._1 == 1L)
    assert(q1.map(t => (t._2, t._3)).toSeq == Seq((1, 4L)))
    assert(q1.head._4 > 0.0) // the +1 inside ln keeps idf positive
    // a term the corpus never saw scores no documents at all
    assert(!rows.exists(_._1 == 3L))
  }

  test("bm25: repeated/cased/punctuated query terms count once") {
    val rows = run().collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val q0 = rows.filter(_._1 == 0L).map(t => (t._2, t._3, t._4)).sortBy(_._1)
    val q2 = rows.filter(_._1 == 2L).map(t => (t._2, t._3, t._4)).sortBy(_._1)
    assert(q0.toSeq == q2.toSeq) // identical ranking AND scores
  }

  test("bm25: k truncates per query, rank is 1-based and dense") {
    val rows = run(k = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.forall(_._2 == 1))
    assert(rows.map(_._1).sorted.toSeq == Seq(0L, 1L, 2L)) // one row each
  }

  test("bm25 plan: no cartesian product; query/stats sides broadcast") {
    val plan = run().queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
