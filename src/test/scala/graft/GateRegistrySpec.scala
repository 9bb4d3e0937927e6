package graft

import org.scalatest.funsuite.AnyFunSuite

/** Machine check for the gate registry — the defense against the
  * silently-shadowed-gate bug class: a Scala `Map(...)` literal keeps
  * the LAST duplicate key, so a duplicated gate name would leave the
  * scoreboard green with a row missing (it happened: `text_char_entropy`
  * never ran for a full round). The registries are Seq literals; this
  * suite pins their integrity and their size. */
class GateRegistrySpec extends AnyFunSuite {

  test("querySeq has no duplicate keys (duplicates would shadow)") {
    val keys = SparkEntry.querySeq.map(_._1)
    val dups = keys.groupBy(identity)
      .collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"duplicate gate keys: ${dups.mkString(", ")}")
  }

  test("oracleSeq has no duplicate keys") {
    val keys = SparkEntry.oracleSeq.map(_._1)
    val dups = keys.groupBy(identity)
      .collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"duplicate oracle keys: ${dups.mkString(", ")}")
  }

  test("every gate has an oracle and every oracle has a gate") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"gates without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without gate: ${(o -- q).toSeq.sorted}")
  }

  test("gate count is pinned — adding or removing a gate must update " +
       "this number consciously (a silent drop is the bug)") {
    assert(SparkEntry.queries.size == GateRegistrySpec.ExpectedGateCount,
      s"gate count ${SparkEntry.queries.size} != pinned " +
        s"${GateRegistrySpec.ExpectedGateCount}; if you added/removed a " +
        "gate on purpose, update ExpectedGateCount")
  }

  test("memoFamilies: every member is a registered gate, no gate is in " +
       "two families, and no family is a singleton (a singleton has no " +
       "sibling to misbill to)") {
    val all = SparkEntry.queries.keySet
    val members = SparkEntry.memoFamilies.values.flatten.toSeq
    assert((members.toSet -- all).isEmpty,
      s"memo members not in the registry: ${(members.toSet -- all).toSeq.sorted}")
    assert(members.distinct.size == members.size,
      "a gate appears in two memo families")
    assert(SparkEntry.memoFamilies.values.forall(_.size >= 2))
  }

  test("a deliberately duplicated key fails loudly at registry build") {
    val e = intercept[IllegalArgumentException] {
      SparkEntry.requireDistinctKeys(Seq("a", "b", "a", "c", "b"), "test")
    }
    assert(e.getMessage.contains("a") && e.getMessage.contains("b"))
  }
}

object GateRegistrySpec {
  /** Update on every deliberate gate addition/removal. */
  val ExpectedGateCount = 367
}
