package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's failed-run and noise rules, unit-pinned: a query that
  * throws fast in one run must never report the failure time as its
  * benchmark number when other runs succeeded. */
class BenchSummarySpec extends AnyFunSuite {
  private def ok(s: Double) = (s, true)
  private def bad(s: Double) = (s, false)

  test("min excludes failed runs; all-failed falls back to raw min") {
    // the ADVICE case: a 0.01 s time-to-exception beside 5 s successes
    assert(BenchSummary.minOf(Vector(bad(0.01), ok(5.0), ok(4.5))) === 4.5)
    assert(BenchSummary.minOf(Vector(ok(2.0), ok(3.0))) === 2.0)
    // every run failed: a number still exists (the name rides `failed`)
    assert(BenchSummary.minOf(Vector(bad(0.3), bad(0.1))) === 0.1)
  }

  test("noise considers only successful runs") {
    assert(BenchSummary.noiseOf(Vector(bad(0.01), ok(2.0), ok(4.0))) === 2.0)
    assert(BenchSummary.noiseOf(Vector(ok(1.0))) === 1.0)
    assert(BenchSummary.noiseOf(Vector(bad(1.0), bad(2.0))) === 0.0)
  }

  test("rerun: noisy over successes, or nothing succeeded yet") {
    assert(BenchSummary.needsRerun(Vector(ok(1.0), ok(2.5))))  // noise 2.5
    assert(!BenchSummary.needsRerun(Vector(ok(1.0), ok(1.5)))) // noise 1.5
    assert(!BenchSummary.needsRerun(Vector(ok(1.0))))          // one sample: stop
    assert(BenchSummary.needsRerun(Vector(bad(0.5), bad(0.2)))) // keep trying
    assert(!BenchSummary.needsRerun(Vector(bad(0.5), ok(1.0), ok(1.2))))
  }

  test("stdout line fits the driver's ~4 KB tail for the REAL gate list, " +
       "worst-case widths") {
    // r9 proved the inline per-query map cannot fit 130 gates (3987 B >
    // 3900 B budget → BENCH_r09 parsed: null), so the line now carries
    // totals + failed + the BENCH_FULL pointer only. Budget-check the
    // WORST case: every gate failed, so the failed array holds every
    // real gate name — if adding a gate pushes the line past the tail
    // window, this fails before the driver records `parsed: null`
    val mins = SparkEntry.queries.keys.map(_ -> 999.999).toMap
    val line = BenchSummary.stdoutLine(999.999 * mins.size, mins,
      failed = mins.keys.toList, fullOut = "BENCH_FULL.json",
      sfDir = "/root/testdata/sf0.1",
      nMemoized = SparkEntry.memoFamilyOf.size, memoBuildSec = 9999.999)
    assert(line.getBytes("UTF-8").length < 3900,
      s"bench stdout line is ${line.getBytes("UTF-8").length} B; the " +
        "failed array has outgrown the tail — cap it to a count")
    // the driver contract fields survive the budgeting
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.contains("\"queries\":{") && line.contains("\"sf\":"))
    assert(line.contains("\"full\":\"BENCH_FULL.json\""))
    // memo billing is visible on the line (r16 verdict #2)
    assert(line.contains("\"n_memoized\":") &&
      line.contains("\"memo_build_sec\":"))
    // and the realistic case (nothing failed) is far under budget
    val quiet = BenchSummary.stdoutLine(105.5, mins, Nil,
      "BENCH_FULL.json", "/root/testdata/sf0.1",
      nMemoized = 22, memoBuildSec = 78.123)
    assert(quiet.getBytes("UTF-8").length < 400, quiet)
  }
}
