package graft.core

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based tests for the pure window/HWM math — an upgrade over the
  * reference, whose tests pin only hand-picked examples
  * (tests_strategy_unit/). */
class PropertySpec extends SparkSpec {

  private def check(label: String, p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$label: ${r.status}")
  }

  test("batch stepping partitions (start, stop] exactly, first edge inclusive") {
    val gen = for {
      start <- Gen.choose(-1000000L, 1000000L)
      len <- Gen.choose(0L, 100000L)
      step <- Gen.choose(math.max(1L, len / 50), math.max(1L, len / 50) + 50000L)
    } yield (start, start + len, step)
    check("partition", Prop.forAll(gen) { case (start, stop, step) =>
      val b = SnapshotBatchStrategy(step)
      b.initialize(start, stop)
      val wins = scala.collection.mutable.ArrayBuffer[Window]()
      var done = false
      while (!done) { wins += b.currentWindow("x"); done = b.advance("x") }
      val ws = wins.toList
      val contiguous = ws.zip(ws.drop(1)).forall { case (a, c) =>
        a.stopAt.value == c.startFrom.value && !c.startFrom.including
      }
      val first = ws.head
      val last = ws.last
      first.startFrom.value.contains(start) && first.startFrom.including &&
        last.stopAt.value.contains(stop) && last.stopAt.including &&
        ws.forall(w => w.stopAt.including) &&
        contiguous &&
        ws.forall(w => !WindowMath.lt(w.stopAt.value.get, w.startFrom.value.get))
    })
  }

  test("updateHwm is raise-only: value equals the running max") {
    val gen = Gen.nonEmptyListOf(Gen.choose(-1000000L, 1000000L))
    check("raise-only", Prop.forAll(gen) { values =>
      val s = new IncrementalStrategy(store = new InMemoryHwmStore)
      s.fetchHwm(IntHwm("p.x", "p", "x", None))
      values.foreach(s.updateHwm(_))
      s.hwm.get.valueOpt.contains(values.max)
    })
  }

  test("edgeToWhere renders the four inclusivity operators correctly") {
    val gen = for {
      v <- Gen.choose(-1000000L, 1000000L)
      isStart <- Gen.oneOf(true, false)
      inc <- Gen.oneOf(true, false)
    } yield (v, isStart, inc)
    check("edges", Prop.forAll(gen) { case (v, isStart, inc) =>
      val sql = graft.dialects.GenericDialect
        .edgeToWhere("c", Edge(Some(v), inc), isStart).get
      val op = (isStart, inc) match {
        case (true, true) => ">="
        case (true, false) => ">"
        case (false, true) => "<="
        case (false, false) => "<"
      }
      sql == s"c $op $v"
    })
  }

  test("SpaceSaving guarantees: heavy hitters kept, bounds bracket truth") {
    import org.apache.spark.unsafe.types.UTF8String
    val gen = for {
      capacity <- Gen.choose(4, 32)
      items <- Gen.listOfN(500, Gen.choose(0, 200).map(i => s"i$i"))
    } yield (capacity, items)
    check("spacesaving", Prop.forAll(gen) { case (capacity, items) =>
      val sk = new graft.expressions.SpaceSavingSketch(capacity)
      items.foreach(s => sk.add(UTF8String.fromString(s)))
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = items.size.toLong
      val kept = new scala.collection.mutable.HashMap[String, (Long, Long)]()
      sk.counters.forEach((k, v) => kept(k.toString) = (v(0), v(1)))
      val heavyKept = truth.forall { case (item, f) =>
        f <= n / capacity || kept.contains(item)
      }
      val bounded = kept.forall { case (item, (count, err)) =>
        val t = truth.getOrElse(item, 0L)
        count >= t && count - err <= t
      }
      heavyKept && bounded
    })
  }

  test("shingleHashes == xx64 of the string shingles, element by element") {
    import org.apache.spark.unsafe.types.UTF8String
    val token = Gen.choose(1, 6).flatMap(len =>
      Gen.listOfN(len, Gen.alphaNumChar).map(_.mkString))
    val ws = Gen.choose(1, 3).map(" " * _)
    val gen = for {
      k <- Gen.choose(1, 10)
      toks <- Gen.listOfN(k, token)
      seps <- Gen.listOfN(k, ws)
      n <- Gen.choose(1, 4)
    } yield (toks.zip(seps).map { case (t, s) => t + s }.mkString, n)
    check("hash-parity", Prop.forAll(gen) { case (text, n) =>
      val u = UTF8String.fromString(text)
      val strs = graft.expressions.ShingleImpl.shingles(u, n)
      val hashes = graft.expressions.ShingleImpl.shingleHashes(u, n, 42L)
      hashes.numElements() == strs.numElements() &&
        (0 until strs.numElements()).forall { i =>
          hashes.getLong(i) ==
            graft.expressions.TextHashImpl.xx64(strs.getUTF8String(i), 42L)
        }
    })
  }

  test("charNgrams == sliding character windows, multibyte code points step whole") {
    import org.apache.spark.unsafe.types.UTF8String
    val gen = for {
      // mix ASCII, 2-byte (é), 3-byte (日) code points
      cs <- Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('é'),
        Gen.const('日'), Gen.const(' ')))
      n <- Gen.choose(1, 4)
    } yield (cs.mkString, n)
    check("char-ngram-parity", Prop.forAll(gen) { case (text, n) =>
      val got = graft.expressions.ShingleImpl.charNgrams(
        UTF8String.fromString(text), n)
      val want = text.sliding(n).filter(_.length == n).toSeq
      got.numElements() == want.length &&
        (0 until got.numElements()).forall(i =>
          got.getUTF8String(i).toString == want(i))
    })
  }

  test("KeyValueIntHwm updates merge per-key maxima, never regress") {
    val entry = for {
      k <- Gen.choose(0, 5)
      v <- Gen.choose(0L, 1000L)
    } yield (k, v)
    val gen = Gen.listOf(Gen.nonEmptyListOf(entry).map(_.toMap))
    check("kv-merge", Prop.forAll(gen) { updates =>
      val h0 = KeyValueIntHwm("k.off", "k")
      val merged = updates.foldLeft(h0: Hwm)((h, u) => h.withValue(u))
        .asInstanceOf[KeyValueIntHwm].value
      val expected = updates.flatten
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      merged == expected
    })
  }

  test("word shingle count is max(0, tokens - n + 1)") {
    val token = Gen.choose(1, 6).flatMap(len =>
      Gen.listOfN(len, Gen.alphaNumChar).map(_.mkString))
    val gen = for {
      k <- Gen.choose(1, 12)
      toks <- Gen.listOfN(k, token)
      n <- Gen.choose(1, 5)
    } yield (toks, n)
    check("shingles", Prop.forAll(gen) { case (toks, n) =>
      val arr = graft.expressions.ShingleImpl.shingles(
        org.apache.spark.unsafe.types.UTF8String.fromString(toks.mkString(" ")), n)
      arr.numElements() == math.max(0, toks.size - n + 1)
    })
  }

  test("WindowMath.add is monotone and consistent with compare across HWM types") {
    import java.time.{Duration, Instant, LocalDate}
    val longs = Gen.choose(-1000000L, 1000000L)
    check("long add monotone", Prop.forAll(longs, Gen.choose(1L, 10000L)) {
      (v, step) => WindowMath.lt(v, WindowMath.add(v, step))
    })
    check("decimal add monotone", Prop.forAll(longs, Gen.choose(1L, 10000L)) {
      (v, step) =>
        WindowMath.lt(BigDecimal(v), WindowMath.add(BigDecimal(v), BigDecimal(step)))
    })
    check("date add by days monotone", Prop.forAll(
        Gen.choose(0L, 200000L), Gen.choose(1, 365)) { (epochDay, days) =>
      val d = LocalDate.ofEpochDay(epochDay)
      WindowMath.lt(d, WindowMath.add(d, days))
    })
    check("instant add by duration monotone", Prop.forAll(
        Gen.choose(0L, 4102444800L), Gen.choose(1L, 86400L * 365)) { (sec, stepSec) =>
      val t = Instant.ofEpochSecond(sec)
      WindowMath.lt(t, WindowMath.add(t, Duration.ofSeconds(stepSec)))
    })
  }

  test("WindowMath.min/max agree with compare and are idempotent") {
    val longs = Gen.choose(Long.MinValue / 4, Long.MaxValue / 4)
    check("min/max coherent", Prop.forAll(longs, longs) { (a, b) =>
      val mn = WindowMath.min(a, b); val mx = WindowMath.max(a, b)
      !WindowMath.lt(mx, mn) &&
        (mn == a || mn == b) && (mx == a || mx == b) &&
        WindowMath.min(mn, mn) == mn && WindowMath.max(mx, mx) == mx
    })
  }
}
