package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("paddingWasteStats: sorted batching eliminates the planted waste") {
    // id-order lengths 10,1,10,1,10,1 at batch=3: natural batches
    // (10,1,10) and (1,10,1) waste 9 + 18 = 27; sorted batches
    // (1,1,1) and (10,10,10) waste 0
    val df = Seq((1L, 10L), (2L, 1L), (3L, 10L), (4L, 1L), (5L, 10L),
      (6L, 1L)).toDF("id", "len")
    val out = Packing.paddingWasteStats(df, "id", "len", batchSize = 3)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().head
    assert(out == ((6L, 2L, 33L, 27L, 0L, 0.45, 0.0)))
  }

  test("chunk assignment: exclusive prefix sum, doc counted where it starts") {
    // source A: tokens 300, 300, 300 with chunk size 512:
    //   doc 1 starts at 0   -> chunk 0
    //   doc 2 starts at 300 -> chunk 0 (straddles, counted at its start)
    //   doc 3 starts at 600 -> chunk 1
    val df = Seq(("A", 1L, 300L), ("A", 2L, 300L), ("A", 3L, 300L),
                 ("B", 9L, 1200L), ("B", 10L, 1L))
      .toDF("source", "doc_id", "n_tokens")
    val packed = Packing.packChunks(df, Seq("source"), "doc_id", "n_tokens", 512L)
      .select($"source", $"doc_id", $"chunk_id").as[(String, Long, Long)]
      .collect().toSet
    assert(packed == Set(("A", 1L, 0L), ("A", 2L, 0L), ("A", 3L, 1L),
      ("B", 9L, 0L), ("B", 10L, 2L)))
  }

  test("chunk ids are dense per group and independent across groups") {
    val df = (1L to 100L).map(i => ("g" + (i % 2), i, 100L))
      .toDF("source", "doc_id", "n_tokens")
    val chunks = Packing.packChunks(df, Seq("source"), "doc_id", "n_tokens", 500L)
      .groupBy($"source", $"chunk_id").count()
      .select($"source", $"chunk_id", $"count").as[(String, Long, Long)]
      .collect()
    // 50 docs x 100 tokens / 500 per chunk = 10 full chunks of 5 docs each
    assert(chunks.length == 20)
    assert(chunks.forall(_._3 == 5L))
    chunks.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._2).sorted.toSeq == (0L to 9L))
    }
  }

  test("packText joins chunk members in order with the separator") {
    val df = Seq(("A", 1L, "one", 300L), ("A", 2L, "two", 300L),
      ("A", 3L, "three", 300L), ("B", 9L, "solo", 10L))
      .toDF("source", "doc_id", "text", "n_tokens")
    val packed = Packing.packText(df, Seq("source"), "doc_id",
        "text", "n_tokens", chunkTokens = 512L, separator = "|")
      .select($"source", $"chunk_id", $"packed")
      .as[(String, Long, String)].collect().toSet
    // A: docs 1,2 start in chunk 0 (prefix 0 and 300), doc 3 in chunk 1
    assert(packed == Set(("A", 0L, "one|two"), ("A", 1L, "three"),
      ("B", 0L, "solo")))
  }

  test("packing conserves tokens and docs: chunk totals sum to input totals") {
    val rnd = new scala.util.Random(7)
    val df = (1L to 500L).map(i => ("g" + (i % 3), i, rnd.nextInt(400).toLong))
      .toDF("source", "doc_id", "n_tokens")
    val packed = Packing.packChunks(df, Seq("source"), "doc_id", "n_tokens", 777L)
    assert(packed.count() == 500L)
    val byChunk = packed.groupBy($"source", $"chunk_id")
      .agg(sum($"n_tokens").as("t")).agg(sum($"t")).as[Long].head()
    val total = df.agg(sum($"n_tokens")).as[Long].head()
    assert(byChunk == total, "no tokens lost or duplicated across chunks")
  }
}

class SentencesSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.TextFunctions._

  test("segments keep terminators, trailing fragment counts, empty is zero") {
    def seg(s: String): Seq[String] =
      Seq(s).toDF("t").select(sentences($"t")).as[Seq[String]].head()
    assert(seg("One. Two! Three?") === Seq("One.", " Two!", " Three?"))
    assert(seg("no terminator at all") === Seq("no terminator at all"))
    assert(seg("Tail. fragment") === Seq("Tail.", " fragment"))
    assert(seg("Wait... what?!") === Seq("Wait...", " what?!"))
    assert(Seq("").toDF("t").select(sentenceCount($"t")).as[Long].head() === 0L)
    assert(Seq("   ").toDF("t").select(sentenceCount($"t")).as[Long].head() === 0L)
  }
}

class CompressionRatioSpec extends SparkSpec {
  import spark.implicits._
  import graft.expressions.GraftExpressions._

  test("repetitive junk compresses below prose; deterministic; round-trip sane") {
    val prose = "The quick brown fox jumps over the lazy dog while seventeen " +
      "geese argue about parquet footers in a surprisingly verbose manner today."
    val junk = "buy now click here " * 40
    val rows = Seq(("prose", prose), ("junk", junk), ("empty", ""))
      .toDF("id", "t")
      .select($"id", compressionRatio($"t").as("r"))
      .as[(String, Double)].collect().toMap
    assert(rows("junk") < rows("prose"),
      s"repetition must compress better: ${rows("junk")} vs ${rows("prose")}")
    assert(rows("junk") < 0.2 && rows("prose") > 0.5, rows.toString)
    assert(rows("empty") === 1.0)
    // deterministic across runs (same JVM zlib, fixed level)
    val again = Seq(("prose", prose)).toDF("id", "t")
      .select(compressionRatio($"t")).as[Double].head()
    assert(again === rows("prose"))
  }
}

class StripHtmlSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.TextFunctions._

  private def strip(s: String): String =
    Seq(s).toDF("t").select(stripHtml($"t")).as[String].head()

  test("script/style content dies with the block, even with bare '<' inside") {
    assert(strip("<script>if (1 < 2) alert('x');</script>keep") === "keep")
    assert(strip("<style>p > a { color: red; }</style>keep") === "keep")
    assert(strip("a<SCRIPT>\nmultiline\n</SCRIPT>b") === "a b")
  }

  test("tags become spaces, comments vanish, entities decode once") {
    assert(strip("<p>one</p><p>two</p>") === "one two")
    assert(strip("a<!-- note -->b") === "a b")
    assert(strip("Tom &amp; Jerry &lt;3") === "Tom & Jerry <3")
    // &amp;lt; is the ESCAPED text "&lt;" — must not double-decode to '<'
    assert(strip("&amp;lt;") === "&lt;")
    assert(strip("x&nbsp;y") === "x y")
    assert(strip("  a   b  ") === "a b")
    // a bare '<' in prose (not followed by a tag-start character) must
    // NOT start a match at all — the full span survives verbatim
    val prose = "words " * 60 // ~360 chars
    assert(strip(s"a < $prose> b") === s"a < ${prose.trim} > b")
    assert(strip("1 < 2 and 3 > 1") === "1 < 2 and 3 > 1")
    // while a REAL tag longer than any prose bound still strips whole
    val longTag = "<img src=\"data:image/png;base64," + ("A" * 600) + "\">"
    assert(strip(s"x ${longTag} y") === "x y")
  }
}

class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._
  import graft.expressions.GraftExpressions._

  test("NFC composes, NFKC folds compatibility forms, fast path intact") {
    def norm(s: String, form: String = "NFC"): String =
      Seq(s).toDF("t").select(unicodeNormalize($"t", form)).as[String].head()
    val decomposed = "cafe\u0301"           // e + combining acute
    assert(norm(decomposed) === "caf\u00e9") // composed form
    assert(norm("caf\u00e9") === "caf\u00e9") // already NFC: unchanged
    assert(norm("\uff21\ufb01", "NFKC") === "Afi") // fullwidth A + fi ligature
    // the dedup consequence: both spellings collapse to one fingerprint
    val fps = Seq(decomposed, "caf\u00e9").toDF("t")
      .select(fingerprint64(unicodeNormalize($"t"))).distinct().count()
    assert(fps === 1L)
    intercept[IllegalArgumentException] {
      Seq("x").toDF("t").select(unicodeNormalize($"t", "NFX")).head()
    }
  }
}

class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.UrlFunctions._

  private def norm(u: String): String =
    Seq(u).toDF("u").select(normalizeUrl($"u")).as[String].head()

  test("normalizeUrl: case, default ports, userinfo, utm params, fragment") {
    assert(norm("HTTPS://User:Pw@WWW.Ex.COM:443/A/B?utm_source=x&id=3&utm_medium=y#frag")
      === "https://www.ex.com/A/B?id=3")
    assert(norm("http://ex.com:80") === "http://ex.com/") // default port + empty path
    assert(norm("http://ex.com:8080/x") === "http://ex.com:8080/x") // non-default kept
    assert(norm("https://ex.com:80/x") === "https://ex.com:80/x") // 80 not default for https
    assert(norm("ftp://Ex.Com/File.TXT") === "ftp://ex.com/File.TXT") // path case kept
    assert(norm("not a url") === "not a url") // schemeless passes through
  }

  test("urlDomain strips one www label; host/port/path/query extract") {
    val row = Seq("https://WWW.Sub.Ex.com:8443/p/q?a=1#z").toDF("u")
      .select(urlHost($"u"), urlDomain($"u"), urlPort($"u"), urlPath($"u"),
        urlQuery($"u"))
      .as[(String, String, String, String, String)].head()
    assert(row === (("www.sub.ex.com", "sub.ex.com", "8443", "/p/q", "a=1")))
  }

  test("a '?' inside the fragment is not a query string") {
    // no real query here: '?x=1' is fragment text, and normalizeUrl must
    // not resurrect it after dropping the fragment
    val row = Seq("https://h/p#frag?x=1").toDF("u")
      .select(urlQuery($"u"), normalizeUrl($"u")).as[(String, String)].head()
    assert(row === (("", "https://h/p")))
    // a real query before the fragment still extracts
    assert(Seq("https://h/p?a=1#frag?x=2").toDF("u")
      .select(urlQuery($"u")).as[String].head() === "a=1")
  }

  test("idnAscii: unicode hosts -> punycode, ASCII and invalid pass through") {
    def idn(s: String): String =
      Seq(s).toDF("h").select(idnAscii($"h")).as[String].head()
    assert(idn("münchen.example.com") === "xn--mnchen-3ya.example.com")
    assert(idn("例え.テスト") === "xn--r8jz45g.xn--zckzah")
    assert(idn("plain.example.com") === "plain.example.com") // fast path
    assert(idn("") === "")
    // the two spellings of one host collapse to one dedup key
    assert(idn("münchen.de") === idn("xn--mnchen-3ya.de"))
  }

  test("percent-encoding normalization (RFC 3986 6.2.2)") {
    def pn(s: String): String =
      Seq(s).toDF("u").select(percentNormalize($"u")).as[String].head()
    assert(pn("a%7eb") === "a~b")          // unreserved decodes
    assert(pn("a%7Eb") === "a~b")
    assert(pn("%41%62%39%2d%2e%5f") === "Ab9-._")
    assert(pn("a%3fb%2fc") === "a%3Fb%2Fc") // reserved stays, hex uppercased
    assert(pn("100%") === "100%")           // bare percent passes through
    assert(pn("%zz%4") === "%zz%4")         // invalid escapes untouched
    assert(pn("plain") === "plain")         // fast path: no '%'
    // inside normalizeUrl: path + query both normalized
    assert(norm("https://Ex.com/a%7Eb/%41?x=%3f&y=%7e")
      === "https://ex.com/a~b/A?x=%3F&y=~")
  }
}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = (0L until 4000L).toDF("id")

  test("poissonBootstrap: constant group has zero bootstrap variance, " +
       "mixed group's mean stays in range with positive spread, " +
       "deterministic under repartition") {
    val rows = (1 to 200).map(i => ("c", s"a$i", 5000000L)) ++
      (1 to 200).map(i =>
        ("m", s"b$i", if (i <= 100) 1000000L else 3000000L))
    val df = rows.toDF("g", "id", "v")
    val out = Sampling.poissonBootstrap(df, "g", "id", "v", reps = 16)
      .as[(String, Long, Long, Long, Double)].collect().sortBy(_._1)
    val Seq(c, m) = out.toSeq
    // every replicate of a constant column means exactly the constant
    assert(c == (("c", 16L, 5000000L, 0L, 0.0)))
    assert(m._2 == 16L)
    assert(m._3 >= 1000000L && m._3 <= 3000000L)
    assert(m._4 > 0L)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m._5 == r6(math.sqrt(m._4.toDouble) / 1e6))
    // the row hash + Weyl rotation ignores partitioning: exact replay
    val rep = Sampling.poissonBootstrap(df.repartition(9), "g", "id",
        "v", reps = 16)
      .as[(String, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rep.toSeq == out.toSeq)
  }

  test("poissonBootstrap independentReps: on tiny groups the Weyl " +
       "lattice understates spread — independent per-(row,rep) draws " +
       "give at least the Weyl variance; both modes deterministic") {
    // 2-row groups are the worst case for the Weyl rotation: the two
    // rows' uniforms shift by the SAME constant per replicate, so their
    // multiplicities walk in lockstep and replicate means barely move
    val rows = (1 to 40).map(i => (s"g${i % 8}", s"id$i",
      if (i % 2 == 0) 1000000L else 9000000L))
    val df = rows.toDF("g", "id", "v")
    def run(indep: Boolean) =
      Sampling.poissonBootstrap(df, "g", "id", "v", reps = 200,
          independentReps = indep)
        .as[(String, Long, Long, Long, Double)].collect()
        .map(r => r._1 -> r._4).toMap
    val weyl = run(indep = false)
    val ind = run(indep = true)
    // aggregate over groups: independent replicates must show at least
    // as much across-replicate variance as the quasi-MC lattice
    assert(ind.values.sum >= weyl.values.sum,
      s"independent ${ind.values.sum} < weyl ${weyl.values.sum}")
    // determinism under repartition holds for the independent mode too
    val rep2 = Sampling.poissonBootstrap(df.repartition(7), "g", "id",
        "v", reps = 200, independentReps = true)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(rep2 == ind)
  }

  test("capPerKey keeps exactly maxPerKey best rows per key, deterministic ties") {
    // domain a: 10 docs, quality == id%3 (ties resolved by ascending id);
    // domain b: 2 docs (below the cap, all survive)
    val docs = ((0 until 10).map(i => ("a", i.toLong, (i % 3).toDouble)) ++
      Seq(("b", 100L, 9.0), ("b", 101L, 1.0))).toDF("domain", "id", "q")
    val kept = Sampling.capPerKey(docs, Seq("domain"), 4, "q", "id")
      .select($"domain", $"id").as[(String, Long)].collect().toSet
    // a: quality-2 docs are ids 2,5,8 -> all kept; the 4th slot goes to
    // the smallest-id quality-1 doc (id 1)
    assert(kept === Set(("a", 2L), ("a", 5L), ("a", 8L), ("a", 1L),
      ("b", 100L), ("b", 101L)))
    // survivor columns are untouched and the cap never exceeds the group
    assert(Sampling.capPerKey(docs, Seq("domain"), 100, "q", "id")
      .count() === docs.count())
  }

  test("capPerKeySkewAware: identical survivors, hot-key task shrinks") {
    // planted 30%-style skew: one domain holds 20k rows, 40 others hold
    // 50 each; cap keeps the 4 best per domain
    val hot = (0 until 20000).map(i => ("hot.com", i.toLong, (i % 97).toDouble))
    val cold = (0 until 40).flatMap(d =>
      (0 until 50).map(i => (s"d$d.com", 100000L + d * 100 + i, (i % 7).toDouble)))
    val docs = (hot ++ cold).toDF("domain", "id", "q")
    def plain = Sampling.capPerKey(docs, Seq("domain"), 4, "q", "id")
    def skewAware = Sampling.capPerKeySkewAware(docs, Seq("domain"), 4, "q", "id")
    // result-identical: same survivor SET (cold keys under the cap all
    // survive; hot key keeps the exact same best-4)
    assert(skewAware.select($"domain", $"id").as[(String, Long)].collect().toSet
      === plain.select($"domain", $"id").as[(String, Long)].collect().toSet)
    // NULL keys form one over-cap group too: the null-safe join must
    // route them through the capped path, never exempt them
    val withNulls = docs.unionByName(
      (0 until 500).map(i => (null.asInstanceOf[String], 900000L + i, 1.0))
        .toDF("domain", "id", "q"))
    val cappedNull = Sampling.capPerKeySkewAware(withNulls, Seq("domain"), 4, "q", "id")
      .filter($"domain".isNull).count()
    assert(cappedNull === 4L,
      s"null-key group must be capped like any other, got $cappedNull")
    // small caps: Spark's InferWindowGroupLimit protects the plain path
    // by itself — the plan must carry a WindowGroupLimit, which trims
    // each map partition to the top-4 per key before the shuffle
    plain.count()
    assert(plain.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "expected Spark's group-limit pushdown on the plain path at cap=4")
    // LARGE caps lose that rule (it fires only under
    // windowGroupLimitThreshold, default 1000) — simulate by disabling
    // it: the plain window then materializes the WHOLE hot group in one
    // task, and the salted pre-rank is what bounds the straggler
    // (records, not bytes — repetitive keys compress; AQE off keeps
    // reduce tasks distinct)
    import graft.metrics.SkewAudit
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "-1")
    try {
      val (_, plainRep) = SkewAudit.audit(spark) { plain.rdd.count() }
      val (_, skewRep) = SkewAudit.audit(spark) { skewAware.rdd.count() }
      val plainMax = plainRep.map(_.maxShuffleReadRecords).max
      val skewMax = skewRep.map(_.maxShuffleReadRecords).max
      assert(plainMax >= 20000L,
        s"plain path should pin the full hot group in one task, got $plainMax")
      assert(skewMax < plainMax / 2,
        s"skew-aware worst task should shrink severalfold: $skewMax vs $plainMax")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.optimizer.windowGroupLimitThreshold")
    }
  }

  test("deterministic: same rows every run, fraction approximately honored") {
    val a = Sampling.sampleByKey(ids, "id", 0.3).as[Long].collect().toSet
    val b = Sampling.sampleByKey(ids, "id", 0.3).as[Long].collect().toSet
    assert(a == b, "hash sampling must be run-stable")
    assert(math.abs(a.size / 4000.0 - 0.3) < 0.05, s"got ${a.size}/4000")
  }

  test("nested: sample(0.1) is a subset of sample(0.5)") {
    val small = Sampling.sampleByKey(ids, "id", 0.1).as[Long].collect().toSet
    val large = Sampling.sampleByKey(ids, "id", 0.5).as[Long].collect().toSet
    assert(small.subsetOf(large))
  }

  test("kFold: stable folds in [0,k), growth-invariant, key-determined") {
    val df = (0L until 1000L).toDF("id")
    val folds = Sampling.kFold(df, "id", 5).select("id", "fold")
      .as[(Long, Int)].collect().toMap
    assert(folds.values.forall(f => f >= 0 && f < 5))
    // every fold populated, roughly balanced
    val sizes = folds.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.size == 5 && sizes.values.forall(s => s > 120 && s < 280))
    // a row's fold never changes when the corpus grows
    val grown = Sampling.kFold((0L until 2000L).toDF("id"), "id", 5)
      .select("id", "fold").as[(Long, Int)].collect().toMap
    assert(folds.forall { case (id, f) => grown(id) == f })
    intercept[IllegalArgumentException] { Sampling.kFold(df, "id", 1) }
  }

  test("truncateHeadTail: exceeding docs keep head+tail with marker, " +
       "at-budget docs pass verbatim, tail 0 keeps head only, NULL " +
       "stays NULL") {
    val docs = Seq(
      (1L, "a b c d e f g h"),  // 8 tokens > 3+2
      (2L, "a b c d e"),        // exactly at budget
      (3L, null: String)).toDF("id", "text")
    val out = Packing.truncateHeadTail(docs, "text", 3, 2).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getString(2)), r.getLong(3)))).toMap
    assert(out(1L) == (Some("a b c ... g h"), 5L))
    assert(out(2L) == (Some("a b c d e"), 5L))
    assert(out(3L) == (None, 0L))
    val headOnly = Packing.truncateHeadTail(docs, "text", 3, 0).collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(headOnly(1L) == Some("a b c ... "))
  }

  test("temporalSplit: strict train end, inclusive test start, embargo " +
       "band dropped, NULL ts dropped") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    val df = Seq((1L, t(100)), (2L, t(189)), (3L, t(190)), (4L, t(195)),
      (5L, t(200)), (6L, t(300)),
      (7L, null.asInstanceOf[Timestamp])).toDF("id", "ts")
    val out = Sampling.temporalSplit(df, "ts", t(200), embargoSeconds = 10)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // train end = 190 exclusive; embargo [190, 200) gone; test from 200
    assert(out == Map(1L -> "train", 2L -> "train",
      5L -> "test", 6L -> "test"))
  }

  test("systematicSampleByWeight: every stride crossing kept exactly " +
       "once, heavy rows always survive, expected weight ~ total/stride, " +
       "NULL weights never sampled") {
    import org.apache.spark.sql.functions.col
    val rows = (0 until 400).map(i =>
      (i.toLong, ((i * 37) % 90 + 10).toLong)) :+ (400L, 5000L)
    val df = rows.toDF("id", "w")
    val out = Sampling.systematicSampleByWeight(df, Seq(col("id")), "w",
      stride = 1000L).select("id", "w").as[(Long, Long)].collect()
    // the 5000-weight row crosses >= 5 boundaries -> always kept
    assert(out.exists(_._1 == 400L))
    // with every weight < stride each row crosses at most one boundary,
    // so the light-only frame keeps exactly floor(total / stride) rows
    // (the heavy row above absorbs several boundaries into one row)
    val light = rows.dropRight(1)
    val lightKept = Sampling.systematicSampleByWeight(
      light.toDF("id", "w"), Seq(col("id")), "w", stride = 1000L).count()
    assert(lightKept == light.map(_._2).sum / 1000L)
    // deterministic replay
    val again = Sampling.systematicSampleByWeight(df, Seq(col("id")), "w",
      stride = 1000L).select("id").as[Long].collect()
    assert(out.map(_._1).toSeq == again.toSeq)
    // NULL weight rows can never be selected
    val withNull = Seq((1L, java.lang.Long.valueOf(1500L)),
      (2L, null.asInstanceOf[java.lang.Long]),
      (3L, java.lang.Long.valueOf(1500L))).toDF("id", "w")
    val sel = Sampling.systematicSampleByWeight(withNull, Seq(col("id")),
      "w", stride = 1000L).select("id").as[Long].collect().toSet
    assert(sel == Set(1L, 3L))
  }

  test("mixByTokenBudget: per-source caps bind, order deterministic, others drop") {
    val docs = (0 until 30).map { i =>
      (i.toLong, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c", 10L)
    }.toDF("id", "src", "toks") // 10 docs x 10 tokens per source
    val mixed = Sampling.mixByTokenBudget(docs, "src", "toks",
      Map("a" -> 0.5, "b" -> 0.25), budget = 200L, tieBreak = "id")
    val bySrc = mixed.groupBy($"src").count().as[(String, Long)].collect().toMap
    // a: cap 100 tokens -> 10 docs (all); b: cap 50 -> 5 docs; c: absent -> 0
    assert(bySrc === Map("a" -> 10L, "b" -> 5L))
    // deterministic: identical selection on re-run
    val again = Sampling.mixByTokenBudget(docs, "src", "toks",
      Map("a" -> 0.5, "b" -> 0.25), budget = 200L, tieBreak = "id")
    assert(mixed.select($"id").as[Long].collect().sorted.toSeq ===
      again.select($"id").as[Long].collect().sorted.toSeq)
    intercept[IllegalArgumentException] {
      Sampling.mixByTokenBudget(docs, "src", "toks", Map("a" -> 1.5), 100L, "id")
    }
  }

  test("temperatureSampleBySource: tau flattens the head, caps at source " +
       "size, deterministic") {
    // geometric strata: g0 holds ids 0..9 (10 docs), g1 the next 90,
    // g2 the remaining 900 — a 1:9:90 skew
    val docs = (0L until 1000L).toDF("id")
      .withColumn("src",
        when($"id" < 10, "g0").when($"id" < 100, "g1").otherwise("g2"))
    def keptBySrc(tau: Double, budget: Long) =
      Sampling.temperatureSampleBySource(docs, "id", "src", tau, budget)
        .groupBy($"src").count().as[(String, Long)].collect().toMap
        .withDefaultValue(0L)
    // tau=0: equal share (100 each) — tiny g0 is CAPPED at its 10 docs,
    // the rest get ~100 each regardless of size
    val flat = keptBySrc(0.0, 300L)
    assert(flat("g0") == 10L)
    assert(math.abs(flat("g1") - 100L) < 30, flat.toString)
    assert(math.abs(flat("g2") - 100L) < 30, flat.toString)
    // tau=1: proportional — g2 dominates ~9:1 over g1
    val prop = keptBySrc(1.0, 300L)
    assert(prop("g2") > 5 * prop("g1"), prop.toString)
    // monotonicity: lowering tau can only grow the small source's share
    assert(flat("g1") >= prop("g1"))
    // determinism: identical selection on re-run
    val a = Sampling.temperatureSampleBySource(docs, "id", "src", 0.5, 300L)
      .select($"id").as[Long].collect().sorted.toSeq
    val b = Sampling.temperatureSampleBySource(docs, "id", "src", 0.5, 300L)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
    // output schema preserved (no helper columns leak)
    assert(Sampling.temperatureSampleBySource(docs, "id", "src", 0.5, 300L)
      .columns.toSeq == Seq("id", "src"))
    intercept[IllegalArgumentException] {
      Sampling.temperatureSampleBySource(docs, "id", "src", 1.5, 300L)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureSampleBySource(
        docs.withColumn("k", $"id".cast("string")), "k", "src", 0.5, 300L)
    }
  }

  test("leakFreeSplit: paired docs land together, unpaired split by id") {
    val docs = (0L until 100L).toDF("doc_id")
    // two clusters: {3,7,11} (chained — 3-7 and 7-11, no direct 3-11
    // edge, so the guarantee must ride CONNECTIVITY not the raw pairs)
    // and {20,90}
    val pairs = Seq((3L, 7L), (7L, 11L), (20L, 90L)).toDF("id1", "id2")
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.leakFreeSplit(docs, "doc_id", pairs, w)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(out.size == 100 && out.values.forall(_ != null))
    // whole clusters share one split
    assert(Set(out(3L), out(7L), out(11L)).size == 1)
    assert(out(20L) == out(90L))
    // the cluster's split is its MIN id's splitByHash band, and every
    // unpaired doc keeps its plain splitByHash assignment
    val plain = Sampling.splitByHash(docs, "doc_id", w)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(out(7L) == plain(3L) && out(90L) == plain(20L))
    val paired = Set(3L, 7L, 11L, 20L, 90L)
    assert(out.filter(kv => !paired(kv._1)) ==
      plain.filter(kv => !paired(kv._1)))
  }

  test("splitByHash: disjoint covering bands, stable under corpus growth") {
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val small = Sampling.splitByHash(ids, "id", w)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    // every row labeled, rough proportions hold
    assert(small.values.forall(Set("train", "val", "test")))
    val frac = small.values.groupBy(identity).view.mapValues(_.size / 4000.0)
    assert(math.abs(frac("train") - 0.8) < 0.05, frac.toMap.toString)
    // growth stability: the same ids keep their split in a 3x corpus
    val big = Sampling.splitByHash((0L until 12000L).toDF("id"), "id", w)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    assert(small.forall { case (id, sp) => big(id) == sp },
      "existing keys must never be reassigned when the corpus grows")
    // weights below 1: remainder is NULL (explicit holdout)
    val partial = Sampling.splitByHash(ids, "id", Seq("train" -> 0.5))
      .filter($"split".isNull).count()
    assert(partial > 1500 && partial < 2500)
    intercept[IllegalArgumentException] {
      Sampling.splitByHash(ids, "id", Seq("a" -> 0.9, "b" -> 0.2))
    }
    // a string key would hash to NULL for every row and silently void
    // the split — must fail loudly instead
    intercept[IllegalArgumentException] {
      Sampling.splitByHash(Seq("u1").toDF("url"), "url", Seq("a" -> 0.5))
    }
  }

  test("edge fractions: 0 keeps nothing, 1 keeps everything") {
    assert(Sampling.sampleByKey(ids, "id", 0.0).count() == 0L)
    assert(Sampling.sampleByKey(ids, "id", 1.0).count() == 4000L)
    intercept[IllegalArgumentException] { Sampling.sampleByKey(ids, "id", 1.5) }
  }

  test("stratified: per-stratum fractions and default applied") {
    val df = (0L until 3000L).map(i => (i, "s" + (i % 3))).toDF("id", "st")
    val kept = Sampling.stratifiedSampleByKey(df, "id", "st",
        Map("s0" -> 0.8, "s1" -> 0.2), default = 0.0)
      .groupBy($"st").count().as[(String, Long)].collect().toMap
    assert(math.abs(kept("s0") / 1000.0 - 0.8) < 0.08, kept.toString)
    assert(math.abs(kept("s1") / 1000.0 - 0.2) < 0.08, kept.toString)
    assert(!kept.contains("s2"), "default 0.0 must drop the whole stratum")
  }

  test("hash stays in [0, 2^32) even for huge and negative keys") {
    val df = Seq(Long.MaxValue, Long.MinValue, -1L, 0L).toDF("id")
    val hs = df.select(Sampling.knuthHash32($"id").as("h")).as[Long].collect()
    assert(hs.forall(h => h >= 0L && h < 4294967296L), hs.toSeq.toString)
  }

  test("null keys are dropped (null hash fails the filter)") {
    val df = Seq(Some(1L), None, Some(2L)).toDF("id")
    assert(Sampling.sampleByKey(df, "id", 1.0).count() == 2L)
  }

  test("kCenterCoreset: farthest-point traversal on a 1-D line; radius " +
      "curve non-increasing; duplicate points tie to the smaller id") {
    // micro points 0, 1e6, 1e7, 4e6 from seed id 1: picks 3 (1e14),
    // then 4 (1.6e13), then 2 (1e12)
    val df = Seq((1L, Array(0.0f)), (2L, Array(1.0f)), (3L, Array(10.0f)),
      (4L, Array(4.0f))).toDF("vec_id", "embedding")
    val out = Sampling.kCenterCoreset(df, "vec_id", "embedding", k = 4)
      .as[(Int, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((1, 1L, 0L), (2, 3L, 100000000000000L),
      (3, 4L, 16000000000000L), (4, 2L, 1000000000000L)))
    assert(out.map(_._3).drop(1) == out.map(_._3).drop(1).sortBy(-_))
    // duplicates: both at 10.0 — the smaller id wins the argmax tie
    val dup = Seq((1L, Array(0.0f)), (7L, Array(10.0f)), (5L, Array(10.0f)))
      .toDF("vec_id", "embedding")
    val picks = Sampling.kCenterCoreset(dup, "vec_id", "embedding", k = 2)
      .as[(Int, Long, Long)].collect().toSeq.sortBy(_._1).map(_._2)
    assert(picks == Seq(1L, 5L))
    // k beyond the corpus stops at n picks
    assert(Sampling.kCenterCoreset(dup, "vec_id", "embedding", k = 9)
      .count() == 3)
  }
}

class TextMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("repetition: concentration and diversity on crafted docs") {
    val df = Seq(
      (1L, "spam spam spam spam"),        // one token repeated 4x
      (2L, "all four tokens differ here"), // fully diverse (5 tokens)
      (3L, "a a b b"),                    // two tokens, 2x each
      (4L, "   ")                         // blank: no tokens, no row
    ).toDF("doc_id", "text")
    val m = TextMetrics.repetition(df, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Double, Double)].collect().toSeq
    assert(m == Seq(
      (1L, 1.0, 0.25),
      (2L, 0.2, 1.0),
      (3L, 0.5, 0.5)))
  }

  test("duplicateNgramStats: hand-checked coverage on crafted docs") {
    val df = Seq(
      // "a b" occurs at 0,2,4 (3x), "b a" at 1,3 (2x): top 2-gram covers
      // min(1, 3*2/6)=1.0; every position is inside some duplicated gram
      (1L, "a b a b a b"),
      // no repeated 2-gram: top covers 2/4, dup covers 0
      (2L, "w x y z"),
      // "c d" duplicated at 0 and 3 -> positions {0,1,3,4} = 4/5 covered;
      // top 2-gram count 2 -> 2*2/5 = 0.8
      (3L, "c d e c d"),
      (4L, " ")                            // blank: no rows at all
    ).toDF("doc_id", "text")
    val m = TextMetrics.duplicateNgramStats(df, "doc_id", "text", ns = Seq(2))
      .orderBy($"doc_id").as[(Long, Int, Double, Double)].collect().toSeq
    assert(m == Seq(
      (1L, 2, 1.0, 1.0),
      (2L, 2, 0.5, 0.0),
      (3L, 2, 0.8, 0.8)))
  }

  test("duplicateNgramStats: docs shorter than n emit no row for that n") {
    val df = Seq((1L, "only two"), (2L, "one two three four five six")).toDF("doc_id", "text")
    val m = TextMetrics.duplicateNgramStats(df, "doc_id", "text", ns = Seq(2, 5))
      .select($"doc_id", $"n").as[(Long, Int)].collect().toSet
    assert(m == Set((1L, 2), (2L, 2), (2L, 5)))
  }

  test("readabilityScores: hand-counted words/sentences/syllables and formulas") {
    // "The cat sat. It ran!" -> 5 words, 2 sentences,
    // syllables: the(1) cat(1) sat(1) it(1) ran(1) = 5
    val df = Seq((1L, "The cat sat. It ran!"), (2L, "???"), (3L, "beautiful day"))
      .toDF("doc_id", "text")
    val out = TextMetrics.readabilityScores(df, "doc_id", "text")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    val r1 = out(0)
    assert((r1._2, r1._3, r1._4) == ((5L, 2L, 5L)))
    // FRE = 206.835 - 1.015*2.5 - 84.6*1.0 = 119.6975
    assert(r1._5.contains(119.6975) && r1._6.contains(-2.815))
    // zero-word doc: counts kept, scores NULL (sentence floor = 1)
    assert(out(1) == ((2L, 0L, 1L, 0L, None, None)))
    // beau-ti-ful (eau/i/u groups = 3) + day (1) = 4 syllables, 1 sentence
    assert((out(2)._2, out(2)._3, out(2)._4) == ((2L, 1L, 4L)))
  }

  test("bleuCounts: clipped matches, zero-gram edges, identity pair") {
    val pairs = Seq(
      // cand repeats "the cat": unigram clip the=2,cat=1,sat=1 -> 4/5;
      // bigram clip "the cat"=1, "cat sat"=1 -> 2/4
      (1L, "the cat the cat sat", "the cat sat on the mat"),
      (2L, "x", "y z"),        // single token: no bigrams at all
      (3L, "", "anything"),    // empty candidate: all zeros
      (4L, "a b c", "a b c")   // identity: perfect precision
    ).toDF("pid", "cand", "ref")
    val out = TextMetrics.bleuCounts(pairs, "pid", "cand", "ref")
      .orderBy($"pid")
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(out == Seq(
      (1L, 4L, 5L, 2L, 4L, 0.8, 0.5, 0.632456), // sqrt(0.4)
      (2L, 0L, 1L, 0L, 0L, 0.0, 0.0, 0.0),
      (3L, 0L, 0L, 0L, 0L, 0.0, 0.0, 0.0),
      (4L, 3L, 3L, 2L, 2L, 1.0, 1.0, 1.0)))
  }

  test("rougeCounts: recall against the reference, clipped matches, " +
       "ref totals count grams the candidate missed, zero-gram edges, " +
       "identity pair is perfect") {
    val pairs = Seq(
      // uni: cand the2 cat2 sat1 (5), ref the2 cat1 sat1 on1 mat1 (6),
      // clip 4 -> r=4/6 p=4/5; bi: clip "the cat"1 + "cat sat"1 = 2,
      // cand 4, ref 5 -> r=2/5 p=2/4
      (1L, "the cat the cat sat", "the cat sat on the mat"),
      (2L, "x", "y z"),        // no cand bigrams; ref bigram still counts
      (3L, "", "anything"),    // empty candidate: zero recall, ref_1 = 1
      (4L, "a b c", "a b c")   // identity: all scores 1.0
    ).toDF("pid", "cand", "ref")
    val out = TextMetrics.rougeCounts(pairs, "pid", "cand", "ref")
      .orderBy($"pid")
      .as[(Long, Long, Long, Long, Long, Long, Long,
        Double, Double, Double, Double, Double, Double)]
      .collect().toSeq
    def f1(p: Double, r: Double) =
      BigDecimal(2 * p * r / (p + r))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq(
      (1L, 4L, 5L, 6L, 2L, 4L, 5L,
        0.666667, 0.8, f1(4.0 / 5, 4.0 / 6), 0.4, 0.5, f1(0.5, 0.4)),
      (2L, 0L, 1L, 2L, 0L, 0L, 1L, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      (3L, 0L, 0L, 1L, 0L, 0L, 0L, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      (4L, 3L, 3L, 3L, 2L, 2L, 2L, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)))
  }

  test("charEntropy: hand values — uniform pairs give 1 bit, constant " +
       "text gives 0, uniform 4-alphabet gives 2 bits, empty/null keep " +
       "zero rows; both tails separate template from noise") {
    val df = Seq(
      (1L, "aabb"),          // H = 1 bit exactly
      (2L, "aaaa"),          // H = 0
      (3L, "abcd"),          // H = 2 bits
      (4L, ""),              // empty -> zero row
      (5L, null.asInstanceOf[String]),
      (6L, "aaaaaaab")       // low-entropy template-ish: 1/8 vs 7/8
    ).toDF("id", "text")
    val out = TextMetrics.charEntropy(df, "id", "text")
      .orderBy($"id").as[(Long, Long, Long, Double)].collect().toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val h6 = r6((7.0 / 8) * math.log(8.0 / 7) / math.log(2.0)
      + (1.0 / 8) * math.log(8.0) / math.log(2.0))
    assert(out == Seq(
      (1L, 4L, 2L, 1.0),
      (2L, 4L, 1L, 0.0),
      (3L, 4L, 4L, 2.0),
      (4L, 0L, 0L, 0.0),
      (5L, 0L, 0L, 0.0),
      (6L, 8L, 2L, h6)))
    // low-entropy template sits strictly between constant and 1 bit
    assert(out(5)._4 > 0.0 && out(5)._4 < 1.0)
  }

  test("confusableSpoofPairs: planted Cyrillic swap caught, clean docs " +
      "and exact duplicates excluded, n_swapped counts the homoglyphs") {
    val docs = Seq(
      (1L, "the cat sat"),                 // clean original
      (2L, "the cаt sаt"),       // Cyrillic а twice -> spoof of 1
      (3L, "the dog ran"),                 // clean, no pair
      (4L, "the dog ran"),                 // exact duplicate of 3: equal
                                           // skeleton but equal TEXT too
      (5L, "тhe cat sat")             // Cyrillic т: skeleton differs
                                           // (т not in the table) -> no pair
    ).toDF("doc_id", "text")
    val out = TextMetrics.confusableSpoofPairs(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(out == Seq((1L, 2L, 2L)))
    // skeleton is idempotent when no TABLE character appears (docs
    // 1/3/4 are ASCII; doc 5's Cyrillic т is deliberately unmapped)
    val sk = docs.select(
        TextMetrics.confusableSkeleton($"text") === $"text")
      .as[Boolean].collect()
    assert(sk.count(identity) == 4)
  }
}

class MojibakeSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.TextFunctions._

  test("repair restores the original UTF-8; clean rows bypass untouched") {
    val df = Seq(
      ("CafÃ© rÃ©sumÃ© niÃ±o", "Café résumé niño"),  // damaged -> fixed
      ("plain ascii text", "plain ascii text"),     // identity
      ("naïve café — clean unicode", "naïve café — clean unicode")
      // real accents but NO markers: bypass, NOT transcoded (the
      // round-trip would garble the em dash)
    ).toDF("t", "want")
    val out = df.select(repairMojibake($"t").as("got"), $"want")
      .as[(String, String)].collect()
    out.foreach { case (got, want) => assert(got == want, s"$got != $want") }
  }

  test("mojibakeCount counts each marker; repair is idempotent") {
    val damaged = "CafÃ© faÃ§ade Ã¼ber"
    val counts = Seq(damaged).toDF("t")
      .select(mojibakeCount($"t").as("n"),
        mojibakeCount(repairMojibake($"t")).as("after"),
        repairMojibake(repairMojibake($"t")).as("twice"),
        repairMojibake($"t").as("once"))
      .as[(Long, Long, String, String)].head()
    assert(counts._1 == 3L && counts._2 == 0L)
    assert(counts._3 == counts._4, "second repair must be a no-op")
  }
}

class InvisibleCharSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.TextFunctions._

  test("count and scrub every marker; clean text untouched; deletion not spacing") {
    val df = Seq(
      ("a\u200Bb\uFEFFc\u00ADd\u200C\u200D\u2060e", 6L, "abcde"),
      ("plain text", 0L, "plain text"),
      // real whitespace is NOT in the class — only format chars go
      ("keep the  spaces", 0L, "keep the  spaces")
    ).toDF("t", "wantN", "wantS")
    val out = df.select(invisibleCharCount($"t").as("n"),
        scrubInvisible($"t").as("s"), $"wantN", $"wantS")
      .as[(Long, String, Long, String)].collect()
    out.foreach { case (n, sc, wn, ws) =>
      assert(n == wn && sc == ws, s"($n, $sc)")
    }
  }

  test("scrubbed visually-identical strings fingerprint together") {
    val a = "same words here exactly"
    val b = "same\u200B words here\u00AD exactly"
    val fps = Seq(a, b).toDF("t")
      .select(fingerprint(scrubInvisible($"t")).as("fp"))
      .as[Long].collect()
    assert(fps(0) == fps(1))
    // and WITHOUT the scrub they hash apart — the problem is real
    val raw = Seq(a, b).toDF("t")
      .select(fingerprint($"t").as("fp")).as[Long].collect()
    assert(raw(0) != raw(1))
  }
}

class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  test("emails, IPs, phone runs redacted with typed placeholders") {
    val df = Seq(
      "contact bob.smith+x@example.co.uk or call +1 (415) 555-0101 now",
      "server at 192.168.0.1 responded",
      "clean text with no pii at all").toDF("t")
    val out = df.select(TextFunctions.scrubPii($"t").as("s")).as[String].collect()
    assert(out(0) == "contact [EMAIL] or call [PHONE] now", out(0))
    assert(out(1) == "server at [IP] responded", out(1))
    assert(out(2) == "clean text with no pii at all")
  }

  test("piiCount counts each entity once, never double-counts email digits") {
    val df = Seq(
      ("a@b.io and c@d.org", 2L),
      ("ip 10.0.0.7 phone 415 555 0101", 2L),
      ("nothing here", 0L)).toDF("t", "want")
    val got = df.select(TextFunctions.piiCount($"t").as("n"), $"want")
      .as[(Long, Long)].collect()
    got.foreach { case (n, want) => assert(n == want, s"$n != $want") }
  }
}

class KeepBestSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "aaa", 100L), (2L, "aab", 300L), (3L, "aac", 300L), // cluster {1,2,3}
    (4L, "bbb", 50L), (5L, "bbc", 40L),                      // cluster {4,5}
    (6L, "unique", 10L), (7L, "also unique", 20L)            // untouched
  ).toDF("doc_id", "text", "n_chars")
  private val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")

  test("one winner per cluster: best quality, ties to smallest id") {
    val kept = Dedup.keepBestPerCluster(docs, pairs, "doc_id", "n_chars")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    // {1,2,3}: 2 and 3 tie on n_chars=300 -> 2 wins; {4,5}: 4 wins
    assert(kept == Seq(2L, 4L, 6L, 7L))
  }

  test("survivor rows carry the original schema and values") {
    val kept = Dedup.keepBestPerCluster(docs, pairs, "doc_id", "n_chars")
    assert(kept.columns.toSeq == Seq("doc_id", "text", "n_chars"))
    val row = kept.filter($"doc_id" === 4L)
      .as[(Long, String, Long)].collect().head
    assert(row == ((4L, "bbb", 50L)))
  }

  test("empty pair set keeps everything") {
    val none = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(Dedup.keepBestPerCluster(docs, none, "doc_id", "n_chars")
      .count() == 7L)
  }
}

class SlidingWindowChunksSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed windows: stride-overlap, short tail, 1-based starts") {
    val df = Seq((1L, "a b c d e f g")).toDF("id", "text")
    val out = Packing.slidingWindowChunks(df, "id", "text",
        window = 3, stride = 2)
      .orderBy($"start")
      .select($"start", $"n_tok", $"chunk")
      .as[(Int, Long, String)].collect().toSeq
    assert(out == Seq((1, 3L, "a b c"), (3, 3L, "c d e"),
      (5, 3L, "e f g"), (7, 1L, "g")))
  }

  test("every token is covered; token-less docs produce zero chunks") {
    val df = Seq((1L, "x y z"), (2L, null.asInstanceOf[String]),
      (3L, "   ")).toDF("id", "text")
    val out = Packing.slidingWindowChunks(df, "id", "text", 10, 5)
    assert(out.collect().map(r => (r.getLong(0), r.getString(3))).toSeq
      == Seq((1L, "x y z")))
    intercept[IllegalArgumentException] {
      Packing.slidingWindowChunks(df, "id", "text", window = 3, stride = 4)
    }
  }

  test("plan is map-side only: no shuffle, no window") {
    val df = Seq((1L, "a b c")).toDF("id", "text")
    val plan = Packing.slidingWindowChunks(df, "id", "text", 10, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Window"), plan)
  }
}

class ContentDefinedChunksSpec extends SparkSpec {
  import spark.implicits._

  private val words =
    (1 to 120).map(i => s"w$i").mkString(" ") // deterministic corpus-ish doc

  test("chunks tile the document exactly: concatenation rebuilds the " +
       "normalized text, starts are contiguous") {
    val df = Seq((1L, words)).toDF("id", "text")
    val ch = Packing.contentDefinedChunks(df, "id", "text")
      .orderBy($"start").collect()
    assert(ch.map(_.getString(3)).mkString(" ") == words)
    val bounds = ch.map(r => (r.getInt(1), r.getLong(2)))
    // each chunk starts where the previous ended
    assert(bounds.scanLeft(1L)((acc, c) => acc + c._2).init.toSeq
      == bounds.map(_._1.toLong).toSeq)
  }

  test("edit-robustness: one inserted token changes at most two chunk " +
       "contents — the CDC property fixed windows lack") {
    val a = Packing.contentDefinedChunks(
      Seq((1L, words)).toDF("id", "text"), "id", "text")
      .select($"chunk").as[String].collect().toSeq
    val b = Packing.contentDefinedChunks(
      Seq((1L, "inserted " + words)).toDF("id", "text"), "id", "text")
      .select($"chunk").as[String].collect().toSeq
    def multiset(s: Seq[String]) = s.groupBy(identity).view.mapValues(_.size).toMap
    val ma = multiset(a); val mb = multiset(b)
    val onlyA = ma.map { case (k, v) => (v - mb.getOrElse(k, 0)).max(0) }.sum
    assert(onlyA <= 2, s"$onlyA chunks of the original vanished after a " +
      "single-token insert; CDC boundaries must localize edits")
    // contrast: sliding windows shift EVERY chunk
    val sa = Packing.slidingWindowChunks(
      Seq((1L, words)).toDF("id", "text"), "id", "text", 10, 10)
      .select($"chunk").as[String].collect().toSet
    val sb = Packing.slidingWindowChunks(
      Seq((1L, "inserted " + words)).toDF("id", "text"), "id", "text", 10, 10)
      .select($"chunk").as[String].collect().toSet
    assert((sa -- sb).size > 2, "fixed windows should NOT be edit-robust " +
      "(or this corpus is degenerate and the test proves nothing)")
  }

  test("token-less docs produce zero chunks; map-only plan") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, " ")).toDF("id", "text")
    assert(Packing.contentDefinedChunks(df, "id", "text").count() == 0L)
    val plan = Packing.contentDefinedChunks(
        Seq((1L, "a b")).toDF("id", "text"), "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Window"), plan)
  }
}

class SourceOverlapMatrixSpec extends SparkSpec {
  import spark.implicits._

  test("pairs label by endpoint sources, unordered; diagonal = " +
       "within-source") {
    val docs = Seq((1L, "web"), (2L, "books"), (3L, "web"), (4L, "web"),
      (5L, "wiki")).toDF("doc_id", "source")
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("id1", "id2")
    val out = Dedup.sourceOverlapMatrix(docs, pairs, "doc_id", "source")
      .as[(String, String, Long)].collect().toSeq
    // (1,2) and (2,3) both cross books<->web; (1,3) and (3,4) are
    // within web; wiki never appears
    assert(out == Seq(("books", "web", 2L), ("web", "web", 2L)))
  }

  test("empty pair frame yields an empty matrix, not a crash") {
    val docs = Seq((1L, "web")).toDF("doc_id", "source")
    val none = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(Dedup.sourceOverlapMatrix(docs, none, "doc_id", "source")
      .count() == 0L)
  }
}

class EpochReplicateSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 1000L).map(i =>
    (i, if (i < 400) "hq" else "web")).toDF("id", "src")

  test("epochReplicate: floor copies for everyone, the hashed slice gets " +
       "one more — expected copies exact, not approximate") {
    val out = Sampling.epochReplicate(docs, "id", "src",
      Map("hq" -> 2.5, "web" -> 0.25))
    val hq = out.filter($"src" === "hq")
    // every hq doc appears at least twice (epochs 0 and 1)
    assert(hq.filter($"epoch" < 2).count() == 800L)
    // the extra epoch is EXACTLY the fraction-0.5 hash slice
    val extra = hq.filter($"epoch" === 2).select($"id").as[Long].collect().toSet
    val slice = Sampling.sampleByKey(docs.filter($"src" === "hq"), "id", 0.5)
      .select($"id").as[Long].collect().toSet
    assert(extra == slice)
    // web runs 0.25 epochs: only the hashed quarter survives, epoch 0 only
    val web = out.filter($"src" === "web")
    assert(web.select($"epoch").distinct().as[Int].collect().toSeq == Seq(0))
    val webSlice = Sampling.sampleByKey(docs.filter($"src" === "web"), "id", 0.25)
    assert(web.count() == webSlice.count())
  }

  test("epochReplicate: unlisted sources pass through once; e=0 drops a " +
       "source entirely; determinism across runs") {
    val out = Sampling.epochReplicate(docs, "id", "src", Map("hq" -> 0.0))
    assert(out.filter($"src" === "hq").count() == 0L)
    val web = out.filter($"src" === "web")
    assert(web.count() == 600L && web.select($"epoch").distinct().count() == 1)
    val again = Sampling.epochReplicate(docs, "id", "src", Map("hq" -> 0.0))
      .select($"id", $"epoch").as[(Long, Int)].collect().toSet
    assert(again == out.select($"id", $"epoch").as[(Long, Int)].collect().toSet)
    intercept[IllegalArgumentException] {
      Sampling.epochReplicate(docs, "id", "src", Map("hq" -> 100.0))
    }
  }

  test("epochReplicate plan: broadcast plan join + map-side explode, no " +
       "shuffle of the corpus") {
    val plan = Sampling.epochReplicate(docs, "id", "src", Map("hq" -> 2.5))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}

class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("dsirWeights: exact hand-computed log-ratios; target-like docs " +
       "score positive, off-target negative") {
    // target (t=true): "a a b"; raw adds "c c c". Vocab {a,b,c} V=3,
    // N_t=3, N_r=6. Smoothed: p_t(a)=(2+1)/6, p_t(b)=2/6, p_t(c)=1/6;
    // p_r(a)=3/9, p_r(b)=2/9, p_r(c)=4/9.
    val docs = Seq((1L, "a a b", true), (2L, "c c c", false),
      (3L, "", false)).toDF("id", "text", "tgt")
    val out = Sampling.dsirWeights(docs, "id", "text", $"tgt").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val la = math.log(3.0 / 6) - math.log(3.0 / 9)
    val lb = math.log(2.0 / 6) - math.log(2.0 / 9)
    val lc = math.log(1.0 / 6) - math.log(4.0 / 9)
    assert(out(1L) == (3L, Some(r4((la + la + lb) / 3))))
    assert(out(1L)._2.get > 0, "target-built doc must score positive")
    assert(out(2L) == (3L, Some(r4(lc))))
    assert(out(2L)._2.get < 0, "off-target doc must score negative")
    // token-less doc keeps its row with a NULL score
    assert(out(3L) == (0L, None))
  }

  test("dsirWeights: NULL predicate rows count as non-target, not poison") {
    val docs = Seq((1L, "x y", "en"), (2L, "x y", null.asInstanceOf[String]))
      .toDF("id", "text", "lang")
    val out = Sampling.dsirWeights(docs, "id", "text", $"lang" === "en")
      .collect().map(r => r.getLong(0) -> r.get(2)).toMap
    // identical text, same ratio for both docs — and nothing is NULL
    assert(out(1L) != null && out(1L) == out(2L))
  }

  test("dsirWeights plan: no cartesian beyond the 1-row stats broadcast") {
    val docs = Seq((1L, "a", true)).toDF("id", "text", "tgt")
    val plan = Sampling.dsirWeights(docs, "id", "text", $"tgt")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}

class DoremiSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed update: positive excess amplifies, negative clamps") {
    // A: avg proxy 2.0 vs ref 1.0 -> excess 1 -> scale e; B: proxy 1.0
    // vs ref 3.0 -> clamped 0 -> scale 1. Uniform priors, no smoothing.
    val proxy = Seq(("A", 1.5), ("A", 2.5), ("B", 1.0)).toDF("d", "loss")
    val ref = Seq(("A", 1.0), ("B", 3.0)).toDF("d", "loss")
    val w = Seq(("A", 1.0), ("B", 1.0)).toDF("d", "w")
    val out = Sampling.doremiWeightUpdate(proxy, ref, w, "d", "loss", "w",
        eta = 1.0, smoothing = 0.0)
      .as[(String, Double)].collect().toMap
    val e = math.exp(1.0)
    assert(math.abs(out("A") - e / (e + 1)) < 1e-6, out)
    assert(math.abs(out("B") - 1 / (e + 1)) < 1e-6, out)
  }

  test("smoothing mixes toward uniform; weights always sum to ~1") {
    val proxy = Seq(("A", 5.0), ("B", 1.0), ("C", 1.0)).toDF("d", "loss")
    val ref = Seq(("A", 1.0), ("B", 1.0), ("C", 1.0)).toDF("d", "loss")
    val w = Seq(("A", 1.0), ("B", 1.0), ("C", 1.0)).toDF("d", "w")
    val out = Sampling.doremiWeightUpdate(proxy, ref, w, "d", "loss", "w",
        eta = 1.0, smoothing = 0.3)
      .as[(String, Double)].collect().toMap
    assert(math.abs(out.values.sum - 1.0) < 1e-5, out)
    // every domain keeps at least the smoothing floor c/k
    assert(out.values.forall(_ >= 0.3 / 3 - 1e-9), out)
    assert(out("A") > out("B") && math.abs(out("B") - out("C")) < 1e-9)
  }

  test("domains missing from the reference drop (no defined excess)") {
    val proxy = Seq(("A", 1.0), ("B", 1.0)).toDF("d", "loss")
    val ref = Seq(("A", 1.0)).toDF("d", "loss")
    val w = Seq(("A", 1.0), ("B", 1.0)).toDF("d", "w")
    val out = Sampling.doremiWeightUpdate(proxy, ref, w, "d", "loss", "w")
      .as[(String, Double)].collect().toMap
    assert(out.keySet == Set("A") && math.abs(out("A") - 1.0) < 1e-6, out)
  }
}

class UnimaxSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed walk: small sources cap at maxEpochs, surplus flows up") {
    // avail A:10 B:100 C:1000, E=2, budget 200. Ascending walk:
    // A: fair 200/3=66, alloc min(20,66)=20, u=180
    // B: fair 180/2=90, alloc min(200,90)=90, u=90
    // C: fair 90/1=90,  alloc min(2000,90)=90
    val docs = (Seq.fill(1)(("A", 10L)) ++ Seq.fill(2)(("B", 50L)) ++
      Seq.fill(4)(("C", 250L))).toDF("src", "cost")
    val out = Sampling.unimaxAllocation(docs, "src", "cost", 200L, 2)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("A", 10L, 20L), ("B", 100L, 90L), ("C", 1000L, 90L)))
  }

  test("budget larger than maxEpochs x corpus: every source caps, surplus unspent") {
    val docs = Seq(("A", 10L), ("B", 20L)).toDF("src", "cost")
    val out = Sampling.unimaxAllocation(docs, "src", "cost", 1000L, 3)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("A", 10L, 30L), ("B", 20L, 60L)))
  }

  test("zero budget allocates zero everywhere; avail ties order by source") {
    val docs = Seq(("B", 5L), ("A", 5L)).toDF("src", "cost")
    val out = Sampling.unimaxAllocation(docs, "src", "cost", 0L, 1)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("A", 5L, 0L), ("B", 5L, 0L)))
  }
}

class NeymanSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed allocation: variance earns seats, sizes alone do not") {
    // A: 4 rows of {0, 10} pairs -> sigma ~ 5.7735, w = 23.094
    // B: 8 rows all 5           -> sigma 0, w = 0
    // C: 2 rows {0, 100}        -> sigma ~ 70.71, w = 141.4214
    // shares: A 23.094/164.5154, C 141.4214/164.5154; k=10
    val docs = (Seq.fill(2)(("A", 0L)) ++ Seq.fill(2)(("A", 10L)) ++
      Seq.fill(8)(("B", 5L)) ++ Seq(("C", 0L), ("C", 100L)))
      .toDF("src", "v")
    val out = Sampling.neymanAllocation(docs, "src", "v", k = 10)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2)).toSeq ==
      Seq(("A", 4L), ("B", 8L), ("C", 2L)))
    val alloc = out.map(r => r._1 -> r._3).toMap
    assert(alloc.values.sum == 10L, alloc)          // seats always sum to k
    assert(alloc("B") == 0L)                        // constant stratum: none
    assert(alloc("C") > alloc("A") && alloc("A") >= 1L, alloc)
  }

  test("all-degenerate strata are rejected loudly") {
    val docs = Seq(("A", 1L), ("B", 2L)).toDF("src", "v")
    val e = intercept[IllegalArgumentException] {
      Sampling.neymanAllocation(docs, "src", "v", 5)
    }
    assert(e.getMessage.contains("degenerate"))
  }
}

class WeightedNoReplaceSpec extends SparkSpec {
  import spark.implicits._

  test("heavy weights dominate the sample; zero/NULL weights never selected") {
    val rows = (1L to 100L).map(i => (i, java.lang.Long.valueOf(1L))) ++
      (101L to 200L).map(i => (i, java.lang.Long.valueOf(10000L))) ++
      Seq((201L, java.lang.Long.valueOf(0L)), (202L, null.asInstanceOf[java.lang.Long]))
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedSampleWithoutReplacement(df, "id", "w", k = 100)
      .select("id").as[Long].collect().toSet
    assert(got.size == 100)
    assert(!got.contains(201L) && !got.contains(202L))
    // inclusion ~ weight: the 10000x rows should all but fill the sample
    assert(got.count(_ > 100L) >= 90, s"heavy rows selected: ${got.count(_ > 100L)}")
  }

  test("deterministic across runs and partitionings; k >= n returns all positive-weight rows") {
    val df = (1L to 50L).map(i => (i, i)).toDF("id", "w")
    val a = Sampling.weightedSampleWithoutReplacement(df, "id", "w", 10)
      .select("id").as[Long].collect().toSeq
    val b = Sampling.weightedSampleWithoutReplacement(df.repartition(7), "id", "w", 10)
      .select("id").as[Long].collect().toSeq
    assert(a.sorted == b.sorted)
    val all = Sampling.weightedSampleWithoutReplacement(df, "id", "w", 999)
    assert(all.count() == 50)
  }

  test("plan: top-k is TakeOrderedAndProject, not a global sort or window") {
    val df = (1L to 50L).map(i => (i, i)).toDF("id", "w")
    val plan = Sampling.weightedSampleWithoutReplacement(df, "id", "w", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Window"), plan)
  }
}

class GopherFilterSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.TextFunctions._

  test("each rule independently rejects its designed violation") {
    val good = (("the quick brown fox jumps over a lazy dog and " * 5).trim + " it is")
    val tooShort = "the and of it is a"
    val symbols = "the ### $$$ %%% @@@ ((( ))) !!! ??? *** " * 8 + "of it a is"
    val bullets = (1 to 20).map(i => s"- item $i the of a").mkString("\n")
    val noStops = "lorem ipsum dolor sit amet consectetur " * 10
    val df = Seq(good, tooShort, symbols, bullets, noStops).toDF("t")
    val keep = df.select(gopherKeep($"t", minWords = 30, maxWords = 500).as("k"))
      .as[Boolean].collect()
    assert(keep(0), "well-formed text must pass")
    assert(!keep(1), "short text must fail the word-count floor")
    assert(!keep(2), "symbol soup must fail the symbol ratio")
    assert(!keep(3), "bullet wall must fail the bullet-line ratio")
    assert(!keep(4), "stopword-free text must fail the stopword floor")
  }

  test("metric columns are exact on crafted input") {
    val df = Seq("ab cd ef").toDF("t")
    val (wlen, sym, stop) = df.select(meanWordLength($"t"), symbolRatio($"t"),
      stopwordHits($"t")).as[(Double, Double, Long)].collect().head
    assert(wlen == 2.0 && sym == 0.0 && stop == 0L)
    val bullets = Seq("- a\nplain\n* b").toDF("t")
    val br = bullets.select(bulletLineRatio($"t")).as[Double].collect().head
    assert(math.abs(br - 2.0 / 3.0) < 1e-15)
  }
}

class ShuffledOrderSpec extends SparkSpec {
  import spark.implicits._

  test("shuffled: stable permutation, not the input order") {
    val df = (1L to 1000L).toDF("id")
    val a = Sampling.shuffled(df, "id").as[Long].collect().toSeq
    val b = Sampling.shuffled(df, "id").as[Long].collect().toSeq
    assert(a == b, "order must be deterministic across runs")
    assert(a.sorted == (1L to 1000L), "must be a permutation")
    assert(a != (1L to 1000L).toSeq, "must not be the identity order")
  }
}

class ChunkDedupSpec extends SparkSpec {
  import spark.implicits._

  // 10 distinct tokens -> exactly one 10-token chunk
  private def words(prefix: String): String =
    (0 until 10).map(i => s"$prefix$i").mkString(" ")

  test("globally-first chunk occurrence wins; later docs lose the repeat") {
    val shared = words("boiler")
    val df = Seq(
      (1L, shared + " " + words("one")),  // owns the shared chunk
      (2L, words("two") + " " + shared),  // loses its second chunk
      (3L, shared)                        // fully duplicated -> drops out
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedupRebuild(df, "doc_id", "text", chunkTokens = 10)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_kept", $"rebuilt").as[(Long, Long, String)]
      .collect().toSeq
    assert(out == Seq(
      (1L, 2L, shared + " " + words("one")),
      (2L, 1L, words("two"))))
  }

  test("partial tail chunks participate like full chunks") {
    val df = Seq(
      (1L, words("a") + " tail"),   // chunk0 = words(a), chunk1 = "tail"
      (2L, "tail")                  // loses to doc 1's tail chunk
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedupRebuild(df, "doc_id", "text", chunkTokens = 10)
      .select($"doc_id", $"n_kept").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L))
  }

  test("no duplicates -> every doc rebuilt to its normalized self") {
    val df = Seq((1L, words("x")), (2L, words("y") + "  " + words("z")))
      .toDF("doc_id", "text")
    val out = Dedup.chunkDedupRebuild(df, "doc_id", "text", chunkTokens = 10)
      .select($"doc_id", $"rebuilt").as[(Long, String)].collect().toMap
    assert(out(1L) == words("x"))
    assert(out(2L) == words("y") + " " + words("z"), "whitespace normalized by tokenization")
  }
}

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def md5Of(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(
      s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  test("shared >= minMatch run cut from the later doc only, first kept intact") {
    // 9 shared tokens -> 2 overlapping 8-gram anchors in each occurrence;
    // doc 1 owns the keeper, doc 2 loses positions 2..10
    val shared = (0 until 9).map(i => s"s$i").mkString(" ")
    val df = Seq(
      (1L, shared + " alpha beta"),
      (2L, "x0 x1 " + shared + " omega")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(df, "doc_id", "text", minMatch = 8,
        hashedAnchors = false)
      .orderBy($"doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 11L, 0L, md5Of(shared + " alpha beta")),
      (2L, 3L, 9L, md5Of("x0 x1 omega"))))
  }

  test("degenerate all-same-token doc keeps only its first token") {
    val df = Seq((1L, Seq.fill(20)("x").mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(df, "doc_id", "text", minMatch = 8,
        hashedAnchors = false)
      .as[(Long, Long, Long, String)].head()
    assert(out == ((1L, 1L, 19L, md5Of("x"))))
  }

  test("docs shorter than minMatch and unique docs pass through untouched") {
    val df = Seq(
      (1L, "too short to anchor"),
      (2L, (0 until 30).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(df, "doc_id", "text", minMatch = 8,
        hashedAnchors = false)
      .select($"doc_id", $"n_removed").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L))
  }

  test("hashed anchors produce byte-identical output to exact-string anchors") {
    val rnd = new scala.util.Random(61)
    // 40 docs over a small vocab so natural repeated 8-gram runs exist,
    // plus planted full copies
    val docs = (0 until 40).map { i =>
      (i.toLong, (0 until 60).map(_ => s"w${rnd.nextInt(12)}").mkString(" "))
    }
    val planted = Seq((100L, docs(3)._2), (101L, "pre fix " + docs(5)._2))
    val df = (docs ++ planted).toDF("doc_id", "text")
    val exact = Dedup.removeDuplicateSpans(df, "doc_id", "text", minMatch = 8,
        hashedAnchors = false)
      .orderBy($"doc_id").as[(Long, Long, Long, String)].collect().toSeq
    val hashed = Dedup.removeDuplicateSpans(df, "doc_id", "text", minMatch = 8,
        hashedAnchors = true)
      .orderBy($"doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(exact == hashed)
    assert(exact.exists(_._3 > 0), "fixture must exercise real cuts")
  }
}
