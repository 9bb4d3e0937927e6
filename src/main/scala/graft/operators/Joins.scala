package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Join operators Spark lacks as built-ins.
  *
  * The reference delegates all joins to Spark (README.rst "Goals" bullet 2;
  * SURVEY §2.9); these cover the time-series shapes a training-data /
  * feature pipeline needs that the built-in equi/range machinery handles
  * badly at scale.
  */
object Joins {

  /** As-of join: for every left row, attach the single latest right row
    * with `right.timeCol <= left.timeCol` on the same key (pandas
    * `merge_asof` / DuckDB `ASOF JOIN` semantics, backward direction).
    *
    * Implementation is union–sort–carry, NOT an inequality join: both
    * sides are unioned (right payload packed into one struct), hash
    * -shuffled once on the key, sorted within each key by
    * (time, side, tiebreak), and the last non-null right struct is carried
    * forward with a running `last(ignoreNulls)` window. One shuffle per
    * side, no range cross-product, no broadcast requirement — at 100 TB
    * this is the only shape that survives (a Catalyst inequality join
    * degenerates to BroadcastNestedLoop). Heavily skewed keys can be
    * pre-salted by bucketing `timeCol` — the algorithm is unchanged.
    *
    * Time ties: a right row at exactly left.time IS visible (<=). Among
    * right rows sharing (key, time), the one with the greatest `tiebreak`
    * wins, making results deterministic (DuckDB ASOF leaves this
    * unspecified, so the oracle must impose the same tiebreak).
    *
    * Skew: the carry window partitions by key, so ONE hot key (one user
    * holding half the events) serializes through one task. Passing
    * `saltBucketWidth = Some(w)` extends the partition key with a time
    * bucket `floor(time / w)` (w in seconds for timestamp columns, value
    * units for numerics): each (key, bucket) sorts independently, and
    * visibility across bucket boundaries is restored by injecting, per
    * (key, left-bucket), the latest right row from any EARLIER bucket — a
    * bucket-granularity frame (≤ one row per key × bucket), so the extra
    * work scales with the number of buckets, not the number of rows.
    * Results are identical to the unsalted join (spec-asserted on a
    * planted hot key).
    *
    * @param rightCols right columns to attach (must not collide with left)
    * @param tiebreak  right column ordering ties on equal timestamps
    * @param how       "left" (unmatched left rows keep nulls) or "inner"
    * @param saltBucketWidth time-bucket width for skew pre-salting
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftTime: String, rightTime: String,
               leftBy: Seq[String], rightBy: Seq[String],
               rightCols: Seq[String],
               tiebreak: Option[String] = None,
               how: String = "left",
               saltBucketWidth: Option[Double] = None): DataFrame = {
    require(leftBy.length == rightBy.length && leftBy.nonEmpty,
      "asofJoin needs matching non-empty key column lists")
    require(Seq("left", "inner").contains(how), s"how must be left|inner, got $how")
    val collisions = rightCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"right columns collide with left: $collisions")

    val keyNames = leftBy.indices.map(i => s"__asof_k$i")
    val payloadCols = (rightCols :+ rightTime).distinct ++
      tiebreak.filterNot(rightCols.contains).filterNot(_ == rightTime)
    val payloadType = StructType(
      right.select(payloadCols.map(col): _*).schema.fields)

    val leftPrep = left.select(
      leftBy.zip(keyNames).map { case (c, k) => col(c).as(k) } ++ Seq(
        col(leftTime).as("__asof_t"),
        lit(1).as("__asof_side"),
        struct(left.columns.map(col): _*).as("__asof_l"),
        lit(null).cast(payloadType).as("__asof_r")): _*)
    val rightPrep = right.select(
      rightBy.zip(keyNames).map { case (c, k) => col(c).as(k) } ++ Seq(
        col(rightTime).cast(leftPrep.schema("__asof_t").dataType).as("__asof_t"),
        lit(0).as("__asof_side"),
        lit(null).cast(leftPrep.schema("__asof_l").dataType).as("__asof_l"),
        struct(payloadCols.map(col): _*).as("__asof_r")): _*)

    // sort: right rows first at equal time (they are visible to the left
    // row), greatest tiebreak last so `last()` picks it
    val order = Seq(col("__asof_t").asc, col("__asof_side").asc) ++
      tiebreak.map(tb => col(s"__asof_r.$tb").asc_nulls_first)

    val carried = saltBucketWidth match {
      case None =>
        val w = Window.partitionBy(keyNames.map(col): _*)
          .orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        leftPrep.unionByName(rightPrep)
          .withColumn("__asof_match",
            last(col("__asof_r"), ignoreNulls = true).over(w))
          .filter(col("__asof_side") === 1)

      case Some(wd) =>
        require(wd > 0, "saltBucketWidth must be positive")
        def bucket(c: org.apache.spark.sql.Column) =
          floor(c.cast("double") / wd).cast("long")
        val l = leftPrep.withColumn("__asof_b", bucket(col("__asof_t")))
        val r = rightPrep.withColumn("__asof_b", bucket(col("__asof_t")))
        // one row per (key, bucket): the right row a NEXT bucket would
        // carry in — max (time, tiebreak), matching the main sort's winner
        val lastW = Window
          .partitionBy((keyNames :+ "__asof_b").map(col): _*)
          .orderBy(Seq(col("__asof_t").desc) ++
            tiebreak.map(tb => col(s"__asof_r.$tb").desc_nulls_last): _*)
        val bucketLast = r
          .withColumn("__rn", row_number().over(lastW))
          .filter(col("__rn") === 1)
          .select(keyNames.map(col) ++ Seq(col("__asof_b"),
            lit(1).as("__marker"),
            struct(col("__asof_t"), col("__asof_r")).as("__carry_src")): _*)
        val leftBuckets = l
          .select((keyNames :+ "__asof_b").map(col): _*).distinct()
          .withColumn("__marker", lit(0))
          .withColumn("__carry_src",
            lit(null).cast(bucketLast.schema("__carry_src").dataType))
        // bucket-granularity as-of: a left bucket sees the latest carry
        // source from STRICTLY earlier buckets (same-bucket sources sort
        // after marker 0, so in-bucket rights stay in the main frame only)
        val carryW = Window.partitionBy(keyNames.map(col): _*)
          .orderBy(col("__asof_b").asc, col("__marker").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val carryIn = bucketLast.unionByName(leftBuckets)
          .withColumn("__carry",
            last(col("__carry_src"), ignoreNulls = true).over(carryW))
          .filter(col("__marker") === 0 && col("__carry").isNotNull)
          .select(keyNames.map(col) ++ Seq(
            col("__carry.__asof_t").as("__asof_t"),
            lit(0).as("__asof_side"),
            lit(null).cast(leftPrep.schema("__asof_l").dataType).as("__asof_l"),
            col("__carry.__asof_r").as("__asof_r"),
            col("__asof_b")): _*)
        val w = Window.partitionBy((keyNames :+ "__asof_b").map(col): _*)
          .orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        l.unionByName(r).unionByName(carryIn)
          .withColumn("__asof_match",
            last(col("__asof_r"), ignoreNulls = true).over(w))
          .filter(col("__asof_side") === 1)
    }

    val filtered = how match {
      case "inner" => carried.filter(col("__asof_match").isNotNull)
      case _ => carried
    }
    filtered.select(
      left.columns.map(c => col(s"__asof_l.$c").as(c)) ++
        rightCols.map(c => col(s"__asof_match.$c").as(c)): _*)
  }

  /** NEAREST-direction as-of join (pandas `merge_asof
    * direction='nearest'`): each left row takes the right row with the
    * SMALLEST absolute time distance, either side of it — sensor
    * alignment, quote-to-trade matching, "closest snapshot" enrichment
    * — where [[asofJoin]]'s backward-only carry is the causal/leakage-
    * safe mode (training pipelines should keep using it; nearest looks
    * into the future by construction, stated plainly).
    *
    * Same union–sort–carry shape, two carries instead of one: in the
    * (time, side, tiebreak) order, the backward candidate is the last
    * right payload at-or-before (greatest tiebreak on equal times) and
    * the forward candidate the first strictly-after right payload
    * (smallest tiebreak) — each side's deterministic pick; distance
    * ties resolve BACKWARD. One shuffle per side, no inequality join,
    * no broadcast. Timestamp distances compare in exact micros (the
    * values are < 2⁵³, so the double compare is exact); numeric time
    * columns compare as doubles directly. */
  def asofJoinNearest(left: DataFrame, right: DataFrame,
                      leftTime: String, rightTime: String,
                      leftBy: Seq[String], rightBy: Seq[String],
                      rightCols: Seq[String],
                      tiebreak: Option[String] = None,
                      how: String = "left"): DataFrame = {
    require(leftBy.length == rightBy.length && leftBy.nonEmpty,
      "asofJoinNearest needs matching non-empty key column lists")
    require(Seq("left", "inner").contains(how),
      s"how must be left|inner, got $how")
    val collisions = rightCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"right columns collide with left: $collisions")
    val keyNames = leftBy.indices.map(i => s"__asof_k$i")
    val payloadCols = (rightCols :+ rightTime).distinct ++
      tiebreak.filterNot(rightCols.contains).filterNot(_ == rightTime)
    val payloadType = StructType(
      right.select(payloadCols.map(col): _*).schema.fields)
    val leftPrep = left.select(
      leftBy.zip(keyNames).map { case (c, k) => col(c).as(k) } ++ Seq(
        col(leftTime).as("__asof_t"),
        lit(1).as("__asof_side"),
        struct(left.columns.map(col): _*).as("__asof_l"),
        lit(null).cast(payloadType).as("__asof_r")): _*)
    val rightPrep = right.select(
      rightBy.zip(keyNames).map { case (c, k) => col(c).as(k) } ++ Seq(
        col(rightTime).cast(leftPrep.schema("__asof_t").dataType)
          .as("__asof_t"),
        lit(0).as("__asof_side"),
        lit(null).cast(leftPrep.schema("__asof_l").dataType).as("__asof_l"),
        struct(payloadCols.map(col): _*).as("__asof_r")): _*)
      // a right row with a NULL time can never be a nearest match:
      // unfiltered it sorts first (asc nulls-first), gets carried as the
      // backward candidate and its NULL distance poisons `fd < bd`
      .filter(col("__asof_t").isNotNull)
    val order = Seq(col("__asof_t").asc, col("__asof_side").asc) ++
      tiebreak.map(tb => col(s"__asof_r.$tb").asc_nulls_first)
    val wAll = Window.partitionBy(keyNames.map(col): _*).orderBy(order: _*)
    val isTs = leftPrep.schema("__asof_t").dataType
      .isInstanceOf[org.apache.spark.sql.types.TimestampType]
    def tn(c: org.apache.spark.sql.Column) =
      if (isTs) unix_micros(c.cast("timestamp")).cast("double")
      else c.cast("double")
    val both = leftPrep.unionByName(rightPrep)
      .withColumn("__asof_back", last(col("__asof_r"), ignoreNulls = true)
        .over(wAll.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("__asof_fwd", first(col("__asof_r"), ignoreNulls = true)
        .over(wAll.rowsBetween(1, Window.unboundedFollowing)))
      .filter(col("__asof_side") === 1)
    val bd = abs(tn(col(s"__asof_back.$rightTime")) - tn(col("__asof_t")))
    val fd = abs(tn(col(s"__asof_fwd.$rightTime")) - tn(col("__asof_t")))
    val matched = both.withColumn("__asof_match",
      // a left row with a NULL time has no defined distance — no match
      when(col("__asof_t").isNull, lit(null).cast(payloadType))
        .when(col("__asof_back").isNull, col("__asof_fwd"))
        .when(col("__asof_fwd").isNull, col("__asof_back"))
        .when(fd < bd, col("__asof_fwd"))
        .otherwise(col("__asof_back"))) // distance ties resolve backward
    val filtered = how match {
      case "inner" => matched.filter(col("__asof_match").isNotNull)
      case _ => matched
    }
    filtered.select(
      left.columns.map(c => col(s"__asof_l.$c").as(c)) ++
        rightCols.map(c => col(s"__asof_match.$c").as(c)): _*)
  }

  /** Salted equi-join for skewed keys: the big side gets a uniform salt in
    * [0, factor), the small side is replicated once per salt value, and the
    * join key becomes (keys, salt) — a hot key's rows now spread over
    * `factor` reduce partitions instead of serializing through one.
    *
    * Use when AQE's skew-join split can't apply (non-sort-merge joins,
    * pair-generation self-joins) and the small side is replicable. For the
    * supported join types the results are identical to the plain join:
    * every big row matches exactly the one replica carrying its salt.
    * Right/full outer are rejected — an unmatched small-side row would
    * surface once per salt replica, duplicating null-extended output.
    * Cost: small side × factor.
    */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKeys: Seq[String], smallKeys: Seq[String],
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
        "leftsemi", "semi", "left_anti", "leftanti", "anti").contains(
        joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports inner/left/left_semi/left_anti, not '$joinType': " +
        "replicating the small side duplicates unmatched right/full outer rows")
    require(bigKeys.length == smallKeys.length && bigKeys.nonEmpty,
      "saltedJoin needs matching non-empty key column lists")
    val b = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(factor)).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    val cond = bigKeys.zip(smallKeys)
      .map { case (x, y) => b(x) === s(y) }
      .foldLeft(b("__salt") === s("__salt"))(_ && _)
    b.join(s, cond, joinType).drop("__salt")
  }

  /** Band (range) join: pairs where `|left.valCol - right.valCol| <= band`
    * on the same key, WITHOUT an inequality join (Catalyst plans those as
    * BroadcastNestedLoop — quadratic and undistributable at scale).
    *
    * Both sides bucketize `valCol` into bins of `binWidth`; the left row
    * keeps its single bin, the right row replicates to every bin its
    * `[v-band, v+band]` window touches (≤ `2 + band/binWidth` bins), the
    * join is a plain equi-join on (keys, bin), and the exact predicate
    * filters after. Each qualifying pair meets in exactly one bin (the
    * left row's), so no dedup pass is needed. `binWidth` defaults to
    * `band`, giving ≤ 3 replicas — tune it when band ≫ typical spacing.
    */
  def bandJoin(left: DataFrame, right: DataFrame,
               leftVal: String, rightVal: String,
               leftBy: Seq[String], rightBy: Seq[String],
               band: Double,
               binWidth: Option[Double] = None): DataFrame = {
    require(band >= 0, "band must be non-negative")
    require(leftBy.length == rightBy.length,
      "bandJoin needs matching key column lists")
    val collisions = right.columns.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"column names collide across sides: $collisions")
    val w = binWidth.getOrElse(math.max(band, Double.MinPositiveValue))

    val l = left.withColumn("__band_bin",
      floor(col(leftVal).cast("double") / w).cast("long"))
    val r = right.withColumn("__band_bin", explode(sequence(
      floor((col(rightVal).cast("double") - band) / w).cast("long"),
      floor((col(rightVal).cast("double") + band) / w).cast("long"))))

    val keyCond = leftBy.zip(rightBy)
      .map { case (a, b) => l(a) === r(b) }
      .foldLeft(l("__band_bin") === r("__band_bin"))(_ && _)
    l.join(r, keyCond)
      .filter(abs(col(leftVal).cast("double") - col(rightVal).cast("double"))
        <= band)
      .drop("__band_bin")
  }

  /** Interval-overlap join: pair a left row with a right row when their
    * closed intervals intersect (`l.start <= r.end AND r.start <= l.end`)
    * and the optional equality keys match — sessions × maintenance
    * windows, ad exposures × visits, any two interval sets. Spark has no
    * native interval join; the naive plan is a BroadcastNestedLoopJoin
    * (or a cartesian) that compares every pair per key — O(n·m), dead at
    * scale. Here both sides bucketize into bins of `binWidth` (each row
    * replicates to every bin its interval touches, ≤ `len/binWidth + 2`
    * copies), the join is a plain equi-join on (keys, bin) — one hash
    * shuffle, AQE-skew-splittable — and the exact overlap predicate
    * filters after.
    *
    * Exactly-once without a dedup pass: a qualifying pair is emitted only
    * in the bin containing `max(l.start, r.start)`. Overlap means
    * `max(starts) <= min(ends)`, so that bin is covered by BOTH
    * intervals, and floor's monotonicity makes it `max` of the two start
    * bins — each pair meets the filter in exactly one bin, so no
    * `distinct` shuffle follows the join.
    *
    * Rows whose `end < start` (empty intervals) match nothing and are
    * dropped up front — also keeps `sequence()` from stepping backwards.
    * Bounds are compared as doubles: exact for epoch micros (< 2^53);
    * epoch NANOS would round — pre-divide such columns first.
    *
    * `binWidth` tunes the replication/selectivity trade: ~the typical
    * interval length gives ≤ 3 copies a side; too-wide bins degrade
    * toward per-key nested loops, too-narrow ones explode replicas. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          leftStart: String, leftEnd: String,
                          rightStart: String, rightEnd: String,
                          leftBy: Seq[String], rightBy: Seq[String],
                          binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(leftBy.length == rightBy.length,
      "intervalOverlapJoin needs matching key column lists")
    val collisions = right.columns.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"column names collide across sides: $collisions")
    def bin(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / binWidth).cast("long")
    val l = left.filter(col(leftEnd) >= col(leftStart))
      .withColumn("__iv_lbin", explode(sequence(
        bin(col(leftStart)), bin(col(leftEnd)))))
    val r = right.filter(col(rightEnd) >= col(rightStart))
      .withColumn("__iv_rbin", explode(sequence(
        bin(col(rightStart)), bin(col(rightEnd)))))
    val keyCond = leftBy.zip(rightBy)
      .map { case (a, b) => l(a) === r(b) }
      .foldLeft(l("__iv_lbin") === r("__iv_rbin"))(_ && _)
    l.join(r, keyCond)
      .filter(col(leftStart).cast("double") <= col(rightEnd).cast("double") &&
        col(rightStart).cast("double") <= col(leftEnd).cast("double"))
      .filter(col("__iv_lbin") ===
        greatest(bin(col(leftStart)), bin(col(rightStart))))
      .drop("__iv_lbin", "__iv_rbin")
  }

  /** Bloom-filter semi-join reduction: filter `fact` down to rows whose
    * `factKey` MIGHT appear in `dim`'s `dimKey` set, using a Bloom filter
    * built distributively over the dim keys and shipped to every fact
    * task as a plan constant. The shape that matters at 100 TB: when the
    * dim side is too big to broadcast as rows but its KEY SET fits a
    * bloom sketch (~1.2 bytes/key at 1% fpp — a billion keys ≈ 1.2 GB,
    * a hundred million ≈ 120 MB), the fact side sheds non-matching rows
    * in its scan stage, BEFORE the join shuffle, instead of shuffling
    * 100 TB to discard most of it at the join.
    *
    * EXACTNESS: a Bloom filter has no false negatives, so every matching
    * fact row survives; false positives (≤ fpp) are dropped by the real
    * join that follows. Prefilter + join ≡ plain join, always — the
    * sketch only changes WHERE rows die, never the result (spec-asserted
    * against the plain join on planted keys).
    *
    * Mechanics: dim keys are xxhash64'd and fed to the distributed
    * sketch builder (`stat.bloomFilter` — a treeAggregate, no
    * driver-side row collection); the probe is Spark's own codegen'd
    * `BloomFilterMightContain` over `xxhash64(factKey)`, so the filter
    * fuses into the fact scan's WholeStageCodegen span. Cost: one extra
    * pass over dim (plus a count when `expectedItems` is not given —
    * pass it to skip that job).
    */
  def bloomKeyPrefilter(fact: DataFrame, factKey: String,
                        dim: DataFrame, dimKey: String,
                        fpp: Double = 0.01,
                        expectedItems: Long = -1L): DataFrame = {
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val hashed = dim.select(xxhash64(col(dimKey)).as("__h"))
    val n = if (expectedItems > 0) expectedItems else hashed.count()
    // `stat.bloomFilter` treeAggregates from a null zero-value, so an
    // EMPTY dim yields a null-backed sketch (NPE on serialize) — and an
    // empty key set matches nothing anyway: prefilter against it ≡ plain
    // join with an empty dim ≡ zero rows. Short-circuit to the
    // statically-empty fact (Catalyst folds `lit(false)` to an empty
    // LocalRelation — no fact scan at all). The count-based path catches
    // this for free; when the caller passed expectedItems (skipping the
    // count), the null result from the aggregate is caught below.
    if (n == 0) return fact.filter(lit(false))
    val bf =
      try hashed.stat.bloomFilter("__h", n, fpp)
      catch { case _: NullPointerException => null }
    if (bf == null) return fact.filter(lit(false))
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    fact.filter(GraftColumnBridge.column(BloomFilterMightContain(
      Literal.create(bytes, org.apache.spark.sql.types.BinaryType),
      GraftColumnBridge.expression(xxhash64(col(factKey))))))
  }

  /** Domain-blocklist flags with registrable-suffix semantics — the URL
    * governance filter every crawl pipeline runs: an entry `example.com`
    * blocks `example.com` AND every subdomain (`a.b.example.com`), the
    * way robots/safety blocklists are written, which a plain equality
    * join on the host gets wrong.
    *
    * Each URL's host (lower-cased, `www.`-stripped —
    * [[graft.functions.UrlFunctions.urlDomain]]) explodes to its ≤ labels
    * dot-suffixes, which semi-join the BROADCAST blocklist (even a 10⁶-
    * entry list is megabytes); the suffix explode is a small constant
    * per row and the only shuffle is re-attaching the verdict by id.
    * Blocklist entries are matched lower-cased verbatim — callers wanting
    * IDN/punycode equivalence canonicalize both sides with
    * [[graft.functions.UrlFunctions.idnAscii]] first.
    *
    * Output: (id, domain, blocked). */
  def domainBlocklistFlags(df: DataFrame, idCol: String, urlCol: String,
                           blocklist: DataFrame,
                           domainCol: String): DataFrame = {
    val hosts = df.select(col(idCol),
      graft.functions.UrlFunctions.urlDomain(col(urlCol)).as("domain"))
    val suffixes = hosts.select(col(idCol),
      explode(expr(
        "transform(sequence(1, size(split(domain, '\\\\.'))), " +
          "i -> array_join(slice(split(domain, '\\\\.'), i, 1000), '.'))"))
        .as("__suffix"))
    val blocked = suffixes
      .join(broadcast(blocklist.select(lower(col(domainCol)).as("__suffix"))),
        Seq("__suffix"), "left_semi")
      .select(col(idCol)).distinct()
      .withColumn("blocked", lit(true))
    hosts.join(blocked, Seq(idCol), "left")
      .select(col(idCol), col("domain"),
        coalesce(col("blocked"), lit(false)).as("blocked"))
  }

  /** Blocked fuzzy self-match — record linkage's workhorse: find pairs of
    * rows whose `strCol` values are within `maxDist` edit distance,
    * WITHOUT the all-pairs cross product. Rows are first grouped by the
    * caller's `blockExpr` (a standard blocking key: a prefix, a phonetic
    * code, a length band — candidates must share it to be compared), the
    * block is equi-joined with itself, and only in-block pairs pay a
    * Levenshtein evaluation — with Spark's threshold variant, which
    * abandons a pair's DP early once `maxDist` is exceeded, so each
    * comparison is O(maxDist · len) not O(len²).
    *
    * Returns (id_a, id_b, dist long) with id_a < id_b, exact distances
    * (identical in every engine — Levenshtein is integer DP). NULL
    * strings/blocks excluded.
    *
    * Scale shape: one shuffle on the block key; cost is Σ |block|², so
    * block design is the contract — the operator is linear in the
    * biggest block's square, and a skewed blocking key should be
    * refined (longer prefix, added length band) rather than salted,
    * because correctness requires true-pair co-location. */
  def fuzzySelfPairs(df: DataFrame, idCol: String, strCol: String,
                     blockExpr: org.apache.spark.sql.Column,
                     maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val base = df
      .filter(col(strCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s"),
        blockExpr.as("__blk"))
      .filter(col("__blk").isNotNull)
    val a = base.select(col("__id").as("id_a"), col("__s").as("__sa"),
      col("__blk"))
    val b = base.select(col("__id").as("id_b"), col("__s").as("__sb"),
      col("__blk"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist",
        levenshtein(col("__sa"), col("__sb"), maxDist).cast("long"))
      .filter(col("dist") >= 0L && col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Edit-distance-1 self-join over a word set via DELETION
    * neighborhoods (the FastSS device — Bocek, Hunt & Stiller 2007,
    * "Fast similarity search in large dictionaries"): each word emits
    * itself plus its |w| one-character deletions as join keys; two
    * words at edit distance ≤ 1 ALWAYS share a key (identity for d=0,
    * the deleted form for an insert/delete, the common deletion at the
    * substituted position for a substitution), so a keyed equi-join +
    * one bounded `levenshtein(·,·,1)` verify per candidate replaces the
    * quadratic all-pairs scan — no blocking key needed, which is what
    * makes it THE spelling-variant miner for a corpus vocabulary
    * (typo mining, OCR-noise linking, tokenizer-vocab collapsing).
    *
    * Scale shape: |w|+1 index rows per word (linear in total
    * characters), one shuffle on the variant key. The quadratic hazard
    * is a variant bucket shared by many words (short words collapse
    * onto few strings), guarded twice by construction: `minLen` drops
    * words shorter than 4 by default, and buckets above `maxBucket`
    * variants are EXCLUDED (a pair losing its only shared bucket that
    * way would have to route ≥ |maxBucket| − 2 coincident words through
    * one deleted form — document the cap, don't assume the vocab).
    * False candidates from d=2 pairs sharing an unpositioned deletion
    * (e.g. "ab"/"ba" both deleting to "a") are removed by the verify.
    *
    * Returns one row per verified pair: `w_a < w_b` (lexicographic),
    * `dist` ∈ {0 impossible, 1} as long — distinct words, so always 1,
    * kept as a column for the audit trail. */
  def deletionEditPairs(words: DataFrame, wordCol: String,
                        minLen: Int = 4, maxBucket: Int = 1000): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val base = words
      .filter(col(wordCol).isNotNull && length(col(wordCol)) >= minLen)
      .select(col(wordCol).as("__w")).distinct()
    // the word itself + each single-character deletion as join keys;
    // array_union dedups within a word ("aab" deletes to "ab" twice),
    // so no candidate pair is emitted twice through one word's list
    val variants = base.select(col("__w"), explode(array_union(
      array(col("__w")),
      transform(sequence(lit(1), length(col("__w"))),
        i => concat(col("__w").substr(lit(1), i - lit(1)),
          col("__w").substr(i + lit(1), length(col("__w")))))))
      .as("__v"))
    val small = variants.join(
      variants.groupBy(col("__v")).agg(count(lit(1)).as("__n"))
        .filter(col("__n") <= maxBucket).select(col("__v")),
      Seq("__v"))
    small.select(col("__v"), col("__w").as("w_a"))
      .join(small.select(col("__v"), col("__w").as("w_b")), Seq("__v"))
      .filter(col("w_a") < col("w_b"))
      .select(col("w_a"), col("w_b")).distinct()
      .withColumn("dist",
        levenshtein(col("w_a"), col("w_b"), 1).cast("long"))
      .filter(col("dist") >= 0L && col("dist") <= 1L)
  }

  /** Blocking-scheme quality report — the numbers that decide whether a
    * blocking key is usable BEFORE paying for the pair comparisons: one
    * row (n_records, n_blocks, n_candidate_pairs = Σ c·(c−1)/2,
    * reduction_ratio = 1 − pairs/C(n,2) round(6), max_block). A low
    * reduction ratio or a monster block means the compare step will
    * blow up (the Σ|block|² cost contract on [[fuzzySelfPairs]]); this
    * is the audit that catches it from one word-count-shaped aggregate.
    * c·(c−1) is always even, so the pair count is exact integer. */
  def blockingStats(df: DataFrame, idCol: String,
                    blockExpr: org.apache.spark.sql.Column): DataFrame = {
    val blocks = df.filter(col(idCol).isNotNull)
      .select(blockExpr.as("__b")).filter(col("__b").isNotNull)
      .groupBy(col("__b")).agg(count(lit(1)).as("__c"))
    blocks.agg(
        sum(col("__c")).as("n_records"),
        count(lit(1)).as("n_blocks"),
        sum(call_function("div", col("__c") * (col("__c") - 1L), lit(2L)))
          .as("n_candidate_pairs"),
        max(col("__c")).as("max_block"))
      .select(col("n_records"), col("n_blocks"), col("n_candidate_pairs"),
        (round(when(col("n_records") >= 2L,
          lit(1.0) - col("n_candidate_pairs").cast("double") /
            (col("n_records") * (col("n_records") - 1L))
              .cast("double") * 2.0)
          .otherwise(lit(1.0)), 6) + lit(0.0)).as("reduction_ratio"),
        col("max_block"))
  }

  /** Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD 1995):
    * rank every record by a sort key and compare only records within
    * `window` ranks — the O(n·w) alternative when no natural equality
    * block exists (typo'd keys still sort adjacently). Ranks come from
    * the distributed [[Ranking.globalRowNumber]] (range-sort +
    * zipWithIndex — no single-partition window), and the candidate
    * frame is `window−1` keyed equi-joins on (rank + δ), so the plan
    * scales like the input, not like C(n,2). Returns (id_a, id_b,
    * delta long) with id_a the lower-ranked record of the pair. */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String,
                              sortExpr: org.apache.spark.sql.Column,
                              window: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val ranked = Ranking.globalRowNumber(
      df.filter(col(idCol).isNotNull)
        .select(col(idCol).as("__id"), sortExpr.as("__s"))
        .filter(col("__s").isNotNull),
      Seq(col("__s"), col("__id")), "__r")
    val left = ranked.select(col("__id").as("id_a"), col("__r"))
    val right = ranked.select(col("__id").as("id_b"), col("__r").as("__r2"))
    (1 until window).map { d =>
      left.join(right, col("__r2") === col("__r") + d)
        .select(col("id_a"), col("id_b"), lit(d.toLong).as("delta"))
    }.reduce(_ unionByName _)
  }

  /** Join-skew pre-check: the hot-key histogram that predicts a shuffle
    * join's straggler BEFORE running it. Takes the top-k most frequent
    * keys of each side (count desc, key — deterministic), unions the
    * key sets, and reports per key (n_left, n_right, out_rows =
    * n_left·n_right — that key's share of the join output, the number
    * that lands on ONE reducer in a plain shuffle join). A key whose
    * out_rows dwarfs the rest is the cue for salting or an AQE skew
    * split. Two word-count aggregates + two TakeOrdered top-ks; the
    * report is ≤ 2k rows. */
  def joinSkewAudit(left: DataFrame, leftKey: String, right: DataFrame,
                    rightKey: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val lc = left.filter(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("key")).agg(count(lit(1)).as("n_left"))
    val rc = right.filter(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("key")).agg(count(lit(1)).as("n_right"))
    val hot = lc.orderBy(col("n_left").desc, col("key")).limit(topK)
      .select(col("key"))
      .unionByName(rc.orderBy(col("n_right").desc, col("key")).limit(topK)
        .select(col("key")))
      .distinct()
    hot.join(lc, Seq("key"), "left").join(rc, Seq("key"), "left")
      .select(col("key"),
        coalesce(col("n_left"), lit(0L)).as("n_left"),
        coalesce(col("n_right"), lit(0L)).as("n_right"))
      .withColumn("out_rows", col("n_left") * col("n_right"))
      .orderBy(col("out_rows").desc, col("key"))
  }

  /** Fellegi–Sunter probabilistic record linkage (JASA 1969) over a
    * blocked candidate-pair frame: each field contributes
    * log2(m/u) on agreement and log2((1−m)/(1−u)) on disagreement
    * (m = P(agree | match), u = P(agree | non-match)), the pair's score
    * is the sum, and the decision is the classic three-way
    * link / possible / non-link cut.
    *
    * Cross-engine exactness: the two weights per field are computed
    * ONCE driver-side, rounded to 6 dp, and injected as DECIMAL(18,6)
    * literals — the per-pair score is a sum of exact decimals (order-
    * free), cast to double at the end. A NULL in either field value
    * scores as disagreement (the conservative choice).
    *
    * `fields` = (name, agreement predicate, m, u) — the predicate is any
    * Column (equality, a band like |a−b| < 100, a phonetic match), so
    * the model composes with the blocking/fuzzy machinery above.
    * Map-only over the pair frame; nothing shuffles. */
  def fellegiSunterScore(pairs: DataFrame, idA: String, idB: String,
                         fields: Seq[(String, org.apache.spark.sql.Column,
                           Double, Double)],
                         upper: Double = 2.0,
                         lower: Double = 0.0): DataFrame = {
    val score = fsScoreColumn(fields)
    pairs
      .select(col(idA), col(idB), score.cast("double").as("score"))
      .withColumn("verdict",
        when(col("score") >= upper, lit("link"))
          .when(col("score") >= lower, lit("possible"))
          .otherwise(lit("non_link")))
      .orderBy(col(idA), col(idB))
  }

  /** The Fellegi–Sunter pair score as a Column: per field, log2(m/u) on
    * agreement and log2((1−m)/(1−u)) on disagreement, weights computed
    * once driver-side, rounded to 6 dp, and injected as DECIMAL(18,6)
    * literals so the sum is exact and order-free in any engine. Shared
    * by [[fellegiSunterScore]] and [[linkAgainstReference]]. */
  private[graft] def fsScoreColumn(
      fields: Seq[(String, org.apache.spark.sql.Column, Double, Double)])
      : org.apache.spark.sql.Column = {
    require(fields.nonEmpty, "Fellegi-Sunter needs at least one field")
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    fields.map { case (name, agree, m, u) =>
      require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
        s"field $name needs 0 < u < m < 1, got m=$m u=$u")
      val wa = r6(math.log(m / u) / math.log(2.0))
      val wd = r6(math.log((1 - m) / (1 - u)) / math.log(2.0))
      when(agree, lit(wa.bigDecimal)).otherwise(lit(wd.bigDecimal))
    }.reduce(_ + _)
  }

  /** One micro-batch (or one daily increment) of ENTITY RESOLUTION
    * against a growing reference: every batch record is blocked against
    * the reference on `blockCol` equality, Fellegi–Sunter-scored against
    * its candidates, and resolved to its BEST match — the incremental
    * linkage step a master-data / identity pipeline runs on ingest.
    *
    * Candidates for batch record `a` are (1) every reference row sharing
    * `a`'s block, and (2) every EARLIER batch row (id < a's id) sharing
    * the block — without (2), two copies of a brand-new entity arriving
    * in one batch would both be declared `new` and both enter the
    * reference permanently (the same in-batch wrinkle
    * [[graft.streaming.StreamRunner.runIncrementalNearDedup]] handles).
    * Ids must therefore be globally unique across batch and reference —
    * spec-enforced by a require on the caller's contract, not scanned.
    *
    * Decision per batch record: max score, ties to the smallest
    * matched id (a total order — the walk is deterministic and
    * SQL-replayable); the [[fellegiSunterScore]] three-way cut on that
    * best score, plus `new` when the block has no candidate at all.
    * Returns one row per batch record: (idCol, matched_id long nullable,
    * score double nullable, verdict link|possible|non_link|new).
    *
    * Scale shape: one equi-join on the block key (reference side read
    * from its BUCKETED table — no Exchange on ten years of entities)
    * plus one window partitioned by batch id; per-batch cost is
    * O(batch · block-fan-out), independent of reference size. Blocking
    * quality is the caller's lever and [[blockingStats]] audits it. */
  def linkAgainstReference(batch: DataFrame, ref: DataFrame, idCol: String,
                           blockCol: String, attrCols: Seq[String],
                           fields: Seq[(String, org.apache.spark.sql.Column,
                             Double, Double)],
                           upper: Double = 2.0,
                           lower: Double = 0.0): DataFrame = {
    require(attrCols.nonEmpty, "linkAgainstReference needs attribute columns")
    val score = fsScoreColumn(fields)
    def side(df: DataFrame, idAs: String, suffix: String) = df.select(
      col(idCol).cast("long").as(idAs) +: col(blockCol).as("__blk") +:
        attrCols.map(a => col(a).as(s"${a}$suffix")): _*)
    val a = side(batch, "__ida", "_a")
    val cands = side(ref, "matched_id", "_b")
        .withColumn("__from_batch", lit(false))
      .unionByName(side(batch, "matched_id", "_b")
        .withColumn("__from_batch", lit(true)))
    val scored = a.join(cands, Seq("__blk"))
      .filter(!col("__from_batch") || col("matched_id") < col("__ida"))
      // a replayed reference append stores byte-identical duplicate rows
      // (exactly-once reads over at-least-once storage); collapse them
      // so the rank-1 window below cannot see the same candidate twice
      .select(col("__ida"), col("matched_id"),
        score.cast("double").as("score"))
      .distinct()
    val w = Window.partitionBy(col("__ida"))
      .orderBy(col("score").desc, col("matched_id").asc)
    val best = scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__ida"), col("matched_id"), col("score"))
    batch.select(col(idCol).cast("long").as("__ida")).distinct()
      .join(best, Seq("__ida"), "left")
      .select(col("__ida").as(idCol), col("matched_id"), col("score"),
        when(col("score").isNull, lit("new"))
          .when(col("score") >= upper, lit("link"))
          .when(col("score") >= lower, lit("possible"))
          .otherwise(lit("non_link")).as("verdict"))
      .orderBy(col(idCol))
  }

  /** Persist the linkage reference as a bucketed table keyed on the
    * block column: the per-batch candidate join then has NO Exchange on
    * the reference side at any history size — the same index contract as
    * the dedup fingerprint tables. */
  def buildLinkageRefTable(ref: DataFrame, idCol: String, blockCol: String,
                           attrCols: Seq[String], table: String,
                           buckets: Int = 32): Unit =
    Bucketing.writeBucketed(
      ref.select(col(idCol).cast("long").as(idCol) +: col(blockCol) +:
        attrCols.map(col): _*),
      table, buckets, Seq(blockCol))

  /** Append newly-resolved entities (a batch's non-`link` records) to
    * the bucketed reference. Replays append byte-identical duplicates,
    * which [[linkAgainstReference]]'s candidate `distinct()` collapses —
    * the fingerprint-index idempotency contract. */
  def appendToLinkageRefTable(newRows: DataFrame, idCol: String,
                              blockCol: String, attrCols: Seq[String],
                              table: String, buckets: Int = 32): Unit =
    Bucketing.writeBucketed(
      newRows.select(col(idCol).cast("long").as(idCol) +: col(blockCol) +:
        attrCols.map(col): _*),
      table, buckets, Seq(blockCol),
      org.apache.spark.sql.SaveMode.Append)

  /** Unsupervised EM estimation of the Fellegi–Sunter parameters (m_f,
    * u_f, p) from an UNLABELED candidate-pair frame — the Winkler 1988
    * procedure that [[fellegiSunterScore]]'s caller-supplied weights
    * normally come from when no labeled pairs exist.
    *
    * Scale shape: the pair frame collapses to its DISTINCT AGREEMENT
    * PATTERN table (≤ 2^F rows for F fields — a provably bounded
    * sidecar) in ONE map-combinable aggregate; the EM loop then runs
    * driver-side over that table, so a trillion-pair frame costs one
    * word-count-shaped pass regardless of `iterations`.
    *
    * Cross-engine exactness (every step SQL-replayable): all per-pattern
    * arithmetic is IEEE-754 double ops in a FIXED left-to-right order
    * (E-step weight w = p·Π t_f / (p·Π t_f + (1−p)·Π s_f), t/s chosen
    * by the γ bit), each weight and each M-step ratio is rounded
    * HALF_UP to 6 dp (the repo's proven cross-engine quantum), and the
    * M-step sums run over the 6-dp weights × integer counts in exact
    * decimals — order-free, so neither engine's
    * aggregation order matters. Estimates clamp to
    * [1e-6, 0.999999] after each round (EM can push m→1 / u→0 on
    * degenerate patterns; an unclamped log-weight would be ±∞).
    *
    * NULL agreement evaluates as disagreement, matching the scorer.
    * Returns one row per field, input order: (field, m, u, p — the
    * match proportion repeated per row for a flat schema). */
  def fellegiSunterEm(pairs: DataFrame,
                      fields: Seq[(String, org.apache.spark.sql.Column)],
                      p0: Double = 0.1, m0: Double = 0.9, u0: Double = 0.1,
                      iterations: Int = 2): DataFrame = {
    require(fields.nonEmpty && fields.size <= 16,
      s"need 1..16 fields, got ${fields.size}")
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    val spark = pairs.sparkSession
    val f = fields.size
    val gCols = fields.map { case (n, pred) =>
      when(coalesce(pred, lit(false)), 1).otherwise(0).as(s"__g_$n") }
    val pat = pairs.select(gCols: _*)
      .groupBy(fields.map(fd => col(s"__g_${fd._1}")): _*)
      .agg(count(lit(1)).as("__cnt"))
      .collect()
    val patterns = pat.map(r =>
      (Array.tabulate(f)(i => r.getInt(i)), r.getLong(f)))
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def clamp(x: Double): Double = math.max(1e-6, math.min(0.999999, x))
    var p = p0
    val m = Array.fill(f)(m0)
    val u = Array.fill(f)(u0)
    var iter = 0
    while (iter < iterations) {
      var bigW = BigDecimal(0)
      var n = 0L
      val wf = Array.fill(f)(BigDecimal(0))
      val cf = Array.fill(f)(0L)
      patterns.foreach { case (g, cnt) =>
        var num = p
        var alt = 1.0 - p
        var i = 0
        while (i < f) {
          num *= (if (g(i) == 1) m(i) else 1.0 - m(i))
          alt *= (if (g(i) == 1) u(i) else 1.0 - u(i))
          i += 1
        }
        val w = r6(num / (num + alt))
        bigW += w * cnt
        n += cnt
        i = 0
        while (i < f) {
          if (g(i) == 1) { wf(i) += w * cnt; cf(i) += cnt }
          i += 1
        }
      }
      p = clamp(r6(bigW.toDouble / n.toDouble).toDouble)
      val bigV = BigDecimal(n) - bigW
      var i = 0
      while (i < f) {
        m(i) = clamp(r6(wf(i).toDouble / bigW.toDouble).toDouble)
        u(i) = clamp(r6((BigDecimal(cf(i)) - wf(i)).toDouble /
          bigV.toDouble).toDouble)
        i += 1
      }
      iter += 1
    }
    import spark.implicits._
    fields.zipWithIndex
      .map { case ((name, _), i) => (name, m(i), u(i), p) }
      .toDF("field", "m", "u", "p")
  }
}
