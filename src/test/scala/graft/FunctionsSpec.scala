package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ext.Similarity
import graft.functions.GraftFunctions

/** Native CosineSimilarity expression: bit-parity with the HOF spec
  * form, null semantics, SQL registration, and codegen coverage. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def randVecs(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong,
      Array.fill(dim)(rnd.nextFloat() * 2 - 1))).toDF("id", "v")
  }

  test("native cosine is bit-identical to the HOF form") {
    val df = randVecs(200, 64, seed = 7)
    val a = df.select($"id", $"v")
    val b = randVecs(200, 64, seed = 8).select($"id", $"v".as("w"))
    val joined = a.join(b, "id")
    val diffs = joined.select(
      Similarity.cosine($"v", $"w").as("native"),
      Similarity.cosineHof($"v", $"w").as("hof"))
      .filter($"native" =!= $"hof") // exact double comparison
      .count()
    assert(diffs === 0L)
  }

  test("native cosine handles zero vectors and nulls") {
    val df = Seq(
      (Array(0f, 0f), Array(1f, 1f)),
      (null, Array(1f, 1f))
    ).toDF("a", "b")
    val out = df.select(Similarity.cosine($"a", $"b")).collect()
    assert(out(0).getDouble(0) === 0.0)
    assert(out(1).isNullAt(0))
  }

  test("native cosine yields NULL on length mismatch") {
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
    assert(df.select(Similarity.cosine($"a", $"b")).head().isNullAt(0))
  }

  test("graft_cosine is callable from SQL after register()") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_cosine(
           CAST(array(1.0, 0.0) AS array<float>),
           CAST(array(1.0, 0.0) AS array<float>)) AS c""").head().getDouble(0)
    assert(r === 1.0)
  }

  test("every native kernel is callable from SQL after register()") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
           graft_minhash(array('ab', 'bc'), 4) AS mh,
           graft_simhash(array('ab', 'bc')) AS sh,
           graft_jaccard(array('a', 'b'), array('b', 'c')) AS j,
           graft_winnow('abcdefgh', 4, 2) AS w,
           graft_cdc_chunks(encode('hello world', 'UTF-8'), 2, 3, 8) AS c,
           graft_bpe_count('the theme', array('t h', 'th e')) AS bpe,
           graft_bpe_tokenize('the theme', array('t h', 'th e')) AS bpt,
           graft_sign_sketch_wide(
             CAST(array(1.0, -1.0) AS array<float>), 128) AS ssw,
           graft_hamming_words(array(CAST(3 AS BIGINT), CAST(0 AS BIGINT)),
             array(CAST(0 AS BIGINT), CAST(1 AS BIGINT))) AS hw,
           graft_jaro_winkler('MARTHA', 'MARHTA') AS jw""")
      .head()
    assert(r.getSeq[Long](0).length === 4)
    assert(r.getLong(1) !== 0L)
    assert(r.getDouble(2) === 1.0 / 3.0)
    assert(r.getSeq[Long](3).nonEmpty)
    // chunks tile the 11-byte blob
    val chunks = r.getSeq[Row](4)
    assert(chunks.map(_.getInt(1)).sum === 11)
    // 'the' -> [the]; 'theme' -> [the, m, e]
    assert(r.getLong(5) === 4L)
    assert(r.getSeq[String](6) === Seq("▁the", "▁the", "m", "e"))
    assert(r.getSeq[Long](7) === Seq(1L, 0L)) // 2 words at dim 128
    assert(r.getInt(8) === 3)                 // popcount(3^0) + popcount(0^1)
    assert(r.getDouble(9) === 0.9611111111111111) // DuckDB-pinned value
    // structural args must be literals
    intercept[Exception](spark.sql(
      "SELECT graft_minhash(array('a'), CAST(rand() * 4 AS INT))").collect())
    intercept[Exception](spark.sql(
      "SELECT graft_bpe_count('x', array(CAST(rand() AS STRING)))").collect())
  }

  test("normalizeText: forms behave per the Unicode spec; stripAccents drops marks only") {
    import graft.ext.TextOps
    val composed = "héllo"                 // é as one codepoint
    val decomposed = "héllo"              // e + combining acute
    val ligature = "ﬁle"                   // ﬁle
    val df = Seq(
      (1L, composed), (2L, decomposed), (3L, ligature),
      (4L, "plain ascii"), (5L, null: String),
      (6L, "ø ß über")           // ø ß über
    ).toDF("id", "text")
    val out = df.select($"id",
      TextOps.normalizeText($"text").as("nfc"),
      TextOps.normalizeText($"text", "NFKC").as("nfkc"),
      TextOps.stripAccents($"text").as("sa"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // NFC: decomposed composes; composed unchanged; both now EQUAL
    assert(out(1L).getString(1) === composed)
    assert(out(2L).getString(1) === composed)
    // NFKC additionally folds compatibility chars (the ligature)
    assert(out(3L).getString(1) === ligature)   // NFC keeps ﬁ
    assert(out(3L).getString(2) === "file")     // NFKC folds it
    // stripAccents: marks drop, base letters stay; ø/ß not decomposable
    assert(out(1L).getString(3) === "hello")
    assert(out(2L).getString(3) === "hello")
    assert(out(6L).getString(3) === "ø ß uber")
    assert(out(4L).getString(3) === "plain ascii")
    assert(out(5L).get(1) === null && out(5L).get(3) === null)
    // dedup composition: the two spellings fingerprint identically
    // AFTER normalization, differently before — the reason this op exists
    val fps = df.filter($"id" <= 2L)
      .select(md5(TextOps.normalizeText($"text")).as("fp"))
      .distinct().count()
    assert(fps === 1L)
    assert(df.filter($"id" <= 2L).select(md5($"text"))
      .distinct().count() === 2L)
    // SQL surface
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      s"SELECT graft_normalize('héllo', 'NFC') AS n, " +
        s"graft_strip_accents('héllo') AS s").head()
    assert(viaSql.getString(0) === composed)
    assert(viaSql.getString(1) === "hello")
    intercept[Exception](spark.sql(
      "SELECT graft_normalize('x', concat('NF', 'C'))").collect())
  }

  test("bloom agg + might_contain are callable from SQL after register()") {
    GraftFunctions.register(spark)
    // membership via a scalar subquery — the form BloomFilterMightContain
    // is built for; 7 is in range(50), 999 is not (no false positive at
    // this sizing)
    val r = spark.sql(
      """SELECT
           graft_might_contain(
             (SELECT graft_bloom_agg(xxhash64(CAST(id AS STRING)), 50L, 4000L)
              FROM range(50)),
             xxhash64(CAST(7 AS STRING))) AS hit,
           graft_might_contain(
             (SELECT graft_bloom_agg(xxhash64(CAST(id AS STRING)), 50L, 4000L)
              FROM range(50)),
             xxhash64(CAST(999 AS STRING))) AS miss""").head()
    assert(r.getBoolean(0) === true)
    assert(r.getBoolean(1) === false)
  }

  /** Run `body` with an appender on the log4j2 root logger and return
    * (result, ERROR-level messages logged by the janino CodeGenerator) —
    * a failed whole-stage compile is not an exception, just an ERROR log
    * plus silent interpreted fallback, so tests that pin "no codegen
    * regression" must watch the log. */
  private def captureCodegenErrors[A](body: => A): (A, Seq[String]) = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    val appender = new AbstractAppender(
        "graft-codegen-capture", null, null, false, Property.EMPTY_ARRAY) {
      override def append(event: LogEvent): Unit =
        if (event.getLevel.isMoreSpecificThan(Level.ERROR) &&
            event.getLoggerName.contains("CodeGenerator"))
          errors.synchronized {
            errors += event.getMessage.getFormattedMessage
          }
    }
    appender.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val root = ctx.getConfiguration.getRootLogger
    root.addAppender(appender, Level.ERROR, null)
    ctx.updateLoggers()
    try { (body, errors.toSeq) }
    finally {
      root.removeAppender("graft-codegen-capture")
      ctx.updateLoggers()
      appender.stop()
    }
  }

  test("graft_might_contain's subquery form emits zero codegen errors") {
    // Spark's BloomFilterMightContain handed a user-written scalar
    // subquery compiles to invalid Java (janino: "java.lang.Long is not
    // an rvalue") and silently falls back interpreted with two ERROR
    // CodeGenerator lines per query; the registered builder must route
    // that shape to the deliberate CodegenFallback probe instead
    GraftFunctions.register(spark)
    val (rows, errors) = captureCodegenErrors {
      spark.sql(
        """SELECT id, graft_might_contain(
             (SELECT graft_bloom_agg(xxhash64(CAST(id AS STRING)), 50L, 4000L)
              FROM range(50)),
             xxhash64(CAST(id AS STRING))) AS hit
           FROM range(60)""").collect()
    }
    assert(errors.isEmpty,
      s"whole-stage codegen ERRORs:\n${errors.mkString("\n")}")
    // every built id probes true; false positives above 50 are possible
    // but bounded, and 999-style clean misses are pinned in the test above
    assert(rows.filter(_.getLong(0) < 50).forall(_.getBoolean(1)))
  }

  test("bloomFilterAgg refuses sizings over the session bloom caps") {
    // default caps: 4M items / 64M bits. 10^9 items needs ~7.3G bits —
    // BloomFilterAggregate would silently clamp to 8 MiB and saturate;
    // the builder must refuse instead. The builder reads the caps via
    // SQLConf.get (session conf when active, compiled defaults when
    // not), so both branches below hold with or without a session; the
    // cap-raise branch still needs `spark` initialized first so the
    // conf.set lands on the conf SQLConf.get resolves to.
    spark.sparkContext // force the shared lazy session before anything else
    val e = intercept[IllegalArgumentException](
      GraftFunctions.bloomFilterAgg(xxhash64(lit("x")), 1000000000L, 0.03))
    assert(e.getMessage.contains("maxNumBits"))
    // raising the caps makes the same sizing legal
    val items = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bits = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val (i0, b0) = (spark.conf.get(items), spark.conf.get(bits))
    try {
      spark.conf.set(items, 1000000000L)
      spark.conf.set(bits, 8000000000L)
      GraftFunctions.bloomFilterAgg(xxhash64(lit("x")), 1000000000L, 0.03)
    } finally {
      spark.conf.set(items, i0); spark.conf.set(bits, b0)
    }
  }

  test("jaroWinkler matches DuckDB's builtin on pinned vectors") {
    // expected values are DuckDB jaro_winkler_similarity outputs,
    // captured verbatim — the oracle-exactness contract
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
      ("apple", "aple", 0.9466666666666665),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0),
      ("a", "", 0.0),
      ("", "", 0.0), // DuckDB's both-empty edge: 0, not 1
      ("Customer#000000001", "Customer#000000010", 0.9888888888888889),
      ("DwAyNE", "DuANE", 0.8400000000000001),
      ("kitten", "sitting", 0.746031746031746),
      ("ab", "ba", 0.0),                    // window 0: no cross matches
      ("abcdef", "fedcba", 0.38888888888888884), // below boost threshold
      ("aabbcc", "ccbbaa", 0.5555555555555555),  // transposition-heavy
      ("xy", "zq", 0.0))                    // zero matches
    val df = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(GraftFunctions.jaroWinkler($"a", $"b"))
    assert(df.as[Double].collect().toSeq === cases.map(_._3))
    // NULL in, NULL out
    val n = Seq((Some("a"), Option.empty[String])).toDF("a", "b")
      .select(GraftFunctions.jaroWinkler($"a", $"b"))
    assert(n.collect().head.isNullAt(0))
  }

  test("jaroWinkler interpreted eval equals codegen on random pairs") {
    val rnd = new scala.util.Random(11)
    val al = "abcab "
    val pairs = Seq.fill(500)((
      Seq.fill(rnd.nextInt(9))(al(rnd.nextInt(al.length))).mkString,
      Seq.fill(rnd.nextInt(9))(al(rnd.nextInt(al.length))).mkString))
    val viaCodegen = pairs.toDF("a", "b")
      .select(GraftFunctions.jaroWinkler($"a", $"b")).as[Double].collect()
    val viaEval = pairs.map { case (a, b) =>
      graft.functions.JaroWinkler.score(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
    }
    assert(viaCodegen.toSeq === viaEval)
  }

  test("graft_kll_* SQL surface: agg + fold + quantile round-trip") {
    import spark.implicits._
    GraftFunctions.register(spark)
    (1 to 47).map(i => ("g", i.toDouble)).toDF("k", "v")
      .createOrReplaceTempView("kll_in")
    // agg -> quantile in SQL matches the Column API's exact-regime pin
    val direct = spark.sql(
      """SELECT graft_kll_quantile(graft_kll_agg(v, 200), 0.5d) AS p50
         FROM kll_in""").as[Double].head()
    assert(direct === 24.0)
    // two partial sketches fold to the same answer via graft_kll_merge
    val folded = spark.sql(
      """SELECT graft_kll_quantile(graft_kll_merge(sk, 200), 0.5d) AS p50
         FROM (SELECT graft_kll_agg(v, 200) AS sk FROM kll_in GROUP BY v > 20)
      """).as[Double].head()
    assert(folded === 24.0)
    // structural k must be a literal
    intercept[Exception](spark.sql(
      "SELECT graft_kll_agg(v, CAST(v AS INT)) FROM kll_in").collect())
  }

  test("graft_cms_* SQL surface: agg + fold + point estimate round-trip") {
    import spark.implicits._
    GraftFunctions.register(spark)
    (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(1)("c"))
      .map(v => ("g", v)).toDF("k", "v")
      .createOrReplaceTempView("cms_in")
    // agg -> estimate in SQL matches the exact-regime pin
    val direct = spark.sql(
      """SELECT graft_cms_estimate(graft_cms_agg(v, 5, 4096, 1), 'a') AS e
         FROM cms_in""").as[Long].head()
    assert(direct === 5L)
    // partial sketches fold to the same answer via graft_cms_merge
    val folded = spark.sql(
      """SELECT graft_cms_estimate(graft_cms_merge(sk, 5, 4096, 1), 'a') AS e
         FROM (SELECT graft_cms_agg(v, 5, 4096, 1) AS sk FROM cms_in
               GROUP BY v = 'a')""").as[Long].head()
    assert(folded === 5L)
    // absent key reads 0 in the collision-free regime
    assert(spark.sql(
      """SELECT graft_cms_estimate(graft_cms_agg(v, 5, 4096, 1), 'zz') AS e
         FROM cms_in""").as[Long].head() === 0L)
    // structural shape must be literal
    intercept[Exception](spark.sql(
      "SELECT graft_cms_agg(v, CAST(length(v) AS INT), 16, 1) FROM cms_in")
      .collect())
  }

  test("round-12 SQL surface: theta, linear score, media meta, deflate size") {
    import spark.implicits._
    GraftFunctions.register(spark)
    (1L to 50L).map(i => ("g", i, s"w$i w${i % 10}")).toDF("k", "v", "t")
      .createOrReplaceTempView("r12_in")
    // theta: distinct over two halves, unioned state == direct estimate
    val theta = spark.sql(
      """SELECT graft_theta_estimate(graft_theta_union(sk, 4096)) AS est
         FROM (SELECT graft_theta_agg(v, 4096) AS sk FROM r12_in
               GROUP BY v % 2)""").as[Long].head()
    assert(theta === 50L)
    // intersect/diff of pre-capacity sketches are exact set arithmetic
    val setops = spark.sql(
      """SELECT graft_theta_intersect(a.sk, b.sk) AS common,
                graft_theta_diff(a.sk, b.sk) AS only_a
         FROM (SELECT graft_theta_agg(v, 4096) AS sk FROM r12_in
               WHERE v <= 30) a,
              (SELECT graft_theta_agg(v, 4096) AS sk FROM r12_in
               WHERE v >= 21) b""").as[(Long, Long)].head()
    assert(setops === ((10L, 20L)))
    // linear score via the 'gram weight' array form (gram may hold
    // spaces; weight after the LAST one)
    // v = 1 row's text is "w1 w1": unigram w1 twice (2×3) + the
    // bigram "w1 w1" once (7) = 13
    val score = spark.sql(
      """SELECT graft_linear_score(split(t, ' '),
           array('w1 3', 'w1 w1 7'), 2).w_sum AS s
         FROM r12_in WHERE v = 1""").as[Long].head()
    assert(score === 13L)
    // media meta + deflate size round-trip through SQL
    val mm = spark.sql(
      """SELECT graft_media_meta(unhex('474946383961' || '2000' || '1000'
           || '00')).width AS w,
           graft_deflate_size(CAST('aaaaaaaaaaaaaaaa' AS BINARY), 6) AS dz
      """).as[(Int, Int)].head()
    assert(mm._1 === 32 && mm._2 > 0 && mm._2 < 16)
  }

  /** Independent reference MMR (plain Scala arrays, no ArrayData) —
    * the spec's second opinion on the kernel's greedy loop. */
  private def mmrRef(
      ids: Seq[Long], rels: Seq[Double], vecs: Seq[Array[Float]],
      k: Int, lam: Double): Seq[(Long, Double, Double)] = {
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < x.length) {
        dot += x(i).toDouble * y(i).toDouble
        na += x(i).toDouble * x(i).toDouble
        nb += y(i).toDouble * y(i).toDouble
        i += 1
      }
      val sa = math.sqrt(na); val sb = math.sqrt(nb)
      if (sa == 0.0 || sb == 0.0) 0.0 else dot / (sa * sb)
    }
    val n = ids.length
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    while (out.length < math.min(k, n)) {
      var best = -1; var bestScore = 0.0
      for (i <- 0 until n if !chosen.contains(i)) {
        val maxSim = (0.0 +: chosen.map(s => cos(vecs(i), vecs(s))).toSeq).max
        val score = lam * rels(i) - (1.0 - lam) * maxSim
        if (best < 0 || score > bestScore) { best = i; bestScore = score }
      }
      chosen += best
      out += ((ids(best), rels(best), bestScore))
    }
    out.toSeq
  }

  private def mmrViaDf(
      ids: Seq[Long], rels: Seq[Double], vecs: Seq[Array[Float]],
      k: Int, lam: Double): Seq[(Long, Double, Double)] =
    Seq((ids, rels, vecs)).toDF("ids", "rels", "vecs")
      .select(explode(GraftFunctions.mmrSelect(
        $"ids", $"rels", $"vecs", k, lam)).as("s"))
      .select($"s.item_id", $"s.cosine", $"s.mmr")
      .as[(Long, Double, Double)].collect().toSeq

  test("graft_mmr_select matches an independent reference on random pools") {
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 30) {
      val n = 1 + rnd.nextInt(12)
      val dim = 1 + rnd.nextInt(8)
      // coarse grid values make exact score ties actually occur, so the
      // earliest-index discipline is exercised, not just documented
      val vecs = Seq.fill(n)(Array.fill(dim)(
        (rnd.nextInt(5) - 2).toFloat / 2))
      val rels = Seq.fill(n)(rnd.nextInt(5).toDouble / 4)
      val ids = (0 until n).map(i => (i * 7 + trial).toLong)
      val k = 1 + rnd.nextInt(n + 2) // sometimes k > pool size
      val lam = Seq(0.0, 0.3, 0.7, 1.0)(rnd.nextInt(4))
      assert(mmrViaDf(ids, rels, vecs, k, lam) ===
        mmrRef(ids, rels, vecs, k, lam),
        s"trial=$trial n=$n dim=$dim k=$k lam=$lam")
    }
  }

  test("graft_mmr_select branch pins: ties, zero-norm, empty pool, redundancy") {
    // exact score tie (identical rel, identical vec) -> earliest pool
    // index (= first id) wins both rounds
    val tied = mmrViaDf(Seq(10L, 11L), Seq(0.5, 0.5),
      Seq(Array(1f, 0f), Array(1f, 0f)), k = 2, lam = 0.7)
    assert(tied.map(_._1) === Seq(10L, 11L))
    // zero-norm selected vector: pairwise cos = 0.0, no penalty, so
    // round 2 is still pure-relevance order
    val zn = mmrViaDf(Seq(1L, 2L, 3L), Seq(0.9, 0.8, 0.7),
      Seq(Array(0f, 0f), Array(0f, 1f), Array(1f, 0f)), k = 2, lam = 0.5)
    assert(zn.map(_._1) === Seq(1L, 2L))
    // anticorrelated neighbor earns NO bonus: max(0, sims) clamps, so
    // the opposite vector scores exactly lam*rel, not more
    val anti = mmrViaDf(Seq(1L, 2L), Seq(0.9, 0.2),
      Seq(Array(1f, 0f), Array(-1f, 0f)), k = 2, lam = 0.5)
    assert(anti(1)._3 === 0.5 * 0.2 - 0.5 * 0.0)
    // empty pool -> empty selection (not an error)
    assert(mmrViaDf(Seq.empty, Seq.empty, Seq.empty, k = 3, lam = 0.7)
      === Seq.empty)
    // the semantic point: a near-duplicate of pick 1 loses round 2 to a
    // diverse lower-relevance candidate
    val div = mmrViaDf(Seq(1L, 2L, 3L), Seq(0.95, 0.94, 0.5),
      Seq(Array(1f, 0f), Array(1f, 0.01f), Array(0f, 1f)),
      k = 2, lam = 0.5)
    assert(div.map(_._1) === Seq(1L, 3L))
  }

  test("graft_mmr_select error branches: ragged arrays, null elements, bad args") {
    // parallel arrays disagreeing on length
    intercept[Exception](mmrViaDf(Seq(1L, 2L), Seq(0.5),
      Seq(Array(1f), Array(1f)), k = 1, lam = 0.5))
    // pool vectors disagreeing on dimension (ragged pool throws, never
    // silently scores 0.0) — trip it at step 2's pairwise cosine
    intercept[Exception](mmrViaDf(Seq(1L, 2L), Seq(0.9, 0.8),
      Seq(Array(1f, 0f), Array(1f)), k = 2, lam = 0.5))
    // null pool element
    intercept[Exception] {
      Seq((Seq(1L, 2L), Seq(Some(0.5), Option.empty[Double]),
        Seq(Array(1f), Array(1f)))).toDF("ids", "rels", "vecs")
        .select(GraftFunctions.mmrSelect($"ids", $"rels", $"vecs", 2, 0.5))
        .collect()
    }
    // structural args validated at construction
    intercept[Exception](GraftFunctions.mmrSelect(
      $"a", $"b", $"c", k = 0, lambda = 0.5))
    intercept[Exception](GraftFunctions.mmrSelect(
      $"a", $"b", $"c", k = 1, lambda = 1.5))
  }

  test("graft_mmr_select is callable from SQL and lambda=1 is pure relevance") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT s.item_id, s.mmr FROM (
           SELECT explode(graft_mmr_select(
             CAST(array(1, 2, 3) AS array<bigint>),
             array(0.2d, 0.9d, 0.5d),
             array(CAST(array(1.0, 0.0) AS array<float>),
                   CAST(array(1.0, 0.0) AS array<float>),
                   CAST(array(0.0, 1.0) AS array<float>)),
             2, 1.0d)) AS s)""").as[(Long, Double)].collect().toSeq
    // lam=1: no diversity penalty, selection = relevance order even
    // though items 1 and 2 are identical vectors
    assert(rows === Seq((2L, 0.9), (3L, 0.5)))
  }

  test("mmrTopK at lambda=1 equals bruteForceTopK (selection = relevance order)") {
    val corpus = randVecs(60, 16, seed = 41)
    val queries = corpus.filter($"id" < 4)
    val viaMmr = Similarity.mmrTopK(
      corpus, "id", "v", queries, "id", "v",
      k = 5, poolSize = 5, lambda = 1.0)
      .select("query_id", "rank", "item_id", "cosine")
    val viaBrute = Similarity.bruteForceTopK(
      corpus, "id", "v", queries, "id", "v", k = 5)
      .select("query_id", "rank", "item_id", "cosine")
    assert(viaMmr.except(viaBrute).isEmpty && viaBrute.except(viaMmr).isEmpty)
  }

  test("fwhtRotate: orthogonality, energy spreading, PQ distortion win, edges") {
    val rnd = new scala.util.Random(31)
    // anisotropic data: all variance in the first 8 of 64 dims — the
    // shape that starves per-subspace PQ codebooks
    val vecs = Seq.fill(128)(Array.tabulate(64)(d =>
      if (d < 8) rnd.nextFloat() * 2 - 1 else 0f))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val rotated = df.select($"id",
      Similarity.fwhtRotate($"v", dim = 64).as("r"), $"v")
    // orthogonality: norms and pairwise cosines survive to float rounding
    val checked = rotated.select(
      Similarity.cosineHof($"v", $"v").as("n0"),
      Similarity.cosineHof($"r", $"r").as("n1"),
      graft.functions.GraftFunctions.cosine($"v", $"v"))
      .collect()
    assert(checked.forall(r => math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-5))
    val normPairs = rotated.limit(10).collect().map { r =>
      val raw = r.getSeq[Float](2).map(_.toDouble)
      val rot = r.getSeq[Float](1).map(_.toDouble)
      (math.sqrt(raw.map(x => x * x).sum), math.sqrt(rot.map(x => x * x).sum))
    }
    assert(normPairs.forall { case (a, b) =>
      math.abs(a - b) <= 1e-5 * math.max(a, 1e-9) })
    // energy spreading: the max/min per-8-dim-subspace energy ratio
    // collapses from infinite (zeros) to near-uniform
    val rotRows = rotated.select("r").collect().map(_.getSeq[Float](0))
    val subEnergy = (0 until 8).map(sb =>
      rotRows.map(v => (sb * 8 until sb * 8 + 8)
        .map(d => v(d).toDouble * v(d)).sum).sum)
    assert(subEnergy.min > 0.0)
    assert(subEnergy.max / subEnergy.min < 3.0,
      s"rotated subspace energies still skewed: $subEnergy")
    // the payoff: per-subspace PQ distortion drops after rotation
    def distortion(data: org.apache.spark.sql.DataFrame): Double = {
      val cents = Similarity.pqCodebooks(data, "v", m = 8,
        k = 4, maxIter = 5, seed = 7)
      val enc = Similarity.pqEncode("v", cents, "cid", "center", m = 8)(data)
      // decode via the centroid table and measure mean squared error
      val cmap = cents.collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      enc.select("v", "pq_codes").collect().map { r =>
        val v = r.getSeq[Float](0); val codes = r.getSeq[Int](1)
        codes.zipWithIndex.map { case (c, s) =>
          val cent = cmap(c.toLong)
          (s * 8 until s * 8 + 8).map { d =>
            val e = v(d) - cent(d - s * 8); e * e
          }.sum
        }.sum.toDouble
      }.sum
    }
    val dRaw = distortion(df)
    val dRot = distortion(rotated.select($"id", $"r".as("v")))
    assert(dRot < dRaw,
      s"rotation did not reduce PQ distortion: raw=$dRaw rot=$dRot")
    // wrong length throws; NULL passes through; SQL surface registered
    intercept[Exception](Seq((1L, Array(1f, 2f))).toDF("id", "v")
      .select(Similarity.fwhtRotate($"v", dim = 64)).collect())
    assert(Seq((1L, null: Array[Float])).toDF("id", "v")
      .select(Similarity.fwhtRotate($"v", dim = 64)).head.isNullAt(0))
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      """SELECT graft_fwht_rotate(CAST(array(1.0, 0.0) AS array<float>),
           2, 0) AS r""").head.getSeq[Float](0)
    assert(viaSql.length === 2)
    intercept[IllegalArgumentException](
      GraftFunctions.fwhtRotate($"v", dim = 63))
  }

  test("native cosine stays inside whole-stage codegen") {
    // spark.range (a real source) rather than a local relation, which the
    // optimizer folds before any codegen happens
    val df = spark.range(100).select(
      expr("cast(array(id, id + 1, id + 2) as array<float>)").as("v"))
    val plan = df.select(Similarity.cosine($"v", $"v").as("c"))
      .queryExecution.executedPlan
    val wscg = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wscg.nonEmpty, s"no WholeStageCodegen in:\n$plan")
  }

  test("builtin soundex implements documented American Soundex (oracle mirror contract)") {
    // The phonetic ops and their DuckDB oracle mirror both encode THIS
    // algorithm: first letter kept; B F P V→1, C G J K Q S X Z→2,
    // D T→3, L→4, M N→5, R→6; H/W transparent (equal codes merge
    // across them); A E I O U Y separate (equal codes count twice);
    // the first letter's own code absorbs an equal-coded run; 3 digits,
    // zero-padded. A drift between Spark's builtin and this reference
    // would silently re-block every phonetic query — pinned here on
    // the canonical set plus a seeded fuzz.
    def reference(w: String): String = {
      val codes = Map('B' -> '1', 'F' -> '1', 'P' -> '1', 'V' -> '1',
        'C' -> '2', 'G' -> '2', 'J' -> '2', 'K' -> '2', 'Q' -> '2',
        'S' -> '2', 'X' -> '2', 'Z' -> '2', 'D' -> '3', 'T' -> '3',
        'L' -> '4', 'M' -> '5', 'N' -> '5', 'R' -> '6')
      val up = w.toUpperCase
      val sb = new StringBuilder
      var last = codes.getOrElse(up.head, '0')
      var i = 1
      while (i < up.length && sb.length < 3) {
        val c = up(i)
        if (c == 'H' || c == 'W') () // transparent: last survives
        else codes.get(c) match {
          case Some(d) => if (d != last) { sb += d; last = d }
          case None => last = '0' // vowel separator
        }
        i += 1
      }
      up.head + sb.toString.padTo(3, '0').mkString
    }
    val canonical = Map("Tymczak" -> "T522", "Ashcraft" -> "A261",
      "Pfister" -> "P236", "Honeyman" -> "H555", "Robert" -> "R163",
      "Wb" -> "W100", "Hb" -> "H100", "Phf" -> "P000", "Cyc" -> "C200",
      "Aeiouy" -> "A000", "Lee" -> "L000")
    canonical.foreach { case (w, want) => assert(reference(w) == want, w) }
    val rnd = new scala.util.Random(42)
    val letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ" // H/W-heavy tail below
    val words = (1 to 400).map { _ =>
      val n = 1 + rnd.nextInt(12)
      (1 to n).map(_ => letters(rnd.nextInt(26))).mkString
    } ++ (1 to 200).map { _ =>
      val n = 1 + rnd.nextInt(10)
      (1 to n).map(_ => "HWAEYBCS" (rnd.nextInt(8))).mkString
    } ++ canonical.keys
    val got = words.toDF("w").select($"w", soundex(upper($"w")).as("sx"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    words.foreach { w =>
      assert(got(w) == reference(w), s"'$w': ${got(w)} != ${reference(w)}")
    }
  }
}
