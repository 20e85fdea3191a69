package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.Ops
import org.apache.spark.sql.functions._

/** Operator-algebra invariants the reference's unit tests imply
  * (SURVEY.md §5): append additivity, distinct idempotence,
  * record_count = group size, filter partitioning. Uses raw ScalaCheck
  * generators drawn with fixed seeds (scalatest-scalacheck bridge is not
  * on the offline classpath). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(String, Int)]] = Gen.listOfN(30,
    Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.chooseNum(-50, 50)))

  private def draws[A](g: Gen[A], n: Int = 5): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("pqEncode over concatenated codebooks IS independent per-subspace encoding") {
    // The load-bearing claim of pqCodebooks: storing per-subspace
    // codebook entry c as slice s of full-dim row c is LOSSLESS,
    // because the kernel's argmin runs per subspace slice
    // independently. Property: for random vectors and random
    // per-subspace codebooks, the kernel's codes over the
    // concatenated frame equal a direct per-subspace argmin computed
    // in plain Scala (strictly-less ties to the earlier entry, the
    // kernel's documented discipline).
    val dim = 8; val m = 2; val sub = dim / m; val kk = 3
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-4.0f, 4.0f))
    val bookGen = Gen.listOfN(m * kk * sub, Gen.chooseNum(-4.0f, 4.0f))
    for (Seq((vs, bs)) <- draws(Gen.zip(Gen.listOfN(6, vecGen), bookGen), 5)
           .map(Seq(_))) {
      // books(s)(c)(j): m subspaces × kk entries × sub dims
      val books = bs.grouped(sub).grouped(kk).toIndexedSeq
      val concat = (0 until kk).map { c =>
        (c.toLong, (0 until m).flatMap(s => books(s)(c)).toArray)
      }.toDF("cid", "center")
      val got = graft.ext.Similarity.pqEncode(
        "embedding", concat, "cid", "center", m = m)(
        vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
          .toDF("vec_id", "embedding"))
        .orderBy("vec_id").select("pq_codes").as[Seq[Int]].collect()
      val want = vs.map { v =>
        (0 until m).map { s =>
          var bestC = -1; var bestD = Double.PositiveInfinity
          for (c <- 0 until kk) {
            var d = 0.0
            for (j <- 0 until sub) {
              val diff = v(s * sub + j).toDouble - books(s)(c)(j)
              d += diff * diff
            }
            if (d < bestD) { bestD = d; bestC = c }
          }
          bestC
        }
      }
      assert(got.toSeq.map(_.toList) === want.map(_.toList))
    }
  }

  test("mediaMeta never throws on arbitrary bytes and classifies magics consistently") {
    // the malformed-input contract under fuzzing: random blobs —
    // including ones that START like real containers and then decay
    // into garbage — must produce a row, never an exception, and a
    // recognized magic must pin the format field
    val blobGen: Gen[Array[Byte]] = for {
      n <- Gen.chooseNum(0, 200)
      prefix <- Gen.oneOf(
        Array.emptyByteArray,
        Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A),
        "GIF89a".getBytes("US-ASCII"),
        Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte),
        "RIFF1234WAVE".getBytes("US-ASCII"),
        (Array[Byte](0, 0, 0, 16) ++ "ftyp".getBytes("US-ASCII")))
      tail <- Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield prefix ++ tail.toArray
    val blobs = draws(blobGen, n = 200)
    val rows = blobs.map(Tuple1(_)).toDF("b")
      .select(graft.ext.BinaryOps.mediaMeta($"b").as("m")).collect()
    assert(rows.length === blobs.length) // no throw anywhere
    // the sample-decoding kernel carries the same contract: arbitrary
    // bytes (incl. RIFF-prefixed garbage with wild chunk sizes) must
    // yield a row — NULL when unreadable — never an exception
    val wavRows = blobs.map(Tuple1(_)).toDF("b")
      .select(graft.ext.BinaryOps.wavPcmStats($"b").as("w")).collect()
    assert(wavRows.length === blobs.length)
    // the archive-listing kernel too: PK-signature-prefixed garbage
    // with wild counts/offsets must list-or-NULL, never throw
    val zipBlobs = blobs.map(b =>
      "PK".getBytes("US-ASCII") ++ b) ++ blobs
    val zipRows = zipBlobs.map(Tuple1(_)).toDF("b")
      .select(graft.ext.BinaryOps.zipEntries($"b").as("z")).collect()
    assert(zipRows.length === zipBlobs.length)
    val warcBlobs = blobs.map(b =>
      "WARC/1.0\r\n".getBytes("US-ASCII") ++ b) ++ blobs
    val warcRows = warcBlobs.map(Tuple1(_)).toDF("b")
      .select(graft.ext.BinaryOps.warcRecords($"b").as("w")).collect()
    assert(warcRows.length === warcBlobs.length)
    // tar: garbage with a planted ustar magic at 257 (and without)
    // must list-or-NULL, never throw
    val tarBlobs = blobs.map { b =>
      val t = new Array[Byte](512) ++ b
      "ustar".getBytes("US-ASCII").copyToArray(t, 257)
      t
    } ++ blobs
    val tarRows = tarBlobs.map(Tuple1(_)).toDF("b")
      .select(graft.ext.BinaryOps.tarEntries($"b").as("t")).collect()
    assert(tarRows.length === tarBlobs.length)
    blobs.zip(rows).foreach { case (b, r) =>
      val m = r.getStruct(0)
      val fmt = if (m.isNullAt(0)) null else m.getString(0)
      if (b.length >= 8 && b.startsWith(Array[Byte](0x89.toByte, 'P')))
        assert(fmt === "png")
      if (b.length >= 6 && b.startsWith("GIF89a".getBytes("US-ASCII")))
        assert(fmt === "gif")
    }
  }

  test("KLL merged == direct for random splits in the exact regime") {
    val valsGen = Gen.listOfN(120, Gen.chooseNum(-1000, 1000))
    for (vs <- draws(valsGen, n = 5)) {
      val all = vs.map(v => ("g", v.toDouble)).toDF("k", "v")
      val (a, b) = vs.splitAt(vs.length / 3)
      val sa = Ops.aggregateStateKll(Seq("k"), Seq("v"))(
        a.map(v => ("g", v.toDouble)).toDF("k", "v"))
      val sb = Ops.aggregateStateKll(Seq("k"), Seq("v"))(
        b.map(v => ("g", v.toDouble)).toDF("k", "v"))
      val ranks = Seq(0.1, 0.5, 0.9)
      val merged = Ops.finalizeAggregateKll(Seq("k"), Seq("v"), ranks)(
        Ops.mergeAggregateStatesKll(Seq("k"), Seq("v"))(sa, sb)).head()
      val direct = Ops.finalizeAggregateKll(Seq("k"), Seq("v"), ranks)(
        Ops.aggregateStateKll(Seq("k"), Seq("v"))(all)).head()
      assert(merged.toSeq.drop(1) === direct.toSeq.drop(1))
      // and the exact order statistic, independently computed
      val sorted = vs.map(_.toDouble).sorted
      ranks.zipWithIndex.foreach { case (r, i) =>
        val expect = sorted(math.ceil(r * vs.length).toInt - 1)
        assert(merged.getDouble(i + 1) === expect, s"rank $r")
      }
    }
  }

  test("theta set algebra equals exact set arithmetic for random sets pre-capacity") {
    val setGen = Gen.listOfN(150, Gen.chooseNum(0L, 400L))
    for (seed <- 1 to 4) {
      val xs = draws(setGen, n = seed).last.toSet
      val ys = draws(setGen, n = seed + 10).last.toSet
      val fa = xs.toSeq.map(v => ("g", v)).toDF("k", "v")
      val fb = ys.toSeq.map(v => ("g", v)).toDF("k", "v")
      val sa = Ops.aggregateStateTheta(Seq("k"), Seq("v"))(fa)
        .select(col("v_theta").as("sa"))
      val sb = Ops.aggregateStateTheta(Seq("k"), Seq("v"))(fb)
        .select(col("v_theta").as("sb"))
      import graft.functions.GraftFunctions._
      val r = sa.crossJoin(sb).select(
        thetaEstimate(col("sa")),
        thetaIntersect(col("sa"), col("sb")),
        thetaDiff(col("sa"), col("sb"))).head()
      assert(r.getLong(0) === xs.size.toLong)
      assert(r.getLong(1) === (xs intersect ys).size.toLong)
      assert(r.getLong(2) === (xs diff ys).size.toLong)
    }
  }

  test("luhnValid matches a reference implementation on random digit strings") {
    // the HOF fold vs a plain-Scala Luhn over 200 pseudo-random digit
    // strings of every length 0..24 — checksum kernels earn fuzzing
    def ref(s: String): Boolean = s.nonEmpty && {
      var t = 0
      s.reverse.zipWithIndex.foreach { case (c, i) =>
        var d = c - '0'
        if (i % 2 == 1) { d *= 2; if (d > 9) d -= 9 }
        t += d
      }
      t % 10 == 0
    }
    val gen = Gen.chooseNum(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.numChar).map(_.mkString))
    val cases = draws(gen, 200).distinct
    val got = cases.toDF("d")
      .select(col("d"), graft.ext.TextOps.luhnValid(col("d")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach(s => assert(got(s) === ref(s), s"digits='$s'"))
  }

  test("paretoFront equals NOT-EXISTS dominance on random clouds at random bucket counts") {
    val cloudGen = Gen.listOfN(40,
      Gen.zip(Gen.chooseNum(0, 9), Gen.chooseNum(0, 9)))
    draws(cloudGen, 4).zipWithIndex.foreach { case (pts, ci) =>
      val df = pts.zipWithIndex
        .map { case ((x, y), i) => (i.toLong, x.toDouble, y.toDouble) }
        .toDF("id", "x", "y")
      val brute = pts.zipWithIndex.collect { case ((x, y), i)
        if !pts.exists { case (sx, sy) =>
          sx >= x && sy >= y && (sx > x || sy > y) } => i.toLong }.toSet
      Seq(1, 5, 64).foreach { b =>
        val got = Ops.paretoFront("x", "y", buckets = b)(df)
          .select("id").as[Long].collect().toSet
        assert(got === brute, s"cloud=$ci buckets=$b")
      }
    }
  }

  test("paretoFrontNd d=3 equals NOT-EXISTS dominance on random clouds") {
    val cloudGen = Gen.listOfN(40,
      Gen.zip(Gen.chooseNum(0, 6), Gen.chooseNum(0, 6), Gen.chooseNum(0, 6)))
    draws(cloudGen, 4).zipWithIndex.foreach { case (pts, ci) =>
      val df = pts.zipWithIndex
        .map { case ((x, y, z), i) =>
          (i.toLong, x.toDouble, y.toDouble, z.toDouble) }
        .toDF("id", "x", "y", "z")
      val brute = pts.zipWithIndex.collect { case ((x, y, z), i)
        if !pts.exists { case (sx, sy, sz) =>
          sx >= x && sy >= y && sz >= z &&
            (sx > x || sy > y || sz > z) } => i.toLong }.toSet
      Seq(1, 5, 64).foreach { b =>
        val got = Ops.paretoFrontNd(Seq("x", "y", "z"), buckets = b)(df)
          .select("id").as[Long].collect().toSet
        assert(got === brute, s"cloud=$ci buckets=$b")
      }
    }
  }

  test("paretoFrontNd d=4 equals NOT-EXISTS dominance on random clouds") {
    val cloudGen = Gen.listOfN(30, Gen.zip(
      Gen.chooseNum(0, 4), Gen.chooseNum(0, 4),
      Gen.chooseNum(0, 4), Gen.chooseNum(0, 4)))
    draws(cloudGen, 3).zipWithIndex.foreach { case (pts, ci) =>
      val df = pts.zipWithIndex
        .map { case ((a, b, c, d), i) =>
          (i.toLong, a.toDouble, b.toDouble, c.toDouble, d.toDouble) }
        .toDF("id", "a", "b", "c", "d")
      val brute = pts.zipWithIndex.collect { case ((a, b, c, d), i)
        if !pts.exists { case (sa, sb, sc, sd) =>
          sa >= a && sb >= b && sc >= c && sd >= d &&
            (sa > a || sb > b || sc > c || sd > d) } => i.toLong }.toSet
      Seq(1, 16).foreach { bk =>
        val got = Ops.paretoFrontNd(Seq("a", "b", "c", "d"),
          buckets = bk)(df)
          .select("id").as[Long].collect().toSet
        assert(got === brute, s"cloud=$ci buckets=$bk")
      }
    }
  }

  test("bm25PrfTerms invariants on random corpora: no query terms, ranked weights, fbTerms cap") {
    import graft.ext.TextOps
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu")
    val docGen = Gen.listOfN(12,
      Gen.listOfN(8, Gen.oneOf(vocab)).map(_.mkString(" ")))
    draws(docGen, 3).zipWithIndex.foreach { case (texts, ci) =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val index = TextOps.bm25IndexRows("doc_id", "text")(docs)
      val queries = Seq((0L, Seq("ant", "bee"))).toDF("query_id", "terms")
      val out = TextOps.bm25PrfTerms(index, TextOps.bm25TermDf(index),
        TextOps.bm25Stats(index), queries, "query_id", "terms",
        fbDocs = 3, fbTerms = 4)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getDouble(2), r.getInt(4)))
      assert(out.length <= 4, s"case $ci")                  // fbTerms cap
      assert(!out.exists(t => t._1 == "ant" || t._1 == "bee"), s"case $ci")
      assert(out.map(_._2).toSeq ===
        out.map(_._2).sortBy(-_).toSeq, s"case $ci")        // weight desc
      assert(out.map(_._3).toSeq === (1 to out.length), s"case $ci")
    }
  }

  test("proportionalAllocate: Σ == total and quota bounds on random weights") {
    val wGen = Gen.listOfN(12, Gen.chooseNum(0L, 50L))
    draws(wGen, 6).zipWithIndex.foreach { case (ws, ci) =>
      val df = ws.zipWithIndex.map { case (w, i) => (s"g$i", w) }
        .toDF("g", "w")
      val total = 97L
      val out = Ops.proportionalAllocate("g", "w", total)(df)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      val bigW = ws.sum
      if (bigW == 0L) assert(out.values.forall(_._2 == 0L), s"case $ci")
      else {
        assert(out.values.map(_._2).sum === total, s"case $ci")
        // Hamilton quota property: every allocation within floor/ceil
        // of its exact proportional share
        out.values.foreach { case (w, a) =>
          val exact = total.toDouble * w / bigW
          assert(a >= math.floor(exact).toLong &&
            a <= math.ceil(exact).toLong, s"case $ci w=$w a=$a")
        }
      }
    }
  }

  test("append row count is additive") {
    for (Seq(xs, ys) <- draws(Gen.zip(rowsGen, rowsGen)).map(t => Seq(t._1, t._2))) {
      val a = xs.toDF("k", "v"); val b = ys.toDF("k", "v")
      assert(Ops.append(Seq(a, b)).count() == xs.size + ys.size)
    }
  }

  test("distinct is idempotent") {
    for (xs <- draws(rowsGen)) {
      val once = Ops.distinct(Seq("k"))(xs.toDF("k", "v"))
      assert(Ops.distinct(Seq("k"))(once).count() == once.count())
    }
  }

  test("aggregate record_count sums to total rows and matches group sums") {
    for (xs <- draws(rowsGen) if xs.nonEmpty) {
      val agg = Ops.aggregate(Seq("k"), Seq("v" -> "sum"))(xs.toDF("k", "v")).collect()
      assert(agg.map(_.getAs[Long]("record_count")).sum == xs.size)
      val expected = xs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      agg.foreach { r =>
        assert(r.getAs[Long]("v_sum") == expected(r.getAs[String]("k")))
      }
    }
  }

  test("filterByValue keep + discard partition the input") {
    for (xs <- draws(rowsGen)) {
      val df = xs.toDF("k", "v")
      val kept = Ops.filterByValue("k", "a")(df).count()
      val discarded = Ops.filterByValue("k", "a", discard = true)(df).count()
      assert(kept + discarded == xs.size)
    }
  }

  test("fieldFilter rename-then-keep equals keep-then-rename") {
    val df = Seq((1, 2, 3)).toDF("a", "b", "c")
    val r1 = Ops.fieldFilter(keep = Seq("a", "b"), rename = Map("a" -> "x"))(df)
    val r2 = Ops.fieldFilter(rename = Map("a" -> "x"))(
      Ops.fieldFilter(keep = Seq("a", "b"))(df))
    assert(r1.columns.toSeq == r2.columns.toSeq)
    assert(r1.collect().toSeq == r2.collect().toSeq)
  }

  test("saltedAggregate equals plain aggregate on random data") {
    for (xs <- draws(rowsGen) if xs.nonEmpty) {
      val df = xs.toDF("k", "v")
      val plain = Ops.aggregate(Seq("k"),
        Seq("v" -> "sum", "v" -> "min", "v" -> "max"))(df)
        .orderBy("k").collect().map(_.toSeq).toSeq
      val salted = Ops.saltedAggregate(Seq("k"),
        Seq("v" -> "sum", "v" -> "min", "v" -> "max"),
        saltSource = col("v"), buckets = 3)(df)
        .orderBy("k").collect().map(_.toSeq).toSeq
      assert(salted == plain)
    }
  }

  test("hashSplit labels partition the input for any fraction layout") {
    import graft.ext.TextOps
    for (xs <- draws(rowsGen) if xs.nonEmpty) {
      val df = xs.toDF("k", "v")
      val out = df.select(TextOps.hashSplit(col("v"),
        Seq("a" -> 0.3, "b" -> 0.3, "c" -> 0.4)).as("s"))
      assert(out.filter(col("s").isin("a", "b", "c", "train")).count() == xs.size)
      // same key -> same label, regardless of surrounding rows
      val one = df.limit(1).select(TextOps.hashSplit(col("v"),
        Seq("a" -> 0.3, "b" -> 0.3, "c" -> 0.4)).as("s"))
      assert(out.head().getString(0) == one.head().getString(0))
    }
  }

  test("intersect/except partition the distinct left side") {
    for (Seq(xs, ys) <- draws(Gen.zip(rowsGen, rowsGen)).map(t => Seq(t._1, t._2))) {
      val a = xs.toDF("k", "v"); val b = ys.toDF("k", "v")
      val inter = Ops.intersect(b)(a).count()
      val exc = Ops.except(b)(a).count()
      assert(inter + exc == a.distinct().count())
    }
  }

  test("threshold bins cover every row exactly once") {
    for (xs <- draws(rowsGen)) {
      val df = xs.map(_._2.toDouble).toDF("v")
      val out = Ops.threshold("v", -10.0, 10.0)(df)
      assert(out.filter(col("v_bin").isin("low", "pass", "high")).count() == xs.size)
    }
  }

  private val blobGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 8000).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))

  test("CDC chunks always tile the blob and respect size bounds") {
    import graft.ext.BinaryOps
    for (blob <- draws(blobGen, n = 8)) {
      val rows = Seq(Tuple1(blob)).toDF("b")
        .select(explode(BinaryOps.contentChunkFingerprints(
          col("b"), minBytes = 32, avgBits = 7, maxBytes = 512)).as("c"))
        .select("c.offset", "c.length")
        .collect().map(r => (r.getInt(0), r.getInt(1)))
      // contiguous tiling from 0 to len, even for the empty blob
      assert(rows.head._1 == 0)
      rows.sliding(2).foreach {
        case Array(a, b) => assert(a._1 + a._2 == b._1)
        case _ => ()
      }
      assert(rows.last._1 + rows.last._2 == blob.length)
      // every chunk but the last inside [min, max]; last only bounded above
      rows.init.foreach { case (_, len) => assert(len >= 32 && len <= 512) }
      assert(rows.last._2 <= 512)
    }
  }

  test("fuzzyKeyPairs equals brute-force levenshtein pairs on random keys") {
    // small alphabet + short lengths force collisions, near-misses, and
    // exact dups; the blocking must find EXACTLY the distance<=1 pairs
    val keyGen = Gen.listOfN(40,
      Gen.chooseNum(2, 6).flatMap(n =>
        Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c'))))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (keys <- draws(keyGen, n = 3)) {
      val df = keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }
        .toDF("id", "key")
      // uncapped buckets: the equivalence claim is about recall, and the
      // tiny alphabet makes hot variants routine
      val got = graft.ext.Dedup.fuzzyKeyPairs("id", "key",
        maxBucket = 10000)(df)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val want = (for {
        (a, i) <- keys.zipWithIndex; (b, j) <- keys.zipWithIndex
        if i < j && lev(a, b) <= 1
      } yield (i.toLong, j.toLong)).toSet
      assert(got === want)
    }
  }

  test("quotaSample keeps min(cap, group size) rows and the hash-smallest ids") {
    val grpGen: Gen[List[(Long, String)]] = Gen.listOfN(50,
      Gen.zip(Gen.chooseNum(1L, 1000000L), Gen.oneOf("x", "y", "z")))
    for (xs0 <- draws(grpGen, n = 3)) {
      val xs = xs0.distinctBy(_._1) // unique keys: quota is per distinct row
      val df = xs.toDF("id", "grp")
      val out = Ops.quotaSample("grp", "id", n = 7)(df)
        .as[(Long, String)].collect().toSeq
      val byGrp = xs.groupBy(_._2)
      out.groupBy(_._2).foreach { case (g, rows) =>
        assert(rows.size == math.min(7, byGrp(g).size))
      }
      // the survivors are exactly the 7 hash-smallest ids per group —
      // recompute the md5-prefix order on the driver
      def h(id: Long): Long = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils
          .md5Hex(id.toString).substring(0, 8), 16)
      byGrp.foreach { case (g, rows) =>
        val expect = rows.map(_._1).sortBy(id => (h(id), id)).take(7).toSet
        assert(out.filter(_._2 == g).map(_._1).toSet === expect)
      }
    }
  }

  test("CDC fingerprints mostly survive a random middle edit") {
    import graft.ext.BinaryOps
    def fps(b: Array[Byte]): Seq[String] =
      Seq(Tuple1(b)).toDF("b")
        .select(explode(BinaryOps.contentChunkFingerprints(
          col("b"), minBytes = 32, avgBits = 6, maxBytes = 512)).as("c"))
        .select("c.fp").as[String].collect().toSeq
    for (blob <- draws(blobGen, n = 5) if blob.length > 2000) {
      val at = blob.length / 2
      val edited = blob.take(at) ++ Array[Byte](1, 2, 3) ++ blob.drop(at)
      val (a, b) = (fps(blob), fps(edited))
      val survived = (a.toSet intersect b.toSet).size.toDouble / a.size
      // only the edit's neighborhood re-chunks; the tails stay identical
      assert(survived >= 0.5,
        s"len=${blob.length}: only ${(survived * 100).round}% survived")
    }
  }

  // random word-salad corpora for the span/chunk/mix invariants: small
  // vocabulary forces real repeats and cross-doc duplication
  private val corpusGen: Gen[List[(Long, String)]] =
    Gen.zip(Gen.chooseNum(3, 12), Gen.chooseNum(5, 40)).flatMap {
      case (nDocs, maxLen) =>
        Gen.sequence[List[(Long, String)], (Long, String)](
          (0 until nDocs).toList.map { i =>
            Gen.nonEmptyListOf(Gen.oneOf("u", "v", "w", "x", "y", "z"))
              .map(ts => (i.toLong, ts.take(maxLen).mkString(" ")))
          })
    }

  test("chunkTexts with stride == chunkTokens partitions every document exactly") {
    import graft.ext.TextOps
    for (xs <- draws(corpusGen, n = 4)) {
      val df = xs.toDF("doc_id", "text")
      val chunks = TextOps.chunkTexts("doc_id", "text", chunkTokens = 5,
        stride = 5)(df)
        .select("doc_id", "chunk_idx", "chunk_tokens", "chunk_text")
        .as[(Long, Long, Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      xs.foreach { case (id, text) =>
        val mine = chunks(id)
        // disjoint stride: re-concatenating the chunks rebuilds the doc
        assert(mine.map(_._4).mkString(" ") === text)
        // token counts partition the doc's token count
        assert(mine.map(_._3).sum === text.split(" ").length.toLong)
      }
    }
  }

  test("strip operators conserve tokens: kept + removed = total") {
    import graft.ext.TextOps
    for (xs <- draws(corpusGen, n = 4)) {
      val df = xs.toDF("doc_id", "text")
      Seq(TextOps.stripDuplicateSpans("doc_id", "text", n = 3)(df),
        TextOps.stripSelfRepeats("doc_id", "text", n = 3)(df))
        .foreach { out =>
          val rows = out.select("doc_id", "n_tokens", "n_removed", "clean_text")
            .as[(Long, Long, Long, String)].collect()
          assert(rows.length === xs.size) // every doc comes back
          rows.foreach { case (id, nTok, nRem, clean) =>
            val original = xs.find(_._1 == id).get._2
            assert(nTok === original.split(" ").length.toLong)
            val keptTokens = if (clean.isEmpty) 0L
              else clean.split(" ").length.toLong
            assert(keptTokens === nTok - nRem,
              s"doc $id: kept $keptTokens != $nTok - $nRem")
            // kept text is a subsequence of the original tokens
            val origToks = original.split(" ")
            val cleanToks =
              if (clean.isEmpty) Array.empty[String] else clean.split(" ")
            var oi = 0
            val isSubseq = cleanToks.forall { t =>
              while (oi < origToks.length && origToks(oi) != t) oi += 1
              val ok = oi < origToks.length
              if (ok) oi += 1
              ok
            }
            assert(isSubseq,
              s"doc $id: '$clean' not a subsequence of '$original'")
          }
        }
    }
  }

  test("duplicateSpans islands stay in bounds and respect the merge gap") {
    import graft.ext.TextOps
    for (xs <- draws(corpusGen, n = 4)) {
      val df = xs.toDF("doc_id", "text")
      val spans = TextOps.duplicateSpans("doc_id", "text", n = 3)(df)
        .select("doc_id", "span_start", "span_end", "span_tokens")
        .as[(Long, Long, Long, Long)].collect()
      spans.groupBy(_._1).foreach { case (id, ss) =>
        val nTok = xs.find(_._1 == id).get._2.split(" ").length
        val sorted = ss.sortBy(_._2)
        sorted.foreach { case (_, s, e, t) =>
          assert(s >= 0 && e < nTok && t === e - s + 1 && t >= 3)
        }
        // islands are maximal: consecutive spans are > n apart at the
        // gram level, so their token ranges never touch
        sorted.sliding(2).foreach {
          case Array((_, _, e1, _), (_, s2, _, _)) => assert(s2 > e1 + 1)
          case _ => ()
        }
      }
    }
  }

  test("tokenBudgetMix never exceeds the budget and selects a stable prefix") {
    import graft.ext.TextOps
    for (xs <- draws(corpusGen, n = 4)) {
      val df = xs.map { case (id, t) => (id, t, s"s${id % 3}") }
        .toDF("doc_id", "text", "source")
      val out = TextOps.tokenBudgetMix("doc_id", "text", "source",
        tokensPerSource = 12)(df)
        .select("source", "doc_id", "cum_tokens")
        .as[(String, Long, Long)].collect()
      out.groupBy(_._1).foreach { case (_, rows) =>
        assert(rows.map(_._3).max <= 12L)
      }
      val again = TextOps.tokenBudgetMix("doc_id", "text", "source",
        tokensPerSource = 12)(df)
        .select("doc_id").as[Long].collect().toSet
      assert(again === out.map(_._2).toSet)
    }
  }

  test("quantized cosine tracks exact cosine within int8 rounding error") {
    import graft.ext.Similarity
    val vecGen: Gen[List[(Array[Float], Array[Float])]] = Gen.listOfN(25,
      Gen.zip(
        Gen.listOfN(16, Gen.chooseNum(-1000, 1000).map(_ / 250.0f)).map(_.toArray),
        Gen.listOfN(16, Gen.chooseNum(-1000, 1000).map(_ / 250.0f)).map(_.toArray)))
    for (pairs <- draws(vecGen, 3)) {
      val rows = pairs.toDF("a", "b")
        .select(
          Similarity.cosineHof($"a", $"b").as("exact"),
          Similarity.quantizedCosine(
            Similarity.quantizeInt8($"a"), Similarity.quantizeInt8($"b"))
            .as("q8"))
        .as[(Double, Double)].collect()
      // int8 rounding perturbs each normalized coordinate by <= 1/254,
      // so over 16 dims the cosine moves by a small bounded amount
      rows.foreach { case (e, q) =>
        assert(math.abs(e - q) < 0.12, s"quantized cosine drifted: $e vs $q")
        assert(q >= -1.0000001 && q <= 1.0000001)
      }
    }
  }

  test("sign-sketch hamming is a bounded symmetric pseudo-metric") {
    import graft.ext.Similarity
    val vecGen: Gen[List[(Long, Array[Float])]] = Gen.listOfN(20,
      Gen.zip(Gen.chooseNum(1L, 1000000L),
        Gen.listOfN(32, Gen.chooseNum(-500, 500).map(_ / 100.0f)).map(_.toArray)))
    for (vecs <- draws(vecGen, 3)) {
      val df = vecs.toDF("id", "v")
        .select(Similarity.signSketch($"v", dim = 32).as("s"))
      val sketches = df.as[Long].collect()
      // bounded by dim; self-distance 0; symmetric by construction
      for (a <- sketches; b <- sketches) {
        val h = java.lang.Long.bitCount(a ^ b)
        assert(h >= 0 && h <= 32)
        assert(h === java.lang.Long.bitCount(b ^ a))
      }
      assert(sketches.forall(s => java.lang.Long.bitCount(s ^ s) === 0))
    }
  }

  test("gopherRules verdicts are pure functions of their exposed signals") {
    import graft.ext.TextOps
    val textGen: Gen[List[(Long, String)]] = Gen.listOfN(15,
      Gen.zip(Gen.chooseNum(1L, 1000000L),
        Gen.chooseNum(0, 80).flatMap(n => Gen.listOfN(n,
          Gen.oneOf("the", "a", "of", "tok", "zq", "07", "##"))
          .map(_.mkString(" ")))))
    for (docs <- draws(textGen, 3)) {
      val out = TextOps.gopherRules("doc_id", "text")(
        docs.toDF("doc_id", "text"))
        .select("n_tokens", "mean_word_len", "alpha_frac", "stop_hits",
          "dup_frac", "pass_length", "pass_mean_len", "pass_alpha",
          "pass_stopwords", "pass_repetition", "passes_gopher")
        .as[(Long, Double, Double, Long, Double, Long, Long, Long, Long, Long, Long)]
        .collect()
      out.foreach { case (n, mwl, af, sh, dup, pl, pm, pa, ps, pr, all) =>
        assert(pl === (if (n >= 50 && n <= 100000) 1L else 0L))
        assert(pm === (if (mwl >= 3.0 && mwl <= 10.0) 1L else 0L))
        assert(pa === (if (af >= 0.8) 1L else 0L))
        assert(ps === (if (sh >= 2) 1L else 0L))
        assert(pr === (if (dup <= 0.9) 1L else 0L))
        assert(all === pl * pm * pa * ps * pr)
      }
    }
  }

  test("perceptual pairs report the true hash distance under the ordered convention") {
    import graft.ext.BinaryOps
    val blobGen: Gen[List[(Long, String)]] = Gen.listOfN(12,
      Gen.zip(Gen.chooseNum(1L, 1000000L),
        Gen.listOfN(150, Gen.alphaNumChar).map(_.mkString)))
    for (blobs <- draws(blobGen, 3)) {
      val docs = blobs.distinctBy(_._1).toDF("id", "t")
        .select($"id", BinaryOps.toBlob($"t").as("blob"))
      val hashes = docs.select($"id",
        BinaryOps.aHash60($"blob").as("h")).as[(Long, Long)].collect().toMap
      // hashes stay inside the 60-bit budget (sign bit clear by design)
      assert(hashes.values.forall(h => h >= 0 && h < (1L << 60)))
      val pairs = BinaryOps.perceptualHashPairs("id", "blob",
        maxHamming = 60)(docs)
        .as[(Long, Long, Int)].collect()
      pairs.foreach { case (a, b, ham) =>
        assert(a < b, s"pair ($a, $b) breaks the ordered convention")
        assert(ham === java.lang.Long.bitCount(hashes(a) ^ hashes(b)),
          s"reported hamming disagrees with the hashes for ($a, $b)")
      }
    }
  }

  test("incrementalPerceptualDedup survivors are never in-radius of the index") {
    import graft.ext.BinaryOps
    // maxHamming <= 3 is the pigeonhole-complete regime: NO survivor may
    // sit within the radius of ANY index hash (brute-force recheck)
    val blobGen: Gen[List[String]] = Gen.listOfN(20,
      Gen.listOfN(120, Gen.oneOf('a', 'z')).map(_.mkString))
    for ((blobs, round) <- draws(blobGen, 3).zipWithIndex) {
      val all = blobs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val (idxRows, batchRows) = all.partition(_._1 < 10)
      def frame(rows: Seq[(Long, String)]) = rows.toDF("id", "t")
        .select($"id", BinaryOps.toBlob($"t").as("blob"))
      val index = BinaryOps.phashIndexRows("id", "blob")(frame(idxRows))
      val survivors = BinaryOps.incrementalPerceptualDedup(
        "id", "blob", index, maxHamming = 3)(frame(batchRows))
        .select($"id", BinaryOps.aHash60($"blob").as("h"))
        .as[(Long, Long)].collect()
      val idxHashes = index.select($"phash").as[Long].collect()
      for ((sid, sh) <- survivors; ih <- idxHashes)
        assert(java.lang.Long.bitCount(sh ^ ih) > 3,
          s"round $round: survivor $sid is within radius of the index")
    }
  }

  test("containment pairs stay in (0, 1] and never exceed either gram set") {
    import graft.ext.{Dedup, TextOps}
    val docGen: Gen[List[(Long, String)]] = Gen.listOfN(10,
      Gen.zip(Gen.chooseNum(1L, 1000000L),
        Gen.chooseNum(8, 40).flatMap(n => Gen.listOfN(n,
          Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff"))
          .map(_.mkString(" ")))))
    for (docs <- draws(docGen, 3)) {
      val df = docs.distinctBy(_._1).toDF("doc_id", "text")
      val gramCounts = df.select($"doc_id",
        size(TextOps.shingles($"text", 8)).as("n"))
        .as[(Long, Int)].collect().toMap
      val out = Dedup.containmentPairs("doc_id", "text", n = 8,
        threshold = 0.1)(df)
        .as[(Long, Long, Long, Double, Double)].collect()
      out.foreach { case (a, b, shared, ca, cb) =>
        assert(a < b)
        assert(shared >= 1 && ca > 0 && cb > 0 && ca <= 1.0 && cb <= 1.0)
        assert(shared <= gramCounts(a) && shared <= gramCounts(b))
        assert(ca === shared.toDouble / gramCounts(a))
        assert(cb === shared.toDouble / gramCounts(b))
      }
    }
  }

  test("pqTopK equals brute force when the ADC pool covers the corpus") {
    import graft.ext.Similarity
    // the coarse pass only SELECTS candidates; with k*rerank >= corpus
    // size the exact-cosine rerank sees everything, so the output must
    // be row-identical to bruteForceTopK — approximation error can live
    // only in the pool cut, never in the final ranking
    val vecGen: Gen[List[(Long, Array[Float])]] = Gen.listOfN(15,
      Gen.zip(Gen.chooseNum(1L, 1000000L),
        Gen.listOfN(16, Gen.chooseNum(-500, 500).map(_ / 100.0f)).map(_.toArray)))
    for (vecs <- draws(vecGen, 3)) {
      val points = vecs.distinctBy(_._1).toDF("vec_id", "embedding")
      val cents = points.limit(3)
        .select($"vec_id".as("cid"), $"embedding".as("center"))
      val pq = Similarity.pqTopK(points, "vec_id", "embedding",
        points, "vec_id", "embedding", cents, "cid", "center",
        m = 4, k = 3, rerank = 100)
        .select("query_id", "item_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
      val brute = Similarity.bruteForceTopK(points, "vec_id", "embedding",
        points, "vec_id", "embedding", k = 3)
        .select("query_id", "item_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
      assert(pq === brute)
    }
  }

  test("jaroWinkler: bounded, symmetric, 1 iff equal nonempty, del-1 floor") {
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      graft.functions.JaroWinkler.score(
        UTF8String.fromString(a), UTF8String.fromString(b))
    val strGen = Gen.listOfN(2,
      Gen.chooseNum(0, 10).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)))
    for (Seq(a, b) <- draws(strGen, 300)) {
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"out of bounds: $a/$b -> $s")
      assert(s === jw(b, a), s"asymmetric: $a/$b")
      if (a.nonEmpty) assert(jw(a, a) === 1.0)
      // deleting one char from a nonempty string keeps similarity high
      // (the property that makes del-1 blocking + a JW threshold sane)
      if (a.length >= 4) {
        val del = a.substring(0, 1) + a.substring(2)
        assert(jw(a, del) > 0.7, s"del-1 collapsed: $a vs $del -> ${jw(a, del)}")
      }
    }
  }

  test("two-pass heavy hitters equal the naive plan on random skewed streams") {
    val streamGen = Gen.listOfN(400,
      Gen.frequency(5 -> Gen.const("hot1"), 3 -> Gen.const("hot2"),
        2 -> Gen.oneOf((1 to 50).map(i => s"cold$i"))))
    for ((rows, i) <- draws(streamGen, 4).zipWithIndex) {
      val df = spark.createDataset(rows).toDF("k").repartition(3 + i)
      val f = 0.05
      val n = rows.length.toDouble
      val want = rows.groupBy(identity).view.mapValues(_.length.toLong)
        .filter { case (_, c) => c.toDouble > f * n }.toMap
      val got = graft.ext.Frequency.heavyHitters("k", f)(df)
        .as[(String, Long)].collect().toMap
      assert(got === want)
    }
  }

  test("conversation assembly/truncation invariants under random turn streams") {
    // For random conversations: (1) every loss span extracts exactly an
    // assistant turn's content, in order; (2) loss_chars == the sum of
    // those contents' lengths; (3) a truncated example is a rendered
    // (system?) + contiguous-suffix selection whose token sum fits the
    // budget whenever any suffix fits, and its spans address ITS text.
    val roleGen = Gen.oneOf("system", "user", "assistant")
    val wordGen = Gen.listOfN(3, Gen.alphaNumStr.map(_.take(4))).map(_.mkString(" "))
    val turnGen = Gen.zip(roleGen, wordGen)
    val convGen = Gen.listOfN(24,
      Gen.zip(Gen.chooseNum(1, 4), Gen.chooseNum(1, 1000), turnGen))
    for (rows <- draws(convGen, 4)) {
      val distinctRows = rows
        .groupBy(r => (r._1, r._2)).map(_._2.head).toList // unique (conv, ord)
      val df = distinctRows.map { case (c, o, (r, t)) => (c, o, r, t) }
        .toDF("conv", "ord", "role", "content")
      val asm = graft.ext.Conversations
        .assemble("conv", Seq("ord"), "role", "content")(df)
        .collect().map(r => r.getAs[Int]("conv") ->
          ((r.getAs[String]("text"), r.getAs[String]("loss_spans"),
            r.getAs[Long]("loss_chars")))).toMap
      val byConv = distinctRows.groupBy(_._1)
      for ((c, members) <- byConv) {
        val (text, spans, lc) = asm(c)
        val wantLoss = members.sortBy(_._2).collect {
          case (_, _, ("assistant", t)) => t
        }
        val gotLoss =
          if (spans.isEmpty) Seq.empty
          else spans.split(",").toSeq.map { s =>
            val Array(a, b) = s.split(":"); text.substring(a.toInt, b.toInt)
          }
        assert(gotLoss === wantLoss)
        assert(lc === wantLoss.map(_.length).sum)
      }
      val budget = 5
      val tr = graft.ext.Conversations
        .truncate("conv", Seq("ord"), "role", "content", budget = budget)(df)
        .collect()
      for (r <- tr) {
        val c = r.getAs[Int]("conv")
        val members = byConv(c).sortBy(_._2).map { case (_, _, (ro, t)) => (ro, t) }
        val hasSys = members.head._1 == "system"
        val sysTok = if (hasSys) members.head._2.split(" ", -1).length else 0
        val kt = r.getAs[Long]("kept_tokens")
        val keptTurns = r.getAs[Long]("kept_turns")
        // budget respected unless only the (oversized) system turn is left
        assert(kt <= budget || (hasSys && keptTurns === 1L && kt === sysTok.toLong))
        // text is render(system?) + a contiguous SUFFIX render
        val rendered = members.map { case (ro, t) => s"<|$ro|>\n$t\n" }
        val suffixes = (0 to members.size).map(k =>
          (if (hasSys) rendered.head else "") + rendered.drop(k).mkString(""))
        assert(suffixes.contains(r.getAs[String]("text")))
        // spans address the truncated text
        val text = r.getAs[String]("text")
        val sp = r.getAs[String]("loss_spans")
        if (sp.nonEmpty) sp.split(",").foreach { s =>
          val Array(a, b) = s.split(":")
          assert(b.toInt <= text.length && a.toInt >= 14) // in bounds
          // a loss span's content region is always headed by its role
          assert(text.substring(a.toInt - 12, a.toInt) === "assistant|>\n")
        }
      }
    }
  }

  test("quantileNormalize invariants: size-preserving, monotone, pooled-value image") {
    val gen = Gen.listOfN(40, Gen.zip(Gen.oneOf("g1", "g2", "g3"),
      Gen.chooseNum(-100.0, 100.0)))
    for (rows <- draws(gen, 4)) {
      val df = rows.zipWithIndex.map { case ((g, v), i) =>
        (g, math.rint(v * 10) / 10, i.toLong)
      }.toDF("g", "v", "id")
      val out = Ops.quantileNormalize("g", "v", "id")(df).collect()
      // one output row per input row, grouped sizes preserved
      assert(out.length === rows.length)
      // every normalized value IS some input value (an exact copy)
      val pool = rows.map(r => math.rint(r._2 * 10) / 10).toSet
      assert(out.forall(r => pool.contains(r.getAs[Double]("normalized"))))
      // within each group the map is rank-monotone
      out.groupBy(_.getString(0)).foreach { case (_, rs) =>
        val byRank = rs.sortBy(_.getAs[Int]("rank"))
          .map(_.getAs[Double]("normalized"))
        assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
      }
    }
  }

  test("associationRules invariants: lift symmetry, support <= confidence <= 1") {
    val gen = Gen.listOfN(60, Gen.zip(Gen.chooseNum(1L, 12L),
      Gen.oneOf("x", "y", "z", "w", "u")))
    for (rows <- draws(gen, 4)) {
      val df = rows.toDF("t", "i")
      val out = graft.ext.Frequency.associationRules("t", "i",
        minSupportCount = 1)(df).collect()
      val lifts = out.map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Double]("lift"))).toMap
      out.foreach { r =>
        val (a, b) = (r.getString(0), r.getString(1))
        assert(lifts((a, b)) === lifts((b, a)), "lift is symmetric")
        val s = r.getAs[Double]("support")
        val c = r.getAs[Double]("confidence")
        assert(s <= c + 1e-15 && c <= 1.0 && s > 0.0)
      }
    }
  }

  test("bootstrapCI invariants: interval ordered and inside the data range") {
    val gen = Gen.listOfN(30, Gen.chooseNum(-50.0, 50.0))
    for (vs <- draws(gen, 4)) {
      val df = vs.zipWithIndex.map { case (v, i) =>
        (i.toLong, math.rint(v * 100) / 100) }.toDF("k", "v")
      val r = graft.probes.Probes.bootstrapCI(col("k"), col("v"),
        reps = 40)(df).head()
      val lo = r.getAs[Double]("ci_low"); val hi = r.getAs[Double]("ci_high")
      assert(lo <= hi)
      val xs = vs.map(v => math.rint(v * 100) / 100)
      assert(lo >= xs.min - 1e-9 && hi <= xs.max + 1e-9,
        "resample means cannot leave the data's convex hull")
    }
  }

  test("kTruss edges live inside the (k-1)-core (the classic nesting theorem)") {
    // every edge of the k-truss has both endpoints of induced degree
    // >= k-1 inside it, so its node set is a subgraph of the
    // (k-1)-core; random graphs, rounds high enough that both flags
    // read converged (peel depth <= |V|)
    val edgeGen = Gen.listOfN(24,
      Gen.zip(Gen.chooseNum(1L, 10L), Gen.chooseNum(1L, 10L)))
    for (es <- draws(edgeGen, 4)) {
      val df = es.toDF("src", "dst")
      val truss = graft.ext.GraphOps.kTruss("src", "dst", k = 4,
        rounds = 25)(df).collect()
      val core = graft.ext.GraphOps.kCore("src", "dst", k = 3,
        rounds = 25)(df).collect()
      assert(truss.forall(_.getAs[Boolean]("converged")) &&
        core.forall(_.getAs[Boolean]("converged")))
      val coreNodes = core.map(_.getAs[Long]("node")).toSet
      val trussNodes = truss.flatMap(r => Seq(r.getAs[Long]("node_a"),
        r.getAs[Long]("node_b"))).toSet
      assert(trussNodes.subsetOf(coreNodes),
        s"truss nodes $trussNodes escape the 3-core $coreNodes")
    }
  }

  test("kTruss maintained supports equal a full recomputation, bit for bit") {
    // the incremental contract: round-0 seeds + per-round destroyed-
    // triangle decrements must land on EXACTLY the support a fresh
    // wedge enumeration over the final edge frame computes — for
    // converged runs (rounds=25) and mid-peel supergraphs (rounds=1)
    val edgeGen = Gen.listOfN(30,
      Gen.zip(Gen.chooseNum(1L, 12L), Gen.chooseNum(1L, 12L)))
    for (es <- draws(edgeGen, 4); k <- Seq(3, 4); rounds <- Seq(1, 25)) {
      val df = es.toDF("src", "dst")
      val out = graft.ext.GraphOps.kTruss("src", "dst", k, rounds)(df)
        .collect()
      val edges = out.map(r =>
        (r.getAs[Long]("node_a"), r.getAs[Long]("node_b")))
        .toSeq.toDF("__s", "__d")
      val fresh = graft.ext.GraphOps.trussSupport(edges).collect()
        .map(r => (r.getAs[Long]("__s"), r.getAs[Long]("__d")) ->
          r.getAs[Long]("__sup")).toMap
      out.foreach { r =>
        val key = (r.getAs[Long]("node_a"), r.getAs[Long]("node_b"))
        assert(r.getAs[Long]("support") === fresh.getOrElse(key, 0L),
          s"k=$k rounds=$rounds edge $key: maintained " +
            s"${r.getAs[Long]("support")} vs fresh ${fresh.getOrElse(key, 0L)}")
      }
    }
  }

  test("k-sample and paired tests: rank invariances and symmetries") {
    val gen = Gen.listOfN(24, Gen.zip(Gen.chooseNum(0, 2),
      Gen.chooseNum(-9.0, 9.0)))
    for (rows <- draws(gen, 4)) {
      val df = rows.zipWithIndex.map { case ((v, x), i) =>
        (s"v$v", i.toLong, math.rint(x * 4) / 4) }.toDF("v", "i", "x")
      // Kruskal–Wallis rides RANKS: any strictly increasing transform
      // of x leaves H bit-for-bit (ranks identical)
      val h1 = graft.probes.Probes.kruskalWallis(col("v"), col("x"))(df)
        .head()
      val h2 = graft.probes.Probes.kruskalWallis(col("v"),
        col("x") * 3.0 + 100.0)(df).head()
      def d(r: org.apache.spark.sql.Row, c: String) =
        Option(r.getAs[java.lang.Double](c)).map(_.doubleValue())
      assert(d(h1, "h") === d(h2, "h") &&
        d(h1, "h_corrected") === d(h2, "h_corrected"))
      // Wilcoxon signed-rank: swapping the pair sides swaps W+/W- and
      // flips z and the rank-biserial exactly
      val pairs = rows.zipWithIndex.map { case ((v, x), i) =>
        (i.toLong, math.rint(x * 4) / 4, (v - 1).toDouble) }
        .toDF("i", "a", "b")
      val w1 = graft.probes.Probes.wilcoxonSignedRank(col("a"), col("b"))(
        pairs).head()
      val w2 = graft.probes.Probes.wilcoxonSignedRank(col("b"), col("a"))(
        pairs).head()
      assert(w1.getAs[Double]("w_plus") === w2.getAs[Double]("w_minus") &&
        w1.getAs[Double]("w_minus") === w2.getAs[Double]("w_plus"))
      (d(w1, "z"), d(w2, "z")) match {
        case (Some(z1), Some(z2)) => assert(z1 === -z2)
        case (a, b) => assert(a.isEmpty && b.isEmpty)
      }
      (d(w1, "rank_biserial"), d(w2, "rank_biserial")) match {
        case (Some(r1), Some(r2)) => assert(math.abs(r1 + r2) < 1e-12)
        case (a, b) => assert(a.isEmpty && b.isEmpty)
      }
      // sign test under the same swap: pos/neg counters exchange
      val s1 = graft.probes.Probes.signTest(col("a"), col("b"))(pairs)
        .head()
      val s2 = graft.probes.Probes.signTest(col("b"), col("a"))(pairs)
        .head()
      assert(s1.getAs[Long]("n_pos") === s2.getAs[Long]("n_neg") &&
        s1.getAs[Long]("n_neg") === s2.getAs[Long]("n_pos"))
    }
    // Cochran's Q is invariant under treatment relabeling (the
    // statistic reads only the C_j multiset and the block sums)
    val blocks = (1L to 6L).flatMap(b => Seq(
      (b, "A", b % 2 == 0), (b, "B", b % 3 == 0), (b, "C", b <= 2)))
    val qAB = graft.probes.Probes.cochranQ("b", "t", col("s"))(
      blocks.toDF("b", "t", "s")).head().getAs[Double]("q")
    val qBA = graft.probes.Probes.cochranQ("b", "t", col("s"))(
      blocks.map { case (b, t, s) =>
        (b, Map("A" -> "B", "B" -> "C", "C" -> "A")(t), s) }
        .toDF("b", "t", "s")).head().getAs[Double]("q")
    assert(qAB === qBA)
  }

  test("round-18 shelf: monotone-transform invariances") {
    val gen = Gen.listOfN(24, Gen.zip(Gen.chooseNum(0, 2),
      Gen.chooseNum(-9.0, 9.0)))
    for (rows <- draws(gen, 4)) {
      val quart = rows.map { case (v, x) => (v.toLong, math.rint(x * 4) / 4) }
      val df = quart.toDF("v", "x")
      def d(r: org.apache.spark.sql.Row, c: String) =
        Option(r.getAs[java.lang.Double](c)).map(_.doubleValue())
      // Jonckheere–Terpstra rides pooled ranks: cubing x (strictly
      // increasing on R, tie-preserving) leaves J and z bit-for-bit
      val cube = col("x") * col("x") * col("x")
      val j1 = graft.probes.Probes.jonckheereTerpstra(col("v"),
        col("x"))(df).head()
      val j2 = graft.probes.Probes.jonckheereTerpstra(col("v"), cube)(
        df).head()
      assert(d(j1, "j_stat") === d(j2, "j_stat") &&
        d(j1, "z") === d(j2, "z"))
      // Dunn: the same pooled-rank property across the whole pair
      // matrix
      val p1 = graft.probes.Probes.dunnTest(col("v"), col("x"))(df)
        .orderBy("variant_a", "variant_b").collect().map(d(_, "z")).toSeq
      val p2 = graft.probes.Probes.dunnTest(col("v"), cube)(df)
        .orderBy("variant_a", "variant_b").collect().map(d(_, "z")).toSeq
      assert(p1 === p2)
      // friedmanConover: within-block ranks -> monotone transform of
      // the scores leaves every pairwise t bit-for-bit
      val bdf = quart.zipWithIndex.map { case ((_, x), i) =>
        ((i / 3).toLong, s"t${i % 3}", x) }.toDF("b", "t", "x")
      val c1 = graft.probes.Probes.friedmanConover("b", "t", col("x"))(
        bdf).orderBy("treatment_a", "treatment_b").collect()
        .map(d(_, "t")).toSeq
      val c2 = graft.probes.Probes.friedmanConover("b", "t", cube)(bdf)
        .orderBy("treatment_a", "treatment_b").collect()
        .map(d(_, "t")).toSeq
      assert(c1 === c2)
      // pageTest: the same within-block ranks -> monotone transform
      // of the scores leaves L and z bit-for-bit
      val pg1 = graft.probes.Probes.pageTest("b", "t", col("x"))(bdf)
        .head()
      val pg2 = graft.probes.Probes.pageTest("b", "t", cube)(bdf).head()
      assert(d(pg1, "l") === d(pg2, "l") && d(pg1, "z") === d(pg2, "z"))
      // log-rank and the KM survival sequence depend only on the
      // ORDER of distinct times: t -> 2t + 1 (exact in IEEE on the
      // quarter grid) leaves z and the survival sequence bit-for-bit
      val sdf = quart.map { case (v, x) =>
        (v > 0, math.abs(x), v == 2L) }.toDF("a", "t", "c")
      val l1 = graft.probes.Probes.logRankTest(col("a"), col("t"),
        col("c"))(sdf).head()
      val l2 = graft.probes.Probes.logRankTest(col("a"),
        col("t") * 2.0 + 1.0, col("c"))(sdf).head()
      assert(d(l1, "z") === d(l2, "z") &&
        d(l1, "o_minus_e") === d(l2, "o_minus_e"))
      val k1 = graft.ops.WindowOps.kaplanMeier(col("t"), col("c"))(sdf)
        .orderBy("t").collect().map(_.getAs[Double]("survival")).toSeq
      val k2 = graft.ops.WindowOps.kaplanMeier(col("t") * 2.0 + 1.0,
        col("c"))(sdf)
        .orderBy("t").collect().map(_.getAs[Double]("survival")).toSeq
      assert(k1 === k2)
    }
  }

  test("rank tests: negation anti-symmetry and side-swap complements") {
    val gen = Gen.listOfN(20, Gen.zip(Gen.chooseNum(-9, 9),
      Gen.chooseNum(-9, 9), Gen.oneOf(true, false)))
    for (rows <- draws(gen, 4)) {
      val df = rows.zipWithIndex.map { case ((x, y, a), i) =>
        ("g", i.toLong, x.toDouble, y.toDouble, a) }
        .toDF("g", "i", "x", "y", "a")
      // kendall: negating y swaps C and D EXACTLY -> tau flips bit-exactly
      val t1 = graft.probes.Probes.kendallTau("g", "i", "x", "y")(df)
        .head()
      val t2 = graft.probes.Probes.kendallTau("g", "i", "x", "yn")(
        df.withColumn("yn", -col("y"))).head()
      assert(t1.getAs[Long]("concordant") === t2.getAs[Long]("discordant"))
      (Option(t1.getAs[java.lang.Double]("tau_b")),
        Option(t2.getAs[java.lang.Double]("tau_b"))) match {
        case (Some(a), Some(b)) => assert(a.doubleValue === -b.doubleValue)
        case (a, b) => assert(a.isEmpty && b.isEmpty)
      }
      // spearman: rank reversal is an exact integer identity; the
      // final double dag may round differently -> 1e-12 tolerance
      val s1 = graft.probes.Probes.spearmanCorr("g", "x", "y")(df).head()
      val s2 = graft.probes.Probes.spearmanCorr("g", "x", "yn")(
        df.withColumn("yn", -col("y"))).head()
      (Option(s1.getAs[java.lang.Double]("rho")),
        Option(s2.getAs[java.lang.Double]("rho"))) match {
        case (Some(a), Some(b)) =>
          assert(math.abs(a.doubleValue + b.doubleValue) < 1e-12)
        case (a, b) => assert(a.isEmpty && b.isEmpty)
      }
      // mann-whitney: swapping sides complements AUC and flips delta/z
      val m1 = graft.probes.Probes.mannWhitneyU(col("a"), col("x"))(df)
        .head()
      val m2 = graft.probes.Probes.mannWhitneyU(!col("a"), col("x"))(df)
        .head()
      if (m1.getAs[Long]("n_a") > 0 && m1.getAs[Long]("n_b") > 0) {
        assert(math.abs(m1.getAs[Double]("auc") +
          m2.getAs[Double]("auc") - 1.0) < 1e-12)
        assert(math.abs(m1.getAs[Double]("cliffs_delta") +
          m2.getAs[Double]("cliffs_delta")) < 1e-12)
        // the two-sample rank-biserial r = 2U/(n_a n_b) - 1 (which IS
        // cliffs_delta) stays in [-1, 1] and agrees in sign with z —
        // both read the same exact 2U - n_a n_b numerator
        val cd = m1.getAs[Double]("cliffs_delta")
        assert(cd >= -1.0 && cd <= 1.0)
        Option(m1.getAs[java.lang.Double]("z")).foreach(z =>
          assert(math.signum(cd) === math.signum(z.doubleValue)))
      }
      // matched-pairs rank-biserial: in [-1, 1], sign agrees with z
      // (both read the exact 4W+ - n(n+1) numerator)
      val pw = graft.probes.Probes.wilcoxonSignedRank(col("x"), col("y"))(
        df).head()
      Option(pw.getAs[java.lang.Double]("rank_biserial")).foreach { rb =>
        assert(rb.doubleValue >= -1.0 && rb.doubleValue <= 1.0)
        Option(pw.getAs[java.lang.Double]("z")).foreach(z =>
          assert(math.signum(rb.doubleValue) ===
            math.signum(z.doubleValue)))
      }
      // ks: the sup gap is side-symmetric BIT-EXACTLY (|.| of exact
      // integers), and so is where it is attained
      val k1 = graft.probes.Probes.ksTest(col("a"), col("x"))(df).head()
      val k2 = graft.probes.Probes.ksTest(!col("a"), col("x"))(df).head()
      if (k1.getAs[Long]("n_a") > 0 && k1.getAs[Long]("n_b") > 0) {
        assert(k1.getAs[Double]("ks_stat") === k2.getAs[Double]("ks_stat"))
        assert(k1.getAs[Double]("ks_at") === k2.getAs[Double]("ks_at"))
      }
    }
  }

  test("bhCorrect invariants: p_adj >= p, monotone in rank, prefix rejections") {
    val gen = Gen.listOfN(12, Gen.chooseNum(0, 1000))
    for (ps <- draws(gen, 4)) {
      val df = ps.zipWithIndex.map { case (p, i) =>
        (s"t$i", p / 1000.0) }.toDF("t", "p")
      val rows = graft.probes.Probes.bhCorrect("t", "p", alpha = 0.1)(df)
        .orderBy("rank").collect()
      rows.foreach { r =>
        assert(r.getAs[Double]("p_adj") >= r.getAs[Double]("p") - 1e-15)
        assert(r.getAs[Double]("p_adj") <= 1.0)
      }
      val adj = rows.map(_.getAs[Double]("p_adj")).toSeq
      assert(adj === adj.sorted, "adjusted p must be monotone in rank")
      val rej = rows.map(_.getAs[Boolean]("reject")).toSeq
      assert(!rej.dropWhile(identity).contains(true),
        "rejections must form a prefix of the rank order")
    }
  }

  test("holtWinters with gamma = 0 IS holtSmooth, bit for bit") {
    val gen = Gen.listOfN(16, Gen.chooseNum(-50.0, 50.0))
    for (vs <- draws(gen, 4)) {
      val df = vs.zipWithIndex.map { case (v, i) =>
        (1L, java.sql.Timestamp.valueOf(f"2024-01-01 10:${i}%02d:00"),
          i.toLong, math.rint(v * 100) / 100) }
        .toDF("k", "t", "tb", "v")
      // gamma = 0 pins every seasonal slot at its zero seed, so the
      // level/trend/forecast dags collapse to Holt's exactly
      val hw = graft.ops.WindowOps.holtWinters("k", "t", "v",
        alpha = 0.3, beta = 0.1, gamma = 0.0, period = 3,
        tieBreak = "tb")(df)
        .orderBy("tb").select("level", "trend", "forecast")
        .as[(Double, Double, Double)].collect().toSeq
      val h = graft.ops.WindowOps.holtSmooth("k", "t", "v",
        alpha = 0.3, beta = 0.1, tieBreak = "tb")(df)
        .orderBy("tb").select("level", "trend", "forecast")
        .as[(Double, Double, Double)].collect().toSeq
      assert(hw === h)
      // the same collapse holds DAMPED: gamma = 0, phi = 0.8 — the
      // phi multiply lands in identical dag positions in both ops
      val hwD = graft.ops.WindowOps.holtWinters("k", "t", "v",
        alpha = 0.3, beta = 0.1, gamma = 0.0, period = 3,
        tieBreak = "tb", phi = 0.8)(df)
        .orderBy("tb").select("level", "trend", "forecast")
        .as[(Double, Double, Double)].collect().toSeq
      val hD = graft.ops.WindowOps.holtSmooth("k", "t", "v",
        alpha = 0.3, beta = 0.1, tieBreak = "tb", phi = 0.8)(df)
        .orderBy("tb").select("level", "trend", "forecast")
        .as[(Double, Double, Double)].collect().toSeq
      assert(hwD === hD)
    }
  }

  test("theilSen affine equivariance: y -> a*y + b maps the fitted line with it") {
    val gen = Gen.listOfN(12, Gen.zip(Gen.chooseNum(-20, 20),
      Gen.chooseNum(-20, 20)))
    for (pts <- draws(gen, 4)) {
      val df = pts.zipWithIndex.map { case ((x, y), i) =>
        ("g", i.toLong, x.toDouble, y.toDouble) }.toDF("g", "i", "x", "y")
      val base = graft.probes.Probes.theilSen("g", "i", "x", "y")(df)
        .head()
      val mapped = graft.probes.Probes.theilSen("g", "i", "x", "ym")(
        df.withColumn("ym", col("y") * 2.0 + 3.0)).head()
      (Option(base.getAs[java.lang.Double]("slope")),
        Option(mapped.getAs[java.lang.Double]("slope"))) match {
        case (Some(s), Some(sm)) =>
          assert(math.abs(sm.doubleValue - 2.0 * s.doubleValue) < 1e-9)
          assert(math.abs(mapped.getAs[Double]("intercept") -
            (2.0 * base.getAs[Double]("intercept") + 3.0)) < 1e-9)
        case (s, sm) => assert(s.isEmpty && sm.isEmpty)
      }
    }
  }

  test("corpusDivergence and mcnemar are symmetric under side/label swap") {
    val docGen = Gen.listOfN(10, Gen.zip(Gen.oneOf("s0", "s1"),
      Gen.listOfN(6, Gen.oneOf("a", "b", "c", "d", "e"))))
    for (docs <- draws(docGen, 4)) {
      val df = docs.map { case (s, ws) => (s, ws.mkString(" ")) }
        .toDF("source", "text")
      val swapped = docs.map { case (s, ws) =>
        (if (s == "s0") "s1" else "s0", ws.mkString(" ")) }
        .toDF("source", "text")
      def row(d: org.apache.spark.sql.DataFrame) =
        graft.ext.TextOps.corpusDivergence("source", "text", topV = 3)(d)
          .select("tvd", "hellinger", "chi_sq")
          .as[(Double, Double, Double)].collect().toSeq
      // both frames may lack a pair (all docs one source) — compare sets
      assert(row(df) === row(swapped))
    }
    val flagGen = Gen.listOfN(20, Gen.zip(Gen.oneOf(true, false),
      Gen.oneOf(true, false)))
    for (fs <- draws(flagGen, 4)) {
      val df = fs.toDF("a", "b")
      val ab = graft.probes.Probes.mcnemarTest(col("a"), col("b"))(df)
        .head()
      val ba = graft.probes.Probes.mcnemarTest(col("b"), col("a"))(df)
        .head()
      assert(ab.getAs[Long]("a_only") === ba.getAs[Long]("b_only"))
      assert(Option(ab.getAs[java.lang.Double]("chi2")) ===
        Option(ba.getAs[java.lang.Double]("chi2")))
    }
  }

  test("fleschReadability counts are additive over concatenation") {
    val wordGen = Gen.listOfN(8, Gen.oneOf("the", "cat", "sat", "br",
      "queueing", "rhythm", "a"))
    for (Seq((w1, w2)) <- draws(Gen.zip(wordGen, wordGen), 4).map(Seq(_))) {
      def counts(t: String) = {
        val r = graft.ext.TextOps.fleschReadability("id", "text")(
          Seq((1L, t)).toDF("id", "text")).head()
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_syllables"))
      }
      val (wa, sa) = counts(w1.mkString(" "))
      val (wb, sb) = counts(w2.mkString(" "))
      val (wc, sc) = counts(w1.mkString(" ") + " " + w2.mkString(" "))
      assert(wc === wa + wb && sc === sa + sb,
        "words and syllables must add over ' '-joined concatenation")
    }
  }

  test("rankBiasedOverlap invariants: bounded by the identity score, monotone in depth overlap") {
    val itemGen = Gen.listOfN(8, Gen.chooseNum(1, 20))
    for (Seq((la, lb)) <- draws(Gen.zip(itemGen, itemGen), 4).map(Seq(_))) {
      def rank(items: List[Int]) = items.distinct.zipWithIndex
        .map { case (it, i) => ("q", it.toLong, i + 1) }
      val a = rank(la).toDF("q", "i", "r")
      val b = rank(lb).toDF("q", "i", "r")
      val k = 5
      val got = graft.probes.Probes.rankBiasedOverlap(b, "q", "i", "r",
        p = 0.7, depth = k)(a).head().getAs[Double]("rbo")
      val ident = 1.0 - math.pow(0.7, k)
      assert(got >= 0.0 && got <= ident + 1e-12,
        s"rbo $got must sit in [0, 1 − p^k = $ident]")
    }
  }
}
