package graft

import graft.probes.{Probes, ProbeAssertionError}
import org.apache.spark.sql.functions.{col, concat_ws, floor, lit}

class ProbesSpec extends SparkSpec {
  import org.apache.spark.sql.functions.col

  test("verificationSuite: thresholds grade both ways, distinctness, vacuous empty pass") {
    import spark.implicits._
    val df = Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 200.0, null),
      (3L, 30.0, "c")).toDF("id", "v", "s")
    val out = graft.probes.Probes.verificationSuite(
      rowChecks = Seq(
        ("v_small", col("v") <= 100.0, 0.75),  // 3/4 = .75 — boundary PASSES
        ("s_complete", col("s").isNotNull, 1.0)), // 3/4 — FAILS
      distinctChecks = Seq(
        ("id_unique", Seq("id"), 1.0)))(df)       // 3 distinct / 4 — FAILS
      .orderBy("check_name").collect()
      .map(r => (r.getString(0), r.getLong(3), r.getBoolean(6))).toSeq
    assert(out === Seq(("id_unique", 3L, false), ("s_complete", 3L, false),
      ("v_small", 3L, true)))
    // empty input: every check passes vacuously with pass_frac 1.0
    val empty = graft.probes.Probes.verificationSuite(
      rowChecks = Seq(("any", col("v") > 0, 1.0)),
      distinctChecks = Seq(("k", Seq("id"), 1.0)))(df.filter(col("v") < 0))
      .collect()
    assert(empty.length === 2 &&
      empty.forall(r => r.getBoolean(6) && r.getDouble(4) === 1.0))
    intercept[IllegalArgumentException](
      graft.probes.Probes.verificationSuite(
        Seq(("a", col("v") > 0, 1.5)))(df))
    intercept[IllegalArgumentException](
      graft.probes.Probes.verificationSuite(
        Seq(("a", col("v") > 0, 1.0), ("a", col("v") < 0, 1.0)))(df))
  }

  import spark.implicits._

  private def df = Seq(
    ("a", "x", 1.0), ("a", "", 2.0), ("b", null, 3.0),
    ("b", "y", 3.0), ("c", "x", 5.0))
    .toDF("k", "s", "v")

  test("audit reports per-field stats in long format") {
    val out = Probes.audit(Seq("k", "s", "v"))(df).collect()
    assert(out.map(_.getAs[String]("field_name")).toSeq == Seq("k", "s", "v"))
    val s = out(1)
    assert(s.getAs[Long]("record_count") == 5L)
    assert(s.getAs[Long]("null_count") == 1L)
    assert(s.getAs[Double]("null_ratio") == 0.2)
    assert(s.getAs[Long]("empty_string_count") == 1L)
    assert(s.getAs[Long]("distinct_count") == 3L) // "", x, y — null excluded
    val v = out(2)
    assert(v.getAs[Long]("empty_string_count") == 0L) // non-string field
    assert(v.getAs[Long]("distinct_count") == 4L)
  }

  test("auditApprox tracks exact audit within HLL tolerance") {
    import spark.implicits._
    val wide = (1 to 2000).map(i => (s"k${i % 700}", i.toDouble)).toDF("k", "v")
    val exact = Probes.audit(Seq("k"))(wide).head()
    val approx = Probes.auditApprox(Seq("k"))(wide).head()
    assert(approx.getAs[Long]("record_count") === exact.getAs[Long]("record_count"))
    assert(approx.getAs[Long]("null_count") === exact.getAs[Long]("null_count"))
    val e = exact.getAs[Long]("distinct_count").toDouble
    val a = approx.getAs[Long]("approx_distinct_count").toDouble
    assert(math.abs(a - e) / e < 0.15, s"approx $a vs exact $e")
  }

  test("audit distinct threshold caps to null") {
    val out = Probes.audit(Seq("v"), distinctThreshold = 2)(df).head()
    assert(out.isNullAt(out.fieldIndex("distinct_count")))
  }

  test("countDuplicates finds groups above threshold") {
    val out = Probes.countDuplicates(Seq("k"))(df)
    assert(out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 2L, "b" -> 2L))
    assert(Probes.countDuplicates(Seq("k"), threshold = 2)(df).count() == 0)
  }

  test("duplicateStats summarizes total vs distinct") {
    val r = Probes.duplicateStats(Seq("k"))(df).head()
    assert(r.getAs[Long]("record_count") == 5L)
    assert(r.getAs[Long]("distinct_count") == 3L)
    assert(r.getAs[Long]("duplicate_count") == 2L)
  }

  test("duplicateStats counts NULL as an ordinary key value") {
    // one unique NULL-keyed row is NOT a duplicate (consistent with
    // countDuplicates/assertUnique, which group NULL as a key)
    val withNull = Seq(Some("a"), Some("a"), None).toDF("k")
    val r = Probes.duplicateStats(Seq("k"))(withNull).head()
    assert(r.getAs[Long]("record_count") == 3L)
    assert(r.getAs[Long]("distinct_count") == 2L)
    assert(r.getAs[Long]("duplicate_count") == 1L)
  }

  test("keySkew ranks heavy keys with exact shares") {
    val skewed = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold"))
      .toDF("k")
    val rows = Probes.keySkew(Seq("k"), topN = 2)(skewed)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq === Seq(("hot", 6L, 0.6), ("warm", 3L, 0.3)))
  }

  test("assertUnique passes on unique key, throws on duplicates") {
    val unique = Seq("a", "b").toDF("k")
    assert(Probes.assertUnique(Seq("k"))(unique).count() == 2)
    intercept[ProbeAssertionError](Probes.assertUnique(Seq("k"))(df))
  }

  test("assertContains / assertMissing") {
    assert(Probes.assertContains("k", "a")(df).count() == 5)
    intercept[ProbeAssertionError](Probes.assertContains("k", "zzz")(df))
    assert(Probes.assertMissing("k", "zzz")(df).count() == 5)
    intercept[ProbeAssertionError](Probes.assertMissing("k", "a")(df))
  }

  test("schemaDrift flags dropped/added columns, type flips, null-rate moves") {
    import spark.implicits._
    val before = Seq((1L, Some("x"), 1.0), (2L, None, 2.0))
      .toDF("id", "name", "score")
    val after = Seq((1L, Option.empty[String], "s1"), (2L, None, "s2"),
        (3L, None, "s3"))
      .toDF("id", "name", "tag")
      .withColumn("name", org.apache.spark.sql.functions.col("name").cast("string"))
      .withColumn("id", org.apache.spark.sql.functions.col("id").cast("int")) // type flip long -> int
    val out = Probes.schemaDrift(before, after).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("id", "name", "score", "tag"))
    // score dropped, tag added
    assert(out("score").getBoolean(1) && !out("score").getBoolean(2))
    assert(!out("tag").getBoolean(1) && out("tag").getBoolean(2))
    // id type flipped
    assert(!out("id").getBoolean(7) &&
      out("id").getString(3) === "bigint" && out("id").getString(4) === "int")
    // name went from half-null to all-null — the silent feed breakage
    assert(out("name").getDouble(5) === 0.5 && out("name").getDouble(6) === 1.0)
    assert(out("name").getBoolean(7)) // same type though
  }

  test("referentialIntegrity counts orphans and NULL FKs separately") {
    val dim = Seq(10L, 20L).toDF("pk")
    val fact = Seq(Some(10L), Some(20L), Some(20L), Some(99L), None)
      .toDF("fk")
    val r = graft.probes.Probes.referentialIntegrity(
      Seq("fk"), dim, Seq("pk"))(fact).head()
    assert(r.getLong(0) === 5L) // n_rows
    assert(r.getLong(1) === 1L) // n_null_fk
    assert(r.getLong(2) === 1L) // n_orphans (99 only; NULL is not one)
  }

  test("categoryDrift: new/vanished categories, NULL category, share arithmetic") {
    import graft.probes.Probes
    val before = Seq(Some("a"), Some("a"), Some("b"), None)
      .map(Tuple1(_)).toDF("c")
    val after = Seq(Some("a"), Some("x"), Some("x"), Some("x"))
      .map(Tuple1(_)).toDF("c")
    val out = Probes.categoryDrift("c")(before, after)
      .orderBy(col("value").asc_nulls_first).collect()
    // NULL category first: present before (1/4), vanished after
    assert(out(0).isNullAt(0) && out(0).getLong(1) === 1L &&
      out(0).getLong(2) === 0L)
    assert(out(0).getDouble(3) === 0.25 && out(0).getDouble(4) === 0.0)
    // 'a' shrank 0.5 -> 0.25: chi2 = 0.25^2 / 0.5 = 0.125
    val a = out(1)
    assert(a.getString(0) === "a" && a.getDouble(5) === -0.25 &&
      a.getDouble(6) === 0.125)
    // brand-new 'x': baseline share 0 -> chi2 NULL, visible via share
    val x = out(3)
    assert(x.getString(0) === "x" && x.getLong(1) === 0L &&
      x.getDouble(4) === 0.75 && x.isNullAt(6))
  }

  test("categoryDrift: an empty side yields NULL shares, never NaN") {
    import graft.probes.Probes
    val empty = Seq.empty[Tuple1[Option[String]]].toDF("c")
    val after = Seq(Tuple1(Some("a"))).toDF("c")
    val r = Probes.categoryDrift("c")(empty, after).head()
    assert(r.isNullAt(3) && r.getDouble(4) === 1.0)
    assert(r.isNullAt(5) && r.isNullAt(6)) // delta/chi2 inherit the NULL
  }

  test("kAnonymity emits only classes under k; NULL quasi values class together") {
    import spark.implicits._
    val t = Seq(("z1", "30s"), ("z1", "30s"), ("z1", "30s"),
      ("z2", "40s"), (null, "40s"), (null, "40s"))
      .toDF("zip", "age")
    val viol = Probes.kAnonymity(Seq("zip", "age"), k = 3)(t)
      .orderBy(col("zip").asc_nulls_first).collect()
    // (null, 40s) size 2 and (z2, 40s) size 1 violate; (z1, 30s) size 3 passes
    assert(viol.length == 2)
    assert(viol(0).isNullAt(0) && viol(0).getAs[Long]("class_size") == 2L)
    assert(viol(1).getString(0) == "z2" &&
      viol(1).getAs[Long]("class_size") == 1L)
    assert(Probes.kAnonymity(Seq("zip", "age"), k = 2)(
      t.filter(col("zip").isNotNull && col("zip") =!= "z2")).count() == 0)
  }

  test("numericDrift: binned two-sample KS — clamping, empty bins, NULL handling") {
    import spark.implicits._
    // before uniform over [0,4); after concentrated in [2,4) plus an
    // outlier far outside the range that must CLAMP into the top bin
    val before = Seq(0.5, 1.5, 2.5, 3.5).map(Tuple1(_)).toDF("v")
    val after = Seq(2.5, 3.5, 3.6, 99.0)
      .map(Tuple1(_)).toDF("v")
      .unionByName(Seq(Tuple1(null: java.lang.Double)).toDF("v"))
    val out = Probes.numericDrift("v", lo = 0.0, hi = 4.0, bins = 4)(
      before, after)
      .orderBy("bin").collect()
    // NULL dropped: after totals = 4 (2.5, 3.5, 3.6, clamped 99)
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 1L, 1L, 1L)) // n_before
    assert(out.map(_.getLong(3)).toSeq === Seq(0L, 0L, 1L, 3L)) // n_after
    // ECDFs: before 0.25/0.5/0.75/1.0, after 0/0/0.25/1.0
    assert(out.map(_.getDouble(4)).toSeq === Seq(0.25, 0.5, 0.75, 1.0))
    assert(out.map(_.getDouble(5)).toSeq === Seq(0.0, 0.0, 0.25, 1.0))
    // KS = max |delta| = 0.5 at bin 1/2, same on every row
    assert(out.map(_.getDouble(7)).distinct.toSeq === Seq(0.5))
    // an empty side reports NULL CDFs, not NaN
    val empty = Probes.numericDrift("v", 0.0, 4.0, 2)(
      before, before.filter(col("v") < -1))
      .orderBy("bin").collect()
    assert(empty.forall(r => r.isNullAt(5) && r.isNullAt(6)))
    intercept[IllegalArgumentException] {
      Probes.numericDrift("v", 4.0, 0.0, 2)(before, after)
    }
  }

  test("kAnonymize: suppress + generalize release views pass kAnonymity by construction") {
    import spark.implicits._
    val t = Seq(
      ("z1", 31, "a"), ("z1", 33, "b"), ("z1", 38, "c"),  // 30s band of 3
      ("z2", 44, "d"),                                     // singleton: suppressed
      (null.asInstanceOf[String], 47, "e"),                // NULL-zip band of 2:
      (null.asInstanceOf[String], 42, "f"))                // anonymous, KEPT
      .toDF("zip", "age", "payload")
    // suppress-only on raw (zip, age): every class is a singleton
    val raw = Probes.kAnonymize(Seq("zip", "age"), k = 2)(t)
    assert(raw.count() === 0)
    // generalize age to decade bands, then suppress what remains under k
    val gen = Probes.kAnonymize(Seq("zip", "age"), k = 2,
      generalizations = Map("age" -> (floor(col("age") / 10) * 10)))(t)
    val kept = gen.orderBy(col("payload")).collect()
    // (z1, 30) class of 3 and the NULL-zip 40s class of 2 survive — the
    // NULL class is anonymous, not collateral damage of a null-dropping
    // equi-join; (z2, 40) is a singleton and is suppressed
    assert(kept.map(_.getString(2)).toSeq === Seq("a", "b", "c", "e", "f"))
    // released view carries the GENERALIZED ages, never the raw values
    assert(kept.map(_.getLong(1)).toSet === Set(30L, 40L))
    // the contract: kAnonymity over the released view is empty
    assert(Probes.kAnonymity(Seq("zip", "age"), k = 2)(gen).count() === 0)
    // generalizations must target quasi columns
    intercept[IllegalArgumentException] {
      Probes.kAnonymize(Seq("zip"), k = 2,
        generalizations = Map("payload" -> lit(0)))(t)
    }
  }

  test("lDiversity counts distinct non-NULL sensitive values per class") {
    import spark.implicits._
    val t = Seq(
      ("z1", "flu"), ("z1", "flu"), ("z1", "flu"),     // homogeneous: leaks
      ("z2", "flu"), ("z2", "cold"),                   // diverse: passes l=2
      ("z3", null), ("z3", "flu"))                     // NULL adds no diversity
      .toDF("zip", "dx")
    val out = Probes.lDiversity(Seq("zip"), "dx", l = 2)(t)
      .orderBy("zip").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("z1", "z3"))
    assert(out(0).getAs[Long]("class_size") == 3L &&
      out(0).getAs[Long]("distinct_sensitive") == 1L)
    assert(out(1).getAs[Long]("distinct_sensitive") == 1L)
    intercept[IllegalArgumentException] {
      Probes.lDiversity(Seq("dx"), "dx", l = 2)(t)
    }
  }

  test("joinCardinality: exact per-key products, heaviest first, NULL keys out") {
    import spark.implicits._
    val l = Seq("a", "a", "a", "b", "c", null).map(Tuple1(_)).toDF("k")
    val r = Seq("a", "a", "b", "b", "b", null, "d").map(Tuple1(_)).toDF("rk")
    val out = Probes.joinCardinality(Seq("k"), r, Seq("rk"))(l).collect()
    // a: 3×2=6, b: 1×3=3; c and d have no partner; NULLs never join
    assert(out.map(x => (x.getString(0), x.getAs[Long]("left_rows"),
      x.getAs[Long]("right_rows"), x.getAs[Long]("out_rows"))).toSeq ==
      Seq(("a", 3L, 2L, 6L), ("b", 1L, 3L, 3L)))
    // topN truncates after the deterministic (out_rows desc, key) order
    val top1 = Probes.joinCardinality(Seq("k"), r, Seq("rk"), topN = 1)(l)
    assert(top1.head().getString(0) == "a")
  }

  test("labelAgreement: hand-computed kappa, NULL exclusion, degenerate pe = 1") {
    import spark.implicits._
    // confusion: a/a ×3, a/b ×1, b/b ×2, b/a ×2 → n=8, agree=5
    // marginals A: a=4, b=4; B: a=5, b=3 → pe = (4·5 + 4·3)/64 = 0.5
    // kappa = (0.625 − 0.5)/0.5 = 0.25
    val df = Seq(
      ("a", "a"), ("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"), ("b", "b"), ("b", "a"), ("b", "a"),
      ("a", null), (null, "b") // NULL on either side excluded
    ).toDF("la", "lb")
    val r = Probes.labelAgreement(col("la"), col("lb"))(df).head()
    assert(r.getLong(0) === 8L && r.getLong(1) === 5L)
    assert(r.getDouble(2) === 0.625 && r.getDouble(3) === 0.5)
    assert(r.getDouble(4) === 0.25)
    // single shared class: pe = 1 → kappa NULL, never a 0/0 NaN
    val degen = Seq(("x", "x"), ("x", "x")).toDF("la", "lb")
    val d = Probes.labelAgreement(col("la"), col("lb"))(degen).head()
    assert(d.getDouble(3) === 1.0 && d.isNullAt(4))
  }

  test("concentration: HHI arithmetic, NULL category, effective count") {
    import spark.implicits._
    val df = Seq(
      ("g1", Some("a")), ("g1", Some("a")), ("g1", Some("b")),
      ("g1", Some("b")),                 // two equal cats -> hhi 0.5
      ("g2", Some("x")), ("g2", Some("x")), ("g2", Some("x")),
      ("g2", None)                       // NULL is a category: 3²+1² /16
    ).toDF("g", "c")
    val out = Probes.concentration(Seq("g"), "c")(df)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out("g1") === (4L, 2L, 0.5, 2.0))
    assert(out("g2") === (4L, 2L, 10.0 / 16, 16.0 / 10))
  }

  test("gini: exact sorted-rank formula, tie invariance, degenerate groups") {
    import spark.implicits._
    val df = Seq(
      ("eq", 5L), ("eq", 5L), ("eq", 5L),       // equal -> gini 0
      ("one", 0L), ("one", 0L), ("one", 9L),    // one owner -> (n-1)/n
      ("mix", 1L), ("mix", 2L), ("mix", 3L),
      ("zero", 0L), ("zero", 0L)                // Σx = 0 -> NULL
    ).toDF("g", "x")
    val out = Probes.gini(Seq("g"), "x")(df)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(out("eq") === (3L, Some(0.0)))
    assert(out("one") === (3L, Some(2.0 / 3)))
    // 1,2,3: G = (2(1+4+9) − 4·6)/(3·6) = 4/18
    assert(out("mix") === (3L, Some(4.0 / 18)))
    assert(out("zero") === (2L, None))
  }

  test("scoreCalibration groupCols: independent per-group bins and ECE") {
    import spark.implicits._
    val df = Seq(
      // g1: perfectly calibrated hard predictor -> ece 0
      ("g1", 0.0, false), ("g1", 0.0, false), ("g1", 1.0, true),
      // g2: anti-calibrated -> ece 1
      ("g2", 0.0, true), ("g2", 1.0, false)
    ).toDF("g", "s", "y")
    val rows = Probes.scoreCalibration(col("s"), col("y"), bins = 2,
      groupCols = Seq("g"))(df).collect()
    val eceByGroup = rows.map(r => r.getString(0) -> r.getDouble(6))
      .toMap
    assert(eceByGroup("g1") === 0.0 && eceByGroup("g2") === 1.0)
    // every row of a group carries that group's ece, and bins stay
    // within-group (g2's bin 0 has n=1, not g1's 2)
    val g2b0 = rows.find(r => r.getString(0) == "g2" && r.getInt(1) == 0)
      .get
    assert(g2b0.getLong(2) === 1L && g2b0.getDouble(4) === 1.0)
  }

  test("confusionMatrix: exact counts and per-class row shares") {
    import spark.implicits._
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"), (null, "a"), ("a", null)).toDF("la", "lb")
    val m = Probes.confusionMatrix(col("la"), col("lb"))(df)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(m(("a", "a")) === (2L, 2.0 / 3))
    assert(m(("a", "b")) === (1L, 1.0 / 3))
    assert(m(("b", "b")) === (1L, 1.0))
    assert(m.size === 3) // NULL rows excluded on either side
  }

  test("scoreCalibration: bin edges, quantized means, ECE fold, perfect predictor") {
    import spark.implicits._
    // bins=2: scores < 0.5 → bin 0, ≥ 0.5 → bin 1; score 1.0 clamps into
    // the top bin rather than creating a phantom bin 2
    val df = Seq(
      (0.1, false), (0.3, false), (0.4, true),   // bin 0: mean .2666…, rate 1/3
      (0.6, true), (1.0, true)                    // bin 1: mean 0.8, rate 1.0
    ).toDF("s", "y")
    val rows = Probes.scoreCalibration(col("s"), col("y"), bins = 2)(df)
      .collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(0, 1))
    val b0 = rows(0); val b1 = rows(1)
    assert(b0.getLong(1) === 3L && b1.getLong(1) === 2L)
    // quantized-exact means: (0.1+0.3+0.4)/3 and (0.6+1.0)/2 on 1e-9 grid
    assert(math.abs(b0.getDouble(2) - 0.8 / 3) < 1e-9)
    assert(b1.getDouble(2) === 0.8)
    assert(b0.getDouble(3) === 1.0 / 3 && b1.getDouble(3) === 1.0)
    // ECE = (3·|0.2666−0.3333| + 2·|0.8−1.0|)/5, both rows carry it
    val ece = (3.0 * b0.getDouble(4) + 2.0 * b1.getDouble(4)) / 5.0
    assert(math.abs(b0.getDouble(5) - ece) < 1e-12)
    assert(b0.getDouble(5) === b1.getDouble(5))
    // a perfectly calibrated hard predictor: score == empirical rate
    val perfect = Seq((0.0, false), (0.0, false), (1.0, true))
      .toDF("s", "y")
    val p = Probes.scoreCalibration(col("s"), col("y"), bins = 2)(perfect)
      .head()
    assert(p.getDouble(5) === 0.0)
    // r13 ADVICE: an out-of-contract negative score clamps into bin 0
    // (both-edge clamp) — no negative bin row, and it feeds the ECE
    val neg = Seq((-0.5, false), (0.9, true)).toDF("s", "y")
    val nr = Probes.scoreCalibration(col("s"), col("y"), bins = 2)(neg)
      .collect()
    assert(nr.map(_.getInt(0)).toSeq === Seq(0, 1)) // no bin -1
    assert(nr(0).getLong(1) === 1L)
  }

  test("isotonicCalibration: hand-checked PAV fixture, monotone, clamp/NULL doctrine") {
    import spark.implicits._
    // observed bins 1,3,5,8 with rates [.5, 1, 0, 1]: PAV pools the
    // (1, 0) violation with the leading .5 into one .5 block →
    // calibrated = [.5, .5, .5, 1]
    val df = Seq(
      (0.15, true), (0.15, false),
      (0.35, true), (0.35, true),
      (0.55, false), (0.55, false),
      (0.85, true), (0.85, true)).toDF("s", "y")
    val rows = Probes.isotonicCalibration(col("s"), col("y"), bins = 10)(df)
      .orderBy("bin").collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 3, 5, 8))
    assert(rows.map(_.getAs[Long]("n")).toSeq === Seq(2L, 2L, 2L, 2L))
    assert(rows.map(_.getAs[Long]("k")).toSeq === Seq(1L, 2L, 0L, 2L))
    assert(rows.map(_.getAs[Double]("rate")).toSeq === Seq(0.5, 1.0, 0.0, 1.0))
    assert(rows.map(_.getAs[Double]("calibrated")).toSeq ===
      Seq(0.5, 0.5, 0.5, 1.0))
    // monotone non-decreasing by construction
    val cal = rows.map(_.getAs[Double]("calibrated"))
    assert(cal.zip(cal.tail).forall { case (a, b) => a <= b })
    // already-monotone input is a fixpoint: calibrated == rate
    val mono = Seq((0.1, false), (0.1, false), (0.9, true), (0.9, false))
      .toDF("s", "y")
    val mrows = Probes.isotonicCalibration(col("s"), col("y"), bins = 10)(mono)
      .orderBy("bin").collect()
    assert(mrows.map(r => r.getAs[Double]("calibrated")).toSeq ===
      mrows.map(r => r.getAs[Double]("rate")).toSeq)
    // NULL score/label rows drop; out-of-range scores clamp both edges
    val edge = Seq((Some(-0.3), Some(false)), (Some(1.7), Some(true)),
      (None, Some(true)), (Some(0.5), Option.empty[Boolean]))
      .toDF("s", "y")
    val erows = Probes.isotonicCalibration(col("s"), col("y"), bins = 10)(edge)
      .orderBy("bin").collect()
    assert(erows.map(_.getInt(0)).toSeq === Seq(0, 9))
    assert(erows.map(_.getAs[Long]("n")).sum === 2L)
    // per-group fits are independent
    val grouped = Seq(("a", 0.2, true), ("a", 0.8, false),
      ("b", 0.2, false), ("b", 0.8, true)).toDF("g", "s", "y")
    val g = Probes.isotonicCalibration(col("s"), col("y"), bins = 10,
      groupCols = Seq("g"))(grouped).orderBy("g", "bin").collect()
    // group a violates (1 then 0) → pooled to .5/.5; group b is monotone
    assert(g.map(r => (r.getString(0), r.getAs[Double]("calibrated"))).toSeq
      === Seq(("a", 0.5), ("a", 0.5), ("b", 0.0), ("b", 1.0)))
    intercept[IllegalArgumentException](
      Probes.isotonicCalibration(col("s"), col("y"), bins = 0)(df))
  }

  test("quarantine: NULL predicate violates, reasons keep rule order, clean is empty") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1, Option(5.0), Option("a")),
      (2, Option(-1.0), Option.empty[String]), // fails both
      (3, Option.empty[Double], Option("a")))  // NULL value -> violation
      .toDF("id", "v", "s")
    val out = graft.probes.Probes.quarantine(Seq(
      "v_nonneg" -> (col("v") >= 0),
      "s_present" -> col("s").isNotNull))(df)
      .orderBy("id").select("id", "quarantine_reasons")
      .as[(Int, String)].collect()
    assert(out.toSeq === Seq(1 -> "", 2 -> "v_nonneg,s_present",
      3 -> "v_nonneg"))
    // the split is a partition: clean + quarantined = all, no overlap
    val q = graft.probes.Probes.quarantine(Seq("v_nonneg" -> (col("v") >= 0)))(df)
    assert(q.filter(col("quarantine_reasons") === "").count() +
      q.filter(col("quarantine_reasons") =!= "").count() === 3L)
    intercept[IllegalArgumentException](
      graft.probes.Probes.quarantine(Nil)(df))
    intercept[IllegalArgumentException](
      graft.probes.Probes.quarantine(Seq("a" -> lit(true), "a" -> lit(false)))(df))
  }

  test("rocAuc: hand-computed mid-rank AUC, ties, NULLs, degenerate groups") {
    import spark.implicits._
    // perfect separation -> 1.0
    val perfect = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
      .toDF("s", "l")
    assert(Probes.rocAuc(col("s"), col("l"))(perfect)
      .select("auc").as[Double].head() === 1.0)
    // ties get mid-rank credit: scores [1,2,2,3], labels [0,1,0,1]
    // pairwise wins: (1 + 0.5 + 1 + 1) / 4 = 0.875
    val tied = Seq((1.0, false), (2.0, true), (2.0, false), (3.0, true))
      .toDF("s", "l")
    val r = Probes.rocAuc(col("s"), col("l"))(tied).head()
    assert(r.getAs[Long]("n") === 4L && r.getAs[Long]("n_pos") === 2L &&
      r.getAs[Long]("n_neg") === 2L && r.getAs[Double]("auc") === 0.875)
    // NULL score/label rows drop; one-class group -> NULL auc
    val degenerate = Seq((Option(1.0), Option(true)),
      (Option(2.0), Option(true)), (Option.empty[Double], Option(false)),
      (Option(3.0), Option.empty[Boolean])).toDF("s", "l")
    val d = Probes.rocAuc(col("s"), col("l"))(degenerate).head()
    assert(d.getAs[Long]("n") === 2L && d.isNullAt(d.fieldIndex("auc")))
    // grouped: independent AUCs per group
    val grouped = Seq(("a", 1.0, false), ("a", 2.0, true),
      ("b", 1.0, true), ("b", 2.0, false)).toDF("g", "s", "l")
    val byG = Probes.rocAuc(col("s"), col("l"), Seq("g"))(grouped)
      .orderBy("g").select("auc").as[Double].collect()
    assert(byG.toSeq === Seq(1.0, 0.0))
  }

  test("prAuc: step-interpolated AP, tie blocks, rare-positive behavior") {
    import spark.implicits._
    // ranked desc: pos@1 (P=1), neg, pos@3 (P=2/3) -> AP = (1 + 2/3)/2
    val df = Seq((4.0, true), (3.0, false), (2.0, true), (1.0, false))
      .toDF("s", "l")
    val ap = Probes.prAuc(col("s"), col("l"))(df)
      .select("ap").as[Double].head()
    assert(math.abs(ap - (1.0 + 2.0 / 3.0) / 2.0) < 1e-15)
    // a tied block lands at once: [2:pos, 2:neg] -> P at block end = 1/2
    val tied = Seq((2.0, true), (2.0, false)).toDF("s", "l")
    assert(Probes.prAuc(col("s"), col("l"))(tied)
      .select("ap").as[Double].head() === 0.5)
    // no positives -> NULL (undefined, not zero)
    val noPos = Seq((1.0, false), (2.0, false)).toDF("s", "l")
    assert(Probes.prAuc(col("s"), col("l"))(noPos).head()
      .isNullAt(2))
    // AP is rank-only: any monotone rescaling of scores is invariant
    val scaled = df.withColumn("s", col("s") * 100.0 + 7.0)
    assert(Probes.prAuc(col("s"), col("l"))(scaled)
      .select("ap").as[Double].head() === ap)
  }

  test("benfordDigits: floor-then-first-digit, non-positive drop, share sums") {
    import spark.implicits._
    val df = Seq(1.0, 19.5, 23.0, 2999.9, 0.4, 0.0, -5.0)
      .toDF("v")
    val out = Probes.benfordDigits(col("v"))(df)
      .orderBy("digit").collect()
    // kept: 1, 19, 23, 2999 -> digits 1 (x2), 2 (x2)
    assert(out.map(_.getAs[Int]("digit")).toSeq === Seq(1, 2))
    assert(out.map(_.getAs[Long]("n")).toSeq === Seq(2L, 2L))
    assert(out.map(_.getAs[Double]("share")).toSeq === Seq(0.5, 0.5))
    assert(out(0).getAs[Double]("expected") === math.log10(2.0))
    assert(out(0).getAs[Double]("deviation") ===
      0.5 - math.log10(2.0))
    // shares sum to 1 within a group
    val shares = Probes.benfordDigits(col("v"), Seq("g"))(
      Seq(("a", 123.0), ("a", 456.0), ("b", 789.0)).toDF("g", "v"))
      .groupBy("g").agg(org.apache.spark.sql.functions.sum("share"))
      .orderBy("g").collect().map(_.getDouble(1))
    assert(shares.forall(s => math.abs(s - 1.0) < 1e-15))
    // r14 ADVICE: values ≥ 2^63 drop instead of saturating the long
    // cast to a silent digit-9 misclassification
    val huge = Seq(1e19, 9.3e18, 42.0).toDF("v")
    val hr = Probes.benfordDigits(col("v"))(huge).collect()
    assert(hr.map(_.getAs[Int]("digit")).toSeq === Seq(4))
    assert(hr.head.getAs[Double]("share") === 1.0)
  }

  test("chiSquareSelect: hand chi2 incl. absent cells, independence, NULL doctrine") {
    import spark.implicits._
    // 2x2 with an ABSENT (B, y) cell: chi2 = 4/3 only if the empty
    // cell's expected mass is counted (the sum-o2/e - N identity)
    val df = Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "x"))
      .toDF("f1", "lab")
    val r = Probes.chiSquareSelect(Seq("f1"), col("lab"))(df).head()
    assert(r.getAs[String]("feature") === "f1" && r.getAs[Long]("n") === 4L)
    assert(math.abs(r.getAs[Double]("chi2") - 4.0 / 3.0) < 1e-12)
    assert(r.getAs[Long]("dof") === 1L)
    assert(math.abs(r.getAs[Double]("cramers_v") - math.sqrt(1.0 / 3.0))
      < 1e-12)
    // a perfectly independent feature scores ~0
    val ind = Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "y"))
      .toDF("f1", "lab")
    assert(math.abs(Probes.chiSquareSelect(Seq("f1"), col("lab"))(ind)
      .head().getAs[Double]("chi2")) < 1e-12)
    // NULL label rows drop; NULL feature value is its own category;
    // single-valued feature -> dof 0, NULL V
    val nulls = Seq((Option("A"), Option("x")),
      (Option.empty[String], Option("y")),
      (Option("A"), Option.empty[String])).toDF("f1", "lab")
    val nr = Probes.chiSquareSelect(Seq("f1"), col("lab"))(nulls).head()
    assert(nr.getAs[Long]("n") === 2L && nr.getAs[Long]("dof") === 1L)
    val const = Seq(("A", "x"), ("A", "y")).toDF("f1", "lab")
    val cr = Probes.chiSquareSelect(Seq("f1"), col("lab"))(const).head()
    assert(cr.getAs[Long]("dof") === 0L &&
      cr.isNullAt(cr.fieldIndex("cramers_v")))
    // two features, one scan, one row each
    assert(Probes.chiSquareSelect(Seq("f1", "lab"), col("lab"))(df)
      .count() === 2L)
    intercept[IllegalArgumentException](
      Probes.chiSquareSelect(Nil, col("lab"))(df))
    // r14 ADVICE: duplicate feature names fail fast instead of hitting
    // Spark's map-key dedup policy at runtime
    intercept[IllegalArgumentException](
      Probes.chiSquareSelect(Seq("f1", "f1"), col("lab"))(df))
  }

  test("fleissKappa: hand-checked fixture, perfect/degenerate cases, variable n") {
    import spark.implicits._
    // items A(x,x,x) B(x,x,y) C(x,y,y): P̄ = 5/9 AND P_e = 5/9 → κ = 0
    val df = Seq(
      ("A", "x"), ("A", "x"), ("A", "x"),
      ("B", "x"), ("B", "x"), ("B", "y"),
      ("C", "x"), ("C", "y"), ("C", "y")).toDF("i", "l")
    val r = Probes.fleissKappa(col("i"), col("l"))(df).head()
    assert(r.getAs[Long]("n_items") === 3L && r.getAs[Long]("n_ratings") === 9L)
    assert(math.abs(r.getAs[Double]("p_bar") - 5.0 / 9.0) < 1e-15)
    assert(math.abs(r.getAs[Double]("p_e") - 5.0 / 9.0) < 1e-15)
    assert(math.abs(r.getAs[Double]("kappa")) < 1e-12)
    // perfect agreement across two categories → κ = 1
    val perfect = Seq(("A", "x"), ("A", "x"), ("B", "y"), ("B", "y"))
      .toDF("i", "l")
    assert(Probes.fleissKappa(col("i"), col("l"))(perfect)
      .head().getAs[Double]("kappa") === 1.0)
    // one category everywhere → P_e = 1 → NULL κ
    val mono = Seq(("A", "x"), ("A", "x"), ("B", "x"), ("B", "x"))
      .toDF("i", "l")
    val m = Probes.fleissKappa(col("i"), col("l"))(mono).head()
    assert(m.isNullAt(m.fieldIndex("kappa")))
    // single-rating items drop entirely (from counts AND marginals)
    val withSingleton = df.unionByName(Seq(("D", "z")).toDF("i", "l"))
    val s = Probes.fleissKappa(col("i"), col("l"))(withSingleton).head()
    assert(s.getAs[Long]("n_items") === 3L &&
      s.getAs[Long]("n_ratings") === 9L &&
      math.abs(s.getAs[Double]("kappa")) < 1e-12)
    // variable n: item D with 4 raters joins the pool; NULLs drop
    val varN = df.unionByName(Seq(("D", "y"), ("D", "y"), ("D", "y"),
      ("D", "y")).toDF("i", "l"))
      .unionByName(Seq((Option.empty[String], Option("x")),
        (Option("E"), Option.empty[String])).toDF("i", "l"))
    val v = Probes.fleissKappa(col("i"), col("l"))(varN).head()
    assert(v.getAs[Long]("n_items") === 4L &&
      v.getAs[Long]("n_ratings") === 13L)
    // D is pure agreement: P̄ rises above the κ=0 fixture's 5/9
    assert(v.getAs[Double]("p_bar") > 5.0 / 9.0)
    // grouped: independent κ per group
    val g = Probes.fleissKappa(col("i"), col("l"), Seq("g"))(
      df.withColumn("g", lit("a"))
        .unionByName(perfect.withColumn("g", lit("b"))))
      .orderBy("g").collect()
    assert(math.abs(g(0).getAs[Double]("kappa")) < 1e-12 &&
      g(1).getAs[Double]("kappa") === 1.0)
  }

  test("krippendorffAlpha: hand-checked nominal fixture, degenerate cases, vs kappa") {
    import spark.implicits._
    // items A(x,x) B(x,y) C(y,y): A = 2+0+2 = 4, N = 6,
    // n_x = n_y = 3 → Σn_c² = 18; D_o = 2/6, D_e = 18/30 → α = 4/9
    val df = Seq(("A", "x"), ("A", "x"), ("B", "x"), ("B", "y"),
      ("C", "y"), ("C", "y")).toDF("i", "l")
    val r = Probes.krippendorffAlpha(col("i"), col("l"))(df).head()
    assert(r.getAs[Long]("n_items") === 3L &&
      r.getAs[Long]("n_ratings") === 6L)
    assert(math.abs(r.getAs[Double]("d_o") - 1.0 / 3.0) < 1e-15)
    assert(math.abs(r.getAs[Double]("d_e") - 0.6) < 1e-15)
    assert(math.abs(r.getAs[Double]("alpha") - 4.0 / 9.0) < 1e-14)
    // α applies the small-sample pairing correction κ lacks: on this
    // fixture κ = 1/3 < α = 4/9
    val k = Probes.fleissKappa(col("i"), col("l"))(df).head()
      .getAs[Double]("kappa")
    assert(math.abs(k - 1.0 / 3.0) < 1e-12 &&
      r.getAs[Double]("alpha") > k)
    // perfect agreement → α = 1; one category everywhere → D_e = 0 →
    // NULL; a lone 2-rating disagreeing item → α = 0 (pure chance)
    val perfect = Seq(("A", "x"), ("A", "x"), ("B", "y"), ("B", "y"))
      .toDF("i", "l")
    assert(Probes.krippendorffAlpha(col("i"), col("l"))(perfect)
      .head().getAs[Double]("alpha") === 1.0)
    val mono = Seq(("A", "x"), ("A", "x"), ("B", "x"), ("B", "x"))
      .toDF("i", "l")
    val m = Probes.krippendorffAlpha(col("i"), col("l"))(mono).head()
    assert(m.isNullAt(m.fieldIndex("alpha")))
    val lone = Seq(("A", "x"), ("A", "y")).toDF("i", "l")
    assert(Probes.krippendorffAlpha(col("i"), col("l"))(lone)
      .head().getAs[Double]("alpha") === 0.0)
    // single-rating items and NULLs drop (the missing-data robustness
    // α exists for); grouped: independent α per group
    val noisy = df.unionByName(Seq(("D", "z")).toDF("i", "l"))
      .unionByName(Seq((Option.empty[String], Option("x")),
        (Option("E"), Option.empty[String])).toDF("i", "l"))
    val n2 = Probes.krippendorffAlpha(col("i"), col("l"))(noisy).head()
    assert(n2.getAs[Long]("n_items") === 3L &&
      n2.getAs[Long]("n_ratings") === 6L &&
      math.abs(n2.getAs[Double]("alpha") - 4.0 / 9.0) < 1e-14)
    val g = Probes.krippendorffAlpha(col("i"), col("l"), Seq("g"))(
      df.withColumn("g", lit("a"))
        .unionByName(perfect.withColumn("g", lit("b"))))
      .orderBy("g").collect()
    assert(math.abs(g(0).getAs[Double]("alpha") - 4.0 / 9.0) < 1e-14 &&
      g(1).getAs[Double]("alpha") === 1.0)
    // production mode parity
    val fast = Probes.krippendorffAlpha(col("i"), col("l"),
      exactOrder = false)(df).head()
    assert(math.abs(fast.getAs[Double]("alpha") -
      r.getAs[Double]("alpha")) < 1e-12)
  }

  test("krippendorffAlphaWeighted: hand ordinal/interval, nominal reduction, guard") {
    import spark.implicits._
    // 4 kept items on a 1-3 scale + one single-rating item (drops);
    // exact-rational reference (independent fractions arithmetic):
    //   nominal:  D_o = 6/11,   D_e = 39/55, α = 3/13
    //   ordinal:  D_o = 192/11, D_e = 96/5,  α = 1/11
    //   interval: D_o = 12/11,  D_e = 6/5,   α = 1/11
    val r = Seq((1, 1.0), (1, 1.0), (1, 2.0), (2, 2.0), (2, 2.0),
      (2, 2.0), (3, 1.0), (3, 3.0), (4, 3.0), (4, 3.0), (4, 2.0),
      (5, 1.0)).toDF("item", "v")
    def run(metric: String) =
      Probes.krippendorffAlphaWeighted(col("item"), col("v"), metric)(r)
        .head()
    val nom = run("nominal")
    assert(nom.getAs[Long]("n_items") === 4L &&
      nom.getAs[Long]("n_ratings") === 11L)
    assert(math.abs(nom.getAs[Double]("d_o") - 6.0 / 11.0) < 1e-12)
    assert(math.abs(nom.getAs[Double]("alpha") - 3.0 / 13.0) < 1e-12)
    val ord = run("ordinal")
    assert(math.abs(ord.getAs[Double]("d_o") - 192.0 / 11.0) < 1e-9)
    assert(math.abs(ord.getAs[Double]("d_e") - 19.2) < 1e-9)
    assert(math.abs(ord.getAs[Double]("alpha") - 1.0 / 11.0) < 1e-12)
    val itv = run("interval")
    assert(math.abs(itv.getAs[Double]("d_o") - 12.0 / 11.0) < 1e-12)
    assert(math.abs(itv.getAs[Double]("alpha") - 1.0 / 11.0) < 1e-12)
    // the nominal metric reduces to krippendorffAlpha (different dag,
    // same mathematics)
    val base = Probes.krippendorffAlpha(col("item"), col("v"))(r).head()
    assert(math.abs(nom.getAs[Double]("alpha") -
      base.getAs[Double]("alpha")) < 1e-12)
    // binary labels: interval ≡ nominal BIT FOR BIT (the only pair's
    // distance is (0−1)² = 1.0 exactly — same fold values)
    val bin = Seq((1, 0.0), (1, 1.0), (2, 1.0), (2, 1.0), (3, 0.0),
      (3, 0.0), (3, 1.0)).toDF("item", "v")
    val bi = Probes.krippendorffAlphaWeighted(col("item"), col("v"),
      "interval")(bin).head()
    val bn = Probes.krippendorffAlphaWeighted(col("item"), col("v"),
      "nominal")(bin).head()
    assert(bi.getAs[Double]("alpha") === bn.getAs[Double]("alpha"))
    // production mode within float noise of the pinned fold
    val fastW = Probes.krippendorffAlphaWeighted(col("item"), col("v"),
      "ordinal", exactOrder = false)(r).head()
    assert(math.abs(fastW.getAs[Double]("alpha") -
      ord.getAs[Double]("alpha")) < 1e-12)
    // the |V| guard raises loudly; a bad metric rejects
    val wide = (1 to 40).flatMap(i =>
      Seq((i / 2, i.toDouble), (i / 2, i + 0.5))).toDF("item", "v")
    val ex = intercept[Exception] {
      Probes.krippendorffAlphaWeighted(col("item"), col("v"), "ordinal",
        maxLabels = 8)(wide).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("maxLabels")),
      s"expected the |V| guard, got: ${msgs(ex).mkString(" | ")}")
    intercept[IllegalArgumentException](
      Probes.krippendorffAlphaWeighted(col("item"), col("v"), "euclid")(r))
  }

  test("fleissKappa exactOrder=false: plain-sum mode within 1e-12 of exact") {
    import spark.implicits._
    // large-ish mixed fixture: 60 items × 3-5 raters, 4 categories
    val rows = for {
      i <- 1 to 60
      r <- 1 to (3 + i % 3)
    } yield (s"item$i", s"cat${(i * 7 + r * 13) % 4}")
    val df = rows.toDF("i", "l").repartition(7)
    val exact = Probes.fleissKappa(col("i"), col("l"))(df).head()
    val fast =
      Probes.fleissKappa(col("i"), col("l"), exactOrder = false)(df).head()
    for (f <- Seq("p_bar", "p_e", "kappa"))
      assert(math.abs(exact.getAs[Double](f) - fast.getAs[Double](f)) < 1e-12,
        s"field $f diverged")
    assert(exact.getAs[Long]("n_items") === fast.getAs[Long]("n_items"))
    assert(exact.getAs[Long]("n_ratings") === fast.getAs[Long]("n_ratings"))
  }

  test("bootstrapCI: deterministic, exact on constants, Poisson weight sanity") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("k", "v")
    val r = Probes.bootstrapCI(col("k"), col("v"), reps = 100)(df).head()
    assert(r.getAs[Long]("n") === 100L)
    assert(r.getAs[Double]("mean") === 50.5)
    assert(r.getAs[Long]("reps") === 100L)
    assert(r.getAs[Double]("ci_low") < 50.5 &&
      r.getAs[Double]("ci_high") > 50.5)
    // the interval is a plausible bootstrap band for mean of U(1..100):
    // se ≈ 2.9, so ±3·se bounds it generously
    assert(r.getAs[Double]("ci_low") > 50.5 - 9.0 &&
      r.getAs[Double]("ci_high") < 50.5 + 9.0)
    // rerun-identical (hash draws, not RNG) — even repartitioned
    val r2 = Probes.bootstrapCI(col("k"), col("v"), reps = 100)(
      df.repartition(7)).head()
    assert(r.toSeq === r2.toSeq)
    // constant values: every resample mean IS the constant — exact band
    val const = (1 to 50).map(i => (i.toLong, 7.25)).toDF("k", "v")
    val c = Probes.bootstrapCI(col("k"), col("v"), reps = 50)(const).head()
    assert(c.getAs[Double]("mean") === 7.25 &&
      c.getAs[Double]("ci_low") === 7.25 &&
      c.getAs[Double]("ci_high") === 7.25)
    // Poisson(1) weights: total resample weight averages ≈ n
    val sw = df.select(col("k"),
      org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.sequence(lit(0), lit(99))).as("rep"))
      .withColumn("w", Probes.poissonWeight(
        graft.functions.GraftFunctions.md5Prefix32(
          org.apache.spark.sql.functions.concat(
            col("k").cast("string"), lit("_"), col("rep")), "bs")))
      .agg(org.apache.spark.sql.functions.sum("w")).head().getLong(0)
    assert(sw > 9000 && sw < 11000, s"Σw = $sw over 100 reps × 100 rows")
    // grouped: independent intervals; NULL values drop
    val grouped = Seq(("a", 1L, Some(1.0)), ("a", 2L, Some(3.0)),
      ("b", 3L, Some(10.0)), ("b", 4L, Option.empty[Double]))
      .toDF("g", "k", "v")
    val gr = Probes.bootstrapCI(col("k"), col("v"), reps = 20,
      groupCols = Seq("g"))(grouped).orderBy("g").collect()
    assert(gr.length === 2 && gr(1).getAs[Long]("n") === 1L &&
      gr(1).getAs[Double]("mean") === 10.0)
    intercept[IllegalArgumentException](
      Probes.bootstrapCI(col("k"), col("v"), reps = 5)(df))
    intercept[IllegalArgumentException](
      Probes.bootstrapCI(col("k"), col("v"), alpha = 0.0)(df))
  }

  test("permutationTest: exact p on degenerate fixtures, determinism, NULL drop") {
    import spark.implicits._
    // all differences +1: |t_b| ≥ |obs| only when every coin lands the
    // same way — never in 100 draws over 40 rows → p = 1/101
    val oneSided = (1 to 40).map(i => (i.toLong, 2.0, 1.0)).toDF("k", "a", "b")
    val p1 = Probes.permutationTest(col("k"), col("a"), col("b"),
      reps = 100)(oneSided).head()
    assert(p1.getAs[Long]("n") === 40L)
    assert(p1.getAs[Double]("mean_diff") === 1.0)
    assert(p1.getAs[Double]("p_value") === 1.0 / 101.0)
    // exactly balanced ±1 differences: observed Σ = 0, so EVERY
    // resample reaches it → p = 1 exactly
    val balanced = (1 to 40).map(i =>
      (i.toLong, if (i % 2 == 0) 1.0 else 0.0, if (i % 2 == 0) 0.0 else 1.0))
      .toDF("k", "a", "b")
    val p0 = Probes.permutationTest(col("k"), col("a"), col("b"),
      reps = 100)(balanced).head()
    assert(p0.getAs[Double]("mean_diff") === 0.0 &&
      p0.getAs[Double]("p_value") === 1.0)
    // rerun-identical under repartition
    val p1b = Probes.permutationTest(col("k"), col("a"), col("b"),
      reps = 100)(oneSided.repartition(5)).head()
    assert(p1.toSeq === p1b.toSeq)
    // NULL metric rows drop; grouped forms are independent
    val grouped = (1 to 30).map(i => ("g1", i.toLong, 2.0, 1.0))
      .toDF("g", "k", "a", "b")
      .unionByName((1 to 30).map(i =>
        ("g2", i.toLong, if (i % 2 == 0) 1.0 else 0.0,
          if (i % 2 == 0) 0.0 else 1.0)).toDF("g", "k", "a", "b"))
      .unionByName(Seq(("g1", 99L, Option.empty[Double], Option(1.0)))
        .toDF("g", "k", "a", "b"))
    val gp = Probes.permutationTest(col("k"), col("a"), col("b"),
      reps = 100, groupCols = Seq("g"))(grouped).orderBy("g").collect()
    assert(gp(0).getAs[Long]("n") === 30L &&
      gp(0).getAs[Double]("p_value") < 0.02)
    assert(gp(1).getAs[Double]("p_value") === 1.0)
    intercept[IllegalArgumentException](Probes.permutationTest(
      col("k"), col("a"), col("b"), reps = 9)(oneSided))
  }

  test("patternProfile: shapes, null shape, topN rank discipline, casts") {
    import spark.implicits._
    val df = Seq(
      (Option("25-989"), Option(12L)),
      (Option("25-981"), Option(7L)),
      (Option("AB-12x"), Option(123L)),
      (Option.empty[String], Option(12L))).toDF("phone", "k")
    val out = Probes.patternProfile(Seq("phone", "k"))(df)
      .orderBy("column", "rank").collect()
    val phone = out.filter(_.getString(0) == "phone")
    assert(phone.map(r => (r.getString(1), r.getAs[Long]("n"))).toSeq ===
      Seq(("99-999", 2L), ("<null>", 1L), ("AA-99a", 1L)))
    assert(phone.head.getAs[Double]("share") === 0.5)
    assert(phone.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2, 3))
    // longs cast canonically; shapes bucket by digit count
    val k = out.filter(_.getString(0) == "k")
    assert(k.map(_.getString(1)).toSeq === Seq("99", "9", "999"))
    // topN truncates but shares stay over the FULL column
    val top1 = Probes.patternProfile(Seq("phone"), topN = 1)(df).collect()
    assert(top1.length === 1 && top1.head.getAs[Double]("share") === 0.5)
    intercept[IllegalArgumentException](
      Probes.patternProfile(Nil)(df))
    intercept[IllegalArgumentException](
      Probes.patternProfile(Seq("phone", "phone"))(df))
  }

  test("rankBiasedOverlap: hand RBO, identity/disjoint bounds, one-sided queries") {
    import spark.implicits._
    def w(p: Double, d: Int) = (1.0 - p) * math.pow(p, d - 1) / d
    // A: x,y,z  B: x,z,w at p=.5 depth 3 → X = [1,1,2],
    // RBO = 1·w1 + 1·w2 + 2·w3
    val a = Seq(("q", "x", 1), ("q", "y", 2), ("q", "z", 3)).toDF("q", "i", "r")
    val b = Seq(("q", "x", 1), ("q", "z", 2), ("q", "w", 3)).toDF("q", "i", "r")
    val r = Probes.rankBiasedOverlap(b, "q", "i", "r", p = 0.5, depth = 3)(a)
      .head()
    assert(r.getAs[Long]("overlap_at_depth") === 2L)
    assert(r.getAs[Double]("rbo") ===
      1.0 * w(0.5, 1) + 1.0 * w(0.5, 2) + 2.0 * w(0.5, 3))
    // identical rankings → truncated RBO = 1 − p^k
    val same = Probes.rankBiasedOverlap(a, "q", "i", "r",
      p = 0.5, depth = 3)(a).head()
    assert(math.abs(same.getAs[Double]("rbo") - (1.0 - 0.125)) < 1e-15)
    // disjoint rankings → 0; a query on one side only → 0
    val disj = Seq(("q", "u", 1), ("q", "v", 2), ("q", "t", 3))
      .toDF("q", "i", "r")
    assert(Probes.rankBiasedOverlap(disj, "q", "i", "r",
      p = 0.5, depth = 3)(a).head().getAs[Double]("rbo") === 0.0)
    val extra = a.unionByName(Seq(("q2", "x", 1)).toDF("q", "i", "r"))
    val two = Probes.rankBiasedOverlap(b, "q", "i", "r",
      p = 0.5, depth = 3)(extra).orderBy("q").collect()
    assert(two.length === 2 && two(1).getAs[Double]("rbo") === 0.0 &&
      two(1).getAs[Long]("overlap_at_depth") === 0L)
    // ranks beyond depth are invisible
    val deep = a.unionByName(Seq(("q", "w", 9)).toDF("q", "i", "r"))
    assert(Probes.rankBiasedOverlap(b, "q", "i", "r", p = 0.5, depth = 3)(
      deep).head().getAs[Double]("rbo") === r.getAs[Double]("rbo"))
    intercept[IllegalArgumentException](Probes.rankBiasedOverlap(
      b, "q", "i", "r", p = 1.0)(a))
    intercept[IllegalArgumentException](Probes.rankBiasedOverlap(
      b, "q", "i", "r", depth = 0)(a))
  }

  test("proportionCI: Wilson bounds at hand values, edge rates, NULL drop") {
    import spark.implicits._
    // n=4, k=1 at z=2: center 0.375, half sqrt(0.109375)
    val df = Seq(true, false, false, false).toDF("s")
    val r = Probes.proportionCI(col("s"), z = 2.0)(df).head()
    assert(r.getAs[Long]("n") === 4L && r.getAs[Long]("successes") === 1L)
    assert(r.getAs[Double]("rate") === 0.25)
    assert(math.abs(r.getAs[Double]("ci_low") -
      (0.375 - math.sqrt(0.109375))) < 1e-15)
    assert(math.abs(r.getAs[Double]("ci_high") -
      (0.375 + math.sqrt(0.109375))) < 1e-15)
    // k=0 at z=2 and n=4: Wilson lower bound is exactly 0, never < 0
    val zero = Seq(false, false, false, false).toDF("s")
    val zr = Probes.proportionCI(col("s"), z = 2.0)(zero).head()
    assert(zr.getAs[Double]("ci_low") === 0.0 &&
      zr.getAs[Double]("ci_high") > 0.0 && zr.getAs[Double]("ci_high") < 1.0)
    // k=n: upper bound 1 at z=2/n=4 symmetry; NULL outcomes drop
    val withNull = Seq(Option(true), Option(true), Option.empty[Boolean])
      .toDF("s")
    val wr = Probes.proportionCI(col("s"))(withNull).head()
    assert(wr.getAs[Long]("n") === 2L && wr.getAs[Double]("rate") === 1.0 &&
      wr.getAs[Double]("ci_high") <= 1.0)
    // grouped form: one row per group
    val byG = Probes.proportionCI(col("s"), Seq("g"))(
      Seq(("a", true), ("b", false)).toDF("g", "s"))
    assert(byG.count() === 2L)
    intercept[IllegalArgumentException](
      Probes.proportionCI(col("s"), z = 0.0)(df))
  }

  test("tCloseness: TV distance per class, absent-value mass, NULL doctrine") {
    import spark.implicits._
    // global: a,b each 50%; each class is single-valued -> TV = 0.5
    val df = Seq(("g1", "a"), ("g1", "a"), ("g2", "b"), ("g2", "b"))
      .toDF("q", "v")
    val out = Probes.tCloseness(Seq("q"), "v")(df)
      .orderBy("q").collect()
    assert(out.map(_.getAs[Double]("t_closeness")).toSeq === Seq(0.5, 0.5))
    assert(out.map(_.getAs[Long]("n")).toSeq === Seq(2L, 2L))
    // a class matching the global distribution scores 0
    val balanced = Seq(("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b"))
      .toDF("q", "v")
    assert(Probes.tCloseness(Seq("q"), "v")(balanced)
      .select("t_closeness").as[Double].collect().forall(_ === 0.0))
    // NULL sensitive drops from both distributions; NULL quasi is a class
    val withNulls = Seq((Option("g1"), Option("a")),
      (Option("g1"), Option.empty[String]), (Option.empty[String], Option("a")))
      .toDF("q", "v")
    val nv = Probes.tCloseness(Seq("q"), "v")(withNulls)
    assert(nv.count() === 2L) // g1 and the NULL-quasi class
    assert(nv.filter(col("q").isNull).head().getAs[Long]("n") === 1L)
    intercept[IllegalArgumentException](Probes.tCloseness(Nil, "v")(df))
  }

  test("spearmanCorr: perfect/inverse, classic 0.8, tie average-ranks, constant NULL") {
    import spark.implicits._
    def run(xs: Seq[Double], ys: Seq[Double]): Option[Double] = {
      val d = xs.zip(ys).map { case (x, y) => ("g", x, y) }
        .toDF("g", "x", "y")
      Option(Probes.spearmanCorr("g", "x", "y")(d).head()
        .getAs[java.lang.Double]("rho")).map(_.doubleValue())
    }
    assert(math.abs(run(Seq(1, 2, 3, 4), Seq(10, 20, 30, 40)).get - 1.0)
      < 1e-15)
    assert(math.abs(run(Seq(1, 2, 3, 4), Seq(8, 6, 4, 2)).get + 1.0)
      < 1e-15)
    // the textbook no-ties case: d^2 = (1,1,1,1,0) -> 1 - 24/120 = 0.8
    assert(math.abs(run(Seq(1, 2, 3, 4, 5), Seq(2, 1, 4, 3, 5)).get - 0.8)
      < 1e-15)
    // ties average: x=(1,1,2) -> 2r=(3,3,6); y=(5,6,7) -> 2r=(2,4,6);
    // Pearson on ranks = 18/sqrt(18*24)
    assert(math.abs(run(Seq(1, 1, 2), Seq(5, 6, 7)).get -
      18.0 / math.sqrt(18.0 * 24.0)) < 1e-15)
    // constant column: zero rank variance -> NULL, not 0
    assert(run(Seq(3, 3, 3), Seq(1, 2, 3)).isEmpty)
    // NULL rows drop; independent groups don't mix
    val two = Seq(("a", Some(1.0), Some(1.0)), ("a", Some(2.0), Some(2.0)),
      ("a", None, Some(9.0)), ("b", Some(1.0), Some(2.0)),
      ("b", Some(2.0), Some(1.0)))
      .toDF("g", "x", "y")
    val r = Probes.spearmanCorr("g", "x", "y")(two).orderBy("g").collect()
    assert(r.map(_.getAs[Long]("n")).toSeq === Seq(2L, 2L))
    assert(r(0).getAs[Double]("rho") === 1.0 &&
      r(1).getAs[Double]("rho") === -1.0)
  }

  test("kendallTau: hand-counted C/D, tau-b tie correction, maxN guard, size-1 NULL") {
    import spark.implicits._
    // x=(1,2,3), y=(1,3,2): C=2, D=1, tau = 1/3
    val d3 = Seq((1L, 1.0, 1.0), (2L, 2.0, 3.0), (3L, 3.0, 2.0))
      .map { case (i, x, y) => ("g", i, x, y) }.toDF("g", "i", "x", "y")
    val r3 = Probes.kendallTau("g", "i", "x", "y")(d3).head()
    assert(r3.getAs[Long]("concordant") === 2L &&
      r3.getAs[Long]("discordant") === 1L &&
      math.abs(r3.getAs[Double]("tau_b") - 1.0 / 3.0) < 1e-15)
    // tie in x only: C=5, D=0, Tx=1 -> tau_b = 5/sqrt(5*6)
    val dt = Seq((1L, 1.0, 1.0), (2L, 2.0, 2.0), (3L, 2.0, 3.0),
      (4L, 3.0, 4.0)).map { case (i, x, y) => ("g", i, x, y) }
      .toDF("g", "i", "x", "y")
    val rt = Probes.kendallTau("g", "i", "x", "y")(dt).head()
    assert(rt.getAs[Long]("concordant") === 5L &&
      rt.getAs[Long]("discordant") === 0L &&
      math.abs(rt.getAs[Double]("tau_b") - 5.0 / math.sqrt(30.0)) < 1e-15)
    // a single-row group has no pairs: zero counts, NULL tau
    val one = Seq(("g", 1L, 1.0, 1.0)).toDF("g", "i", "x", "y")
    val ro = Probes.kendallTau("g", "i", "x", "y")(one).head()
    assert(ro.getAs[Long]("n") === 1L &&
      ro.getAs[Long]("concordant") === 0L &&
      ro.getAs[java.lang.Double]("tau_b") == null)
    // the quadratic guard fails loudly past maxN
    val ex = intercept[Exception] {
      Probes.kendallTau("g", "i", "x", "y", maxN = 2)(d3).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("pair join is O(n^2)")),
      s"expected the maxN guard, got: ${msgs(ex).mkString(" | ")}")
    intercept[IllegalArgumentException](
      Probes.kendallTau("g", "i", "x", "y", maxN = 1)(d3))
  }

  test("mannWhitneyU: separation, tie carry, hand z, degenerate NULLs") {
    import spark.implicits._
    def run(rows: Seq[(Boolean, Double)]) =
      Probes.mannWhitneyU(col("a"), col("x"))(
        rows.toDF("a", "x")).head()
    // complete separation: A below B -> U=0, auc=0; A above -> U=4, auc=1
    val lo = run(Seq((true, 1.0), (true, 2.0), (false, 3.0), (false, 4.0)))
    assert(lo.getAs[Double]("u_a") === 0.0 && lo.getAs[Double]("auc") === 0.0)
    assert(lo.getAs[Double]("cliffs_delta") === -1.0)
    val hi = run(Seq((true, 3.0), (true, 4.0), (false, 1.0), (false, 2.0)))
    assert(hi.getAs[Double]("u_a") === 4.0 && hi.getAs[Double]("auc") === 1.0)
    assert(hi.getAs[Double]("cliffs_delta") === 1.0)
    // tie average-rank carry: A={1,2}, B={2,3} -> R_A=3.5, U_A=0.5
    val tied = run(Seq((true, 1.0), (true, 2.0), (false, 2.0), (false, 3.0)))
    assert(tied.getAs[Double]("u_a") === 0.5 &&
      tied.getAs[Double]("auc") === 0.125)
    // hand z, no ties: A={1,3}, B={2,4}: U=1, mean=2, var=5/3
    val z = run(Seq((true, 1.0), (true, 3.0), (false, 2.0), (false, 4.0)))
      .getAs[Double]("z")
    assert(math.abs(z - (-1.0 / math.sqrt(5.0 / 3.0))) < 1e-15)
    // all values tied: zero variance -> z NULL; auc = 1/2 (all-tie
    // mass), cliffs delta exactly 0
    val flat = run(Seq((true, 5.0), (true, 5.0), (false, 5.0)))
    assert(flat.getAs[java.lang.Double]("z") == null &&
      flat.getAs[Double]("auc") === 0.5 &&
      flat.getAs[Double]("cliffs_delta") === 0.0)
    // one side empty: all three stats NULL, counts honest
    val one = run(Seq((true, 1.0), (true, 2.0)))
    assert(one.getAs[Long]("n_a") === 2L && one.getAs[Long]("n_b") === 0L &&
      one.getAs[java.lang.Double]("u_a") == null &&
      one.getAs[java.lang.Double]("auc") == null &&
      one.getAs[java.lang.Double]("z") == null)
    // groups independent, NULL rows drop
    val g = Probes.mannWhitneyU(col("a"), col("x"), Seq("g"))(
      Seq(("g1", Some(true), Some(1.0)), ("g1", Some(false), Some(2.0)),
        ("g1", None, Some(9.0)), ("g2", Some(true), Some(7.0)),
        ("g2", Some(false), Some(1.0)), ("g2", Some(false), None))
        .toDF("g", "a", "x")).orderBy("g").collect()
    assert(g(0).getAs[Double]("auc") === 0.0 &&
      g(1).getAs[Double]("auc") === 1.0)
  }

  test("ksTest: hand sup and location, identical zero, interleaved, empty side") {
    import spark.implicits._
    def run(rows: Seq[(Boolean, Double)]) =
      Probes.ksTest(col("a"), col("x"))(rows.toDF("a", "x")).head()
    // separation: D=1, attained first at x=2 (F_A=1, F_B=0)
    val sep = run(Seq((true, 1.0), (true, 2.0), (false, 3.0), (false, 4.0)))
    assert(sep.getAs[Double]("ks_stat") === 1.0 &&
      sep.getAs[Double]("ks_at") === 2.0)
    // identical samples: D=0, ks_at deterministic (smallest value)
    val same = run(Seq((true, 1.0), (true, 2.0), (false, 1.0), (false, 2.0)))
    assert(same.getAs[Double]("ks_stat") === 0.0 &&
      same.getAs[Double]("ks_at") === 1.0)
    // interleaved A={1,3}, B={2,4}: sup=1/2 first attained at x=1
    val mix = run(Seq((true, 1.0), (true, 3.0), (false, 2.0), (false, 4.0)))
    assert(mix.getAs[Double]("ks_stat") === 0.5 &&
      mix.getAs[Double]("ks_at") === 1.0)
    // one side empty -> NULL stats, honest counts
    val one = run(Seq((true, 1.0)))
    assert(one.getAs[Long]("n_b") === 0L &&
      one.getAs[java.lang.Double]("ks_stat") == null &&
      one.getAs[java.lang.Double]("ks_at") == null)
    // grouped: disjoint groups do not mix
    val g = Probes.ksTest(col("a"), col("x"), Seq("g"))(
      Seq(("g1", true, 1.0), ("g1", false, 2.0),
        ("g2", true, 5.0), ("g2", false, 5.0)).toDF("g", "a", "x"))
      .orderBy("g").collect()
    assert(g(0).getAs[Double]("ks_stat") === 1.0 &&
      g(1).getAs[Double]("ks_stat") === 0.0)
  }

  test("bhCorrect: step-up suffix min, clamp, tie pinning, contract guards") {
    import spark.implicits._
    def run(ps: Seq[(String, Double)], alpha: Double = 0.05) =
      Probes.bhCorrect("t", "p", alpha)(ps.toDF("t", "p"))
        .orderBy("rank").collect()
    // textbook: p_i = i/64 makes every raw candidate EXACTLY 5/64
    // (binary-exact inputs so the idealized algebra survives IEEE)
    val even = run(Seq(("a", 1.0 / 64), ("b", 2.0 / 64), ("c", 3.0 / 64),
      ("d", 4.0 / 64), ("e", 5.0 / 64)), alpha = 0.08)
    assert(even.forall(_.getAs[Double]("p_adj") === 5.0 / 64) &&
      even.forall(_.getAs[Boolean]("reject")))
    // suffix min crosses: p={0.5, 0.9}, raws={1.0, 0.9} -> both 0.9
    val cross = run(Seq(("a", 0.5), ("b", 0.9)))
    assert(cross.forall(_.getAs[Double]("p_adj") === 0.9) &&
      cross.forall(!_.getAs[Boolean]("reject")))
    // clamp at 1: p=0.8, m=2, rank1 raw=1.6 -> suffix min vs 0.9*2/2=0.9
    val clamp = run(Seq(("a", 0.8), ("b", 0.9)))
    assert(clamp.map(_.getAs[Double]("p_adj")).toSeq === Seq(0.9, 0.9))
    val solo = run(Seq(("a", 0.8)))
    assert(solo.head.getAs[Double]("p_adj") === 0.8)
    // tied p's share the adjusted value; ranks pinned by id
    val tie = run(Seq(("b", 0.02), ("a", 0.02), ("c", 0.1)))
    assert(tie.map(r => (r.getAs[String]("t"), r.getAs[Long]("rank"))).toSeq
      === Seq(("a", 1L), ("b", 2L), ("c", 3L)))
    assert(tie(0).getAs[Double]("p_adj") === tie(1).getAs[Double]("p_adj"))
    // DUPLICATE (p, id) sort keys: the reversed-order running min must
    // still be the positional suffix (it rides the computed rank, a
    // total order) — both twins read the SAME p_adj, deterministically
    // (review-caught: an independent descending tie order could hand
    // the rank-1 twin a prefix excluding the rank-2 twin's smaller raw)
    val dup = run(Seq(("x", 0.5), ("x", 0.5)))
    assert(dup.map(_.getAs[Double]("p_adj")).distinct.length === 1)
    assert(dup.head.getAs[Double]("p_adj") === 0.5) // min(1·0.5·2/2, 1)
    // NULL p drops; out-of-range p raises; bad alpha rejected
    assert(Probes.bhCorrect("t", "p")(
      Seq(("a", Some(0.5)), ("b", None)).toDF("t", "p")).count() === 1L)
    val ex = intercept[Exception] {
      Probes.bhCorrect("t", "p")(Seq(("a", 1.5)).toDF("t", "p")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("p out of [0,1]")))
    intercept[IllegalArgumentException](
      Probes.bhCorrect("t", "p", alpha = 0.0)(Seq(("a", 0.5)).toDF("t", "p")))
  }

  test("brownForsythe: hand F, equal-spread zero, zero-variance NULL, empty side") {
    import spark.implicits._
    def run(rows: Seq[(Boolean, Double)]) =
      Probes.brownForsythe(col("a"), col("x"))(rows.toDF("a", "x"))
        .head()
    // A={1,3} (med 2, devs 1,1), B={0,10,20} (med 10, devs 10,0,10):
    // exact rational F = 8670/5000 = 1.734
    val r = run(Seq((true, 1.0), (true, 3.0), (false, 0.0),
      (false, 10.0), (false, 20.0)))
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 3L)
    assert(r.getAs[Double]("med_a") === 2.0 &&
      r.getAs[Double]("med_b") === 10.0)
    assert(math.abs(r.getAs[Double]("f") - 1.734) < 1e-9)
    // identical spreads: between-side deviation mass is exactly 0
    val eq = run(Seq((true, 1.0), (true, 2.0), (true, 3.0),
      (false, 11.0), (false, 12.0), (false, 13.0)))
    assert(eq.getAs[Double]("f") === 0.0)
    // both sides constant: zero within-variance -> NULL (no evidence)
    val const = run(Seq((true, 5.0), (true, 5.0), (false, 7.0),
      (false, 7.0)))
    assert(const.getAs[java.lang.Double]("f") == null)
    // one side empty: F NULL, the present side's median still reported
    val one = run(Seq((true, 1.0), (true, 2.0)))
    assert(one.getAs[Long]("n_b") === 0L &&
      one.getAs[Double]("med_a") === 1.5 &&
      one.getAs[java.lang.Double]("med_b") == null &&
      one.getAs[java.lang.Double]("f") == null)
    // a deviation past the decimal(19,0) quantization ceiling raises
    // loudly instead of the silent NULL a plain cast overflow gives
    val ex = intercept[Exception] {
      Probes.brownForsythe(col("a"), col("x"))(
        Seq((true, 0.0), (true, 2.0e10), (false, 1.0), (false, 2.0))
          .toDF("a", "x")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("9e9 quantization bound")),
      s"expected the magnitude guard, got: ${msgs(ex).mkString(" | ")}")
  }

  test("wilcoxonSignedRank: hand W+/z, tie carry, zero diffs, degenerate NULLs") {
    import spark.implicits._
    def run(rows: Seq[(Double, Double)]) =
      Probes.wilcoxonSignedRank(col("a"), col("b"))(
        rows.toDF("a", "b")).head()
    // diffs (1, -2, 3, -4, 5), all |d| distinct: ranks 1..5,
    // W+ = 1+3+5 = 9, W- = 6, rbc = 3/15, num4 = 6, V = 660,
    // z = 6/sqrt(220)
    val r = run(Seq((1.0, 0.0), (0.0, 2.0), (3.0, 0.0), (0.0, 4.0),
      (5.0, 0.0)))
    assert(r.getAs[Long]("n_pairs") === 5L &&
      r.getAs[Long]("n_zero") === 0L && r.getAs[Long]("n") === 5L)
    assert(r.getAs[Double]("w_plus") === 9.0 &&
      r.getAs[Double]("w_minus") === 6.0)
    assert(math.abs(r.getAs[Double]("rank_biserial") - 0.2) < 1e-15)
    assert(math.abs(r.getAs[Double]("z") - 6.0 / math.sqrt(220.0))
      < 1e-15)
    // ties in |d|: diffs (1, -1, 2) -> 2r = (3, 3, 6), W+ = 4.5,
    // ties Σ(t³−t) = 6, num4 = 6, V = 2·3·4·7 − 6 = 162,
    // z = 6/sqrt(54)
    val t = run(Seq((1.0, 0.0), (0.0, 1.0), (2.0, 0.0)))
    assert(t.getAs[Double]("w_plus") === 4.5 &&
      t.getAs[Double]("w_minus") === 1.5)
    assert(math.abs(t.getAs[Double]("z") - 6.0 / math.sqrt(54.0))
      < 1e-15)
    // zero differences drop from the ranking but stay reported
    val z0 = run(Seq((7.0, 7.0), (1.0, 0.0), (0.0, 2.0)))
    assert(z0.getAs[Long]("n_pairs") === 3L &&
      z0.getAs[Long]("n_zero") === 1L && z0.getAs[Long]("n") === 2L)
    // all diffs zero: honest counts, NULL statistics
    val all0 = run(Seq((1.0, 1.0), (2.0, 2.0)))
    assert(all0.getAs[Long]("n") === 0L &&
      all0.isNullAt(all0.fieldIndex("w_plus")) &&
      all0.isNullAt(all0.fieldIndex("z")))
    // NULL side drops the pair
    val withNull = Probes.wilcoxonSignedRank(col("a"), col("b"))(
      Seq((Option(1.0), Option(0.0)), (Option.empty[Double], Option(2.0)))
        .toDF("a", "b")).head()
    assert(withNull.getAs[Long]("n_pairs") === 1L)
    // grouped: independent statistics per group
    val g = Probes.wilcoxonSignedRank(col("a"), col("b"), Seq("g"))(
      Seq(("x", 1.0, 0.0), ("x", 0.0, 2.0), ("y", 5.0, 1.0))
        .toDF("g", "a", "b")).orderBy("g").collect()
    assert(g(0).getAs[Long]("n") === 2L && g(1).getAs[Long]("n") === 1L)
  }

  test("kruskalWallis: hand H, k=2 is MWU z², ties, degenerates") {
    import spark.implicits._
    // A={1,2}, B={3,4}: ranks 1..4, S2 = (6, 14),
    // H = 3/(4·5)·(36/2 + 196/2) − 3·5 = 17.4 − 15 = 2.4 exactly
    val d = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0))
      .toDF("v", "x")
    val r = Probes.kruskalWallis(col("v"), col("x"))(d).head()
    assert(r.getAs[Long]("n") === 4L && r.getAs[Long]("k") === 2L)
    assert(math.abs(r.getAs[Double]("h") - 2.4) < 1e-12)
    assert(math.abs(r.getAs[Double]("h_corrected") - 2.4) < 1e-12)
    // the classical identity: at k = 2 the tie-corrected H equals the
    // (tie-corrected) Mann–Whitney z squared — heavy ties included
    val rows = (1 to 40).map(i =>
      (if (i % 2 == 0) "A" else "B", (i % 7).toDouble))
    val df2 = rows.toDF("v", "x")
    val hc = Probes.kruskalWallis(col("v"), col("x"))(df2).head()
      .getAs[Double]("h_corrected")
    val z = Probes.mannWhitneyU(col("v") === "A", col("x"))(df2).head()
      .getAs[Double]("z")
    assert(math.abs(hc - z * z) < 1e-9, s"H=$hc vs z^2=${z * z}")
    // three variants, hand-free sanity: H >= 0 and finite
    val d3 = (1 to 30).map(i => (s"v${i % 3}", (i * 7 % 11).toDouble))
      .toDF("v", "x")
    val r3 = Probes.kruskalWallis(col("v"), col("x"))(d3).head()
    assert(r3.getAs[Long]("k") === 3L &&
      r3.getAs[Double]("h_corrected") >= 0.0)
    // both H-based effect sizes, correctly named: Kelley's
    // eps_sq = H_c/(N−1) = 2.4/3 = 0.8; the rank
    // eta_sq_h = (H_c − k + 1)/(N − k) = 1.4/2 = 0.7
    assert(math.abs(r.getAs[Double]("eps_sq") - 0.8) < 1e-12)
    assert(math.abs(r.getAs[Double]("eta_sq_h") - 0.7) < 1e-12)
    // one variant: NULL H; all values tied: NULL h_corrected
    val one = Seq(("A", 1.0), ("A", 2.0)).toDF("v", "x")
    val ro = Probes.kruskalWallis(col("v"), col("x"))(one).head()
    assert(ro.isNullAt(ro.fieldIndex("h")))
    val tied = Seq(("A", 5.0), ("B", 5.0), ("A", 5.0)).toDF("v", "x")
    val rt = Probes.kruskalWallis(col("v"), col("x"))(tied).head()
    assert(rt.isNullAt(rt.fieldIndex("h_corrected")) &&
      rt.isNullAt(rt.fieldIndex("eps_sq")) &&
      rt.isNullAt(rt.fieldIndex("eta_sq_h")))
  }

  test("dunnTest: k=2 equals mannWhitneyU z, hand pairs, tied NULL, maxK guard") {
    import spark.implicits._
    // k = 2: Dunn's pairwise z IS the (tie-corrected) MWU z — the
    // algebraic reduction the scaladoc derives, pinned to float noise
    val rows = (1 to 40).map(i =>
      (if (i % 2 == 0) "A" else "B", (i % 7).toDouble))
    val df2 = rows.toDF("v", "x")
    val dz = Probes.dunnTest(col("v"), col("x"))(df2).head()
    val mz = Probes.mannWhitneyU(col("v") === "A", col("x"))(df2).head()
      .getAs[Double]("z")
    assert(dz.getAs[String]("variant_a") === "A")
    assert(math.abs(dz.getAs[Double]("z") - mz) < 1e-9,
      s"dunn ${dz.getAs[Double]("z")} vs mwu $mz")
    // hand case, untied: A={1,2} B={3,4} C={5,6} -> mean ranks
    // 1.5/3.5/5.5, V = 6·7/12 = 3.5, z_AB = -2/sqrt(3.5),
    // z_AC = -4/sqrt(3.5) (clears 1.96), z_BC = -2/sqrt(3.5)
    val d3 = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0),
      ("C", 5.0), ("C", 6.0)).toDF("v", "x")
    val p = Probes.dunnTest(col("v"), col("x"))(d3)
      .orderBy("variant_a", "variant_b").collect()
    assert(p.length === 3)
    assert(math.abs(p(0).getAs[Double]("mean_rank_a") - 1.5) < 1e-15)
    assert(math.abs(p(0).getAs[Double]("z") + 2.0 / math.sqrt(3.5)) < 1e-12)
    assert(math.abs(p(1).getAs[Double]("z") + 4.0 / math.sqrt(3.5)) < 1e-12)
    assert(math.abs(p(2).getAs[Double]("z") + 2.0 / math.sqrt(3.5)) < 1e-12)
    assert(!p(0).getAs[Boolean]("reject") && p(1).getAs[Boolean]("reject")
      && !p(2).getAs[Boolean]("reject"))
    // every value tied: zero variance numerator -> NULL z, reject false
    val tied = Seq(("A", 5.0), ("B", 5.0), ("A", 5.0), ("B", 5.0))
      .toDF("v", "x")
    val rt = Probes.dunnTest(col("v"), col("x"))(tied).head()
    assert(rt.isNullAt(rt.fieldIndex("z")) &&
      rt.getAs[Boolean]("reject") === false)
    // the maxK guard raises loudly before the k² pair frame
    val many = (1 to 10).map(i => (s"v$i", i.toDouble)).toDF("v", "x")
    val ex = intercept[Exception] {
      Probes.dunnTest(col("v"), col("x"), maxK = 4)(many).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("maxK=4")))
  }

  test("jonckheereTerpstra: hand J/z, k=2 is MWU z, reversal negates, degenerates") {
    import spark.implicits._
    // Hollander–Wolfe-style 3×6 fixture (hand/py-checked): J = 79,
    // μ = 54, σ² = 150.28676470588235, z = 2.0392930588447173
    val g1 = Seq(40, 35, 38, 43, 44, 41).map(v => (1, v.toDouble))
    val g2 = Seq(38, 40, 47, 44, 40, 42).map(v => (2, v.toDouble))
    val g3 = Seq(48, 40, 45, 43, 46, 44).map(v => (3, v.toDouble))
    val d = (g1 ++ g2 ++ g3).toDF("v", "x")
    val r = Probes.jonckheereTerpstra(col("v"), col("x"))(d).head()
    assert(r.getAs[Long]("n") === 18L && r.getAs[Long]("k") === 3L)
    assert(r.getAs[Double]("j_stat") === 79.0)
    assert(r.getAs[Double]("mu") === 54.0)
    assert(math.abs(r.getAs[Double]("z") - 2.0392930588447173) < 1e-12)
    // k = 2 with heavy ties: z_JT == mannWhitneyU's z on the LATER
    // variant (J = U of the later side; exact algebraic identity)
    val rows = (1 to 40).map(i => (i % 2, (i * 13 % 7).toDouble))
    val df2 = rows.toDF("v", "x")
    val zjt = Probes.jonckheereTerpstra(col("v"), col("x"))(df2).head()
      .getAs[Double]("z")
    val zmw = Probes.mannWhitneyU(col("v") === 1, col("x"))(df2).head()
      .getAs[Double]("z")
    assert(math.abs(zjt - zmw) < 1e-9, s"jt $zjt vs mwu $zmw")
    // reversing the dose order negates z (ties included)
    val zrev = Probes.jonckheereTerpstra(-col("v"), col("x"))(d).head()
      .getAs[Double]("z")
    assert(math.abs(zrev + 2.0392930588447173) < 1e-12)
    // all values tied: zero variance -> NULL z with honest counts;
    // one variant: NULL z
    val tied = Seq((1, 5.0), (2, 5.0), (1, 5.0), (2, 5.0)).toDF("v", "x")
    val rt = Probes.jonckheereTerpstra(col("v"), col("x"))(tied).head()
    assert(rt.getAs[Long]("n") === 4L && rt.isNullAt(rt.fieldIndex("z")))
    val one = Seq((1, 1.0), (1, 2.0)).toDF("v", "x")
    val ro = Probes.jonckheereTerpstra(col("v"), col("x"))(one).head()
    assert(ro.isNullAt(ro.fieldIndex("z")))
    // the maxK guard raises loudly before the (k-1)x replication
    val many = (1 to 10).map(i => (i, i.toDouble)).toDF("v", "x")
    val ex = intercept[Exception] {
      Probes.jonckheereTerpstra(col("v"), col("x"), maxK = 4)(many)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("maxK=4")))
  }

  test("brunnerMunzel: hand placements, swap complements, separation NULL, MWU sign") {
    import spark.implicits._
    def run(rows: Seq[(Boolean, Double)]) =
      Probes.brunnerMunzel(col("a"), col("x"))(rows.toDF("a", "x"))
        .head()
    // interleaved A = {1, 3}, B = {2, 4}: placements D_A = (0, 2),
    // D_B = (2, 4) -> v_a = v_b = 1/2, mean gap -1,
    // statistic = -1/sqrt(2), p_hat = 1/4, Welch df = 2
    val r = run(Seq((true, 1.0), (false, 2.0), (true, 3.0),
      (false, 4.0)))
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Double]("p_hat") === 0.25)
    assert(r.getAs[Double]("statistic") ===
      2.0 * 2.0 * -1.0 / (4.0 * math.sqrt(2.0)))
    assert(r.getAs[Double]("df") === 2.0)
    // swapping the sides complements p_hat and negates the statistic
    val rs = run(Seq((false, 1.0), (true, 2.0), (false, 3.0),
      (true, 4.0)))
    assert(math.abs(r.getAs[Double]("p_hat") +
      rs.getAs[Double]("p_hat") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("statistic") +
      rs.getAs[Double]("statistic")) < 1e-12)
    // COMPLETE separation: both placement variances are 0 and the
    // statistic is +/-inf by construction — honest NULL, p_hat = 1
    val sep = run(Seq((true, 3.0), (true, 4.0), (false, 1.0),
      (false, 2.0)))
    assert(sep.getAs[Double]("p_hat") === 1.0 &&
      sep.isNullAt(sep.fieldIndex("statistic")) &&
      sep.isNullAt(sep.fieldIndex("df")))
    // a one-row side has no variance estimate: NULL with honest p_hat
    val one = run(Seq((true, 1.0), (false, 2.0), (false, 0.5)))
    assert(one.getAs[Long]("n_a") === 1L &&
      one.isNullAt(one.fieldIndex("statistic")))
    // sign agreement with mannWhitneyU's z on a clear overlapping shift
    val shift = (1 to 20).map(i => (true, i + 8.0)) ++
      (1 to 20).map(i => (false, i.toDouble))
    val bm = run(shift).getAs[Double]("statistic")
    val mw = Probes.mannWhitneyU(col("a"), col("x"))(
      shift.toDF("a", "x")).head().getAs[Double]("z")
    assert(bm > 1.96 && mw > 1.96)
  }

  test("hodgesLehmann: hand ranks, shift equivariance, swap negation, CI brackets") {
    import spark.implicits._
    def run(pts: Seq[(Boolean, Double)]) =
      Probes.hodgesLehmann(col("a"), col("x"), "i")(
        pts.zipWithIndex.map { case ((a, x), i) =>
          (a, i.toLong, x) }.toDF("a", "i", "x")).head()
    // hand fixture: A = {1,3,5}, B = {2,4} — differences sorted
    // (-3,-1,-1,1,1,3), N = 6, median ranks 3,4 -> shift 0.0;
    // no ties, Var(U) = 3·2/12·6 = 3, C = 1.96·√12 = 6.79 ≥ N →
    // clamps to the extreme differences (the honestly-wide read)
    val hand = Seq((true, 1.0), (true, 3.0), (true, 5.0),
      (false, 2.0), (false, 4.0))
    val h = run(hand)
    assert(h.getAs[Long]("n_a") === 3L && h.getAs[Long]("n_b") === 2L &&
      h.getAs[Long]("n_pairs") === 6L)
    assert(h.getAs[Double]("shift") === 0.0)
    assert(h.getAs[Double]("shift_lo") === -3.0 &&
      h.getAs[Double]("shift_hi") === 3.0)
    // location equivariance: +c on side A moves estimate and both
    // limits by EXACTLY +c (half-integer A keeps the pool tie-free
    // before AND after the shift, so Var(U) and the rank choices are
    // identical and every add is IEEE-exact)
    val big = (1 to 15).map(i => (true, i + 7.5)) ++
      (1 to 15).map(i => (false, i.toDouble))
    val b0 = run(big)
    val bc = run(big.map { case (a, x) => (a, if (a) x + 5.0 else x) })
    assert(bc.getAs[Double]("shift") === b0.getAs[Double]("shift") + 5.0)
    assert(bc.getAs[Double]("shift_lo") ===
      b0.getAs[Double]("shift_lo") + 5.0)
    assert(bc.getAs[Double]("shift_hi") ===
      b0.getAs[Double]("shift_hi") + 5.0)
    // the CI brackets the estimate, and the un-clamped width is
    // finite on the shifted fixture
    assert(b0.getAs[Double]("shift_lo") <= b0.getAs[Double]("shift") &&
      b0.getAs[Double]("shift") <= b0.getAs[Double]("shift_hi"))
    // side swap negates the estimate exactly (odd-N median selection
    // mirrors), and the limits swap-negate
    val asym = Seq((true, 1.0), (true, 3.0), (true, 5.0),
      (false, 2.0), (false, 4.0), (false, 10.0))
    val s0 = run(asym)
    val s1 = run(asym.map { case (a, x) => (!a, x) })
    assert(s1.getAs[Double]("shift") === -s0.getAs[Double]("shift"))
    assert(s1.getAs[Double]("shift_lo") ===
      -s0.getAs[Double]("shift_hi"))
    assert(s1.getAs[Double]("shift_hi") ===
      -s0.getAs[Double]("shift_lo"))
    // sign agreement with cliffs_delta on the clear shift
    val mw = Probes.mannWhitneyU(col("a"), col("x"))(
      big.toDF("a", "x")).head()
    assert(b0.getAs[Double]("shift") > 0.0 &&
      mw.getAs[Double]("cliffs_delta") > 0.0)
    // degenerate reads: empty side -> NULL everything, honest counts;
    // all values tied -> honest 0 estimate, NULL limits
    val oneSide = run(Seq((true, 1.0), (true, 2.0)))
    assert(oneSide.getAs[Long]("n_pairs") === 0L &&
      oneSide.isNullAt(oneSide.fieldIndex("shift")) &&
      oneSide.isNullAt(oneSide.fieldIndex("shift_lo")))
    val flat = run(Seq((true, 5.0), (false, 5.0), (true, 5.0)))
    assert(flat.getAs[Double]("shift") === 0.0 &&
      flat.isNullAt(flat.fieldIndex("shift_lo")))
    // the quadratic guard fails loudly past maxN, naming the op
    val ex = intercept[Exception] {
      Probes.hodgesLehmann(col("a"), col("x"), "i", maxN = 2)(
        hand.zipWithIndex.map { case ((a, x), i) => (a, i.toLong, x) }
          .toDF("a", "i", "x")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(m => m.contains("hodgesLehmann") &&
      m.contains("O(n^2)")))
  }

  test("logRankTest: hand O-E/V/z, side swap negates, balanced zero, no-deaths NULL") {
    import spark.implicits._
    // micro fixture (py-validated): A death@1 + censored@2, B deaths
    // @2 and @3. t=1: n=4, d=1, dA=1; t=2: n=3, d=1, dA=0 (the A
    // censor leaves the risk set without dying); t=3: n=1 -> excluded
    val d = Seq((true, 1L, false), (true, 2L, true),
      (false, 2L, false), (false, 3L, false)).toDF("a", "t", "c")
    val r = Probes.logRankTest(col("a"), col("t"), col("c"))(d).head()
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Long]("deaths_a") === 1L &&
      r.getAs[Long]("deaths_b") === 2L)
    val o = 0.0 + (1.0 * 4 - 1 * 2) / 4.0 + (0.0 * 3 - 1 * 1) / 3.0 + 0.0
    val v = 0.0 + 12.0 / 48.0 + 4.0 / 18.0 + 0.0
    assert(r.getAs[Double]("o_minus_e") === o)
    assert(r.getAs[Double]("z") === o / math.sqrt(v))
    // Pike's hazard ratio off the same folded sums:
    // (O_a/E_a)/(O_b/E_b) with E_a = 1 - o, E_b = 2 + o
    assert(r.getAs[Double]("hazard_ratio") ===
      (1.0 / (1.0 - o)) / (2.0 / (2.0 + o)))
    // swapping the sides negates z EXACTLY (term negation is exact)
    val rs = Probes.logRankTest(!col("a"), col("t"), col("c"))(d).head()
    assert(rs.getAs[Double]("z") === -(o / math.sqrt(v)))
    // perfectly balanced sides: every O-E term exactly 0
    val bal = (0 until 36).map(i => (i % 2 == 0, (i / 2 % 9).toLong,
      false)).toDF("a", "t", "c")
    val rb = Probes.logRankTest(col("a"), col("t"), col("c"))(bal).head()
    assert(rb.getAs[Double]("o_minus_e") === 0.0 &&
      rb.getAs[Double]("z") === 0.0)
    // all censored: zero deaths, zero variance -> NULL z, honest counts
    val cen = Seq((true, 1L, true), (false, 2L, true)).toDF("a", "t", "c")
    val rc = Probes.logRankTest(col("a"), col("t"), col("c"))(cen).head()
    assert(rc.getAs[Long]("n_a") === 1L &&
      rc.isNullAt(rc.fieldIndex("z")))
    // zero deaths on either side: no finite rate ratio -> NULL hr
    assert(rc.isNullAt(rc.fieldIndex("hazard_ratio")))
  }

  test("gehanBreslow: hand weighted terms, single-time equals logrank, swap negates") {
    import spark.implicits._
    // the logRankTest micro fixture: t=1 n=4 d=1 dA=1 -> w(O-E) =
    // 1*4 - 1*2 = 2, w^2*V = 1*2*2*3/3 = 4; t=2 n=3 d=1 dA=0 ->
    // -1 and 1*1*2*2/2 = 2; t=3 n=1 excluded
    val d = Seq((true, 1L, false), (true, 2L, true),
      (false, 2L, false), (false, 3L, false)).toDF("a", "t", "c")
    val r = Probes.gehanBreslowTest(col("a"), col("t"), col("c"))(d)
      .head()
    assert(r.getAs[Long]("deaths_a") === 1L &&
      r.getAs[Long]("deaths_b") === 2L)
    assert(r.getAs[Double]("w_o_minus_e") === 1.0)
    assert(r.getAs[Double]("z") === 1.0 / math.sqrt(6.0))
    // swapping the sides negates z EXACTLY
    val rs = Probes.gehanBreslowTest(!col("a"), col("t"), col("c"))(d)
      .head()
    assert(rs.getAs[Double]("z") === -(1.0 / math.sqrt(6.0)))
    // ONE distinct event time: the weight is a common factor and
    // cancels — Gehan z == Mantel-Cox z (float noise only; the two
    // spell the n_t cancellation at different points of the dag)
    val one = Seq((true, 1L, false), (true, 1L, false),
      (false, 1L, false), (false, 1L, true)).toDF("a", "t", "c")
    val zg = Probes.gehanBreslowTest(col("a"), col("t"), col("c"))(one)
      .head().getAs[Double]("z")
    val zl = Probes.logRankTest(col("a"), col("t"), col("c"))(one)
      .head().getAs[Double]("z")
    assert(math.abs(zg - zl) < 1e-12 && math.abs(zg - 1.0) < 1e-12)
    // all censored: zero variance -> NULL z with honest counts
    val cen = Seq((true, 1L, true), (false, 2L, true)).toDF("a", "t", "c")
    val rc = Probes.gehanBreslowTest(col("a"), col("t"), col("c"))(cen)
      .head()
    assert(rc.getAs[Long]("n_a") === 1L &&
      rc.isNullAt(rc.fieldIndex("z")))
  }

  test("logRankStratified: one stratum is logRankTest, confounder cancels, empty-side stratum") {
    import spark.implicits._
    // one stratum ≡ logRankTest to ZERO tolerance: same cells, same
    // term sequence, same fold order (the struct pin's first field is
    // constant, so the fold still walks time order)
    val d2 = Seq((true, 1L, false, "s"), (true, 2L, true, "s"),
      (false, 2L, false, "s"), (false, 3L, false, "s"))
      .toDF("a", "t", "c", "st")
    val one = Probes.logRankStratified(col("a"), col("t"), col("c"),
      Seq("st"))(d2).head()
    val plain = Probes.logRankTest(col("a"), col("t"), col("c"))(d2)
      .head()
    assert(one.getAs[Double]("z") === plain.getAs[Double]("z"))
    assert(one.getAs[Double]("o_minus_e") ===
      plain.getAs[Double]("o_minus_e"))
    assert(one.getAs[Double]("hazard_ratio") ===
      plain.getAs[Double]("hazard_ratio"))
    assert(one.getAs[Long]("n_strata") === 1L)
    // the confounder demo: within each stratum the sides share one
    // time distribution (every per-time O−E term is exact 0), but
    // stratum x is A-heavy and short-lived while y is B-heavy and
    // long-lived — the MARGINAL test reads a spurious gap, the
    // stratified test reads exact 0
    val conf = Seq(
      (true, 1L, false, "x"), (true, 1L, false, "x"),
      (true, 2L, false, "x"), (true, 2L, false, "x"),
      (false, 1L, false, "x"), (false, 2L, false, "x"),
      (true, 7L, false, "y"), (true, 8L, false, "y"),
      (false, 7L, false, "y"), (false, 7L, false, "y"),
      (false, 8L, false, "y"), (false, 8L, false, "y"))
    val st = Probes.logRankStratified(col("a"), col("t"), col("c"),
      Seq("st"))(conf.toDF("a", "t", "c", "st")).head()
    assert(st.getAs[Double]("o_minus_e") === 0.0 &&
      st.getAs[Double]("z") === 0.0 &&
      st.getAs[Long]("n_strata") === 2L)
    val marg = Probes.logRankTest(col("a"), col("t"), col("c"))(
      conf.toDF("a", "t", "c", "st")).head()
    assert(marg.getAs[Double]("o_minus_e") > 0.0)
    // an all-A stratum contributes exact-0 terms: o_minus_e and z are
    // IDENTICAL with it present, its subjects still count in n_a;
    // NULL-stratum rows drop entirely
    val extra = Seq((true, 3L, false, "z1"), (true, 9L, false, "z1"),
      (true, 4L, false, null.asInstanceOf[String]))
    val st2 = Probes.logRankStratified(col("a"), col("t"), col("c"),
      Seq("st"))((conf ++ extra).toDF("a", "t", "c", "st")).head()
    assert(st2.getAs[Double]("o_minus_e") ===
      st.getAs[Double]("o_minus_e"))
    assert(st2.getAs[Double]("z") === st.getAs[Double]("z"))
    assert(st2.getAs[Long]("n_a") === st.getAs[Long]("n_a") + 2L)
    assert(st2.getAs[Long]("n_strata") === 3L)
    // strataCols must be non-empty — the unstratified op exists
    intercept[IllegalArgumentException] {
      Probes.logRankStratified(col("a"), col("t"), col("c"), Nil)(d2)
    }
  }

  test("logRankK: k=2 equals logRankTest exactly, hand 3-arm grid, guard, no-deaths NULL") {
    import spark.implicits._
    // k = 2 on the logRankTest micro fixture: the "true" arm's z must
    // equal the two-sample z to ZERO tolerance — identical term
    // sequence (the grid adds only exact-0.0 rows), identical fold
    val d2 = Seq((true, 1L, false), (true, 2L, true),
      (false, 2L, false), (false, 3L, false)).toDF("a", "t", "c")
    val two = Probes.logRankK(col("a"), col("t"), col("c"))(d2)
      .collect().map(r => r.getAs[String]("variant") -> r).toMap
    val zl = Probes.logRankTest(col("a"), col("t"), col("c"))(d2)
      .head().getAs[Double]("z")
    assert(two("true").getAs[Double]("z") === zl)
    assert(two("false").getAs[Double]("z") === -zl)
    // the arms are k-correlated: sum of O-E is 0 by construction
    assert(math.abs(two.values.map(_.getAs[Double]("o_minus_e")).sum)
      < 1e-15)
    // hand 3-arm fixture exercising the grid zero-fill (C has no cell
    // at either death time): A death@1, B death@2, C censored@3.
    // O-E = (2/3, 1/6, -5/6), E = (1/3, 5/6, 5/6), V_A = 2/9,
    // chi2 = 4/3 + 1/30 + 5/6 = 2.2
    val d3 = Seq(("A", 1L, false), ("B", 2L, false), ("C", 3L, true))
      .toDF("v", "t", "c")
    val arms = Probes.logRankK(col("v"), col("t"), col("c"))(d3)
      .collect().map(r => r.getAs[String]("variant") -> r).toMap
    assert(arms("A").getAs[Double]("o_minus_e") === 2.0 / 3.0)
    assert(math.abs(arms("B").getAs[Double]("o_minus_e") -
      (-1.0 / 3.0 + 0.5)) < 1e-15)
    assert(math.abs(arms("C").getAs[Double]("o_minus_e") -
      (-1.0 / 3.0 - 0.5)) < 1e-15)
    assert(math.abs(arms("A").getAs[Double]("expected") - 1.0 / 3.0)
      < 1e-15)
    assert(arms("A").getAs[Double]("z") ===
      arms("A").getAs[Double]("o_minus_e") / math.sqrt(2.0 / 9.0))
    assert(arms("A").getAs[Long]("k") === 3L)
    assert(math.abs(arms("A").getAs[Double]("chi2") - 2.2) < 1e-12)
    assert(!arms("A").getAs[Boolean]("reject"))
    // no deaths anywhere: NULL chi2 and z with honest counts
    val cen = Seq(("A", 1L, true), ("B", 2L, true)).toDF("v", "t", "c")
    val rc = Probes.logRankK(col("v"), col("t"), col("c"))(cen)
      .collect()
    assert(rc.forall(r => r.isNullAt(r.fieldIndex("chi2")) &&
      r.isNullAt(r.fieldIndex("z")) && !r.getAs[Boolean]("reject")))
    // the k guard fails loudly past maxK
    val ex = intercept[Exception] {
      Probes.logRankK(col("v"), col("t"), col("c"), maxK = 2)(d3)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("time-grid is |T|*k")))
  }

  test("pageTest: hand L/variance, order reversal negates, k=2 is signTest, tied NULL") {
    import spark.implicits._
    def run(rows: Seq[(Long, Long, Double)]) =
      Probes.pageTest("b", "t", col("x"))(rows.toDF("b", "t", "x"))
        .head()
    // 4 complete blocks, 3 arms, perfect agreement with the dose:
    // R = (4, 8, 12), L = 56 (the maximum), E = 48,
    // Var = 4*9*16*2/144 = 8 -> z = 8/sqrt(8)
    val up = for (b <- 1L to 4L; a <- 0L to 2L) yield (b, a, a.toDouble)
    val r = run(up)
    assert(r.getAs[Long]("n_blocks") === 4L && r.getAs[Long]("k") === 3L)
    assert(r.getAs[Double]("l") === 56.0)
    assert(r.getAs[Double]("z") === 32.0 / (4.0 * math.sqrt(8.0)))
    // reversing the dose order negates z exactly
    val rev = run(up.map { case (b, a, x) => (b, 2L - a, x) })
    assert(rev.getAs[Double]("z") === -r.getAs[Double]("z"))
    // k = 2 IS the sign test: diffs (+, +, +, -, 0) -> z = 1
    val pairs = Seq(1.0, 2.0, 3.0, -1.0, 0.0).zipWithIndex.flatMap {
      case (d, i) => Seq((i.toLong, 0L, 0.0), (i.toLong, 1L, d)) }
    val p2 = run(pairs)
    val sz = Probes.signTest(col("a"), col("b"))(
      Seq(1.0, 2.0, 3.0, -1.0, 0.0).map(d => (d, 0.0)).toDF("a", "b"))
      .head().getAs[Double]("z")
    assert(p2.getAs[Double]("z") === sz && sz === 1.0)
    // every block internally tied: zero variance -> NULL z, honest l
    val tied = for (b <- 1L to 3L; a <- 0L to 2L) yield (b, a, 7.0)
    val rt = run(tied)
    assert(rt.getAs[Long]("n_blocks") === 3L &&
      rt.isNullAt(rt.fieldIndex("z")))
    // incomplete blocks drop and are REPORTED
    val withBad = up ++ Seq((9L, 0L, 1.0))
    val rb = run(withBad)
    assert(rb.getAs[Long]("n_blocks") === 4L &&
      rb.getAs[Long]("n_dropped") === 1L)
    assert(rb.getAs[Double]("z") === r.getAs[Double]("z"))
  }

  test("cochranQ: hand Q, k=2 is McNemar chi2, uniform-block NULL, dropped blocks") {
    import spark.implicits._
    def run(rows: Seq[(Long, String, Boolean)]) =
      Probes.cochranQ("b", "t", col("s"))(rows.toDF("b", "t", "s")).head()
    // 4 complete blocks over A/B/C: C = (3,3,1), T = 7, ΣR² = 15 ->
    // num = 2·(3·19 − 49) = 16, den = 21 − 15 = 6, Q = 8/3 exactly
    val k3 = run(Seq(
      (1L, "A", true), (1L, "B", true), (1L, "C", false),
      (2L, "A", true), (2L, "B", false), (2L, "C", false),
      (3L, "A", true), (3L, "B", true), (3L, "C", true),
      (4L, "A", false), (4L, "B", true), (4L, "C", false)))
    assert(k3.getAs[Long]("n_blocks") === 4L &&
      k3.getAs[Long]("k") === 3L)
    assert(math.abs(k3.getAs[Double]("q") - 8.0 / 3.0) < 1e-15)
    // k = 2 IS McNemar's uncorrected chi2 on the discordant split
    val pairs = Seq((1L, true, false), (2L, true, false),
      (3L, false, true), (4L, true, true), (5L, false, false))
    val q2 = run(pairs.flatMap { case (b, sa, sb) =>
      Seq((b, "A", sa), (b, "B", sb)) }).getAs[Double]("q")
    val mc = Probes.mcnemarTest(col("a"), col("c"), correction = false)(
      pairs.map { case (_, sa, sb) => (sa, sb) }.toDF("a", "c"))
      .head().getAs[Double]("chi2")
    assert(q2 === mc && math.abs(q2 - 1.0 / 3.0) < 1e-15)
    // every block uniform: zero within-block information -> NULL Q
    val uni = run(Seq((1L, "A", true), (1L, "B", true),
      (2L, "A", false), (2L, "B", false)))
    assert(uni.getAs[Long]("n_blocks") === 2L &&
      uni.isNullAt(uni.fieldIndex("q")))
    // an incomplete block drops, is reported, and leaves Q unchanged
    val noisy = run(Seq(
      (1L, "A", true), (1L, "B", true), (1L, "C", false),
      (2L, "A", true), (2L, "B", false), (2L, "C", false),
      (3L, "A", true), (3L, "B", true), (3L, "C", true),
      (4L, "A", false), (4L, "B", true), (4L, "C", false),
      (5L, "A", true), (5L, "B", true)))
    assert(noisy.getAs[Long]("n_blocks") === 4L &&
      noisy.getAs[Long]("n_dropped") === 1L)
    assert(math.abs(noisy.getAs[Double]("q") - 8.0 / 3.0) < 1e-15)
  }

  test("oneWayAnova + brownForsytheK: hand F, k=2 reduction, degenerates, bound") {
    import spark.implicits._
    // A={1,2,3}, B={4,5,6}: ssb = 13.5, ssw = 4 -> F = (6-2)/1 · 13.5/4
    // = 13.5, eta² = 13.5/17.5 (1e9 scale cancels; fp noise only)
    val d = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 4.0),
      ("B", 5.0), ("B", 6.0)).toDF("v", "x")
    val r = Probes.oneWayAnova(col("v"), col("x"))(d).head()
    assert(r.getAs[Long]("n") === 6L && r.getAs[Long]("k") === 2L)
    assert(math.abs(r.getAs[Double]("f") - 13.5) < 1e-6)
    assert(math.abs(r.getAs[Double]("eta_sq") - 13.5 / 17.5) < 1e-9)
    // identical means: ssb 0 -> F 0-ish
    val eq = Probes.oneWayAnova(col("v"), col("x"))(
      Seq(("A", 1.0), ("A", 3.0), ("B", 3.0), ("B", 1.0))
        .toDF("v", "x")).head()
    assert(math.abs(eq.getAs[Double]("f")) < 1e-9)
    // one variant: NULL F; zero within-variance: NULL F with eta 1
    val one = Probes.oneWayAnova(col("v"), col("x"))(
      Seq(("A", 1.0), ("A", 2.0)).toDF("v", "x")).head()
    assert(one.isNullAt(one.fieldIndex("f")))
    val const = Probes.oneWayAnova(col("v"), col("x"))(
      Seq(("A", 1.0), ("A", 1.0), ("B", 2.0), ("B", 2.0))
        .toDF("v", "x")).head()
    assert(const.isNullAt(const.fieldIndex("f")) &&
      const.getAs[Double]("eta_sq") === 1.0)
    // the 9e9 quantization bound raises loudly
    val ex = intercept[Exception] {
      Probes.oneWayAnova(col("v"), col("x"))(
        Seq(("A", 1.0e10), ("B", 1.0)).toDF("v", "x")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("9e9 quantization bound")))
    // brownForsytheK at k = 2 reduces to the two-sample op's F
    val sp = Seq(("A", 1.0), ("A", 3.0), ("B", 0.0), ("B", 10.0),
      ("B", 20.0)).toDF("v", "x")
    val fk = Probes.brownForsytheK(col("v"), col("x"))(sp).head()
      .getAs[Double]("f")
    val f2 = Probes.brownForsythe(col("v") === "A", col("x"))(sp).head()
      .getAs[Double]("f")
    assert(math.abs(fk - f2) < 1e-9, s"k-sample $fk vs two-sample $f2")
    // three variants with one spread-out arm: F present and positive
    val k3 = Probes.brownForsytheK(col("v"), col("x"))(
      Seq(("A", 1.0), ("A", 1.1), ("B", 2.0), ("B", 2.1),
        ("C", 0.0), ("C", 50.0), ("C", 100.0)).toDF("v", "x")).head()
    assert(k3.getAs[Long]("k") === 3L && k3.getAs[Double]("f") > 0.0)
  }

  test("friedmanTest: perfect-order Q, tie hand value, dropped blocks, degenerates") {
    import spark.implicits._
    def run(rows: Seq[(Long, String, Double)]) =
      Probes.friedmanTest("b", "t", col("x"))(
        rows.toDF("b", "t", "x")).head()
    // 3 blocks, perfect A<B<C ordering: classic Q = 12/36·126 − 36 = 6
    // (= (k−1)·n, the untied maximum)
    val perfect = for (b <- 1L to 3L; (t, v) <- Seq(("A", 1.0),
      ("B", 2.0), ("C", 3.0))) yield (b, t, v + b * 10)
    val r = run(perfect.toSeq)
    assert(r.getAs[Long]("n_blocks") === 3L &&
      r.getAs[Long]("n_dropped") === 0L && r.getAs[Long]("k") === 3L)
    assert(math.abs(r.getAs[Double]("q") - 6.0) < 1e-12)
    // Kendall's W = Q/(n(k−1)): perfect agreement reads exactly 1
    assert(r.getAs[Double]("w") === 1.0)
    // tie case, hand-rolled: b1 (1,1,2) -> 2r (3,3,6); b2 (1,2,3) ->
    // 2r (2,4,6): R2 = (5,7,12), ΣR2² = 218, num = 26; A2 = 110,
    // den = 14 -> Q = 2·26/14 = 26/7
    val tied = Seq((1L, "A", 1.0), (1L, "B", 1.0), (1L, "C", 2.0),
      (2L, "A", 1.0), (2L, "B", 2.0), (2L, "C", 3.0))
    val rt = run(tied)
    assert(math.abs(rt.getAs[Double]("q") - 26.0 / 7.0) < 1e-12)
    // W stays in [0, 1] under ties: (26/7)/(2·2) = 13/14
    val wT = rt.getAs[Double]("w")
    assert(math.abs(wT - 13.0 / 14.0) < 1e-12 && wT >= 0.0 && wT <= 1.0)
    // an incomplete block (missing C) and a duplicated cell both drop
    // and are REPORTED; the complete blocks' Q is unchanged
    val noisy = run(tied ++ Seq((3L, "A", 1.0), (3L, "B", 2.0),
      (4L, "A", 1.0), (4L, "A", 2.0), (4L, "B", 3.0), (4L, "C", 4.0)))
    assert(noisy.getAs[Long]("n_blocks") === 2L &&
      noisy.getAs[Long]("n_dropped") === 2L)
    assert(math.abs(noisy.getAs[Double]("q") - 26.0 / 7.0) < 1e-12)
    // every block internally tied: no rank signal, NULL Q
    val flat = run(Seq((1L, "A", 5.0), (1L, "B", 5.0),
      (2L, "A", 7.0), (2L, "B", 7.0)))
    assert(flat.getAs[Long]("n_blocks") === 2L &&
      flat.isNullAt(flat.fieldIndex("q")) &&
      flat.isNullAt(flat.fieldIndex("w")))
    // one treatment: NULL Q
    val onet = run(Seq((1L, "A", 1.0), (2L, "A", 2.0)))
    assert(onet.getAs[Long]("k") === 1L &&
      onet.isNullAt(onet.fieldIndex("q")))
  }

  test("friedmanConover: hand t pairs, zero-residual NULL, dropped blocks, maxK") {
    import spark.implicits._
    def run(rows: Seq[(Long, String, Double)], maxK: Int = 64) =
      Probes.friedmanConover("b", "t", col("x"), maxK = maxK)(
        rows.toDF("b", "t", "x"))
    // the friedmanTest tie fixture: b1 (1,1,2) -> 2r (3,3,6);
    // b2 (1,2,3) -> (2,4,6): R2 = (5,7,12), A2 = 110, sR2 = 218,
    // resNum = 2(2·110 − 218) = 4, df = (1)(2) -> t scale 1/sqrt(2):
    // t_AB = -2/sqrt2, t_AC = -7/sqrt2, t_BC = -5/sqrt2
    val tied = Seq((1L, "A", 1.0), (1L, "B", 1.0), (1L, "C", 2.0),
      (2L, "A", 1.0), (2L, "B", 2.0), (2L, "C", 3.0))
    val p = run(tied).orderBy("treatment_a", "treatment_b").collect()
    assert(p.length === 3)
    val s2 = math.sqrt(4.0 / 2.0)
    assert(p(0).getAs[Double]("t") === -2.0 / s2)
    assert(p(1).getAs[Double]("t") === -7.0 / s2)
    assert(p(2).getAs[Double]("t") === -5.0 / s2)
    assert(!p(0).getAs[Boolean]("reject") &&
      p(1).getAs[Boolean]("reject") && p(2).getAs[Boolean]("reject"))
    assert(p(0).getAs[Double]("mean_rank_a") === 1.25 &&
      p(0).getAs[Double]("mean_rank_b") === 1.75)
    // perfect order: zero residual variance (the rank table is
    // deterministic) -> NULL t; the omnibus W = 1 already carries it
    val perfect = (for (b <- 1L to 3L; (t, v) <- Seq(("A", 1.0),
      ("B", 2.0), ("C", 3.0))) yield (b, t, v + b * 10)).toSeq
    val pp = run(perfect).collect()
    assert(pp.forall(r => r.isNullAt(r.fieldIndex("t")) &&
      !r.getAs[Boolean]("reject")))
    // incomplete blocks drop and are reported, pairs unchanged
    val noisy = run(tied ++ Seq((3L, "A", 1.0), (3L, "B", 2.0)))
      .orderBy("treatment_a", "treatment_b").collect()
    assert(noisy(0).getAs[Long]("n_blocks") === 2L &&
      noisy(0).getAs[Long]("n_dropped") === 1L)
    assert(noisy(0).getAs[Double]("t") === -2.0 / s2)
    // the maxK guard raises before the pair frame
    val many = (1L to 2L).flatMap(b =>
      (1 to 9).map(i => (b, s"t$i", (b * i % 7).toDouble)))
    val ex = intercept[Exception] { run(many, maxK = 4).collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("maxK=4")))
  }

  test("signTest: hand z, zero diffs reported not counted, no-evidence NULL") {
    import spark.implicits._
    def run(rows: Seq[(Double, Double)]) =
      Probes.signTest(col("a"), col("b"))(rows.toDF("a", "b")).head()
    // diffs (+, +, +, -, 0): pos 3, neg 1, zero 1 -> z = 2/sqrt(4) = 1
    val r = run(Seq((1.0, 0.0), (2.0, 0.0), (3.0, 0.0), (0.0, 4.0),
      (5.0, 5.0)))
    assert(r.getAs[Long]("n_pairs") === 5L &&
      r.getAs[Long]("n_zero") === 1L &&
      r.getAs[Long]("n_pos") === 3L && r.getAs[Long]("n_neg") === 1L)
    assert(r.getAs[Double]("z") === 1.0)
    // all zero: NULL z (no evidence)
    val z0 = run(Seq((1.0, 1.0), (2.0, 2.0)))
    assert(z0.isNullAt(z0.fieldIndex("z")))
    // z² is McNemar's uncorrected chi² on the same discordant split
    val mc = Probes.mcnemarTest(col("a") > 0.5, col("b") > 0.5,
      correction = false)(
      Seq((1.0, 0.0), (2.0, 0.0), (3.0, 0.0), (0.0, 4.0))
        .toDF("a", "b")).head().getAs[Double]("chi2")
    val st = run(Seq((1.0, 0.0), (2.0, 0.0), (3.0, 0.0), (0.0, 4.0)))
      .getAs[Double]("z")
    assert(math.abs(st * st - mc) < 1e-12)
  }

  test("pair-guard raise sits below the pair join in the optimized plan") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{
      Filter => LFilter, Join => LJoin}
    import org.apache.spark.sql.catalyst.expressions.RaiseError
    val d = Seq(("g", 1L, 1.0, 2.0), ("g", 2L, 2.0, 3.0),
      ("h", 3L, 1.0, 4.0)).toDF("g", "i", "x", "y")
    // theilSen's public plan pins its tiny slope median (r20), which
    // hides the pair dag behind a checkpointed leaf — the guard shape
    // is asserted on the SHARED generator (theilSenPairs) instead, the
    // one definition the whole Theil–Sen family rides; the public op's
    // raise still firing through the pin is asserted behaviorally in
    // the maxN tests
    val (_, _, tsPairs) = Probes.theilSenPairs("g", "i", "x", "y",
      maxN = 10000)(d)
    for (q <- Seq(Probes.kendallTau("g", "i", "x", "y")(d),
        tsPairs,
        Probes.mannKendall("g", "i", "x", "y")(d))) {
      val guards = q.queryExecution.optimizedPlan.collect {
        case f: LFilter
          if f.condition.find(_.isInstanceOf[RaiseError]).isDefined => f
      }
      assert(guards.nonEmpty, "no raise_error guard Filter in the plan")
      // at least one guard Filter's subtree holds NO Join: the raise
      // evaluates while side a materializes, before pair enumeration
      assert(guards.exists(f => f.collect { case j: LJoin => j }.isEmpty),
        "guard Filter should sit below the pair join:\n" +
          q.queryExecution.optimizedPlan.treeString)
    }
  }

  test("proportionZTest: hand z, degenerate pool NULL, empty side NULL") {
    import spark.implicits._
    def run(rows: Seq[(Boolean, Boolean)]) =
      Probes.proportionZTest(col("a"), col("s"))(rows.toDF("a", "s"))
        .head()
    // a: 3/4 pass, b: 1/4 pass; pool = 1/2 -> var = 1/8, z = sqrt(2)
    val r = run(Seq((true, true), (true, true), (true, true),
      (true, false), (false, true), (false, false), (false, false),
      (false, false)))
    assert(r.getAs[Long]("n_a") === 4L && r.getAs[Long]("k_a") === 3L)
    assert(r.getAs[Double]("p_a") === 0.75 &&
      r.getAs[Double]("p_b") === 0.25 &&
      r.getAs[Double]("risk_diff") === 0.5)
    assert(math.abs(r.getAs[Double]("z") - math.sqrt(2.0)) < 1e-15)
    // everyone passes: pooled variance 0 -> z NULL, rates honest
    val all = run(Seq((true, true), (false, true)))
    assert(all.getAs[Double]("p_a") === 1.0 &&
      all.getAs[java.lang.Double]("z") == null)
    // one side empty: p_b/risk_diff/z NULL, counts honest
    val one = run(Seq((true, true), (true, false)))
    assert(one.getAs[Long]("n_b") === 0L &&
      one.getAs[java.lang.Double]("p_b") == null &&
      one.getAs[java.lang.Double]("risk_diff") == null &&
      one.getAs[java.lang.Double]("z") == null)
  }

  test("cochranArmitage: hand T/variance, k=2 is proportionZ, reversal/shift algebra") {
    import spark.implicits._
    def run(rows: Seq[(Long, Boolean)]) =
      Probes.cochranArmitage(col("w"), col("s"))(rows.toDF("w", "s"))
        .head()
    def dose(w: Long, k: Int, n: Int): Seq[(Long, Boolean)] =
      (0 until n).map(i => (w, i < k))
    // hand: doses 0/1/2, 4 trials each, successes 1/2/3 —
    // T = 12·8 − 6·12 = 24, Var = 36·96/12 = 288, z = 24/√288 = √2
    val hand = dose(0L, 1, 4) ++ dose(1L, 2, 4) ++ dose(2L, 3, 4)
    val h = run(hand)
    assert(h.getAs[Long]("k") === 3L && h.getAs[Long]("n") === 12L &&
      h.getAs[Long]("successes") === 6L)
    assert(h.getAs[Double]("t_trend") === 24.0)
    assert(math.abs(h.getAs[Double]("z") - math.sqrt(2.0)) < 1e-15)
    // dose reversal (w -> 2 − w) negates T and z EXACTLY (integer
    // legs); a constant shift (w -> w + 7) changes NOTHING
    val rev = run(hand.map { case (w, s) => (2L - w, s) })
    assert(rev.getAs[Double]("t_trend") === -24.0)
    assert(rev.getAs[Double]("z") === -h.getAs[Double]("z"))
    val shift = run(hand.map { case (w, s) => (w + 7L, s) })
    assert(shift.getAs[Double]("t_trend") === h.getAs[Double]("t_trend"))
    assert(shift.getAs[Double]("z") === h.getAs[Double]("z"))
    // k = 2 with scores {0, 1} reduces to proportionZTest's pooled z
    // (algebraically equal — distinct IEEE dags, so 1e-12)
    val two = dose(0L, 1, 4) ++ dose(1L, 3, 4)
    val ca = run(two)
    val pz = Probes.proportionZTest(col("w") === 1L, col("s"))(
      two.toDF("w", "s")).head()
    assert(math.abs(ca.getAs[Double]("z") - pz.getAs[Double]("z"))
      < 1e-12)
    // degenerate reads: one dose level, or K = 0 / K = n → NULL z
    assert(run(dose(1L, 2, 5)).getAs[java.lang.Double]("z") == null)
    assert(run(dose(0L, 0, 3) ++ dose(1L, 0, 3))
      .getAs[java.lang.Double]("z") == null)
    assert(run(dose(0L, 3, 3) ++ dose(1L, 3, 3))
      .getAs[java.lang.Double]("z") == null)
    // the integer-score contract fails loudly on fractional doses
    val ex = intercept[Exception] {
      Probes.cochranArmitage(col("w"), col("s"))(
        Seq((0.5, true), (1.0, false)).toDF("w", "s")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("cochranArmitage")))
  }

  test("theilSen: outlier immunity, even-count median, vertical pairs, guard") {
    import spark.implicits._
    def run(pts: Seq[(Long, Double, Double)], maxN: Int = 10000) =
      Probes.theilSen("g", "i", "x", "y", maxN)(
        pts.map { case (i, x, y) => ("g", i, x, y) }
          .toDF("g", "i", "x", "y")).head()
    // y = 2x with one wild outlier: OLS is dragged, Theil-Sen is not —
    // 6 of 10 slopes are exactly 2, both middles land on 2; residuals
    // (0,0,0,0,90) give intercept 0
    val out = run(Seq((1L, 1.0, 2.0), (2L, 2.0, 4.0), (3L, 3.0, 6.0),
      (4L, 4.0, 8.0), (5L, 5.0, 100.0)))
    assert(out.getAs[Long]("n") === 5L && out.getAs[Long]("n_pairs") === 10L)
    assert(out.getAs[Double]("slope") === 2.0 &&
      out.getAs[Double]("intercept") === 0.0)
    // two points: one pair, exact line y = 2x - 1
    val two = run(Seq((1L, 1.0, 1.0), (2L, 2.0, 3.0)))
    assert(two.getAs[Double]("slope") === 2.0 &&
      two.getAs[Double]("intercept") === -1.0)
    // even slope count averages the two middles: x=1..4, y=(0,1,3,6)
    // gives slopes sorted (1, 1.5, 2, 2, 2.5, 3) -> (2+2)/2 = 2
    val even = run(Seq((1L, 1.0, 0.0), (2L, 2.0, 1.0), (3L, 3.0, 3.0),
      (4L, 4.0, 6.0)))
    assert(even.getAs[Double]("slope") === 2.0)
    // UNEQUAL even middles must truly average (the long-`/`-is-double
    // trap): y=(0,1,3,7) -> slopes (1, 1.5, 2, 7/3, 3, 4) -> (2+7/3)/2
    val uneq = run(Seq((1L, 1.0, 0.0), (2L, 2.0, 1.0), (3L, 3.0, 3.0),
      (4L, 4.0, 7.0)))
    assert(uneq.getAs[Double]("slope") === (2.0 + 7.0 / 3.0) / 2.0)
    // all x equal: vertical pairs drop, honest NULLs
    val vert = run(Seq((1L, 1.0, 1.0), (2L, 1.0, 5.0)))
    assert(vert.getAs[Long]("n") === 2L &&
      vert.getAs[Long]("n_pairs") === 0L &&
      vert.getAs[java.lang.Double]("slope") == null &&
      vert.getAs[java.lang.Double]("intercept") == null)
    // the quadratic guard fails loudly past maxN
    val ex = intercept[Exception] {
      run(Seq((1L, 1.0, 1.0), (2L, 2.0, 2.0), (3L, 3.0, 3.0)), maxN = 2)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("pair join is O(n^2)")))
  }

  test("mannKendall: hand S/variance, tie corrections, reversal, zero-S, guard") {
    import spark.implicits._
    def run(pts: Seq[(Long, Double, Double)], maxN: Int = 10000) =
      Probes.mannKendall("g", "i", "t", "x", maxN)(
        pts.map { case (i, t, x) => ("g", i, t, x) }
          .toDF("g", "i", "t", "x")).head()
    // distinct times/values: x = (1,3,2,5,4) over t = 1..5 gives
    // 8 concordant, 2 discordant -> S = 6; Var = 5*4*15/18 = 300/18;
    // z = (6-1)/sqrt(300/18) — the exact textbook MK dag
    val base = Seq((1L, 1.0, 1.0), (2L, 2.0, 3.0), (3L, 3.0, 2.0),
      (4L, 4.0, 5.0), (5L, 5.0, 4.0))
    val r = run(base)
    assert(r.getAs[Long]("n") === 5L && r.getAs[Long]("s") === 6L)
    assert(r.getAs[Double]("var_s") === 300.0 / 18.0)
    assert(r.getAs[Double]("z") === 5.0 / math.sqrt(300.0 / 18.0))
    // reversing time negates S and z EXACTLY (the continuity
    // correction is sign-symmetric)
    val rev = run(base.map { case (i, t, x) => (i, 6.0 - t, x) })
    assert(rev.getAs[Long]("s") === -6L)
    assert(rev.getAs[Double]("z") === -r.getAs[Double]("z"))
    // a VALUE tie reduces the variance by exactly its t(t-1)(2t+5)/18
    // mass: x = (1,2,2,3) -> S = 5, Var = (4*3*13 - 2*1*9)/18
    val vt = run(Seq((1L, 1.0, 1.0), (2L, 2.0, 2.0), (3L, 3.0, 2.0),
      (4L, 4.0, 3.0)))
    assert(vt.getAs[Long]("s") === 5L &&
      vt.getAs[Double]("var_s") === 138.0 / 18.0)
    // a TIME tie is symmetric: tied-time pairs contribute exact 0 to
    // S and the u-leg subtracts the same mass
    val tt = run(Seq((1L, 1.0, 1.0), (2L, 1.0, 2.0), (3L, 2.0, 3.0),
      (4L, 3.0, 4.0)))
    assert(tt.getAs[Long]("s") === 5L &&
      tt.getAs[Double]("var_s") === 138.0 / 18.0)
    // ties in BOTH at size 3 light up every leg of the bivariate
    // form: t = x = (1,1,1,2) -> S = 3,
    // Var = 24/18 + 36/216 + 36/24 = 3.0 exactly
    val bt = run(Seq((1L, 1.0, 1.0), (2L, 1.0, 1.0), (3L, 1.0, 1.0),
      (4L, 2.0, 2.0)))
    assert(bt.getAs[Long]("s") === 3L)
    assert(bt.getAs[Double]("var_s") ===
      24.0 / 18.0 + 6.0 * 6.0 / (9.0 * 4.0 * 3.0 * 2.0) +
        6.0 * 6.0 / (2.0 * 4.0 * 3.0))
    assert(bt.getAs[Double]("z") === 2.0 / math.sqrt(3.0))
    // S = 0 with live variance reads exact 0.0, not NULL
    val z0 = run(Seq((1L, 1.0, 1.0), (2L, 2.0, 2.0), (3L, 3.0, 1.0)))
    assert(z0.getAs[Long]("s") === 0L && z0.getAs[Double]("z") === 0.0)
    // all values tied: zero variance -> NULL z with the honest S
    val flat = run(Seq((1L, 1.0, 7.0), (2L, 2.0, 7.0)))
    assert(flat.getAs[Long]("s") === 0L &&
      flat.getAs[java.lang.Double]("z") == null)
    // the quadratic guard fails loudly past maxN
    val ex = intercept[Exception] { run(base, maxN = 3) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("pair join is O(n^2)")))
  }

  test("theilSenCI: rank-outward limits, degenerate-wide clamp, theilSen median parity") {
    import spark.implicits._
    def run(pts: Seq[(Long, Double, Double)]) =
      Probes.theilSenCI("g", "i", "x", "y")(
        pts.map { case (i, x, y) => ("g", i, x, y) }
          .toDF("g", "i", "x", "y")).head()
    // y = x^2 over x = 1..10: slopes are the pair sums a+b, N' = 45,
    // no ties anywhere -> Var(S) = 10*9*25/18 = 125,
    // C = 1.96*sqrt(125) = 21.91; M1 = 11.54 -> rank 11 (value 8),
    // M2 = 33.46 -> rank 34 (value 14); median rank 23 -> 11
    val sq = (1L to 10L).map(i => (i, i.toDouble, (i * i).toDouble))
    val r = run(sq)
    assert(r.getAs[Long]("n") === 10L && r.getAs[Long]("n_pairs") === 45L)
    assert(r.getAs[Double]("slope") === 11.0)
    assert(r.getAs[Double]("slope_lo") === 8.0 &&
      r.getAs[Double]("slope_hi") === 14.0)
    // the point estimate IS theilSen's (same ranks, same average)
    val ts = Probes.theilSen("g", "i", "x", "y")(
      sq.map { case (i, x, y) => ("g", i, x, y) }
        .toDF("g", "i", "x", "y")).head()
    assert(r.getAs[Double]("slope") === ts.getAs[Double]("slope"))
    // tiny n: C >= N' clamps to the extreme slopes — the documented
    // honestly-wide interval, never a silent NULL
    val tiny = run(Seq((1L, 1.0, 1.0), (2L, 2.0, 2.0), (3L, 3.0, 4.0)))
    assert(tiny.getAs[Double]("slope") === 1.5)
    assert(tiny.getAs[Double]("slope_lo") === 1.0 &&
      tiny.getAs[Double]("slope_hi") === 2.0)
    // all y tied: zero MK variance -> NULL limits, honest slope 0
    val flat = run(Seq((1L, 1.0, 5.0), (2L, 2.0, 5.0), (3L, 3.0, 5.0)))
    assert(flat.getAs[Double]("slope") === 0.0 &&
      flat.isNullAt(flat.fieldIndex("slope_lo")) &&
      flat.isNullAt(flat.fieldIndex("slope_hi")))
    // all x tied: no valid pairs -> NULL everything with honest counts
    val vert = run(Seq((1L, 1.0, 1.0), (2L, 1.0, 5.0)))
    assert(vert.getAs[Long]("n_pairs") === 0L &&
      vert.isNullAt(vert.fieldIndex("slope")) &&
      vert.isNullAt(vert.fieldIndex("slope_lo")))
  }

  test("seasonalMannKendall: per-season sums, one season is mannKendall, de-seasoning") {
    import spark.implicits._
    def run(pts: Seq[(String, Long, Double, Double)]) =
      Probes.seasonalMannKendall("g", "sea", "i", "t", "x")(
        pts.map { case (s, i, t, x) => ("g", s, i, t, x) }
          .toDF("g", "sea", "i", "t", "x")).head()
    // season A: 4 increasing points (S=6, Var=156/18); season B: 3
    // increasing (S=3, Var=66/18) — sums, fold in season order
    val two = run(Seq(("a", 1L, 1.0, 1.0), ("a", 2L, 2.0, 2.0),
      ("a", 3L, 3.0, 3.0), ("a", 4L, 4.0, 4.0),
      ("b", 5L, 1.0, 1.0), ("b", 6L, 2.0, 2.0), ("b", 7L, 3.0, 3.0)))
    assert(two.getAs[Long]("n") === 7L &&
      two.getAs[Long]("n_seasons") === 2L)
    assert(two.getAs[Long]("s") === 9L)
    assert(two.getAs[Double]("var_s") === 0.0 + 156.0 / 18.0 + 66.0 / 18.0)
    assert(two.getAs[Double]("z") ===
      8.0 / math.sqrt(0.0 + 156.0 / 18.0 + 66.0 / 18.0))
    // ONE season reduces to mannKendall exactly (0.0 + v == v)
    val pts1 = Seq((1L, 1.0, 1.0), (2L, 2.0, 3.0), (3L, 3.0, 2.0),
      (4L, 4.0, 5.0), (5L, 5.0, 4.0))
    val smk = run(pts1.map { case (i, t, x) => ("only", i, t, x) })
    val mk = Probes.mannKendall("g", "i", "t", "x")(
      pts1.map { case (i, t, x) => ("g", i, t, x) }
        .toDF("g", "i", "t", "x")).head()
    assert(smk.getAs[Long]("s") === mk.getAs[Long]("s"))
    assert(smk.getAs[Double]("var_s") === mk.getAs[Double]("var_s"))
    assert(smk.getAs[Double]("z") === mk.getAs[Double]("z"))
    // the de-seasoning point: per-season levels rise while every
    // season trends DOWN — plain MK reads up, seasonal reads down
    val seasonal = Seq(("a", 1L, 1.0, 12.0), ("a", 2L, 2.0, 11.0),
      ("a", 3L, 3.0, 10.0), ("b", 4L, 4.0, 22.0),
      ("b", 5L, 5.0, 21.0), ("b", 6L, 6.0, 20.0))
    val de = run(seasonal)
    assert(de.getAs[Long]("s") === -6L && de.getAs[Double]("z") < 0.0)
    val plain = Probes.mannKendall("g", "i", "t", "x")(
      seasonal.map { case (_, i, t, x) => ("g", i, t, x) }
        .toDF("g", "i", "t", "x")).head()
    assert(plain.getAs[Long]("s") === 3L && plain.getAs[Double]("z") > 0.0)
  }

  test("seasonalTheilSen: one season is theilSen, de-seasoning slope, pooled median") {
    import spark.implicits._
    def run(pts: Seq[(String, Long, Double, Double)]) =
      Probes.seasonalTheilSen("g", "sea", "i", "x", "y")(
        pts.map { case (s, i, x, y) => ("g", s, i, x, y) }
          .toDF("g", "sea", "i", "x", "y")).head()
    // ONE season reduces to theilSen's slope EXACTLY (identical pair
    // set, identical selection median)
    val pts1 = Seq((1L, 1.0, 1.0), (2L, 2.0, 3.0), (3L, 3.0, 2.0),
      (4L, 4.0, 5.0), (5L, 5.0, 4.0))
    val sts = run(pts1.map { case (i, x, y) => ("only", i, x, y) })
    val ts = Probes.theilSen("g", "i", "x", "y")(
      pts1.map { case (i, x, y) => ("g", i, x, y) }
        .toDF("g", "i", "x", "y")).head()
    assert(sts.getAs[Double]("slope") === ts.getAs[Double]("slope"))
    assert(sts.getAs[Long]("n_pairs") === ts.getAs[Long]("n_pairs"))
    assert(sts.getAs[Long]("n_seasons") === 1L)
    // the de-seasoning point (the seasonalMannKendall fixture): each
    // season's level rises while every season trends DOWN at −1 per
    // step — the plain slope reads the cycle (positive), the
    // same-season pooled slopes are all exactly −1
    val seasonal = Seq(("a", 1L, 1.0, 12.0), ("a", 2L, 2.0, 11.0),
      ("a", 3L, 3.0, 10.0), ("b", 4L, 4.0, 22.0),
      ("b", 5L, 5.0, 21.0), ("b", 6L, 6.0, 20.0))
    val de = run(seasonal)
    assert(de.getAs[Long]("n") === 6L &&
      de.getAs[Long]("n_seasons") === 2L &&
      de.getAs[Long]("n_pairs") === 6L)
    assert(de.getAs[Double]("slope") === -1.0)
    val plainTs = Probes.theilSen("g", "i", "x", "y")(
      seasonal.map { case (_, i, x, y) => ("g", i, x, y) }
        .toDF("g", "i", "x", "y")).head()
    assert(plainTs.getAs[Double]("slope") > 0.0)
    // pooled EVEN-count median averages the two middle slopes across
    // seasons: season a slopes {1, 1, 1}, season b {5} -> sorted
    // (1,1,1,5), median (1+1)/2 = 1
    val pool = run(Seq(("a", 1L, 1.0, 1.0), ("a", 2L, 2.0, 2.0),
      ("a", 3L, 3.0, 3.0), ("b", 4L, 1.0, 0.0), ("b", 5L, 2.0, 5.0)))
    assert(pool.getAs[Long]("n_pairs") === 4L &&
      pool.getAs[Double]("slope") === 1.0)
    // all seasons single-point: no pairs, NULL slope, honest counts
    val lone = run(Seq(("a", 1L, 1.0, 1.0), ("b", 2L, 2.0, 9.0)))
    assert(lone.getAs[Long]("n_pairs") === 0L &&
      lone.getAs[Long]("n_seasons") === 2L &&
      lone.isNullAt(lone.fieldIndex("slope")))
  }

  test("logRankK df-gate: reject picks the stored crit by observed k, override honored") {
    import spark.implicits._
    // a 4-arm fixture whose chi2 lands BETWEEN the k=3 gate (5.991)
    // and the k=4 gate (7.815) would flip under the old fixed
    // default; here we pin the mechanics both ways on a hand frame
    val d3 = Seq(("A", 1L, false), ("B", 2L, false), ("C", 3L, true))
      .toDF("v", "t", "c")
    // chi2 = 2.2 at k = 3: default gate 5.991 -> false; an explicit
    // tiny override -> true (the caller owns the df match)
    val defRej = Probes.logRankK(col("v"), col("t"), col("c"))(d3)
      .head()
    assert(defRej.getAs[Long]("k") === 3L &&
      !defRej.getAs[Boolean]("reject"))
    val over = Probes.logRankK(col("v"), col("t"), col("c"),
      chi2Crit = Some(2.0))(d3).head()
    assert(over.getAs[Boolean]("reject"))
    // df = k − 1 > 8 with no override: NULL reject, honest chi2
    val many = (0 until 10).map(i =>
      (s"v$i", (i % 4).toLong + 1L, false)).toDF("v", "t", "c")
    val wide = Probes.logRankK(col("v"), col("t"), col("c"))(many)
      .collect()
    assert(wide.forall(r => r.getAs[Long]("k") === 10L &&
      r.isNullAt(r.fieldIndex("reject")) &&
      !r.isNullAt(r.fieldIndex("chi2"))))
  }

  test("pair ops raise loudly on duplicate ids (the arithmetic-pair-count contract)") {
    import spark.implicits._
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // theilSen family and mannKendall share the guarded frame: a
    // duplicated id silently shrinks the i_a < i_b pair frame while
    // N' and the variance legs still count those pairs — raise
    val dup = Seq(("g", 1L, 1.0, 1.0), ("g", 2L, 2.0, 2.0),
      ("g", 2L, 3.0, 3.0)).toDF("g", "i", "x", "y")
    val e1 = intercept[Exception] {
      Probes.theilSenCI("g", "i", "x", "y")(dup).collect()
    }
    assert(msgs(e1).exists(m => m.contains("duplicate id") &&
      m.contains("theilSenCI")))
    val e2 = intercept[Exception] {
      Probes.mannKendall("g", "i", "t", "x")(
        dup.toDF("g", "i", "t", "x")).collect()
    }
    assert(msgs(e2).exists(m => m.contains("duplicate id") &&
      m.contains("mannKendall")))
    // unique ids pass untouched
    val ok = Seq(("g", 1L, 1.0, 1.0), ("g", 2L, 2.0, 2.0),
      ("g", 3L, 3.0, 3.0)).toDF("g", "i", "x", "y")
    assert(Probes.theilSen("g", "i", "x", "y")(ok).count() === 1L)
  }

  test("mannKendall agrees in sign with theilSen on a monotone fixture") {
    import spark.implicits._
    // strictly increasing y over x: every pair concordant -> S = n(n-1)/2,
    // z > 0, and the Theil-Sen slope is positive; mirrored decreasing
    val up = (1L to 12L).map(i => ("g", i, i.toDouble, 3.0 * i + 1.0))
      .toDF("g", "i", "t", "x")
    val mkUp = Probes.mannKendall("g", "i", "t", "x")(up).head()
    val tsUp = Probes.theilSen("g", "i", "t", "x")(up).head()
    assert(mkUp.getAs[Long]("s") === 66L)
    assert(mkUp.getAs[Double]("z") > 1.96 &&
      tsUp.getAs[Double]("slope") > 0.0)
    val dn = (1L to 12L).map(i => ("g", i, i.toDouble, -2.0 * i))
      .toDF("g", "i", "t", "x")
    val mkDn = Probes.mannKendall("g", "i", "t", "x")(dn).head()
    val tsDn = Probes.theilSen("g", "i", "t", "x")(dn).head()
    assert(mkDn.getAs[Double]("z") < -1.96 &&
      tsDn.getAs[Double]("slope") < 0.0)
  }

  test("chebyshevP + bhCorrect after dunnTest: BH-rejected is a subset of the per-pair gate") {
    import spark.implicits._
    // three arms, one separated: pairs (a,c) and (b,c) carry large
    // |z|, (a,b) none. At the SAME alpha the per-pair gate is
    // |z| >= sqrt(1/alpha) (p = 1/z^2 <= alpha), and p_adj >= p
    // always, so BH's rejections can never exceed the raw gate's.
    val alpha = 0.05
    val rows = (0 until 90).map { i =>
      val v = Seq("a", "b", "c")(i % 3)
      val x = (if (v == "c") 100.0 else 0.0) + (i / 3) * 0.1
      (v, x)
    }.toDF("v", "x")
    val dunn = Probes.dunnTest(col("v"), col("x"),
      zCrit = math.sqrt(1.0 / alpha))(rows)
      .withColumn("pair",
        concat_ws("|", col("variant_a"), col("variant_b")))
      .withColumn("p_raw", Probes.chebyshevP(col("z")))
    val gate = dunn.collect()
      .map(r => r.getAs[String]("pair") -> r.getAs[Boolean]("reject"))
      .toMap
    val bh = Probes.bhCorrect("pair", "p_raw", alpha)(dunn).collect()
    assert(bh.length === 3)
    // p_adj >= p on every row (the step-up only inflates)
    assert(bh.forall(r =>
      r.getAs[Double]("p_adj") >= r.getAs[Double]("p") - 1e-15))
    // the subset property, and the separated pairs do survive
    val bhRej = bh.filter(_.getAs[Boolean]("reject"))
      .map(_.getAs[String]("pair")).toSet
    assert(bhRej.subsetOf(gate.filter(_._2).keySet))
    assert(bhRej === Set("a|c", "b|c"))
    // the envelope itself: z=0 -> exact 1.0; |z|>1 shrinks; NULL stays
    val env = Seq((0.0, "z0"), (2.0, "z2"), (0.5, "zh"))
      .toDF("z", "id")
      .select(col("id"), Probes.chebyshevP(col("z")).as("p"))
      .collect().map(r => r.getAs[String]("id") ->
        r.getAs[Double]("p")).toMap
    assert(env("z0") === 1.0 && env("z2") === 0.25 && env("zh") === 1.0)
    val nullP = Seq(Tuple1(Option.empty[java.lang.Double]))
      .toDF("z").select(Probes.chebyshevP(col("z")).as("p")).head()
    assert(nullP.isNullAt(0))
  }

  test("mcnemarTest: hand chi2, correction toggle, no-evidence NULL, NULL drop") {
    import spark.implicits._
    // both=2, a_only=3, b_only=1, both_wrong=1: |3-1|=2, CC num=1 -> 1/4
    val rows = Seq((true, true), (true, true), (true, false), (true, false),
      (true, false), (false, true), (false, false)).toDF("a", "b")
    val r = Probes.mcnemarTest(col("a"), col("b"))(rows).head()
    assert(r.getAs[Long]("n") === 7L &&
      r.getAs[Long]("both_correct") === 2L &&
      r.getAs[Long]("a_only") === 3L && r.getAs[Long]("b_only") === 1L &&
      r.getAs[Long]("both_wrong") === 1L)
    assert(r.getAs[Double]("chi2") === 0.25)
    // asymptotic form: (3-1)^2/4 = 1
    assert(Probes.mcnemarTest(col("a"), col("b"), correction = false)(rows)
      .head().getAs[Double]("chi2") === 1.0)
    // tie after correction: |1-1|-1 floored at 0 -> chi2 = 0, not 1/(b+c)
    val even = Seq((true, false), (false, true)).toDF("a", "b")
    assert(Probes.mcnemarTest(col("a"), col("b"))(even)
      .head().getAs[Double]("chi2") === 0.0)
    // no discordant items: NULL (zero evidence), counts honest
    val agree = Seq((true, true), (false, false)).toDF("a", "b")
    val ra = Probes.mcnemarTest(col("a"), col("b"))(agree).head()
    assert(ra.getAs[java.lang.Double]("chi2") == null &&
      ra.getAs[Long]("n") === 2L)
    // NULL flags drop; groups independent
    val g = Probes.mcnemarTest(col("a"), col("b"), Seq("g"))(
      Seq(("g1", Some(true), Some(false)), ("g1", Some(true), None),
        ("g2", Some(false), Some(true))).toDF("g", "a", "b"))
      .orderBy("g").collect()
    assert(g.map(_.getAs[Long]("n")).toSeq === Seq(1L, 1L))
    assert(g(0).getAs[Long]("a_only") === 1L &&
      g(1).getAs[Long]("b_only") === 1L)
  }
}
