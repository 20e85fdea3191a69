package graft

import org.apache.spark.sql.functions._
import graft.ext.Frequency

/** Two-pass heavy hitters: exactness vs the naive GROUP BY ... HAVING
  * plan (the oracle shape), the Misra–Gries superset guarantee under
  * adversarial partitioning, and the edge semantics (NULL keys, cap
  * derivation, degenerate streams). */
class FrequencySpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, key: String,
      minFreq: Double): Set[(String, Long)] = {
    val n = df.filter(col(key).isNotNull).count()
    df.filter(col(key).isNotNull)
      .groupBy(key).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").cast("double") > lit(minFreq) * lit(n.toDouble))
      .as[(String, Long)].collect().toSet
  }

  test("equals the naive exact plan on a skewed stream") {
    // zipf-ish: key k appears ~1000/k times — a realistic token curve
    val rows = (1 to 50).flatMap(k => Seq.fill(1000 / k)(s"k$k"))
    val df = spark.createDataset(rows).toDF("k").repartition(7)
    for (f <- Seq(0.01, 0.05, 0.2)) {
      val got = Frequency.heavyHitters("k", f)(df)
        .as[(String, Long)].collect().toSet
      assert(got === naive(df, "k", f), s"minFreq=$f")
    }
  }

  test("exact under adversarial partitioning (each key local-light)") {
    // every key is spread thin across partitions so NO single partition
    // sees it as locally heavy relative to a big cap — the averaging
    // argument (some partition must exceed n_p/cap) is what's on trial
    val rows = (0 until 4000).map(i => s"k${i % 40}") // 100 each, uniform
    val df = spark.createDataset(rows).toDF("k").repartition(32)
    // minFreq 0.02 => threshold 80 < 100: all 40 keys qualify
    val got = Frequency.heavyHitters("k", 0.02)(df)
      .as[(String, Long)].collect().toSet
    assert(got === (0 until 40).map(k => (s"k$k", 100L)).toSet)
  }

  test("counts are exact, not MG estimates") {
    val rows = Seq.fill(900)("hot") ++ (0 until 300).map(i => s"cold$i")
    val df = spark.createDataset(rows).toDF("k").repartition(5)
    val got = Frequency.heavyHitters("k", 0.5)(df).as[(String, Long)].collect()
    assert(got.toSeq === Seq(("hot", 900L)))
  }

  test("NULL keys are dropped and do not count toward N") {
    val df = (Seq.fill(8)(Some("a")) ++ Seq.fill(92)(Option.empty[String]))
      .toDF("k")
    // N = 8 non-null rows; "a" at 8/8 passes any minFreq < 1
    val got = Frequency.heavyHitters("k", 0.9)(df).as[(String, Long)].collect()
    assert(got.toSeq === Seq(("a", 8L)))
  }

  test("empty stream and all-below-threshold streams return no rows") {
    assert(Frequency.heavyHitters("k", 0.1)(
      Seq.empty[String].toDF("k")).count() === 0)
    val uniform = spark.createDataset((0 until 1000).map(i => s"u$i")).toDF("k")
    assert(Frequency.heavyHitters("k", 0.01)(uniform).count() === 0)
  }

  test("minFreq bounds are enforced") {
    val df = Seq("a").toDF("k")
    intercept[IllegalArgumentException](Frequency.heavyHitters("k", 0.0)(df))
    intercept[IllegalArgumentException](Frequency.heavyHitters("k", 1.0)(df))
  }

  test("heavyHittersByGroup: per-group thresholds, exact under partition spread") {
    // group g1 is big (key "a" heavy there), g2 tiny (key "z" heavy in
    // g2 but invisible corpus-wide — the case the per-group form exists
    // for)
    val rows = Seq.fill(300)(("g1", "a")) ++
      (0 until 700).map(i => ("g1", s"c$i")) ++
      Seq.fill(8)(("g2", "z")) ++ (0 until 2).map(i => ("g2", s"d$i"))
    val df = spark.createDataset(rows).toDF("g", "k").repartition(11)
    val got = Frequency.heavyHittersByGroup("g", "k", 0.25)(df)
      .as[(String, String, Long)].collect().toSet
    // g1: a at 300/1000 = 0.3 > 0.25; g2: z at 8/10 = 0.8
    assert(got === Set(("g1", "a", 300L), ("g2", "z", 8L)))
    // NULL group or key rows drop
    val withNulls = (rows.map { case (g, k) => (Option(g), Option(k)) } ++
      Seq((None, Some("a")), (Some("g2"), None))).toDF("g", "k")
    val got2 = Frequency.heavyHittersByGroup("g", "k", 0.25)(withNulls)
      .as[(String, String, Long)].collect().toSet
    assert(got2 === got)
  }

  test("heavyHitterPhrases counts DOCUMENT frequency: in-doc repeats vote once") {
    val df = Seq(
      (1L, "x y z x y z x y z"), // "x y z" repeats but votes once
      (2L, "x y z a b c"),
      (3L, "a b c d e f")).toDF("doc_id", "text")
    val got = Frequency.heavyHitterPhrases("text", n = 3, minFreq = 0.1)(df)
      .as[(String, Long)].collect().toMap
    assert(got("x y z") === 2L) // docs 1 and 2, not 4
    assert(got("a b c") === 2L)
  }

  test("heavyHitterTerms tokenizes like the library (NULL text => [\"\"])") {
    val df = Seq(
      (1L, "the cat and the dog and the fish"),
      (2L, null.asInstanceOf[String]),
      (3L, "the end")).toDF("doc_id", "text")
    // tokens: the×4 cat and×2 dog fish ""×1 end — N = 11
    val got = Frequency.heavyHitterTerms("text", 0.25)(df)
      .as[(String, Long)].collect().toMap
    assert(got === Map("the" -> 4L)) // 4/11 > .25; "and" 2/11 fails
  }

  test("associationRules: hand support/confidence/lift, caps, dup/NULL doctrine") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // t1{a,b} t2{a,b} t3{a,b,c} t4{a} t5{c}: N=5, n_a=4 n_b=3 n_c=2,
    // (a,b)=3 (a,c)=1 (b,c)=1; t1's duplicate 'a' collapses; NULLs drop
    val rows = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"), (3L, "c"),
      (4L, "a"), (5L, "c")).toDF("t", "i")
      .unionByName(Seq((Option(6L), Option.empty[String]),
        (Option.empty[Long], Option("z"))).toDF("t", "i"))
    val r = Frequency.associationRules("t", "i", minSupportCount = 2)(rows)
      .orderBy("antecedent", "consequent").collect()
    assert(r.map(x => (x.getString(0), x.getString(1))).toSeq ===
      Seq(("a", "b"), ("b", "a")))
    val ab = r(0); val ba = r(1)
    assert(ab.getAs[Long]("pair_count") === 3L &&
      ab.getAs[Long]("antecedent_count") === 4L)
    assert(ab.getAs[Double]("support") === 0.6)
    assert(ab.getAs[Double]("confidence") === 0.75)
    assert(ab.getAs[Double]("lift") === 1.25) // 3·5/(4·3)
    assert(ba.getAs[Double]("confidence") === 1.0 &&
      ba.getAs[Double]("lift") === 1.25)
    // confidence floor keeps only the certain direction
    val conf = Frequency.associationRules("t", "i", minSupportCount = 2,
      minConfidence = 0.8)(rows).collect()
    assert(conf.length === 1 && conf(0).getString(0) === "b")
    // maxBasket: t3 (3 items) leaves PAIR generation only — (a,b)
    // falls to 2 but n_a/N are unchanged
    val capped = Frequency.associationRules("t", "i", minSupportCount = 2,
      maxBasket = 2)(rows).orderBy("antecedent").collect()
    assert(capped.map(_.getAs[Long]("pair_count")).toSeq === Seq(2L, 2L))
    assert(capped(0).getAs[Long]("antecedent_count") === 4L)
    assert(capped(0).getAs[Double]("support") === 0.4)
    // an independent pair lifts to ~1; a never-co-occurring pair is absent
    assert(!Frequency.associationRules("t", "i", minSupportCount = 1)(rows)
      .filter(col("antecedent") === "c" && col("consequent") === "a")
      .isEmpty) // (a,c) co-occur once at minSupport 1
    intercept[IllegalArgumentException](
      Frequency.associationRules("t", "i", minSupportCount = 0)(rows))
    intercept[IllegalArgumentException](
      Frequency.associationRules("t", "i", maxBasket = 1)(rows))
  }
}
