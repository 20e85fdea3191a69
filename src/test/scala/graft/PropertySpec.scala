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
}
