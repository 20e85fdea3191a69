package graft

import java.nio.file.Files
import graft.sources.{Stores, MemoryStore}
import graft.pipeline.Pipeline

class StoresSpec extends SparkSpec {
  import spark.implicits._

  test("parquet store round-trip and object listing") {
    val dir = Files.createTempDirectory("graft-pq").toString
    val store = Stores.open(spark, "parquet", dir)
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    store.create("t1", df)
    assert(store.exists("t1"))
    assert(store.getObject("t1").count() == 2)
    store.appendInto("t1", df)
    assert(store.getObject("t1").count() == 4)
    intercept[Exception](store.create("t1", df)) // no replace
    store.create("t1", df, replace = true)
    assert(store.getObject("t1").count() == 2)
  }

  test("csv store honors inferFields and header") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val store = Stores.open(spark, "csv", dir)
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    store.create("t1", df)
    val back = store.getObject("t1")
    assert(back.count() == 2)
    assert(back.schema("id").dataType.typeName == "integer" ||
      back.schema("id").dataType.typeName == "long")
  }

  test("memory store append and replace semantics") {
    val store = new MemoryStore(spark)
    val df = Seq(1, 2).toDF("v")
    store.create("m", df)
    store.appendInto("m", df)
    assert(store.getObject("m").count() == 4)
    intercept[IllegalStateException](store.create("m", df))
  }

  test("pipeline facade composes catalog operators") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("", 4.0))
      .toDF("k", "v")
    val out = Pipeline(df)
      .filterNotEmpty("k")
      .aggregate(Seq("k"), Seq("v" -> "sum"))
      .sort(Seq("k" -> true))
      .result
    val rows = out.collect()
    assert(rows.map(_.getAs[String]("k")).toSeq == Seq("a", "b"))
    assert(rows.head.getAs[Double]("v_sum") == 3.0)
    assert(rows.head.getAs[Long]("record_count") == 2L)
  }
}
