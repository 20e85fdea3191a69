package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ext.BinaryOps

/** Binary/multimodal operator tests: byte semantics of chunking, exact
  * byte dedup, and the partition-batched feature-extraction plumbing
  * (schema, batch shape, null handling) around the stubbed codec. */
class BinaryOpsSpec extends SparkSpec {
  import spark.implicits._

  test("blob digest and size are byte-accurate incl. multi-byte chars") {
    val df = Seq("abc", "héllo").toDF("t")
      .select(BinaryOps.toBlob($"t").as("b"))
      .select(BinaryOps.blobSize($"b").as("n"), BinaryOps.blobDigest($"b").as("d"))
    val rows = df.collect()
    assert(rows(0).getInt(0) === 3)
    assert(rows(1).getInt(0) === 6) // é is 2 bytes in UTF-8
    assert(rows(0).getString(1) === "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
  }

  test("chunkFingerprints emits ceil(len/chunk) digests, min one") {
    val df = Seq("aaaabbbbc", "aa", "").toDF("t")
      .select(size(BinaryOps.chunkFingerprints(BinaryOps.toBlob($"t"), 4)).as("n"))
    assert(df.as[Int].collect().toSeq === Seq(3, 1, 1))
  }

  test("chunkFingerprints chunk boundaries are byte-exact") {
    val df = Seq("aaaabbbb").toDF("t")
      .select(BinaryOps.chunkFingerprints(BinaryOps.toBlob($"t"), 4).as("fps"))
    val fps = df.head().getSeq[String](0)
    // each chunk digest equals the digest of the standalone 4-byte string
    val expected = Seq("aaaa", "bbbb").map(s =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    assert(fps === expected)
  }

  test("dedupByBytes keeps one row per distinct content, min tie-break") {
    val df = Seq((3L, "same"), (1L, "same"), (2L, "other"))
      .toDF("id", "t").select($"id", BinaryOps.toBlob($"t").as("blob"))
    val out = BinaryOps.dedupByBytes("blob", "id")(df)
      .select("id").as[Long].collect().sorted.toSeq
    assert(out === Seq(1L, 2L))
  }

  test("extractFeaturesStub appends typed struct via partition-batched map") {
    val df = Seq((1L, "hello world"), (2L, null))
      .toDF("id", "t")
      .select($"id", BinaryOps.toBlob($"t").as("blob"))
      .repartition(2)
    val out = BinaryOps.extractFeaturesStub("blob", dim = 4)(df)
    assert(out.schema("media").dataType === BinaryOps.featureSchema)
    val rows = out.collect().map(r => (r.getLong(0), r.getAs[Row]("media"))).toMap
    val m = rows(1L)
    assert(m.getInt(0) === 11)
    assert(m.getAs[Array[Byte]](1).length === 8)
    assert(m.getSeq[Float](2).length === 4)
    assert(rows(2L) === null) // null blob -> null media struct
    // deterministic: same bytes, same features on re-run
    val again = BinaryOps.extractFeaturesStub("blob", dim = 4)(df)
      .filter($"id" === 1L).select("media").head().getAs[Row](0)
    assert(again.getSeq[Float](2) === m.getSeq[Float](2))
  }
}
