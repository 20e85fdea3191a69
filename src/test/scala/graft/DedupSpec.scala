package graft

import org.apache.spark.sql.functions._
import graft.ext.Dedup
import graft.ops.Ops

/** Near-dup recall checks: the shipped LSH-candidate paths are validated
  * against the exact brute-force baselines (which exist only for this —
  * never ship an all-pairs plan against a corpus), plus the stratified
  * hash sampler. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en"),
    (2L, "the quick brown fox jumps over the lazy cat", "en"), // near-dup of 1
    (3L, "completely different words live here today yes", "en"),
    (4L, "the quick brown fox jumps over the lazy dog", "en"), // exact dup of 1
    (5L, "unrelated text about spark and catalyst planning", "en")
  ).toDF("doc_id", "text", "lang")

  test("LSH near-dup finds what brute force finds on dup-heavy corpora") {
    val brute = Dedup.ngramJaccardPairs("doc_id", "text", "lang",
      threshold = 0.5, shingleSize = 2)(docs)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashNearDuplicates("doc_id", "text",
      threshold = 0.5, numHashes = 8, bands = 4, shingleSize = 2)(docs)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force is exact recall; LSH may miss (banding) but never adds
    assert(lsh.subsetOf(brute))
    // exact duplicates share every minhash band -> always recalled
    assert(lsh.contains((1L, 4L)))
    assert(brute === Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("LSH embedding near-dup agrees with brute force within buckets") {
    val vecs = Seq(
      (1L, Array.fill(64)(1.0f)),
      (2L, Array.fill(64)(1.0f)),              // exact dup of 1
      (3L, Array.tabulate(64)(i => if (i < 32) 1.0f else -1.0f)),
      (4L, Array.fill(64)(-1.0f))
    ).toDF("vec_id", "embedding")
    val brute = Dedup.embeddingNearDuplicatesBrute("vec_id", "embedding", 0.9)(vecs)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDuplicates("vec_id", "embedding", 0.9,
      planes = 6, dim = 64)(vecs)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute))
    assert(lsh.contains((1L, 2L))) // identical vectors share every bucket
  }

  test("connectedComponents labels every node with its component minimum") {
    val pairs = Seq((2L, 5L), (5L, 9L), (3L, 7L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 5L, 7L, 9L).toDF("id")
    val labels = Dedup.connectedComponents(pairs, nodes)
      .as[(Long, Long)].collect().toMap
    // chain 2-5-9 -> rep 2 (takes two propagation rounds); pair 3-7 -> 3;
    // singleton 1 -> itself
    assert(labels === Map(1L -> 1L, 2L -> 2L, 5L -> 2L, 9L -> 2L,
      3L -> 3L, 7L -> 3L))
  }

  test("clusterDedup keeps exactly one doc per near-dup cluster") {
    val kept = Dedup.clusterDedup("doc_id", "text", threshold = 0.5,
      shingleSize = 2)(docs)
      .select("doc_id").as[Long].collect().toSet
    // 1,2,4 form one cluster (rep 1); 3 and 5 are singletons
    assert(kept === Set(1L, 3L, 5L))
  }

  test("sampleStratifiedHash applies per-stratum fractions deterministically") {
    val df = (1L to 4000L).map(i => (i, if (i % 2 == 0) "big" else "none"))
      .toDF("id", "stratum")
    val out = Ops.sampleStratifiedHash("stratum", "id",
      Map("big" -> 0.5))(df)
    val byStratum = out.groupBy("stratum").count().as[(String, Long)]
      .collect().toMap
    assert(!byStratum.contains("none")) // default fraction 0
    assert(byStratum("big") > 800 && byStratum("big") < 1200) // ~0.5 of 2000
    // deterministic: identical rows on re-run
    val again = Ops.sampleStratifiedHash("stratum", "id",
      Map("big" -> 0.5))(df)
    assert(out.select("id").as[Long].collect().sorted.toSeq ===
      again.select("id").as[Long].collect().sorted.toSeq)
  }
}
