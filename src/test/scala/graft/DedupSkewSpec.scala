package graft

import graft.pipeline.Dedup

/**
 * LSH skew posture: a boilerplate flood (many identical docs ⇒ identical
 * signatures ⇒ one giant (band, bucket) per band) must not send an O(n²)
 * self-join through the candidate stage. The cap drops over-populated
 * buckets; genuine near-dups keep colliding in their own small buckets.
 */
class DedupSkewSpec extends SparkSpec {

  private val boiler = "terms of service apply to all pages on this site please read carefully before proceeding"
  private lazy val fixture = {
    import spark.implicits._
    val boilerDocs = (1 to 20).map(i => (i.toLong, boiler))
    val nearA = 101L -> "the quick brown fox jumps over the lazy dog and then runs far away into the deep green forest tonight"
    val nearB = 102L -> "the quick brown fox jumps over the lazy cat and then runs far away into the deep green forest tonight"
    val unique = (201 to 210).map(i =>
      (i.toLong, s"unique document number $i talks about subject ${i * 7} in its own entirely separate vocabulary ${i * 13}"))
    (boilerDocs ++ Seq(nearA, nearB) ++ unique).toDF("doc_id", "text")
  }

  test("uncapped: the boilerplate flood floods the candidate stage") {
    val pairs = Dedup.minhashNearDups(fixture, "doc_id", "text").collect()
    val boilerPairs = pairs.filter(r => r.getLong(0) <= 20 && r.getLong(1) <= 20)
    assert(boilerPairs.length == 20 * 19 / 2, s"got ${boilerPairs.length}")
  }

  test("capped: hot buckets drop, real near-dups survive, candidates stay bounded") {
    val pairs = Dedup.minhashNearDups(fixture, "doc_id", "text", maxBucketSize = 10)
      .collect()
    // no pair from the boilerplate flood (exact dedup's job, not LSH's)
    assert(!pairs.exists(r => r.getLong(0) <= 20 && r.getLong(1) <= 20), pairs.mkString(","))
    // the planted near-dup pair still collides in its own small buckets
    assert(pairs.exists(r => r.getLong(0) == 101L && r.getLong(1) == 102L), pairs.mkString(","))
  }

  test("hotBuckets reports exactly the flood: one over-cap bucket per band") {
    val hot = Dedup.hotBuckets(fixture, "doc_id", "text", maxBucketSize = 10).collect()
    // 20 identical docs share one bucket in each of the 8 bands
    assert(hot.length == 8, hot.mkString(","))
    assert(hot.forall(_.getAs[Long]("n") >= 20), hot.mkString(","))
  }

  test("incremental variant caps both sides") {
    import spark.implicits._
    val ref = fixture // boilerplate lives in the reference corpus
    val fresh = Seq(
      50L -> boiler, // a new boilerplate page: hot ref bucket must not explode
      51L -> "the quick brown fox jumps over the lazy dog and then runs far away into the deep green forest tonight"
    ).toDF("doc_id", "text")
    val hits = Dedup.minhashNearDupsAgainst(fresh, ref, "doc_id", "text",
      maxBucketSize = 10).collect()
    // the boilerplate newcomer matches nothing (its ref buckets are capped away)
    assert(!hits.exists(_.getLong(0) == 50L), hits.mkString(","))
    // the near-dup newcomer still finds its counterparts
    assert(hits.exists(r => r.getLong(0) == 51L && r.getLong(1) == 101L), hits.mkString(","))
  }
}
