package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{NearDupHit, NearDupStream}

/** Streaming MinHash-LSH near-dup: hits within the watermark horizon,
  * bucket eviction after it, and content never entering state.
  */
class NearDupStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val textA = "the quick brown fox jumps over the lazy dog again and again today"
  private val textB = "completely different content about weather stations in quito ecuador"
  private val textC = "yet another unrelated document mentioning lineitem revenue figures"
  private val textD = "fourth filler document with its own vocabulary entirely separate"

  test("near-dups pair within the horizon; buckets evict after it") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val docs = input.toDF().toDF("doc_id", "text", "timestamp")
    val hits = NearDupStream.nearDupStream(docs, threshold = 0.7,
      watermarkDelay = "10 minutes")
    val q = hits.writeStream.format("memory").queryName("neardup_hits")
      .outputMode("append").start()
    try {
      val t0 = 1700000000L
      input.addData((1L, textA, t0), (2L, textB, t0 + 10))
      q.processAllAvailable()
      input.addData((3L, textA, t0 + 60)) // same content, later micro-batch
      q.processAllAvailable()
      // collect as a SEQ, not a Set: an identical pair matches in all 3
      // bands (12 hashes / 4 rows) and each band group emits it once; the
      // downstream per-pair dedup must leave exactly ONE row, like batch x2
      val got = spark.table("neardup_hits").as[NearDupHit].collect().toSeq
      assert(got.count(_ == NearDupHit(1L, 3L, 1.0)) == 1,
        s"cross-batch duplicate must pair exactly once: $got")
      assert(!got.exists(h => h.doc_a == 2L || h.doc_b == 2L),
        "distinct content must not pair")

      // advance the watermark past the horizon, then trigger a batch where
      // the A-buckets are idle -> event-time timeout evicts them
      input.addData((4L, textC, t0 + 3600)); q.processAllAvailable()
      input.addData((6L, textD, t0 + 3620)); q.processAllAvailable()
      // a fresh copy of textA now sees an EMPTY bucket: no pair with 1/3
      input.addData((5L, textA, t0 + 3650)); q.processAllAvailable()
      val after = spark.table("neardup_hits").as[NearDupHit].collect().toSet
      assert(!after.exists(h => h.doc_b == 5L || h.doc_a == 5L),
        s"evicted bucket must not pair with pre-horizon docs: $after")
    } finally q.stop()
  }

  test("contentless docs never pair (empty shingle set is filtered)") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val docs = input.toDF().toDF("doc_id", "text", "timestamp")
    val hits = NearDupStream.nearDupStream(docs, threshold = 0.7)
    val q = hits.writeStream.format("memory").queryName("neardup_empty")
      .outputMode("append").start()
    try {
      val t0 = 1700000000L
      // empty and whitespace-only docs have empty shingle sets -> all-null
      // signatures; unfiltered they'd band-collide and report est 1.0
      input.addData((20L, "", t0), (21L, "   ", t0 + 1), (22L, "", t0 + 2),
        (23L, textA, t0 + 3), (24L, textA, t0 + 4))
      q.processAllAvailable()
      val got = spark.table("neardup_empty").as[NearDupHit].collect().toSeq
      assert(!got.exists(h => Seq(h.doc_a, h.doc_b).exists(Set(20L, 21L, 22L))),
        s"contentless docs must not pair: $got")
      assert(got.count(_ == NearDupHit(23L, 24L, 1.0)) == 1,
        s"real duplicates still pair exactly once: $got")
    } finally q.stop()
  }

  test("signature estimate approximates jaccard for partial overlap") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val docs = input.toDF().toDF("doc_id", "text", "timestamp")
    // lower threshold: catch near (not exact) duplicates
    val hits = NearDupStream.nearDupStream(docs, threshold = 0.5)
    val q = hits.writeStream.format("memory").queryName("neardup_partial")
      .outputMode("append").start()
    try {
      val t0 = 1700000000L
      val edited = textA.replace("today", "tomorrow") // one token changed
      input.addData((10L, textA, t0), (11L, edited, t0 + 5))
      q.processAllAvailable()
      val got = spark.table("neardup_partial").as[NearDupHit].collect()
      val pair = got.find(h => h.doc_a == 10L && h.doc_b == 11L)
      assert(pair.isDefined, s"near-identical docs must pair: ${got.toSeq}")
      assert(pair.get.est_jaccard >= 0.5 && pair.get.est_jaccard < 1.0)
    } finally q.stop()
  }
}
