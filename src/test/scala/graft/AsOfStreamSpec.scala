package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoinOps
import graft.streaming.{AsOfEnriched, AsOfStream}

/** Streaming as-of enrichment: event-time correctness under out-of-order
  * arrival, watermark-gated finalization, horizon eviction that never
  * changes an answer, and parity with the batch native as-of join.
  */
class AsOfStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val t0 = 1700000000L

  // (event_id, user_id, timestamp-seconds)
  private def harness(name: String) = {
    implicit val sc = spark.sqlContext
    val purchases = MemoryStream[(Long, Long, Long)]
    val clicks = MemoryStream[(Long, Long, Long)]
    val out = AsOfStream.asofEnrichStream(
      purchases.toDF().toDF("event_id", "user_id", "timestamp"),
      clicks.toDF().toDF("event_id", "user_id", "timestamp"),
      watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    (purchases, clicks, q)
  }

  test("late click enriches; purchases finalize only past the watermark") {
    val (purchases, clicks, q) = harness("asof_late")
    try {
      purchases.addData((100L, 1L, t0 + 100))
      clicks.addData((10L, 1L, t0 + 10))
      q.processAllAvailable()
      // the matching click arrives a batch later, with an EARLIER event
      // time than the purchase (out-of-order) but inside the watermark
      clicks.addData((20L, 1L, t0 + 95))
      q.processAllAvailable()
      assert(spark.table("asof_late").isEmpty,
        "purchase must not finalize before the watermark passes it")
      // advance the watermark on BOTH streams (union watermark is the min)
      purchases.addData((900L, 9L, t0 + 2000))
      clicks.addData((901L, 9L, t0 + 2000))
      q.processAllAvailable(); q.processAllAvailable()
      val got = spark.table("asof_late").as[AsOfEnriched].collect().toSet
      assert(got.contains(AsOfEnriched(100L, 1L, Some(20L))),
        s"late click 20 (t0+95) must beat early click 10: $got")
      assert(got.count(_.purchase_id == 100L) == 1, "exactly-once finalization")
    } finally q.stop()
  }

  test("a click far older than the horizon still matches; no-click users get None") {
    val (purchases, clicks, q) = harness("asof_old")
    try {
      clicks.addData((1L, 5L, t0)) // the user's only click, long ago
      purchases.addData((2L, 7L, t0)) // a user with no clicks at all
      q.processAllAvailable()
      // push the watermark ~2 hours forward, well past the 10 min horizon
      clicks.addData((800L, 9L, t0 + 7200))
      purchases.addData((801L, 9L, t0 + 7200))
      q.processAllAvailable()
      // now a purchase far in the click's future: eviction must have kept
      // the newest at-or-below-watermark click for exactly this case
      purchases.addData((3L, 5L, t0 + 7300))
      clicks.addData((802L, 9L, t0 + 9000))
      purchases.addData((803L, 9L, t0 + 9000))
      q.processAllAvailable(); q.processAllAvailable()
      val got = spark.table("asof_old").as[AsOfEnriched].collect().toSet
      assert(got.contains(AsOfEnriched(3L, 5L, Some(1L))),
        s"horizon eviction must keep the user's newest old click: $got")
      assert(got.contains(AsOfEnriched(2L, 7L, None)),
        s"user with no clicks finalizes with None: $got")
    } finally q.stop()
  }

  test("agrees with the batch native as-of join on a shuffled feed") {
    val events = for {
      u <- 1L to 5L; i <- 0L until 8L
    } yield (u * 100 + i, u, t0 + (i * 37 + u * 13) % 400,
      if ((u + i) % 3 == 0) "purchase" else "click")

    val (purchases, clicks, q) = harness("asof_parity")
    try {
      // deliver in three arbitrarily-sliced batches, shuffled within batch
      val shuffled = events.sortBy(e => (e._1 * 2654435761L) % 1000)
      for (batch <- shuffled.grouped((shuffled.size + 2) / 3)) {
        val (p, c) = batch.partition(_._4 == "purchase")
        if (p.nonEmpty) purchases.addData(p.map(e => (e._1, e._2, e._3)))
        if (c.nonEmpty) clicks.addData(c.map(e => (e._1, e._2, e._3)))
        q.processAllAvailable()
      }
      purchases.addData((9000L, 99L, t0 + 100000))
      clicks.addData((9001L, 99L, t0 + 100000))
      q.processAllAvailable(); q.processAllAvailable()

      val streamed = spark.table("asof_parity").as[AsOfEnriched].collect()
        .filter(_.user_id <= 5).map(e => (e.purchase_id, e.click_id)).toSet

      val pdf = events.filter(_._4 == "purchase")
        .map(e => (e._1, e._2, e._3 * 1000000L)).toSeq
        .toDF("purchase_id", "user_id", "tus")
      val cdf = events.filter(_._4 == "click")
        .map(e => (e._1, e._2, e._3 * 1000000L)).toSeq
        .toDF("click_id", "c_user", "c_tus")
        .groupBy("c_user", "c_tus")
        .agg(org.apache.spark.sql.functions.max("click_id").as("click_id"))
      val batch = AsOfJoinOps.asofJoin(pdf, cdf, Seq("user_id"), Seq("c_user"),
          "tus", "c_tus")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]))).toSet

      assert(streamed == batch,
        s"stream ${streamed.size} rows vs batch ${batch.size}:\n" +
          s"only-stream: ${streamed -- batch}\nonly-batch: ${batch -- streamed}")
    } finally q.stop()
  }
}
