package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SketchOps

/** Mergeable HLL sketches: incremental union == global rebuild (exactly),
  * estimates land inside the error envelope, summaries stay kilobytes.
  */
class SketchOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  lazy val events = Tables.events(spark, "/root/testdata/sf0.01")

  test("merging per-day sketches equals the single global sketch exactly") {
    val byDay = SketchOps.distinctSketches(
      events.withColumn("day", to_date(col("ts"))), Seq("day"), "user_id")
    val incremental = SketchOps.mergeEstimate(byDay, Nil)
      .head().getLong(0)
    val global = SketchOps.distinctEstimate(events, "user_id")
      .head().getLong(0)
    assert(incremental == global,
      "sketch union must be lossless over sketch state")
  }

  test("union == rebuild holds at a non-default lgK too (uniform end to end)") {
    val byDay = SketchOps.distinctSketches(
      events.withColumn("day", to_date(col("ts"))), Seq("day"), "user_id", lgK = 14)
    val incremental = SketchOps.mergeEstimate(byDay, Nil).head().getLong(0)
    val global = SketchOps.distinctEstimate(events, "user_id", lgK = 14)
      .head().getLong(0)
    assert(incremental == global)
  }

  test("mixing lgK values fails unless explicitly allowed") {
    val coarse = SketchOps.distinctSketches(events, Seq("event_type"), "user_id", lgK = 10)
    val fine = SketchOps.distinctSketches(events, Seq("event_type"), "user_id", lgK = 14)
    val mixed = coarse.unionAll(fine)
    intercept[Exception] {
      SketchOps.mergeEstimate(mixed, Nil).head()
    }
    // opt-in degrades to the coarsest precision instead of failing
    val est = SketchOps.mergeEstimate(mixed, Nil, allowDifferentLgK = true)
      .head().getLong(0)
    assert(est > 0)
  }

  test("estimate is within the lgK=12 error envelope of the true count") {
    val truth = events.select(countDistinct("user_id")).head().getLong(0)
    val est = SketchOps.distinctEstimate(events, "user_id").head().getLong(0)
    assert(math.abs(est - truth).toDouble / truth < 0.05,
      s"est $est vs truth $truth")
  }

  test("sketch summaries are bounded bytes regardless of group size") {
    val byType = SketchOps.distinctSketches(events, Seq("event_type"), "user_id")
    val sizes = byType.select(octet_length(col("sketch"))).collect().map(_.getInt(0))
    assert(sizes.nonEmpty && sizes.forall(_ < 8192),
      s"sketches must stay KB-sized: ${sizes.toSeq}")
    // and the per-group refresh path works on the summary table alone
    val perType = SketchOps.mergeEstimate(byType, Seq("event_type"))
    assert(perType.collect().forall(_.getLong(1) > 0))
  }

  // ---- count-min ----

  lazy val docToks = Tables.documents(spark, "/root/testdata/sf0.001")
    .select(explode(graft.operators.TextOps.tokens(col("text"))).as("tok"))

  test("count-min never underestimates, and nails the heavy hitters") {
    val exact = docToks.groupBy("tok").count()
    val sk = SketchOps.cmsSketch(docToks, "tok")
    // the counter table is bounded by construction
    assert(sk.count() <= 4L * 1024L)
    val est = SketchOps.cmsEstimate(sk, exact.select("tok"), "tok")
    val joined = exact.join(est, "tok")
      .select(col("tok"), col("count"), col("est")).collect()
    assert(joined.nonEmpty)
    assert(joined.forall(r => r.getLong(2) >= r.getLong(1)),
      "count-min must only overestimate")
    // heavy-hitter use: the top-5 by estimate are the top-5 by truth
    def top5(ix: Int) = joined.sortBy(r => (-r.getLong(ix), r.getString(0)))
      .take(5).map(_.getString(0)).toSeq
    assert(top5(2) == top5(1), "estimate order must match truth on the head")
  }

  test("count-min merge of shard sketches equals the global sketch exactly") {
    val shardA = docToks.filter(pmod(crc32(col("tok")), lit(2)) === 0)
    val shardB = docToks.filter(pmod(crc32(col("tok")), lit(2)) === 1)
    val merged = SketchOps.cmsMerge(
      SketchOps.cmsSketch(shardA, "tok").unionAll(SketchOps.cmsSketch(shardB, "tok")))
    val global = SketchOps.cmsSketch(docToks, "tok")
    // counters add: merged must be row-for-row identical to the rebuild
    assert(merged.exceptAll(global).isEmpty && global.exceptAll(merged).isEmpty)
  }
}
