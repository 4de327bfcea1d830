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

  test("double_sort_key is order-preserving over the whole double line") {
    import spark.implicits._
    // the tricky neighborhoods: sign flip, the two zeros, denormals,
    // infinities, plus a pseudo-random spread (seeded — deterministic)
    val rnd = new scala.util.Random(7)
    val vals = Seq(Double.NegativeInfinity, -1.7e308, -1.0, -1e-300,
        -java.lang.Double.MIN_VALUE, -0.0, 0.0, java.lang.Double.MIN_VALUE,
        1e-300, 1.0, 1.7e308, Double.PositiveInfinity) ++
      (1 to 200).map(_ => (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(20) - 10))
    val keyed = vals.toDF("x")
      .select(col("x"), graft.functions.QuantileExprs.doubleSortKey(col("x")).as("k"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1))
    for (Seq((x, kx), (y, ky)) <- keyed.sortBy(_._1).toSeq.sliding(2)) {
      if (x < y) assert(kx < ky, s"key must preserve order: $x -> $kx, $y -> $ky")
      else assert(kx == ky, s"equal doubles need equal keys: $x, $y") // the zeros
    }
    // NaN lands above +inf, Spark's sort convention
    val nanKey = Seq(Double.NaN).toDF("x")
      .select(graft.functions.QuantileExprs.doubleSortKey(col("x")))
      .head().getLong(0)
    assert(nanKey > keyed.map(_._2).max)
  }

  test("quantile-sketch merge of shard tables equals the global rebuild exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val scored = (1 to 3000)
      .map(i => (i.toLong, if (i % 3 == 0) "a" else "b", rnd.nextGaussian()))
      .toDF("id", "cls", "score")
    val shards = (0 until 3).map(s =>
      SketchOps.quantileSketch(scored.filter(pmod(col("id"), lit(3)) === s),
        Seq("cls"), "score"))
    val merged = SketchOps.quantileMerge(
      shards.reduce(_ unionAll _), Seq("cls"))
    val global = SketchOps.quantileSketch(scored, Seq("cls"), "score")
    assert(merged.exceptAll(global).isEmpty && global.exceptAll(merged).isEmpty)
    // bounded: counter rows never exceed 2^bucketBits per group
    val maxRows = global.groupBy("cls").count().agg(max("count")).head().getLong(0)
    assert(maxRows <= (1L << 12))
  }

  test("quantileRank brackets the exact top-q cutoff") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val scored = (1 to 5000).map(i => (i.toLong, "g", rnd.nextDouble()))
      .toDF("id", "cls", "score")
    val sk = SketchOps.quantileSketch(scored, Seq("cls"), "score")
    val r = SketchOps.quantileRank(sk, Seq("cls"), 0.1).head()
    val (qb, nAbove, n) = (r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n == 5000)
    val k = (n * 1000 + 9999) / 10000 // ceil(0.1·n)
    // the rank-k row lies inside the reported bucket: strictly-higher
    // buckets hold fewer than k rows, and the bucket closes the gap
    assert(nAbove < k)
    val inBucket = scored
      .withColumn("qb2", SketchOps.quantileBucket(col("score"), 12))
      .filter(col("qb2") === qb).count()
    assert(nAbove + inBucket >= k)
  }

  test("kmvSignature is the k smallest distinct hashes; NULLs excluded") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = (1 to 50).map(i => s"doc ${i % 20}") :+ (null: String)
    val df = docs.toDF("text")
    val sig = SketchOps.kmvSignature(df, col("text"), 8)
      .collect().map(_.getString(0)).toSeq
    val full = df.select(md5(col("text")).as("h")).filter(col("h").isNotNull)
      .distinct().collect().map(_.getString(0)).sorted
    assert(sig == full.take(8).toSeq)
    assert(sig == sig.sorted && sig.distinct.size == sig.size)
  }

  test("kmv signatures merge: bottom-k of two signatures = signature of the union") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val a = (1 to 40).map(i => s"a$i").toDF("text")
    val b = (1 to 40).map(i => s"b$i").toDF("text")
    val k = 16
    // the k smallest hashes of A ∪ B all live in sigA ∪ sigB, so the
    // raw-hash merge of the two signatures IS the union's signature
    val fromSigs = SketchOps.kmvMerge(
      SketchOps.kmvSignature(a, col("text"), k)
        .unionAll(SketchOps.kmvSignature(b, col("text"), k)), k)
      .collect().map(_.getString(0)).toSeq
    val fromUnion = SketchOps.kmvSignature(a.unionAll(b), col("text"), k)
      .collect().map(_.getString(0)).toSeq
    assert(fromSigs == fromUnion)
  }

  test("kmvContainment is exact when k covers the union") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val batch = Seq("x", "y", "new1", "new2").toDF("text")
    val hist = Seq("x", "y", "z").toDF("text")
    val row = SketchOps.kmvContainment(
      SketchOps.kmvSignature(batch, col("text"), 64),
      SketchOps.kmvSignature(hist, col("text"), 64), 64).collect().head
    assert(row.getAs[Long]("k_used") == 5L) // |batch ∪ hist|
    assert(row.getAs[Long]("new_n") == 4L) // batch members
    assert(row.getAs[Long]("inter_n") == 2L) // {x, y} already seen
  }

  test("kmvOverlap is exact when k covers the union") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val a = Seq("x", "y", "z", "only-a").toDF("text")
    val b = Seq("x", "y", "only-b").toDF("text")
    val row = SketchOps.kmvOverlap(
      SketchOps.kmvSignature(a, col("text"), 64),
      SketchOps.kmvSignature(b, col("text"), 64), 64).collect().head
    assert(row.getAs[Long]("k_used") == 5L) // |A ∪ B|
    assert(row.getAs[Long]("inter_n") == 2L) // {x, y}
  }
}
