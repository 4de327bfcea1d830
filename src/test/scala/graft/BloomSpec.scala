package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BloomOps

/** Bloom-pruned semi join: result equality with the plain semi join (the
  * operator's whole contract), edge cases (empty dim, NULL keys), the
  * measured false-positive rate of the filter itself, and the plan shape —
  * the probe filters the fact side BELOW the shuffle join it feeds.
  */
class BloomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf0001

  test("prunedLeftSemi equals the plain left-semi join") {
    val l = Tables.lineitem(spark, sf)
    val dim = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
    val got = BloomOps.prunedLeftSemi(l, "l_orderkey", dim, "o_orderkey")
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    val want = l.join(dim, l("l_orderkey") === dim("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(got.nonEmpty)
    assert(got.toSeq === want.toSeq)
  }

  test("empty dim yields an empty result, NULL keys never match") {
    import spark.implicits._
    val fact = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (2L, "c"))
      .toDF("k", "v")
    val emptyDim = Seq.empty[Long].toDF("dk")
    assert(BloomOps.prunedLeftSemi(fact, "k", emptyDim, "dk").count() === 0L)
    val nullDim = Seq[java.lang.Long](null, 2L).toDF("dk")
    val got = BloomOps.prunedLeftSemi(fact, "k", nullDim, "dk")
      .select("k").collect().map(_.getLong(0))
    assert(got.toSeq === Seq(2L))
  }

  test("measured false-positive rate stays under 1% at 10 bits/key") {
    import spark.implicits._
    val dim = (0L until 2000L).toDF("dk")
    val bloom = BloomOps.buildBloom(dim, "dk", numBits = 1 << 16, numHashes = 5)
    val absent = (1000000L until 1020000L).toDF("k")
    val fp = absent.crossJoin(broadcast(bloom))
      .where(BloomOps.mightContain(col("k"), col("__bloom"), 1 << 16, 5))
      .count()
    assert(fp <= 200L, s"false positives: $fp of 20000") // 1%; expected ~0.005%
  }

  test("plan: probe filter sits on the fact side below the shuffle join") {
    val l = Tables.lineitem(spark, sf)
    val dim = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path the operator exists for (a broadcastable
      // dim would make bloom pruning moot)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = BloomOps.prunedLeftSemi(l, "l_orderkey", dim, "o_orderkey")
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(2000))
      val smj = p.indexOf("SortMergeJoin")
      val probe = p.indexOf("xxhash64")
      assert(probe > smj, "bloom probe must be inside the join's fact subtree")
      // and the probe is a Filter, not part of the join condition
      assert(p.contains("Filter"), p.take(2000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("pruning actually shrinks the fact side ahead of the exact join") {
    val l = Tables.lineitem(spark, sf)
    val dim = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 150000.0)
    val bloom = BloomOps.buildBloom(dim, "o_orderkey", 1 << 16, 5)
    val pruned = l.crossJoin(broadcast(bloom))
      .where(col("l_orderkey").isNotNull &&
        BloomOps.mightContain(col("l_orderkey"), col("__bloom"), 1 << 16, 5))
      .count()
    val total = l.count()
    val exact = l.join(dim, l("l_orderkey") === dim("o_orderkey"), "left_semi")
      .count()
    assert(pruned < total / 2, s"pruned=$pruned total=$total")
    assert(pruned >= exact, "bloom can only over-approximate")
  }
}
