package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cache-lifecycle contract for the dedup/ANN operator surface: library
  * callers composing these in a long-lived session must not accumulate
  * persisted lineages (VERDICT r2 #4). The operators now rely on
  * ReuseExchange (shuffle-file sharing of the canonically-equal self-join
  * sides) instead of `persist()`, so there is nothing to leak and nothing
  * for a caller to clean up.
  */
class CacheSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf0001

  val extQueries = Seq(
    "x1_dedup_exact", "x2_dedup_minhash_lsh", "x3_dedup_simhash",
    "x3b_simhash_md5", "x4_dedup_jaccard", "x4b_dedup_jaccard_capped",
    "x5_embed_neardup_pairs", "x6_sim_topk", "x7_sim_topk_bucketed",
    "x14_sim_ivf", "x16_hash_split", "x17_edit_distance_pairs",
    "x18_knn_vote", "x19_l2_topk",
    // the iterative-CC family checkpoints rounds internally; the contract
    // is that every block is freed before the call returns
    "x25_dedup_clusters", "x24b_manifest_neardup", "x29_shared_spans",
    // the round-8 staged queries: scrub/surprise/keywords stage parquet,
    // never persist
    "x38_boilerplate_scrub", "x42_bigram_surprise", "x43_tfidf_keywords")

  test("dedup/ANN queries leave no persisted RDDs behind") {
    for (name <- extQueries) {
      SparkEntry.queries(name)(spark, sf).count()
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        s"$name left persisted RDDs: ${spark.sparkContext.getPersistentRDDs}")
    }
  }

  test("clusterLabels frees every loop round before returning") {
    // guards freeRound's LogicalRDD pattern-match against silently becoming
    // a no-op on a Spark upgrade (advisor r7): the iterative loop
    // localCheckpoints each round, so a dead match would leave blocks here
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("doc_a", "doc_b")
    graft.operators.DedupOps.clusterLabels(pairs).count()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"clusterLabels leaked rounds: ${spark.sparkContext.getPersistentRDDs}")
  }

  test("cleanScratch reclaims default stages; explicit stageDirs survive") {
    import graft.operators.StageIO
    val fs = new org.apache.hadoop.fs.Path(StageIO.scratchRoot(spark))
      .getFileSystem(spark.sessionState.newHadoopConf())
    // x30 stages its scored frame to a default (scratch) stage
    SparkEntry.queries("x30_dedup_best_survivor")(spark, sf).count()
    val root = new org.apache.hadoop.fs.Path(StageIO.scratchRoot(spark))
    assert(fs.exists(root) && fs.listStatus(root).nonEmpty,
      "expected x30 to leave a scratch stage before cleanup")
    // an explicit stageDir outside the scratch root is the caller's to keep
    val keep = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/_graft_keep_test")
    fs.mkdirs(keep)
    try {
      StageIO.cleanScratch(spark)
      assert(!fs.exists(root), "cleanScratch must remove the scratch root")
      assert(fs.exists(keep), "explicit stage dirs must be untouched")
    } finally fs.delete(keep, true)
  }

  test("minhash/jaccard self-joins reuse one exchange at SMJ scale") {
    // with broadcast off (the 100 TB shape: both sides too big to ship),
    // the two self-join sides are canonically equal below the band/shingle
    // exchange, so the expensive kernel materializes ONCE into shuffle files
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      for (name <- Seq("x2_dedup_minhash_lsh", "x4_dedup_jaccard",
          "x4b_dedup_jaccard_capped")) {
        val df = SparkEntry.queries(name)(spark, sf)
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("ReusedExchange"),
          s"$name self-join must reuse the kernel exchange:\n$plan")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
