package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewOps

/** Scale-path mechanics: bucketed co-located joins (no shuffle), salted
  * joins for skew (same results as the plain join), approximate distinct
  * within its error envelope.
  */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf0001

  test("bucketed tables join without a shuffle exchange") {
    val o = Tables.orders(spark, sf)
    val l = Tables.lineitem(spark, sf)
    // the in-memory catalog forgets tables across JVMs but the warehouse
    // dirs persist — clear both
    for (t <- Seq("orders_b", "lineitem_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
      val dir = new java.io.File(
        new java.io.File(Option(wh.getPath).getOrElse(wh.toString)), t)
      if (dir.exists()) {
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
    }
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_b").join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must be shuffle-free:\n$plan")
      assert(joined.count() == l.count()) // every lineitem has its order
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ANN corpus written partitioned by sign-bucket prunes to one cell") {
    import graft.operators.SimilarityOps
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-ann").toString
    // the SCALE.md claim made concrete: write the corpus partitioned by
    // the quantizer cell, then a query's probe reads ONE partition
    emb.withColumn("bucket", SimilarityOps.signBucket(col("embedding")))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
    val corpus = spark.read.parquet(dir)
    val q = emb.filter(col("vec_id") === 0)
      .select(SimilarityOps.signBucket(col("embedding")).as("b")).head().getInt(0)
    val probe = corpus.filter(col("bucket") === q)
    probe.collect()
    val scan = probe.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(bucket"), scan)
    // pruned scan reads only the probed cell's rows
    val cellSize = emb
      .filter(SimilarityOps.signBucket(col("embedding")) === q).count()
    assert(probe.count() == cellSize)
    assert(cellSize < emb.count(), "pruning must exclude other cells")
  }

  test("salted join equals the plain join on skewed data") {
    import spark.implicits._
    // 90% of rows share one hot key
    val big = spark.range(5000)
      .select(when(col("id") % 10 < 9, lit(1L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val small = Seq((1L, "hot"), (17L, "cold"), (23L, "cold")).toDF("k", "v")
    val plain = big.join(small, Seq("k")).agg(
      count(lit(1)), sum(col("payload"))).head()
    val salted = SkewOps.saltedJoin(big, small, "k", salt = 8).agg(
      count(lit(1)), sum(col("payload"))).head()
    assert(plain == salted)
  }

  test("blocked m1 rank equals the naive global-window split exactly") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    val naive = ev
      .withColumn("rn", row_number().over(Window.orderBy("event_id")))
      .select(col("event_id"),
        expr(s"((rn - 1) * 6) div ${n}L").cast("int").as("chunk"))
    val blocked = SparkEntry.queries("m1_ts_split_chunks")(spark, sf)
    assert(blocked.exceptAll(naive).count() == 0, "blocked ⊆ naive")
    assert(naive.exceptAll(blocked).count() == 0, "naive ⊆ blocked")
  }

  test("approx_count_distinct within its error envelope vs exact") {
    val o = Tables.orders(spark, sf)
    val r = o.agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey"), 0.02).as("approx")).head()
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"exact=$exact approx=$approx")
  }
}
