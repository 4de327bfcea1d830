package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimilarityOps

/** Round-2 operators: sessionization semantics, IVF cell assignment,
  * distribution ranks, unpivot reshape, grouping-sets margins.
  */
class Round2OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sessionize splits on gaps > threshold and counts per session") {
    // user 1: events at t=0, 100, 40000 (gap 39900 > 28800 → 2 sessions)
    // user 2: single event → 1 session
    val q = SparkEntry.queries("o6_sessionize")
    // run the full query over sf0.001 and check the invariants instead of
    // goldens: sessions partition the events, and every intra-session gap
    // is ≤ 28800 while consecutive sessions are separated by > 28800
    val out = q(spark, SparkTestSession.sf0001)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
        r.getAs[Long]("n_events"), r.getAs[Long]("start_s"), r.getAs[Long]("end_s")))
    val total = Tables.events(spark, SparkTestSession.sf0001).count()
    assert(out.map(_._3).sum == total, "sessions partition all events")
    out.groupBy(_._1).foreach { case (_, sess) =>
      val ordered = sess.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == ordered.indices.map(_.toLong),
        "session ids are dense from 0")
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._4 - a._5 > 28800L,
            s"consecutive sessions separated by > gap: $a → $b")
        case _ =>
      }
      ordered.foreach(s => assert(s._4 <= s._5, "start <= end"))
    }
  }

  test("sessionize hand-computed on a 2-user micro case") {
    val byTime = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("epoch_s")
    val df = Seq((1L, 0L), (1L, 100L), (1L, 40000L), (2L, 5L))
      .toDF("user_id", "epoch_s")
      .withColumn("new_sess",
        when(col("epoch_s") - lag(col("epoch_s"), 1).over(byTime) > 28800L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(
        byTime.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id").agg(count(lit(1)).as("n"))
      .orderBy("user_id", "session_id")
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq((1L, 0L, 2L), (1L, 1L, 1L), (2L, 0L, 1L)))
  }

  test("IVF assignment picks the argmax-cosine centroid for every vector") {
    val emb = Tables.embeddings(spark, SparkTestSession.sf0001)
    val cents = emb.filter(col("vec_id").between(1, 4))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
    val assigned = SimilarityOps
      .assignCentroids(emb, "vec_id", "embedding", cents)
    // exhaustive check: recompute best centroid per vector via a cross join
    val best = emb.crossJoin(broadcast(cents))
      .withColumn("c", SimilarityOps.cosineFast(col("embedding"), col("cv")))
      .groupBy("vec_id")
      .agg(max_by(col("cent_id"), struct(col("c"), -col("cent_id"))).as("want"))
    val joined = assigned.join(best, "vec_id")
      .filter(col("cent_id") =!= col("want"))
    assert(joined.count() == 0, "every vector lands in its argmax cell")
    assert(assigned.count() == emb.count(), "assignment is a partition")
  }

  test("IVF top-k result is a subset of the query cell, ranked by cosine") {
    val out = SparkEntry.queries("x14_sim_ivf")(spark, SparkTestSession.sf0001)
      .collect()
    assert(out.length == 5)
    val cells = out.map(_.getAs[Long]("cent_id")).distinct
    assert(cells.length == 1, "all results come from the single probed cell")
    val coss = out.map(_.getAs[Double]("cos"))
    assert(coss.sameElements(coss.sortBy(-_: Double)), "descending cosine")
  }

  test("batch sessionize agrees with session_window on session counts") {
    // o6 splits on second-truncated diff > 28800; session_window splits on
    // diff >= gap. Feeding session_window the SAME truncated timestamps with
    // gap 28801 makes the two partitions identical for every integer-second
    // dataset (diff >= 28801 ⇔ diff > 28800) — exact equivalence, not
    // measure-zero-on-this-fixture equivalence.
    val batch = SparkEntry.queries("o6_sessionize")(spark, SparkTestSession.sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
    val viaWindow = Tables.events(spark, SparkTestSession.sf0001)
      .withColumn("tts", timestamp_seconds(expr(
        "CAST((unix_micros(ts) - pmod(unix_micros(ts), 1000000)) / 1000000 AS BIGINT)")))
      .groupBy(session_window(col("tts"), "28801 seconds"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
    assert(batch.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(batch).count() == 0)
  }

  test("jaccard df cap: no-op at high cap, removes hot-shingle-only pairs") {
    import graft.operators.DedupOps
    val docs = Tables.documents(spark, SparkTestSession.sf0001)
    val exact = DedupOps.jaccardNearDups(docs, "text", "doc_id", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = DedupOps.jaccardNearDups(docs, "text", "doc_id", 0.8, Some(1000000L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == capped, "a cap above every df must not change results")
    // two docs whose only overlap is one corpus-hot shingle: capping the
    // shingle removes the pair entirely
    val hand = Seq(
      (1L, "the quick brown fox jumps"), (2L, "the quick brown cat sleeps"),
      (3L, "the quick brown dog barks"), (4L, "unrelated words entirely here now"))
      .toDF("doc_id", "text")
    val uncapped = DedupOps.jaccardNearDups(hand, "text", "doc_id", 0.1)
    assert(uncapped.count() > 0)
    val hardCap = DedupOps.jaccardNearDups(hand, "text", "doc_id", 0.1, Some(1L))
    assert(hardCap.count() == 0, "df>1 shingles dropped => no shared shingles left")
  }

  test("percent_rank/cume_dist bounds and extremes per partition") {
    val out = SparkEntry.queries("w9_dist_ranks")(spark, SparkTestSession.sf0001)
    val stats = out.agg(min("pr"), max("pr"), min("cd"), max("cd")).head()
    assert(stats.getDouble(0) == 0.0 && stats.getDouble(1) == 1.0)
    assert(stats.getDouble(2) > 0.0 && stats.getDouble(3) == 1.0)
  }

  test("unpivot emits one row per (id, metric) with matching values") {
    val wide = Seq((1L, 2, 10.0, 100.0, 0.5)).toDF(
      "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
    val long = wide.unpivot(
      Array(col("l_orderkey"), col("l_linenumber")),
      Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
      "metric", "val").orderBy("metric")
    assert(long.collect().map(r => (r.getAs[String]("metric"), r.getAs[Double]("val"))).toSeq
      == Seq(("l_discount", 0.5), ("l_extendedprice", 100.0), ("l_quantity", 10.0)))
  }

  test("grouping sets margins sum to the grand total") {
    val out = SparkEntry.queries("agg_grouping_sets")(spark, SparkTestSession.sf0001)
      .collect()
    val grand = out.filter(r => r.getAs[String]("status") == "ALL"
      && r.getAs[String]("priority") == "ALL")
    assert(grand.length == 1)
    val total = grand.head.getAs[Long]("n")
    val byStatus = out.filter(r => r.getAs[String]("status") != "ALL").map(_.getAs[Long]("n")).sum
    val byPrio = out.filter(r => r.getAs[String]("priority") != "ALL").map(_.getAs[Long]("n")).sum
    assert(byStatus == total && byPrio == total)
  }
}
