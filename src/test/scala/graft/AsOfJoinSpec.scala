package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoinOps.asofJoin

/** Native as-of join (graft.plans.AsOfJoin*): semantics vs a composed
  * window-over-union specification, SQL null rules, tolerance, self-join
  * safety, and the physical contract (one exchange per side, merge exec).
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // trades(key, t, v) asof-joined to quotes(key, t, q)
  private def trades = Seq(
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 35L, 3.0),
    ("b", 5L, 4.0), ("b", 50L, 5.0),
    ("c", 7L, 6.0) // no quotes for c at all
  ).toDF("key", "t", "v")

  private def quotes = Seq(
    ("a", 8L, 100.0), ("a", 20L, 200.0), ("a", 30L, 300.0),
    ("b", 6L, 400.0), ("b", 49L, 500.0),
    ("d", 1L, 999.0) // key with no trades
  ).toDF("qkey", "qt", "q")

  /** Runs `f` with the broadcast path disabled (merge exec forced). */
  private def withMerge[T](f: => T): T = {
    spark.conf.set("spark.graft.asof.broadcast", "false")
    try f finally spark.conf.set("spark.graft.asof.broadcast", "true")
  }

  test("matches the latest right row at or before each left time (merge path)") {
    val out = withMerge(asofJoin(trades, quotes, Seq("key"), Seq("qkey"), "t", "qt"))
      .select("key", "t", "v", "qt", "q").orderBy("key", "t")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4))))
    assert(out.toSeq == Seq(
      ("a", 10L, Some(8L), Some(100.0)),   // 8 <= 10 < 20
      ("a", 20L, Some(20L), Some(200.0)),  // equality matches
      ("a", 35L, Some(30L), Some(300.0)),
      ("b", 5L, None, None),               // quote at 6 is in the future
      ("b", 50L, Some(49L), Some(500.0)),
      ("c", 7L, None, None)))              // key absent on the right
  }

  test("broadcast and merge paths agree on every direction and tolerance") {
    for (dir <- Seq("backward", "forward", "nearest");
         tol <- Seq(None, Some(10L))) {
      def run() = asofJoin(trades, quotes, Seq("key"), Seq("qkey"), "t", "qt",
          tolerance = tol, direction = dir)
        .select("key", "t", "v", "qt", "q").orderBy("key", "t")
        .collect().map(_.toSeq).toSeq
      val viaBroadcast = run()
      val viaMerge = withMerge(run())
      assert(viaBroadcast == viaMerge, s"dir=$dir tol=$tol")
    }
  }

  test("small right side plans as broadcast: no exchange, no sort anywhere") {
    val out = asofJoin(trades, quotes, Seq("key"), Seq("qkey"), "t", "qt")
    out.collect()
    val exec = out.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val p = exec.toString
    assert(p.contains("BroadcastAsOfJoin"), p)
    assert(!p.contains("Exchange"), s"fact side must stream unshuffled:\n$p")
  }

  test("null keys and null times never match on the broadcast path too") {
    val l = Seq((Some("a"), Some(10L), 1), (None, Some(10L), 2),
      (Some("a"), Option.empty[Long], 3)).toDF("key", "t", "id")
    val r = Seq((Some("a"), Some(5L), 9.0), (None, Some(1L), 8.0),
      (Some("a"), Option.empty[Long], 7.0)).toDF("rkey", "rt", "q")
    val out = asofJoin(l, r, Seq("key"), Seq("rkey"), "t", "rt")
      .select("id", "q").orderBy("id")
      .collect().map(row => (row.getInt(0), Option(row.get(1))))
    assert(out.toSeq == Seq((1, Some(9.0)), (2, None), (3, None)))
  }

  test("tolerance drops matches older than the bound") {
    val out = asofJoin(trades, quotes, Seq("key"), Seq("qkey"), "t", "qt",
        tolerance = Some(5L))
      .select("key", "t", "qt").orderBy("key", "t")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long])))
    assert(out.toSeq == Seq(
      ("a", 10L, Some(8L)),  // age 2 <= 5
      ("a", 20L, Some(20L)), // age 0
      ("a", 35L, Some(30L)), // age 5 (boundary included)
      ("b", 5L, None),
      ("b", 50L, Some(49L)), // age 1
      ("c", 7L, None)))
  }

  test("forward direction matches the earliest right row at or after") {
    val out = asofJoin(trades, quotes, Seq("key"), Seq("qkey"), "t", "qt",
        direction = "forward")
      .select("key", "t", "qt").orderBy("key", "t")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long])))
    assert(out.toSeq == Seq(
      ("a", 10L, Some(20L)),  // next quote after 10
      ("a", 20L, Some(20L)),  // equality matches forward too
      ("a", 35L, None),       // no quote after 35
      ("b", 5L, Some(6L)),
      ("b", 50L, None),
      ("c", 7L, None)))
  }

  test("nearest picks the closer side, ties resolve backward") {
    val l = Seq(("a", 10L), ("a", 14L), ("a", 16L), ("a", 25L)).toDF("key", "t")
    val r = Seq(("a", 9L, "b9"), ("a", 20L, "f20")).toDF("rkey", "rt", "v")
    val out = asofJoin(l, r, Seq("key"), Seq("rkey"), "t", "rt",
        direction = "nearest")
      .select("t", "v").orderBy("t").collect()
      .map(row => (row.getLong(0), row.getString(1)))
    assert(out.toSeq == Seq(
      (10L, "b9"),   // 1 back vs 10 fwd
      (14L, "b9"),   // 5 back vs 6 fwd
      (16L, "f20"),  // 7 back vs 4 fwd
      (25L, "f20"))) // only forward side is past; nearest is 20 (back now)
    // equidistant: 15 sits exactly between 10 and 20 → backward wins
    val r2 = Seq(("a", 10L, "b10"), ("a", 20L, "f20")).toDF("rkey", "rt", "v")
    val mid = asofJoin(Seq(("a", 15L)).toDF("key", "t"), r2,
        Seq("key"), Seq("rkey"), "t", "rt", direction = "nearest")
      .select("v").head().getString(0)
    assert(mid == "b10", "tie must resolve backward")
  }

  test("nearest respects tolerance on both sides") {
    val l = Seq(("a", 14L)).toDF("key", "t")
    val r = Seq(("a", 9L, "b9"), ("a", 20L, "f20")).toDF("rkey", "rt", "v")
    val hit = asofJoin(l, r, Seq("key"), Seq("rkey"), "t", "rt",
      tolerance = Some(5L), direction = "nearest").select("v").head()
    assert(hit.getString(0) == "b9") // back dist 5 allowed, fwd dist 6 not
    val miss = asofJoin(l, r, Seq("key"), Seq("rkey"), "t", "rt",
      tolerance = Some(4L), direction = "nearest").select("v").head()
    assert(miss.isNullAt(0)) // both out of tolerance
  }

  test("null keys and null times never match (SQL semantics, merge path)") {
    val l = Seq((Some("a"), Some(10L), 1), (None, Some(10L), 2),
      (Some("a"), Option.empty[Long], 3)).toDF("key", "t", "id")
    val r = Seq((Some("a"), Some(5L), 9.0), (None, Some(1L), 8.0),
      (Some("a"), Option.empty[Long], 7.0)).toDF("rkey", "rt", "q")
    val out = withMerge(asofJoin(l, r, Seq("key"), Seq("rkey"), "t", "rt")
      .select("id", "q").orderBy("id")
      .collect()).map(row => (row.getInt(0), Option(row.get(1))))
    assert(out.toSeq == Seq(
      (1, Some(9.0)), // only the non-null (a,5) row matches
      (2, None),      // null left key
      (3, None)))     // null left time
  }

  test("agrees with the composed window-over-union specification on events") {
    val ev = Tables.events(spark, SparkTestSession.sf0001)
      .filter(col("event_type").isin("purchase", "click"))
      .withColumn("tus", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("tus"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user"), col("tus").as("c_tus"))
      .agg(max("event_id").as("click_id"))

    val native = asofJoin(purchases, clicks, Seq("user_id"), Seq("c_user"),
        "tus", "c_tus")
      .select("purchase_id", "user_id", "click_id")

    // specification: union, running last_value of click ids, keep purchases.
    // (The j6 idiom can attach a click id from the same instant only after
    // dedup to one click per (user, time) — same table the native join uses.)
    val w = Window.partitionBy("user_id").orderBy("tus", "kind")
      .rowsBetween(Window.unboundedPreceding, 0)
    val spec = purchases.withColumn("kind", lit(1))
      .withColumnRenamed("purchase_id", "eid")
      .unionByName(clicks.select(col("c_user").as("user_id"),
        col("c_tus").as("tus"), col("click_id").as("eid"))
        .withColumn("kind", lit(0)))
      .withColumn("click_id",
        last(when(col("kind") === 0, col("eid")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("eid").as("purchase_id"), col("user_id"), col("click_id"))

    assert(native.count() == purchases.count())
    assert(native.exceptAll(spec).isEmpty && spec.exceptAll(native).isEmpty)
  }

  test("self-join lineage is safe (fresh exprIds on the right)") {
    val ev = trades
    val out = asofJoin(ev.filter(col("v") < 4), ev.filter(col("v") >= 4)
        .withColumnRenamed("key", "k2").withColumnRenamed("t", "t2"),
      Seq("key"), Seq("k2"), "t", "t2")
    assert(out.count() == 3)
  }

  test("optimizer rule: left-only filters push below the join, into the scan") {
    val ev = Tables.events(spark, SparkTestSession.sf0001)
      .withColumn("tus", unix_micros(col("ts")))
    val joined = asofJoin(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("tus").as("c_tus"),
          col("event_id").as("click_id")),
      Seq("user_id"), Seq("c_user"), "tus", "c_tus")
    val filtered = joined.filter(col("user_id") < 50 && col("click_id") > 0)
    // left-only conjunct moves below the AsOfJoin; right-side stays above
    val opt = filtered.queryExecution.optimizedPlan
    val top = opt.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition.sql
    }.getOrElse("")
    assert(top.contains("click_id") && !top.contains("user_id < "), top)
    // and the built-in rules carry it into the parquet scan
    val phys = filtered.queryExecution.executedPlan.toString
    assert(phys.contains("LessThan(user_id,50)"), phys)
    // semantics unchanged vs filtering without the rewrite opportunity
    val expect = joined.collect().filter(r =>
      r.getLong(r.fieldIndex("user_id")) < 50 && !r.isNullAt(r.fieldIndex("click_id")))
    assert(filtered.count() == expect.length)
  }

  test("optimizer rule: projection prunes unused columns out of both scans") {
    val ev = Tables.events(spark, SparkTestSession.sf0001)
      .withColumn("tus", unix_micros(col("ts")))
    // both sides passed WIDE (value, props, event_type untouched by the user)
    val joined = asofJoin(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "click")
        .withColumnRenamed("user_id", "c_user").withColumnRenamed("tus", "c_tus")
        .withColumnRenamed("event_id", "click_id"),
      Seq("user_id"), Seq("c_user"), "tus", "c_tus")
      .select("event_id", "user_id", "click_id")
    val phys = joined.queryExecution.executedPlan.toString
    val schemas = phys.linesIterator.filter(_.contains("ReadSchema")).toList
    assert(schemas.nonEmpty)
    schemas.foreach { s =>
      assert(!s.contains("props") && !s.contains("value"),
        s"unused wide columns must not reach the scan: $s")
    }
  }

  test("physical plan: merge exec with one exchange and one sort per side") {
    val out = withMerge {
      val df = asofJoin(trades, quotes, Seq("key"), Seq("qkey"), "t", "qt")
      df.collect() // materialize AQE final plan under the forced config
      df
    }
    val exec = out.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val p = exec.toString
    assert(p.contains("AsOfJoin"), p) // nodeName strips the Exec suffix
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
    assert("\\bSort\\b".r.findAllIn(p).size == 2, p)
  }
}
