package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Par, SketchOps}
import graft.streaming.{PostingsStream, SketchStream}

/** The driver-thread job-overlap helper behind the composite rows
  * (optimization round r19, guide §2.6): concurrent batch commits to an
  * order-independent store must merge to EXACTLY the sequential build —
  * including the first-write geometry race on a fresh sketch store
  * (CounterLog.writeGeometry's atomic rename makes the same-content
  * race benign) — and failures must propagate, not vanish into the
  * pool.
  */
class ParSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("Par.run propagates the first thunk failure") {
    val hit = new java.util.concurrent.atomic.AtomicInteger
    val e = intercept[IllegalStateException] {
      Par.run(
        () => { hit.incrementAndGet(); () },
        () => throw new IllegalStateException("boom"),
        () => { hit.incrementAndGet(); () })
    }
    assert(e.getMessage == "boom")
    assert(hit.get == 2, "sibling thunks still ran to completion")
  }

  test("Par.run attaches sibling failures as suppressed on the rethrown " +
      "first cause") {
    val e = intercept[IllegalStateException] {
      Par.run(
        () => throw new IllegalStateException("first"),
        () => throw new IllegalArgumentException("second"),
        () => ())
    }
    assert(e.getMessage == "first")
    assert(e.getSuppressed.exists(_.getMessage == "second"),
      s"sibling failure lost: ${e.getSuppressed.toSeq}")
  }

  test("writeGeometry: an unchanged re-write never opens a missing-file " +
      "window, a content change still lands, and concurrent same-geometry " +
      "writers leave a readable live file (judge/advisor r19)") {
    import graft.streaming.CounterLog
    val store = java.nio.file.Files
      .createTempDirectory("geom-swap").toString + "/s"
    new java.io.File(store).mkdirs()
    CounterLog.writeGeometry(spark, store, Seq("depth" -> 4, "width" -> 1024))
    assert(CounterLog.readGeometry(spark, store)
      .contains(Map("depth" -> 4, "width" -> 1024)))
    // unchanged re-write: skip path — the live file is never deleted.
    // Watch the file across the call: it must exist before and after,
    // and the skip leaves no tmp sidecar behind.
    CounterLog.writeGeometry(spark, store, Seq("depth" -> 4, "width" -> 1024))
    assert(CounterLog.readGeometry(spark, store)
      .contains(Map("depth" -> 4, "width" -> 1024)))
    assert(!new java.io.File(store).listFiles()
      .exists(_.getName.endsWith(".tmp")), "skip path left a tmp sidecar")
    // a genuine content change still swaps
    CounterLog.writeGeometry(spark, store, Seq("depth" -> 8, "width" -> 2048))
    assert(CounterLog.readGeometry(spark, store)
      .contains(Map("depth" -> 8, "width" -> 2048)))
    // concurrent same-geometry writers: every interleaving must leave
    // the live file present with the requested content (the Par race)
    val fresh = java.nio.file.Files
      .createTempDirectory("geom-race").toString + "/s"
    new java.io.File(fresh).mkdirs()
    Par.run((0 until 8).map(_ => () =>
      CounterLog.writeGeometry(spark, fresh,
        Seq("depth" -> 4, "width" -> 1024))): _*)
    assert(CounterLog.readGeometry(spark, fresh)
      .contains(Map("depth" -> 4, "width" -> 1024)))
    assert(!new java.io.File(fresh).listFiles()
      .exists(_.getName.endsWith(".tmp")), "race left a tmp sidecar")
  }

  test("concurrent waves on a fresh sketch store equal the sequential build") {
    val toks = (0 until 300).map(i => (i.toLong, s"t${i % 17}"))
      .toDF("id", "tok")
    def build(par: Boolean): Map[(Int, Long), Long] = {
      val store = java.nio.file.Files
        .createTempDirectory(s"par-sketch-$par").toString + "/s"
      def wave(k: Long): Unit = SketchStream.applyBatch(
        toks.filter(pmod(col("id"), lit(3)) === k).select("tok"),
        "tok", store, k)
      if (par) Par.waves(0L to 2L)(wave) else (0L to 2L).foreach(wave)
      SketchStream.readSketch(spark, store).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    }
    assert(build(par = true) == build(par = false))
  }

  test("concurrent waves on a fresh postings store equal the sequential build") {
    val docs = (0 until 60)
      .map(i => (i.toLong, s"w${i % 5} w${i % 7} w${i % 5}"))
      .toDF("doc_id", "text")
    def build(par: Boolean): Map[(Long, String), Long] = {
      val store = java.nio.file.Files
        .createTempDirectory(s"par-postings-$par").toString + "/s"
      def wave(k: Long): Unit = PostingsStream.applyBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === k), store, k)
      if (par) Par.waves(0L to 2L)(wave) else (0L to 2L).foreach(wave)
      PostingsStream.readTf(spark, store).get.collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    }
    assert(build(par = true) == build(par = false))
  }
}
