package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PipelineOps
import graft.streaming.DriftStream

/** Incremental drift monitoring: the counter log merged over every
  * streamed batch must feed the SAME exact-integer TV core as the batch
  * snapshot op — so the streamed drift number equals
  * [[PipelineOps.distributionDrift]] over the union of all streamed
  * data bit-for-bit, not approximately.
  */
class DriftStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def driftRow(df: org.apache.spark.sql.DataFrame)
      : (Long, Long, Long, Double) = {
    val r = df.head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
  }

  test("streamed drift equals the batch snapshot drift bit-for-bit") {
    val base = java.nio.file.Files.createTempDirectory("drift-stream").toString
    val store = s"$base/counts"
    implicit val sc = spark.sqlContext
    val input = MemoryStream[String]
    val q = DriftStream.startDriftMaintenance(
      input.toDF().toDF("lang"), "lang", store, s"$base/ckpt")
    val streamed = Seq(
      Seq("en", "en", "de"), Seq("en", "zh", "zh"), Seq("de", "de", "fr"))
    try {
      streamed.foreach { w => input.addData(w: _*); q.processAllAvailable() }
    } finally q.stop()
    val reference = Seq("en", "en", "en", "de", "zh", "fr", "fr")
      .toDF("lang")
    val live = driftRow(
      DriftStream.driftAgainst(spark, store, reference, "lang"))
    val batch = driftRow(PipelineOps.distributionDrift(
      reference, streamed.flatten.toDF("lang"), "lang"))
    assert(live == batch, s"$live vs $batch")
    // and a reference equal to the streamed mix reads TV = 0
    val self = driftRow(DriftStream.driftAgainst(
      spark, store, streamed.flatten.toDF("lang"), "lang"))
    assert(self._4 == 0.0, self.toString)
  }

  test("replayed batch overwrites; NULL keys are one category") {
    val base = java.nio.file.Files.createTempDirectory("drift-replay").toString
    val store = s"$base/counts"
    val w1 = Seq(Some("en"), None, None).toDF("lang")
    val w2 = Seq(Some("de"), None).toDF("lang")
    DriftStream.applyBatch(w1, "lang", store, 0L)
    DriftStream.applyBatch(w2, "lang", store, 1L)
    // at-least-once delivery: batch 1 arrives again with the same rows
    DriftStream.applyBatch(w2, "lang", store, 1L)
    val counts = DriftStream.readCounts(spark, store).collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(counts ==
      Map(Some("en") -> 1L, Some("de") -> 1L, (None: Option[String]) -> 3L),
      counts.toString)
    // NULL-keyed drift vs an identical reference mix must read 0 —
    // the null-safe join keeps NULL one key, never a key-per-row
    val ref = Seq(Some("en"), Some("de"), None, None, None).toDF("lang")
    assert(driftRow(DriftStream.driftAgainst(spark, store, ref, "lang"))._4
      == 0.0)
    // an empty batch writes nothing
    DriftStream.applyBatch(Seq.empty[String].toDF("lang"), "lang", store, 2L)
    assert(DriftStream.readCounts(spark, store).count() == 3)
  }

  test("compact folds the log; drift reading is unchanged") {
    val base = java.nio.file.Files.createTempDirectory("drift-compact").toString
    val store = s"$base/counts"
    DriftStream.applyBatch(Seq("a", "a", "b").toDF("k"), "k", store, 0L)
    DriftStream.applyBatch(Seq("b", "c").toDF("k"), "k", store, 1L)
    val ref = Seq("a", "b", "b", "c", "c").toDF("k")
    val before = driftRow(DriftStream.driftAgainst(spark, store, ref, "k"))
    DriftStream.compact(spark, store)
    val dirs = new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).toSeq
    assert(dirs == Seq("batch_id=1"), dirs.toString)
    assert(driftRow(DriftStream.driftAgainst(spark, store, ref, "k"))
      == before)
    // post-compact appends keep merging on top of the folded partition
    DriftStream.applyBatch(Seq("c", "c").toDF("k"), "k", store, 2L)
    val counts = DriftStream.readCounts(spark, store).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 2L, "b" -> 2L, "c" -> 3L), counts.toString)
  }

  test("empty log fails loudly instead of reporting drift-vs-nothing") {
    val store = java.nio.file.Files
      .createTempDirectory("drift-empty").toString + "/nope"
    val err = intercept[IllegalArgumentException] {
      DriftStream.readCounts(spark, store)
    }
    assert(err.getMessage.contains("no committed batches"), err.getMessage)
  }
}
