package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CurationStream

/** Ingest curation gate: PII is scrubbed before anything lands, the
  * pass/reject split is the integer cross-multiply of the oracle quality
  * rational, rejects keep their audit trail, and replay is a no-op.
  */
class CurationStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val good = ("good doc " * 20).trim // long, stopword-free
  private val junk = "the a of the a of" // stopword soup, short

  private def rows(dir: String): Map[Long, (String, Long)] =
    spark.read.parquet(dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Long]("quality_bps"))).toMap

  test("gate scrubs PII, routes by the integer quality floor, keeps rejects") {
    val base = java.nio.file.Files.createTempDirectory("curation-gate").toString
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = CurationStream.startGate(input.toDF().toDF("doc_id", "text"),
      "text", minQualityBps = 4000L, s"$base/pass", s"$base/reject",
      s"$base/ckpt")
    try {
      input.addData(
        (1L, s"$good mail me jane@example.com"),
        (2L, junk),
        (3L, "")) // blank: unscorable
      q.processAllAvailable()
    } finally q.stop()
    val pass = rows(s"$base/pass")
    val reject = rows(s"$base/reject")
    // the good doc passes, scrubbed — the raw address never lands
    assert(pass.keySet == Set(1L), s"pass: $pass")
    assert(pass(1L)._1.endsWith("mail me <EMAIL>"))
    assert(!pass(1L)._1.contains("jane@example.com"))
    assert(pass(1L)._2 >= 4000L)
    // junk and unscorable reject WITH their audit score
    assert(reject.keySet == Set(2L, 3L), s"reject: $reject")
    assert(reject(2L)._2 >= 0L && reject(2L)._2 < 4000L)
    assert(reject(3L)._2 == -1L)
  }

  test("a NULL text row lands in reject, not in neither sink") {
    // a NULL predicate silently drops rows from BOTH filter branches —
    // the gate must be a total split of every batch (review finding)
    val base = java.nio.file.Files.createTempDirectory("curation-null").toString
    val batch = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(20L, good),
        org.apache.spark.sql.Row(21L, null)),
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING"))
    CurationStream.applyBatch(batch, 0L, "text", 4000L,
      s"$base/pass", s"$base/reject")
    assert(rows(s"$base/pass").keySet == Set(20L))
    val reject = rows(s"$base/reject")
    assert(reject.keySet == Set(21L), s"NULL row must reject: $reject")
    assert(reject(21L)._2 == -1L)
  }

  test("gate equals the batch quality rational, and replay is a no-op") {
    val base = java.nio.file.Files.createTempDirectory("curation-replay").toString
    val batch = Seq((10L, good), (11L, junk)).toDF("doc_id", "text")
    CurationStream.applyBatch(batch, 0L, "text", 4000L,
      s"$base/pass", s"$base/reject")
    val before = (rows(s"$base/pass"), rows(s"$base/reject"))
    // the gate's bps equals round-down of the batch-side rational
    val (qNum, qDen) = graft.operators.TextOps.qualityRat(col("text"),
      length(col("text")))
    val expected = batch.select(col("doc_id"),
        ((qNum * 10000L - pmod(qNum * 10000L, qDen)) / qDen).cast("long").as("bps"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before._1(10L)._2 == expected(10L))
    assert(before._2(11L)._2 == expected(11L))
    // at-least-once: the same batch id arrives again
    CurationStream.applyBatch(batch, 0L, "text", 4000L,
      s"$base/pass", s"$base/reject")
    assert((rows(s"$base/pass"), rows(s"$base/reject")) == before)
  }
}
