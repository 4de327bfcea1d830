package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps
import graft.streaming.SpanStream

/** Ingest-time span gate: documents arriving ACROSS micro-batches that
  * verbatim-copy a long-enough run from the reference corpus divert to
  * the flagged sink; originals and short-overlap docs pass.
  */
class SpanStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val span = (1 to 12).map(i => s"s$i").mkString(" ") // 12 shared tokens
  val short = (1 to 9).map(i => s"s$i").mkString(" ") // 9 — below minSpan
  lazy val reference = Seq(
    (100L, s"reference intro $span reference outro"),
    (101L, "a second reference document sharing nothing with arrivals"))
    .toDF("doc_id", "text")

  test("planted spans across micro-batches flag; short overlap passes") {
    val base = java.nio.file.Files.createTempDirectory("span-stream").toString
    val (cleanDir, flaggedDir) = (s"$base/clean", s"$base/flagged")
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = SpanStream.startGate(
      input.toDF().toDF("doc_id", "text"), reference, "text", "doc_id",
      windowLen = 8, minSpan = 12L, cleanDir, flaggedDir, s"$base/ckpt")
    try {
      // batch 1: a copier (full span, different position) and an original
      input.addData(
        (1L, s"lead in words here $span"),
        (2L, "an ordinary original document about something else entirely"))
      q.processAllAvailable()
      // batch 2: a 9-token overlap — detectable windows exist (9 >= 8)
      // but the run stays under minSpan=12, so it must PASS
      input.addData(
        (3L, s"partial borrower with $short trailing original content"),
        (4L, s"another verbatim copier $span wrapped differently"))
      q.processAllAvailable()
      val clean = spark.read.parquet(cleanDir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val flagged = spark.read.parquet(flaggedDir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(flagged == Set(1L, 4L), s"both copiers flag: $flagged")
      assert(clean == Set(2L, 3L), s"original + short overlap pass: $clean")
    } finally q.stop()
  }

  test("gate decisions equal the batch kernel's (code-path parity)") {
    val arrivals = Seq(
      (1L, s"lead in words here $span"),
      (2L, "an ordinary original document about something else entirely"),
      (3L, s"partial borrower with $short trailing original content"),
      (4L, s"another verbatim copier $span wrapped differently"))
      .toDF("doc_id", "text")
    val batchFlagged = DedupOps.spanMatches(arrivals, reference,
        "text", "doc_id", windowLen = 8)
      .filter(org.apache.spark.sql.functions.col("max_span") >= 12)
      .select("probe_id").collect().map(_.getLong(0)).toSet
    assert(batchFlagged == Set(1L, 4L))
  }
}
