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

  test("stateful gate catches copier pairs arriving ACROSS micro-batches") {
    val base = java.nio.file.Files.createTempDirectory("span-state").toString
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = SpanStream.startStatefulGate(
      input.toDF().toDF("doc_id", "text"), reference = None, "text",
      "doc_id", windowLen = 8, minSpan = 12L, s"$base/clean",
      s"$base/flagged", s"$base/index", s"$base/ckpt")
    try {
      // batch 1: an original lands clean; its window index becomes state
      input.addData((10L, s"original author writes $span first time here"))
      q.processAllAvailable()
      // batch 2: a copier of batch 1's doc (no static reference knows it),
      // an in-batch copier pair (13 copies 12 — larger id flags), and an
      // unrelated original
      input.addData(
        (11L, s"later arrival copying $span from a previous batch"),
        (12L, "in batch original text that someone else will copy word for word today"),
        (13L, "in batch original text that someone else will copy word for word today indeed"),
        (14L, "completely unrelated clean arrival about other matters"))
      q.processAllAvailable()
      val clean = spark.read.parquet(s"$base/clean")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val flagged = spark.read.parquet(s"$base/flagged")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(flagged == Set(11L, 13L),
        s"cross-batch copier + in-batch larger id must flag: $flagged")
      assert(clean == Set(10L, 12L, 14L), clean)
    } finally q.stop()
  }

  test("stateful replay is idempotent; the horizon bounds history") {
    val base = java.nio.file.Files.createTempDirectory("span-horizon").toString
    def run(b: org.apache.spark.sql.DataFrame, id: Long) =
      SpanStream.applyBatchStateful(b, id, None, "text", "doc_id",
        windowLen = 8, minSpan = 12L, None, s"$base/clean",
        s"$base/flagged", s"$base/index", maxHistoryBatches = Some(1L))
    run(Seq((20L, s"first author $span original")).toDF("doc_id", "text"), 0L)
    // replaying batch 0 must not match the doc against its own state
    run(Seq((20L, s"first author $span original")).toDF("doc_id", "text"), 0L)
    assert(spark.read.parquet(s"$base/clean")
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(20L))
    // batch 1 copier of batch 0: inside the horizon — flags
    run(Seq((21L, s"near copier $span lands")).toDF("doc_id", "text"), 1L)
    // batch 3 copier of batch 0: batch 0's index is evicted (horizon 1,
    // and batch 2 never ran) — the documented miss; batch pass catches it
    run(Seq((22L, s"far copier $span lands")).toDF("doc_id", "text"), 3L)
    val flagged = spark.read.parquet(s"$base/flagged")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val clean = spark.read.parquet(s"$base/clean")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged == Set(21L), flagged)
    assert(clean == Set(20L, 22L), clean)
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
