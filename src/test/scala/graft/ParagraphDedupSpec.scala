package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps
import graft.streaming.ParagraphStream

/** Corpus-wide paragraph dedup: keep-first over md5(paragraph) with
  * in-place reassembly (batch), and the same decisions from the
  * persisted admitted-hash store (streaming gate). For id-ordered
  * waves the gate must reproduce the batch operator exactly.
  */
class ParagraphDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("keep-first across docs, in-place reassembly, empty-doc survival") {
    val out = DedupOps.paragraphDedup(
      docs(
        1L -> "alpha beta\n\nshared one\n\ngamma",
        2L -> "shared one\n\ndelta\n\nshared one",
        3L -> "shared one"),
      "text", "doc_id")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 3L, 3L, "alpha beta\n\nshared one\n\ngamma")))
    // doc 2: both copies of the shared paragraph drop (doc 1 owns it),
    // including the SECOND in-doc copy; delta survives alone
    assert(out(1) == ((2L, 3L, 1L, "delta")))
    // doc 3: fully deduplicated — survives with empty text
    assert(out(2) == ((3L, 1L, 0L, "")))
  }

  test("within-doc duplicate keeps the first position") {
    val out = DedupOps.paragraphDedup(
      docs(7L -> "rep\n\nmid\n\nrep"), "text", "doc_id").collect()
    assert(out.head.getString(3) == "rep\n\nmid")
  }

  test("non-integral id column fails loudly") {
    val e = intercept[IllegalArgumentException] {
      DedupOps.paragraphDedup(
        Seq(("a", "x")).toDF("doc_id", "text"), "text", "doc_id")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("dupRateSample: duplicate groups co-sample (all copies in or out together)") {
    // 10 copies of each of 3 templates + 30 unique docs
    val rows = (0 until 30).map(i => (i.toLong, s"unique doc number $i")) ++
      (0 until 30).map(i => (100L + i, s"template ${i % 3}"))
    val df = rows.toDF("doc_id", "text")
    val out = DedupOps.dupRateSample(df, "text", sampleBps = 5000)
      .collect().head
    val (n, d) = (out.getLong(0), out.getLong(1))
    // a template group contributes 10 sampled + 1 distinct or nothing:
    // sampled - distinct must be a sum of 9s from planted groups
    assert((n - d) % 9 == 0, s"n=$n distinct=$d")
    // determinism
    val again = DedupOps.dupRateSample(df, "text", sampleBps = 5000)
      .collect().head
    assert((again.getLong(0), again.getLong(1)) == ((n, d)))
    // full-rate slice == exact census
    val full = DedupOps.dupRateSample(df, "text", sampleBps = 10000)
      .collect().head
    assert(full.getLong(0) == 60L && full.getLong(1) == 33L)
  }

  test("streaming gate over id-ordered waves == one batch dedup; replay is a no-op") {
    val all = docs(
      1L -> "p one\n\np two",
      2L -> "p two\n\np three",
      3L -> "p one\n\np four\n\np four",
      4L -> "p three\n\np five")
    val base = java.nio.file.Files.createTempDirectory("para-gate").toString
    val (store, clean) = (s"$base/store", s"$base/clean")
    ParagraphStream.applyBatch(all.filter($"doc_id" <= 2), 0L, store, clean)
    ParagraphStream.applyBatch(all.filter($"doc_id" === 3), 1L, store, clean)
    ParagraphStream.applyBatch(all.filter($"doc_id" === 4), 2L, store, clean)
    val batch = DedupOps.paragraphDedup(all, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    def streamed =
      spark.read.parquet(s"$clean/batch=*").orderBy("doc_id").collect().toSeq
    assert(streamed == batch)
    // at-least-once redelivery of the middle wave: below-id store read +
    // overwrite-keyed sinks re-derive the identical rewrite
    ParagraphStream.applyBatch(all.filter($"doc_id" === 3), 1L, store, clean)
    assert(streamed == batch)
    // the store holds exactly the admitted (distinct) paragraph hashes
    val admitted = spark.read.parquet(store).select("ph").distinct().count()
    val distinctParas = all
      .select(explode(split($"text", "\n\n")).as("p"))
      .distinct().count()
    assert(admitted == distinctParas)
  }
}
