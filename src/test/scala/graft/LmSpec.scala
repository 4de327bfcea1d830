package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LmOps

class LmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // reference corpus: "a b c" twice, "a b d" once → known counts
  private def train = Seq(
    (0L, "a b c"), (2L, "a b c"), (4L, "a b d")).toDF("doc_id", "text")

  test("backoff branches match hand-computed scores") {
    val counts = LmOps.ngramCountsTo(train, "text")
    // N = 9 unigram tokens; c(a b c)=2, c(a b)=3, c(b c)=2, c(b)=3,
    // c(c)=2, c(d)=1
    val probe = Seq(
      (1L, "a b c"),   // seen trigram: 2/3 → 6666 bps
      (3L, "x y b c"), // "x y b" unseen, "y b c" unseen tri;
                       //   "y b" unseen bigram; c(b)=3 →
                       //   (4·3·10⁴)/(25·9) = 533 bps each? no:
                       //   "x y b": w3=b → (4·3)/(25·9) → 533
                       //   "y b c": bigram "b c"=2, w2=b=3 →
                       //   (2·2·10⁴)/(5·3) = 2666
      (5L, "q q q")).toDF("doc_id", "text") // all-unseen → 0
    val got = LmOps.backoffScore(probe, "doc_id", "text", counts)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (1L, 1L, 6666L),
      (3L, 2L, 533L + 2666L),
      (5L, 1L, 0L)))
  }

  test("short and empty docs score (0, 0)") {
    val probe = Seq((1L, "a b"), (2L, ""), (3L, "a")).toDF("doc_id", "text")
    val got = LmOps.backoffScore(probe, "doc_id", "text",
        LmOps.ngramCountsTo(train, "text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 0L)))
  }

  test("NgramStream merged log equals the one-pass table; driver runs") {
    import graft.streaming.NgramStream
    val docs = Tables.documents(spark, SparkTestSession.sf0001)
    val store = graft.operators.StageIO.resolve(spark, None, "lm-log")
    (0L to 2L).foreach { k =>
      NgramStream.applyBatch(docs.filter(pmod(col("doc_id"), lit(3)) === k),
        "text", store, k)
    }
    val merged = NgramStream.readCounts(spark, store).get
    val direct = LmOps.ngramCountsTo(docs, "text")
    assert(merged.exceptAll(direct).count() == 0L)
    assert(direct.exceptAll(merged).count() == 0L)
    // compaction folds to one partition, counts unchanged
    NgramStream.compact(spark, store)
    val folded = NgramStream.readCounts(spark, store).get
    assert(folded.exceptAll(direct).count() == 0L)
    // the streaming driver maintains the same log shape
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store2 = graft.operators.StageIO.resolve(spark, None, "lm-log2")
    val input = MemoryStream[(Long, String)]
    val q = NgramStream.startCountMaintenance(
      input.toDF().toDF("doc_id", "text"), "text", store2,
      graft.operators.StageIO.resolve(spark, None, "lm-ckpt"))
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    try {
      input.addData(rows.take(rows.size / 2)); q.processAllAvailable()
      input.addData(rows.drop(rows.size / 2)); q.processAllAvailable()
    } finally q.stop()
    val streamed = NgramStream.readCounts(spark, store2).get
    assert(streamed.exceptAll(direct).count() == 0L)
    assert(direct.exceptAll(streamed).count() == 0L)
  }
}
