package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RetrievalOps
import graft.streaming.PostingsStream

/** The BM25 postings log: merge == one-pass by count mergeability, replay
  * idempotence, compaction, and the zero-term-doc N/avgdl bookkeeping the
  * fixture (no empty docs) can't exercise through the oracle row.
  */
class PostingsStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshStore(tag: String): String =
    graft.operators.StageIO.resolve(spark, None, tag)

  // empty + 1-token docs have zero bigram terms but still carry N/avgdl
  private val corpus = Seq[(Long, String)](
    0L -> "the quick brown fox jumps over the lazy dog",
    1L -> "quick brown fox seen near the river bank today",
    2L -> "the lazy dog sleeps by the river bank",
    3L -> "", 4L -> "single",
    5L -> "the quick brown fox jumps over the lazy dog")

  test("merged tf/dl logs equal the one-pass postings; replayed batches " +
      "are no-ops; compaction preserves both") {
    val docs = corpus.toDF("doc_id", "text")
    val store = freshStore("postings-spec")
    (0L to 2L).foreach { k =>
      PostingsStream.applyBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === k), store, k)
    }
    def tfSet = PostingsStream.readTf(spark, store).get.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    def dlSet = PostingsStream.readDl(spark, store).get.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantTf = RetrievalOps.termCounts(docs, 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val wantDl = RetrievalOps.docLengths(docs, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tfSet == wantTf)
    assert(dlSet == wantDl)
    assert(wantDl.contains((3L, 0L)) && wantDl.contains((4L, 0L)),
      "zero-term docs must keep dl rows")
    // replay wave 1: overwrite-keyed, merged state unchanged
    PostingsStream.applyBatch(
      docs.filter(pmod(col("doc_id"), lit(3)) === 1), store, 1L)
    assert(tfSet == wantTf && dlSet == wantDl, "replay must be a no-op")
    PostingsStream.compact(spark, store)
    assert(tfSet == wantTf && dlSet == wantDl, "compaction must preserve")
  }

  test("the streaming driver maintains the same log shape as direct " +
      "applyBatch (foreachBatch, batch-keyed overwrite)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = corpus.toDF("doc_id", "text")
    val store = freshStore("postings-stream")
    val input = MemoryStream[(Long, String)]
    val q = PostingsStream.startPostingsMaintenance(
      input.toDF().toDF("doc_id", "text"), store,
      freshStore("postings-ckpt"))
    try {
      input.addData(corpus.take(3)); q.processAllAvailable()
      input.addData(corpus.drop(3)); q.processAllAvailable()
    } finally q.stop()
    val tf = PostingsStream.readTf(spark, store).get.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val dl = PostingsStream.readDl(spark, store).get.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tf == RetrievalOps.termCounts(docs, 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet)
    assert(dl == RetrievalOps.docLengths(docs, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("the positional sub-log unions to the one-pass positional " +
      "postings under doc-disjoint batches; replay is a no-op; " +
      "compaction preserves multiplicity") {
    val docs = corpus.toDF("doc_id", "text")
    val store = freshStore("postings-pos")
    (0L to 2L).foreach { k =>
      PostingsStream.applyBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === k), store, k,
        withPositions = true)
    }
    def posSeq = PostingsStream.readPos(spark, store).get.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val want = RetrievalOps.positionalPostings(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(posSeq == want)
    assert(want.exists(_._1 == 0L) && !want.exists(_._1 == 3L),
      "empty docs contribute no positions")
    PostingsStream.applyBatch(
      docs.filter(pmod(col("doc_id"), lit(3)) === 1), store, 1L,
      withPositions = true)
    assert(posSeq == want, "replay must be a no-op")
    PostingsStream.compact(spark, store)
    assert(posSeq == want,
      "plain-rewrite fold must preserve row multiplicity exactly")
  }

  test("a compaction swap interrupted in either crash window recovers: " +
      "the log survives intact and further compaction works") {
    val docs = corpus.toDF("doc_id", "text")
    val store = freshStore("postings-crash")
    (0L to 2L).foreach { k =>
      PostingsStream.applyBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === k), store, k)
    }
    val wantTf = PostingsStream.readTf(spark, store).get.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def path(s: String) = new org.apache.hadoop.fs.Path(s)

    // window 1: crash between rename(dir -> dir.old) and
    // rename(dir.next -> dir) — the complete fold lives only in .next
    PostingsStream.compact(spark, store) // a folded single-partition log
    assert(fs.rename(path(s"$store/tf"), path(s"$store/tf.next")))
    fs.mkdirs(path(s"$store/tf.old")) // stale aside-copy also present
    val afterW1 = PostingsStream.readTf(spark, store).get.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(afterW1 == wantTf, "repair must finish the interrupted swap")
    assert(!fs.exists(path(s"$store/tf.next")), "rescued .next is renamed")

    // window 2: crash between rename(next -> dir) and delete(old) —
    // the live dir is authoritative, the stray .old is dropped
    fs.mkdirs(path(s"$store/tf.old"))
    val afterW2 = PostingsStream.readTf(spark, store).get.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(afterW2 == wantTf)
    assert(!fs.exists(path(s"$store/tf.old")), "stray .old is dropped")

    // and the repaired log compacts again cleanly
    PostingsStream.compact(spark, store)
    val afterFold = PostingsStream.readTf(spark, store).get.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(afterFold == wantTf)
  }

  test("deleteBatch: tombstoned docs vanish from tf/dl/pos reads — the " +
      "merged state equals a rebuild without them (N/avgdl included); " +
      "replay is a no-op; compact applies the exclusion physically and " +
      "retires the del sub-log") {
    val docs = corpus.toDF("doc_id", "text")
    val store = freshStore("postings-delete")
    (0L to 2L).foreach { k =>
      PostingsStream.applyBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === k), store, k,
        withPositions = true)
    }
    // retract docs 0 (content) and 3 (a zero-term doc — the case
    // negative-count tombstones cannot cancel: its dl row is already 0)
    PostingsStream.deleteBatch(Seq(0L, 3L).toDF("doc_id"), store, 0L)
    val kept = docs.filter(!col("doc_id").isin(0L, 3L))
    def tfSet = PostingsStream.readTf(spark, store).get.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    def dlSet = PostingsStream.readDl(spark, store).get.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def posSeq = PostingsStream.readPos(spark, store).get.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val wantTf = RetrievalOps.termCounts(kept, 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val wantDl = RetrievalOps.docLengths(kept, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantPos = RetrievalOps.positionalPostings(kept).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(tfSet == wantTf && dlSet == wantDl && posSeq == wantPos)
    assert(!dlSet.exists(_._1 == 3L),
      "a deleted zero-term doc must drop its dl row (N would count it)")
    PostingsStream.deleteBatch(Seq(0L, 3L).toDF("doc_id"), store, 0L)
    assert(tfSet == wantTf && dlSet == wantDl, "replay must be a no-op")
    PostingsStream.compact(spark, store)
    assert(tfSet == wantTf && dlSet == wantDl && posSeq == wantPos,
      "compaction must preserve the post-delete state")
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$store/del")),
      "compact must retire the applied tombstones")
    // physical purge: the folded parquet itself carries no tombstoned
    // rows (the del log is gone, so an anti-join can no longer hide any)
    val raw = spark.read.parquet(s"$store/tf").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(!raw.contains(0L), "fold must purge deleted postings")
  }

  test("applyBatch finishes an interrupted compaction swap BEFORE " +
      "writing (advisor r17): a post-crash replayed batch must not " +
      "orphan the complete pre-crash log in dir.next") {
    val docs = corpus.toDF("doc_id", "text")
    val store = freshStore("postings-crash-apply")
    (0L to 1L).foreach { k =>
      PostingsStream.applyBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === k), store, k)
    }
    PostingsStream.compact(spark, store) // one folded partition per log
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def path(s: String) = new org.apache.hadoop.fs.Path(s)
    // crash window 1 on BOTH counter logs: dir gone, fold only in .next
    Seq("tf", "dl").foreach { sub =>
      assert(fs.rename(path(s"$store/$sub"), path(s"$store/$sub.next")))
    }
    // the restarted stream's first act is a WRITE (its pending batch)
    PostingsStream.applyBatch(
      docs.filter(pmod(col("doc_id"), lit(3)) === 2), store, 2L)
    val tfSet = PostingsStream.readTf(spark, store).get.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val wantTf = RetrievalOps.termCounts(docs, 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(tfSet == wantTf,
      "the pre-crash log must survive a write-before-read restart")
    // and a follow-up compaction must not destroy anything either
    PostingsStream.compact(spark, store)
    val after = PostingsStream.readTf(spark, store).get.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(after == wantTf)
  }

  test("bm25 from state equals the one-pass scores on a corpus WITH " +
      "degenerate docs (N and avgdl include them)") {
    val docs = corpus.toDF("doc_id", "text")
    val qids = Seq(0L).toDF("q_id")
    val store = freshStore("postings-spec-scores")
    (0L to 2L).foreach { k =>
      PostingsStream.applyBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === k), store, k)
    }
    val tf = PostingsStream.readTf(spark, store).get
    val dl = PostingsStream.readDl(spark, store).get
    val fromState = RetrievalOps
      .bm25PairScoresFromState(tf, dl, docs, qids).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val onePass = RetrievalOps.bm25PairScores(docs, qids).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fromState == onePass)
    assert(onePass.nonEmpty)
  }
}
