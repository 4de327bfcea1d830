package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.RetrievalOps

/** Streaming maintenance of the BM25 postings state — the resident form
  * of "index the corpus once, keep it current per ingest batch": each
  * document batch appends its own `(doc_id, tok, tf)` postings under
  * `storeDir/tf/batch_id=<id>/` and its `(doc_id, dl)` length rows —
  * INCLUDING zero-term docs, which carry corpus size N and the avgdl
  * mass — under `storeDir/dl/batch_id=<id>/`. Term frequencies and
  * lengths are mergeable by plain sum, so the merged log over any
  * DOC-DISJOINT batch partition of a corpus (each document's full text
  * arriving in one batch — the unit every real ingest delivers) equals
  * the one-pass postings over its union, row for row, and
  * [[graft.operators.RetrievalOps.bm25PairScoresFromState]]
  * hash-matches the one-pass scores (the x124b gate pins this end to
  * end). A document SPLIT across batches is outside the contract for
  * `ngram` ≥ 2 — see [[readTf]].
  *
  * Same counter-log discipline as [[NgramStream]]/[[SketchStream]]: a
  * replayed batch OVERWRITES its own partitions (at-least-once in,
  * exactly-once effect), readers see only committed partitions, and
  * [[compact]] folds the accumulated batch dirs into one pre-summed
  * partition per sub-log when file listing becomes the read's cost.
  *
  * At 100 TB the tf log is the corpus's postings — large, but
  * partition-appendable and already in the shape every downstream probe
  * consumes; the dl log is one row per document. Neither is ever
  * rescanned from text.
  */
object PostingsStream {

  /** Index one micro-batch of documents into the log. Overwrite-keyed
    * by batch id: replay is a no-op. `withPositions` additionally
    * appends the batch's POSITIONAL postings `(doc_id, tok, pos)` under
    * `storeDir/pos/` — positions are per-doc absolute, so under the
    * doc-disjoint delivery contract the union of committed batches IS
    * the one-pass positional index, no merge arithmetic at all (and a
    * split document is off-contract at every ngram here, since a
    * fragment restarts its positions at 0).
    */
  def applyBatch(docs: DataFrame, storeDir: String, batchId: Long,
      ngram: Int = 2, withPositions: Boolean = false): Unit = {
    if (docs.isEmpty) return
    RetrievalOps.termCounts(docs, ngram)
      .write.mode("overwrite").parquet(s"$storeDir/tf/batch_id=$batchId")
    RetrievalOps.docLengths(docs, ngram)
      .write.mode("overwrite").parquet(s"$storeDir/dl/batch_id=$batchId")
    if (withPositions)
      RetrievalOps.positionalPostings(docs)
        .write.mode("overwrite").parquet(s"$storeDir/pos/batch_id=$batchId")
  }

  private def hasBatches(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    repair(fs, dir)
    fs.exists(p) && fs.listStatus(p)
      .exists(_.getPath.getName.startsWith("batch_id="))
  }

  /** Finish a [[foldLog]] swap interrupted by a crash (advisor r16).
    * The swap order is rename(dir → dir.old) → rename(dir.next → dir) →
    * delete(dir.old), so at every instant the complete log exists under
    * exactly one of `dir` / `dir.next`:
    *   - `dir` missing with `dir.next` present ⇒ the crash hit between
    *     the two renames and the FOLD is the complete copy — finish the
    *     swap by renaming it into place;
    *   - `dir` present ⇒ it is authoritative (the fold only renames it
    *     aside after `.next` is fully written); a stray `dir.old` from a
    *     crash before the final delete is dropped. A partial `dir.next`
    *     next to a live `dir` is left alone here — the next [[foldLog]]
    *     deletes and rewrites it (readers never look at `.next`).
    */
  private def repair(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val next = new org.apache.hadoop.fs.Path(dir + ".next")
    val old = new org.apache.hadoop.fs.Path(dir + ".old")
    if (!fs.exists(p) && fs.exists(next))
      require(fs.rename(next, p), s"compaction repair failed: $next -> $p")
    if (fs.exists(p) && fs.exists(old)) fs.delete(old, true)
  }

  /** The merged postings — `(doc_id, tok, tf)` summed over every
    * committed batch, or None before the first commit. Sum-merge equals
    * the one-pass index when batches partition the corpus BY DOCUMENT
    * (each document's full text arrives in one batch) — for `ngram` ≥ 2
    * a document split across batches diverges (the n-gram spanning the
    * fragment boundary is never emitted and each fragment contributes
    * its own length), so split delivery is only sum-exact at ngram = 1.
    */
  def readTf(spark: SparkSession, storeDir: String): Option[DataFrame] =
    if (!hasBatches(spark, s"$storeDir/tf")) None
    else Some(spark.read.parquet(s"$storeDir/tf")
      .groupBy("doc_id", "tok").agg(sum("tf").cast("long").as("tf")))

  /** The merged length table — `(doc_id, dl)`, zero-dl rows included. */
  def readDl(spark: SparkSession, storeDir: String): Option[DataFrame] =
    if (!hasBatches(spark, s"$storeDir/dl")) None
    else Some(spark.read.parquet(s"$storeDir/dl")
      .groupBy("doc_id").agg(sum("dl").cast("long").as("dl")))

  /** The merged positional postings — the plain UNION of committed
    * batches (see [[applyBatch]]'s positional contract), or None before
    * the first positional commit.
    */
  def readPos(spark: SparkSession, storeDir: String): Option[DataFrame] =
    if (!hasBatches(spark, s"$storeDir/pos")) None
    else Some(spark.read.parquet(s"$storeDir/pos")
      .select("doc_id", "tok", "pos"))

  /** Fold every batch partition of both sub-logs into ONE pre-summed
    * partition keyed by the max folded id — the [[NgramStream.compact]]
    * maintenance story. OFFLINE rule as everywhere: no batch writing
    * while compacting, no folded id replayable afterwards.
    */
  def compact(spark: SparkSession, storeDir: String): Unit = {
    foldLog(spark, s"$storeDir/tf", Seq("doc_id", "tok"), "tf")
    foldLog(spark, s"$storeDir/dl", Seq("doc_id"), "dl")
    // positions fold by plain rewrite — row multiplicity is preserved
    // exactly (no aggregation), only the batch-dir fan-in collapses
    foldLog(spark, s"$storeDir/pos", Nil, "")
  }

  /** The resident driver: a streaming document source (columns doc_id,
    * text) indexed into the log per micro-batch. foreachBatch +
    * batch-keyed overwrite gives exactly-once effect under Structured
    * Streaming's at-least-once replay, as everywhere in the counter-log
    * family.
    */
  def startPostingsMaintenance(docs: DataFrame, storeDir: String,
      checkpointDir: String, ngram: Int = 2,
      withPositions: Boolean = false): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(batch.toDF(), storeDir, batchId, ngram, withPositions)
      }
      .start()

  private def foldLog(spark: SparkSession, dir: String,
      keys: Seq[String], valueCol: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!hasBatches(spark, dir)) return // hasBatches repairs a crashed swap
    val all = spark.read.parquet(dir)
    if (all.isEmpty) return
    val maxId = all.agg(max(col("batch_id").cast("long"))).head().getLong(0)
    // empty keys = a non-counter sub-log (positions): fold is a plain
    // rewrite that preserves row multiplicity exactly
    val folded =
      if (keys.isEmpty) all.drop("batch_id")
      else all.groupBy(keys.map(col): _*)
        .agg(sum(valueCol).cast("long").as(valueCol))
    val next = new org.apache.hadoop.fs.Path(dir + ".next")
    val old = new org.apache.hadoop.fs.Path(dir + ".old")
    if (fs.exists(next)) fs.delete(next, true)
    folded.write.mode("overwrite").parquet(s"$next/batch_id=$maxId")
    // crash-safe swap (advisor r16): the live dir is renamed ASIDE, never
    // deleted before its replacement is in place — a crash anywhere in
    // this sequence leaves the complete log under exactly one of
    // dir / dir.next, and [[repair]] finishes the swap on the next read.
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(p, old), s"compaction swap failed: $p -> $old")
    require(fs.rename(next, p), s"compaction swap failed: $next -> $p")
    fs.delete(old, true)
  }
}
