package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.DedupOps

/** Streaming SHARED-SPAN gate — the ingest-time twin of the batch span
  * family ([[DedupOps.sharedSpanPairs]]/x29, [[DedupOps.spanMatches]]/x35):
  * arriving documents are checked for verbatim runs of `minSpan`+ tokens
  * against a known reference corpus BEFORE they land — the substring-level
  * leak/copy check that set-overlap decontamination
  * ([[DecontaminationStream]]) misses when global token overlap stays low
  * (a single copied paragraph inside an otherwise-original document).
  *
  * Each micro-batch runs the EXACT batch kernel against the static
  * reference frame, so gate decisions at ingest equal what the batch pass
  * would have decided — the same code-path parity contract as every other
  * streaming twin here. Clean rows append to `cleanDir`, flagged rows to
  * `flaggedDir` (kept, not dropped — verbatim-copy candidates are audit
  * material), both via batchId-keyed OVERWRITE partitions so foreachBatch
  * replays are idempotent.
  *
  * Scale shape: per batch one inverted window-index equi-join of
  * O(batch windows) against O(reference windows); no streaming state
  * store — the immutable reference index IS the state. Back `reference`
  * with parquet (or stage it) so it is not recomputed per batch;
  * `maxWindowDf` caps reference-side boilerplate fan-out. Checking
  * arrivals against EACH OTHER (intra-stream span dedup) is the
  * watermarked-bucket problem [[NearDupStream]] solves for MinHash and is
  * out of scope here: span runs need positions, which would put document
  * content in state.
  */
object SpanStream {

  /** Gate one micro-batch; public so batch backfills replay history
    * through the identical decision path.
    */
  def applyBatch(batch: DataFrame, batchId: Long, reference: DataFrame,
      textCol: String, idCol: String, windowLen: Int, minSpan: Long,
      maxWindowDf: Option[Long], cleanDir: String,
      flaggedDir: String): Unit =
    if (!batch.isEmpty) {
      val b = batch.persist()
      val flagged = DedupOps.spanMatches(b, reference, textCol, idCol,
          windowLen, maxWindowDf)
        .filter(col("max_span") >= minSpan)
        .select(col("probe_id").as(idCol)).distinct()
        .persist()
      try {
        b.join(flagged, Seq(idCol), "left_anti")
          .write.mode("overwrite").parquet(s"$cleanDir/batch=$batchId")
        b.join(flagged, Seq(idCol), "left_semi")
          .write.mode("overwrite").parquet(s"$flaggedDir/batch=$batchId")
      } finally {
        flagged.unpersist()
        b.unpersist()
      }
    }

  /** Run the gate continuously over a streaming `docs` frame (columns
    * must include `idCol` and `textCol`).
    */
  def startGate(docs: DataFrame, reference: DataFrame, textCol: String,
      idCol: String, windowLen: Int, minSpan: Long,
      cleanDir: String, flaggedDir: String, checkpointDir: String,
      maxWindowDf: Option[Long] = None): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(batch.toDF(), batchId, reference, textCol, idCol,
          windowLen, minSpan, maxWindowDf, cleanDir, flaggedDir)
      }
      .start()
}
