package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.DedupOps

/** Streaming DECONTAMINATION gate — the ingest-time twin of batch
  * [[DedupOps.crossContamination]] (x23): arriving training documents are
  * checked against the held-out eval split BEFORE they land in the
  * corpus, so benchmark leakage is stopped at the door instead of
  * scrubbed later.
  *
  * Each micro-batch runs the EXACT batch kernel (inverted shingle index,
  * overlap against the eval doc's shingle count) against the static eval
  * frame — the same code path the oracle checks, so gate decisions at
  * ingest equal what a batch decontamination pass would have decided.
  * Clean rows append to `cleanDir`, flagged rows to `leakedDir` (kept,
  * not dropped — leak candidates are exactly what a data team audits).
  *
  * Scale shape: the eval split is small by nature, so per batch this is
  * one inverted-index equi-join of O(batch shingles) rows against
  * O(eval shingles); no streaming state store at all — the immutable
  * eval index IS the state. Pass an eval frame backed by parquet (or
  * cache it) so it is not recomputed per batch.
  */
object DecontaminationStream {

  /** Gate one micro-batch; public so batch backfills replay history
    * through the identical decision path.
    *
    * Idempotent under foreachBatch's at-least-once replay: each batch
    * writes to a `batch=<id>` partition subdir in OVERWRITE mode, so a
    * replayed batch replaces its own previous (possibly partial) output
    * instead of appending duplicate training rows. Readers see the whole
    * sink as one partitioned dataset (`spark.read.parquet(cleanDir)`).
    * The leak-id set (small by construction) is persisted so the
    * inverted-index join runs once per batch, not once per sink.
    */
  def applyBatch(batch: DataFrame, batchId: Long, evalDocs: DataFrame,
      textCol: String, idCol: String, minOverlap: Double,
      cleanDir: String, leakedDir: String): Unit =
    if (!batch.isEmpty) {
      val b = batch.persist()
      val leaked = DedupOps.crossContamination(b, evalDocs,
          textCol, idCol, minOverlap)
        .select(col("train_id").as(idCol)).distinct()
        .persist()
      try {
        b.join(leaked, Seq(idCol), "left_anti")
          .write.mode("overwrite").parquet(s"$cleanDir/batch=$batchId")
        b.join(leaked, Seq(idCol), "left_semi")
          .write.mode("overwrite").parquet(s"$leakedDir/batch=$batchId")
      } finally {
        leaked.unpersist()
        b.unpersist()
      }
    }

  /** Run the gate continuously over a streaming `train` frame (columns
    * must include `idCol` and `textCol`).
    */
  def startGate(train: DataFrame, evalDocs: DataFrame, textCol: String,
      idCol: String, minOverlap: Double, cleanDir: String,
      leakedDir: String, checkpointDir: String): StreamingQuery =
    train.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(batch.toDF(), batchId, evalDocs, textCol, idCol,
          minOverlap, cleanDir, leakedDir)
      }
      .start()
}
