package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextOps

/** Streaming CURATION gate — PII scrub + quality floor at ingest, the
  * stateless front door of the curation surface (the decontamination and
  * span gates sit behind it for the stateful checks): every arriving
  * document is PII-redacted ([[TextOps.redactPii]], x41's kernel), scored
  * with the oracle-portable quality rational ([[TextOps.qualityRat]],
  * x9's formula, evaluated on the SCRUBBED text — placeholders are what
  * a training run would actually see), and routed pass/reject against an
  * integer threshold: pass iff `qNum · 10⁴ ≥ minQualityBps · qDen` — a
  * pure cross-multiply, so the gate decision is the same integer
  * arithmetic the batch oracle checks, never a float compare. Blank and
  * NULL documents are unscorable and reject with `quality_bps = -1` —
  * every input row lands in exactly one sink.
  *
  * Rejected rows are KEPT (with their quality bps) — curation discards
  * are exactly what a data team audits for gate bugs.
  *
  * Scale shape: per-row codegen'd regexp + token arithmetic, no join, no
  * state store, nothing scales with history. Idempotent under
  * at-least-once replay via the batchId-keyed OVERWRITE sink, the
  * [[DecontaminationStream]] contract.
  */
object CurationStream {

  /** Gate one micro-batch; public so batch backfills replay history
    * through the identical decision path. Output schema on both sinks:
    * the input columns with `textCol` scrubbed, plus `quality_bps`
    * (floor(q·10⁴), −1 for unscorable docs).
    */
  def applyBatch(batch: DataFrame, batchId: Long, textCol: String,
      minQualityBps: Long, passDir: String, rejectDir: String): Unit = {
    // the -1 unscorable sentinel must sit strictly below every legal
    // floor for the quality_bps routing below to be a total split
    require(minQualityBps >= 0, "quality floor is in non-negative bps")
    if (!batch.isEmpty) {
      val scrubbed = batch.withColumn(textCol,
        TextOps.redactPii(col(textCol)))
      val (qNum, qDen) = TextOps.qualityRat(col(textCol),
        length(col(textCol)))
      // blank OR NULL text is unscorable OUTRIGHT: whitespace-split of ""
      // yields one empty token, so the rational alone would happily score
      // it, and a NULL predicate would silently drop the row from BOTH
      // sinks (Dataset.filter keeps only TRUE)
      val scorable = length(trim(col(textCol))) > 0
      // floor(qNum·10⁴ / qDen) without a float division: (a − a mod b)/b
      // is an exact integer-valued double (the round4Rat device)
      val a = qNum * lit(10000L)
      val scored = scrubbed.withColumn("quality_bps",
        when(scorable && qDen > 0, (a - pmod(a, qDen)) / qDen)
          .otherwise(lit(-1L)).cast("long"))
      // route on the MATERIALIZED score: floor(x) >= m  <=>  x >= m for
      // integer m, so this is the same gate as the raw cross-multiply —
      // never NULL (unscorable is -1), one tokenization per row, and the
      // two filters are an exact partition of the batch
      val pass = col("quality_bps") >= lit(minQualityBps)
      val p = scored.persist()
      try {
        p.filter(pass).write.mode("overwrite")
          .parquet(s"$passDir/batch=$batchId")
        p.filter(!pass).write.mode("overwrite")
          .parquet(s"$rejectDir/batch=$batchId")
      } finally { p.unpersist(); () }
    }
  }

  /** Run the gate continuously over a streaming frame of documents. */
  def startGate(docs: DataFrame, textCol: String, minQualityBps: Long,
      passDir: String, rejectDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(batch.toDF(), batchId, textCol, minQualityBps,
          passDir, rejectDir)
      }
      .start()
}
