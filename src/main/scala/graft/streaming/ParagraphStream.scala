package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.DedupOps

/** Streaming PARAGRAPH dedup gate — the ingest-time consumer of
  * [[graft.operators.DedupOps.paragraphDedup]]'s md5 paragraph key: an
  * arriving document is rewritten IN FLIGHT with every paragraph that
  * was already admitted (in any earlier batch, or by a lower
  * `(doc id, position)` in the same batch) removed, before it lands in
  * the corpus. This is crawl-boilerplate control at ingest: the second
  * and later copies of a cookie banner never enter the corpus at all,
  * instead of waiting for an offline dedup pass.
  *
  * State is a persisted paragraph-HASH store, not text: each batch
  * writes its ADMITTED hashes (one md5 hex a row) under
  * `storeDir/batch_id=<id>/pfx=<p>/`, and a probe reads strictly below
  * its own batch id — the [[MediaDedupStream]] replay discipline, so
  * at-least-once redelivery re-derives exactly the same gate decisions
  * and overwrites its own partitions. The `pfx` subpartitioning (first
  * two hex chars, the [[graft.operators.DeltaManifest.pfxLen]]
  * convention) prunes the store scan to the arrivals' own ≤ 256 prefix
  * buckets at file-listing time, so probe cost tracks the BATCH, not
  * the corpus history.
  *
  * Batch ≡ stream: for waves ordered by ascending doc id, the gate's
  * keep-first decision is identical to one
  * [[graft.operators.DedupOps.paragraphDedup]] over the union — the
  * global minimum `(id, pos)` owner of a hash lives in the earliest
  * wave that contains the hash, which is exactly the wave that admits
  * it (ParagraphStreamSpec pins this; the x80b oracle row gates three
  * waves against x80's batch SQL).
  */
object ParagraphStream {

  /** Gate one micro-batch of documents: rewrite each doc with
    * already-admitted paragraphs removed, append the rewritten docs to
    * `cleanDir/batch=<id>` (`(idCol, n_paras, n_kept, text)` — the
    * batch operator's schema, so censuses line up), and commit the
    * batch's newly-admitted hashes to the store. All writes are
    * OVERWRITE-keyed by batch id: replay is a no-op.
    */
  def applyBatch(docs: DataFrame, batchId: Long, storeDir: String,
      cleanDir: String, textCol: String = "text",
      idCol: String = "doc_id", sep: String = "\n\n",
      maxParas: Int = 1000000): Unit = {
    val spark = docs.sparkSession
    if (docs.isEmpty) return
    val paras = DedupOps.splitParas(docs, textCol, idCol, sep, maxParas)
      .persist()
    try {
      // within-batch collapse first: lowest (id, pos) owns a hash.
      // Group on ph ALONE (pfx derives from it afterwards): the
      // anti-join against the store probes on ph too, so the winners'
      // exchange is reused instead of re-shuffling on a different key.
      val winners = paras.groupBy("ph")
        .agg(min(col("_ord")).as("_owner"))
        .withColumn("pfx", substring(col("ph"), 1, 2))
        .persist()
      // bounded collect: ≤ 256 prefix buckets — the store-scan filter
      val pfxes = winners.select("pfx").distinct().collect()
        .map(_.getString(0))
      val admitted = (readStore(spark, storeDir) match {
        case Some(store) =>
          // widened prefix set: small batches store 1-char buckets
          // (the DeltaManifest.pfxWidth LSM dial)
          val prior = store.filter(col("batch_id") < batchId &&
              col("pfx").isin(
                graft.operators.DeltaManifest.widenPfxs(pfxes.toSeq): _*))
            .select("ph").distinct()
          winners.join(prior, Seq("ph"), "left_anti")
        case None => winners
      }).persist()
      try {
        val flagged = paras.join(admitted.select("ph", "_owner"),
            Seq("ph"), "left")
          .withColumn("_keep",
            coalesce(col("_ord") === col("_owner"), lit(false)))
        DedupOps.reassembleParas(flagged, idCol, sep)
          .write.mode("overwrite").parquet(s"$cleanDir/batch=$batchId")
        // adaptive partitioned write (the DeltaManifest discipline):
        // pfx-clustered so tasks don't fan files into every bucket, and
        // bucket width sized to the batch — a small wave writes 16 dirs
        // instead of paying ~4 s of 256-dir commit overhead
        graft.operators.DeltaManifest.writePartitionedAdaptive(
          admitted.select("pfx", "ph"),
          s"$storeDir/batch_id=$batchId", col("ph"))
      } finally {
        admitted.unpersist()
        winners.unpersist()
        ()
      }
    } finally {
      paras.unpersist()
      ()
    }
  }

  /** The admitted-hash store as a frame (batch_id, pfx partitions
    * included), or None before the first commit.
    */
  def readStore(spark: SparkSession, storeDir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p) && fs.listStatus(p)
        .exists(_.getPath.getName.startsWith("batch_id=")))
      Some(spark.read.parquet(storeDir))
    else None
  }

  /** Run the gate continuously over a streaming document frame. */
  def startGate(docs: DataFrame, storeDir: String, cleanDir: String,
      checkpointDir: String, textCol: String = "text",
      idCol: String = "doc_id", sep: String = "\n\n"): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(batch.toDF(), batchId, storeDir, cleanDir,
          textCol, idCol, sep)
      }
      .start()
}
