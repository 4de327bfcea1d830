package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.AnnIndex

/** Streaming maintenance of the persisted IVF-PQ index — the resident
  * form of [[AnnIndex.appendBatch]]: embedding arrivals stream in, every
  * micro-batch is assigned/encoded/written into its own
  * `postings/batch=K` dir against the FROZEN quantizers
  * ([[AnnIndex.init]] must have run). Probes ([[AnnIndex.probe]]) read
  * the store directly and see each batch as soon as its write commits.
  *
  * Exactly-once: foreachBatch re-delivers a batch after a failure, and
  * the sink's contract is that re-processing must be idempotent — here
  * that is the batchId-keyed postings dir (a replay overwrites exactly
  * itself, never appends a duplicate; AnnIndexSpec proves it). Stream
  * batch ids are offset past the init seed's `batch=0`.
  *
  * State per batch is O(arrivals) rows written and two broadcast-sized
  * reads (centroids + codebook) — nothing grows with the index except
  * the postings themselves, and [[AnnIndex.compactPostings]] folds the
  * accumulated batch dirs when file listing becomes the probe's cost.
  */
object AnnIndexStream {

  def startIndexMaintenance(arrivals: DataFrame, idCol: String,
      vecCol: String, base: String, checkpointDir: String): StreamingQuery =
    arrivals.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty)
          AnnIndex.appendBatch(batch.sparkSession, batch.toDF(), idCol,
            vecCol, base, batchId + 1L)
      }
      .start()
}
