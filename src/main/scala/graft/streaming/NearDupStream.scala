package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.HashExprs
import graft.operators.TextOps

/** One (band, doc) occurrence flowing into a bucket. */
case class BandDoc(band_key: String, doc_id: Long, sig: Seq[String],
  event_ts: java.sql.Timestamp)

/** A streaming near-dup hit: `est_jaccard` is the MinHash signature
  * estimate (matching-slot fraction), not the verified shingle Jaccard —
  * the state store never holds document content, only signatures.
  */
case class NearDupHit(doc_a: Long, doc_b: Long, est_jaccard: Double)

/** Streaming MinHash-LSH near-duplicate detection — the streaming twin of
  * [[graft.operators.DedupOps.minhashNearDups]] (x2), for dedup AT INGEST:
  * a new document is checked against the recent corpus before it lands.
  *
  * Shape: stateless signature+banding (the same fused kernels as batch) →
  * explode to one row per (band, doc) → `flatMapGroupsWithState` keyed on
  * the band hash. Each bucket's state is the list of (doc_id, signature)
  * seen within the watermark horizon — O(horizon × rate / bands) per
  * bucket, never document text. Event-time timeout evicts whole buckets
  * once the watermark passes, so total state is bounded by the horizon,
  * not stream history: the property that makes near-dup viable on an
  * unbounded 100 TB/day feed.
  *
  * Two deliberate deviations from batch x2, both forced by unbounded input:
  *  - similarity is the SIGNATURE estimate (E[matching slots / slots] =
  *    true Jaccard); exact shingle verification would require document
  *    text in state. Callers wanting exactness re-verify hits in batch.
  *  - `maxBucket` caps per-bucket members (oldest evicted first) — the
  *    streaming analogue of the batch document-frequency cap: a degenerate
  *    band (boilerplate) costs O(cap) comparisons per arrival, never
  *    O(bucket²) state.
  */
object NearDupStream {

  def nearDupStream(docs: DataFrame, threshold: Double = 0.7,
      numHashes: Int = 12, rowsPerBand: Int = 4,
      watermarkDelay: String = "10 minutes",
      maxBucket: Int = 64): Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    require(numHashes % rowsPerBand == 0)
    val numBands = numHashes / rowsPerBand

    val sig = docs
      .withColumn("event_ts", timestamp_seconds(col("timestamp")))
      .withWatermark("event_ts", watermarkDelay)
      .withColumn("sig", HashExprs.minhashHexSig(
        HashExprs.distinctShingles(TextOps.tokens(col("text"))), numHashes))
    val bandCols = (0 until numBands).map { b =>
      md5(concat_ws("|", (0 until rowsPerBand).map(r =>
        element_at(col("sig"), b * rowsPerBand + r + 1)): _*))
    }
    val exploded = sig
      .select(col("doc_id"), col("sig"), col("event_ts"),
        explode(array(bandCols: _*)).as("band_key"))
      .select(col("band_key"), col("doc_id"), col("sig"), col("event_ts"))
      .as[BandDoc]

    exploded.groupByKey(_.band_key)
      .flatMapGroupsWithState[List[(Long, Seq[String])], NearDupHit](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, rows, state: GroupState[List[(Long, Seq[String])]]) =>
          if (state.hasTimedOut) {
            state.remove() // watermark passed: whole bucket evicted
            Iterator.empty
          } else {
            var members = state.getOption.getOrElse(Nil)
            val hits = Seq.newBuilder[NearDupHit]
            val batch = rows.toSeq
            for (d <- batch.sortBy(_.doc_id) if !members.exists(_._1 == d.doc_id)) {
              for ((oldId, oldSig) <- members) {
                val est = oldSig.zip(d.sig).count(p => p._1 == p._2).toDouble / numHashes
                if (est >= threshold)
                  hits += NearDupHit(math.min(oldId, d.doc_id),
                    math.max(oldId, d.doc_id), est)
              }
              members = ((d.doc_id, d.sig) :: members).take(maxBucket)
            }
            state.update(members)
            // evict one horizon past the bucket's newest EVENT-TIME activity
            // (never the current watermark, which is 0 on the first batch;
            // floor at watermark so the timestamp is always legal)
            val newestMs = batch.map(_.event_ts.getTime).max
            state.setTimeoutTimestamp(
              math.max(newestMs, state.getCurrentWatermarkMs() + 1),
              watermarkDelay)
            hits.result().iterator
          }
      }
  }
}
