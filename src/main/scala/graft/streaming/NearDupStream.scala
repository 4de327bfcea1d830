package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.HashExprs
import graft.operators.TextOps

/** One (band, doc) occurrence flowing into a bucket. `band_idx` is the
  * band this bucket serves (the key is prefixed with it, so one group
  * never mixes bands).
  */
case class BandDoc(band_key: String, band_idx: Int, doc_id: Long,
  sig: Seq[String], event_ts: java.sql.Timestamp)

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
  *
  * Two batch parities that need explicit machinery here:
  *  - EXACTLY-ONCE PER PAIR: a pair matching in k bands reaches k
  *    independent band groups, which cannot see each other's output — a
  *    naive emit would produce k duplicate hits. But each group holds both
  *    docs' FULL signatures, so every matching group computes the same
  *    "first matching band" deterministically; only the group whose
  *    `band_idx` equals it emits. No second stateful operator (Spark's
  *    global-watermark correctness check rejects dedup-after-
  *    flatMapGroupsWithState), no duplicate rows — matching batch x2's
  *    `dropDuplicates`. Corner case: if `maxBucket` eviction removed the
  *    older doc from the first matching band's bucket (but not another's),
  *    the hit is lost rather than emitted by a later band — cap pressure
  *    already loses hits by design; keeping the emission rule static is
  *    what keeps it duplicate-free.
  *  - docs with empty shingle sets (empty/whitespace text) are dropped
  *    before banding: their signatures are all-null, null slots would
  *    compare equal, and their band keys (md5 of empty concat) would
  *    collide — two contentless docs would report est_jaccard 1.0. The
  *    batch path drops them because verified Jaccard is null.
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
      .withColumn("sh", HashExprs.distinctShingles(TextOps.tokens(col("text"))))
      // empty shingle set -> all-null signature; null slots would compare
      // equal and band keys would collide (md5 of empty concat), reporting
      // two contentless docs as perfect near-dups. Batch drops these via
      // null verified jaccard; drop them here before they enter any bucket.
      .filter(size(col("sh")) > 0)
      .withColumn("sig", HashExprs.minhashHexSig(col("sh"), numHashes))
    // band key is md5(band index | slot values): the index prefix keeps a
    // coincidental slot-value match across DIFFERENT bands in separate
    // buckets, so every bucket serves exactly one band_idx
    val bandCols = (0 until numBands).map { b =>
      struct(
        md5(concat_ws("|", lit(b.toString) +: (0 until rowsPerBand).map(r =>
          element_at(col("sig"), b * rowsPerBand + r + 1)): _*)).as("band_key"),
        lit(b).as("band_idx"))
    }
    val exploded = sig
      .select(col("doc_id"), col("sig"), col("event_ts"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("bk.band_key").as("band_key"), col("bk.band_idx").as("band_idx"),
        col("doc_id"), col("sig"), col("event_ts"))
      .as[BandDoc]

    // the FIRST band on which two signatures fully agree — identical for
    // every group comparing this pair, so exactly one group emits it
    def firstMatchingBand(a: Seq[String], b: Seq[String]): Int =
      (0 until numBands).indexWhere { bi =>
        (bi * rowsPerBand until (bi + 1) * rowsPerBand).forall(r => a(r) == b(r))
      }

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
                // emit only from the first band the signatures agree on:
                // the other matching bands' groups compute the same index
                // and stay silent -> one hit per pair, like batch x2
                if (est >= threshold && firstMatchingBand(oldSig, d.sig) == d.band_idx)
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
