package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One tagged event flowing into a user's group: kind 0 = click (the
  * reference/right side), kind 1 = purchase (the probe/left side).
  */
case class AsOfEvent(user_id: Long, kind: Int, event_id: Long, tus: Long,
  event_ts: java.sql.Timestamp)

/** Per-user state: recent clicks and purchases awaiting finalization,
  * both as (tus, event_id) pairs. Bounded by the watermark horizon —
  * see eviction rule in [[AsOfStream]].
  */
case class AsOfBuffer(clicks: List[(Long, Long)], pending: List[(Long, Long)])

/** A finalized enrichment: the purchase and its as-of click (None when
  * the user had no click at or before the purchase).
  */
case class AsOfEnriched(purchase_id: Long, user_id: Long, click_id: Option[Long])

/** Streaming twin of the native as-of join (graft.plans.AsOfJoin, j10):
  * enrich a purchase stream with each user's latest click at or before
  * the purchase — AT INGEST, event-time correct under out-of-order
  * arrival.
  *
  * The difficulty a batch join doesn't have: the matching click may
  * arrive AFTER the purchase it should enrich. Emitting on arrival would
  * be processing-time as-of (wrong under reordering), so purchases
  * buffer in per-user state and finalize only when the WATERMARK passes
  * STRICTLY beyond their event time — Spark admits rows AT the watermark,
  * so only then can no matchable click still arrive, the match is
  * provably the batch answer, and each purchase emits exactly once
  * (append mode). Ties on click time resolve to the highest click id,
  * matching batch j10's one-row-per-(user, time) pre-aggregation.
  *
  * State is bounded by the horizon, not stream history:
  *  - clicks: everything newer than the watermark PLUS the single newest
  *    click at or before it — that one old click is exactly what any
  *    future purchase (necessarily newer than the watermark) can still
  *    match below the horizon, so eviction never changes an answer;
  *  - purchases: only those the watermark hasn't passed yet.
  * Event-time timeouts drive finalization when a user goes quiet. The
  * steady-state floor is ONE (time, id) pair per user ever seen — the
  * fact any future purchase may still match; a group is removed only
  * when it holds nothing at all. `gcHorizonMs` only paces the idle
  * wake-ups; hard-dropping the last click would change answers, so it is
  * left to callers with looser semantics.
  *
  * 100 TB shape: one shuffle (groupBy user), O(users-in-horizon) state
  * entries of O(events-per-user-in-horizon) size, no document payloads in
  * state.
  */
object AsOfStream {

  /** Both inputs need (event_id, user_id, timestamp) with `timestamp` in
    * epoch seconds (the events-table convention).
    */
  def asofEnrichStream(purchases: DataFrame, clicks: DataFrame,
      watermarkDelay: String = "10 minutes",
      gcHorizonMs: Long = 24L * 3600 * 1000): Dataset[AsOfEnriched] = {
    val spark = purchases.sparkSession
    import spark.implicits._

    def prep(df: DataFrame, kind: Int) = df.select(
      col("user_id").cast("long").as("user_id"),
      lit(kind).as("kind"),
      col("event_id").cast("long").as("event_id"),
      (col("timestamp").cast("long") * 1000000L).as("tus"),
      timestamp_seconds(col("timestamp")).as("event_ts"))

    prep(clicks, 0).unionByName(prep(purchases, 1))
      .withWatermark("event_ts", watermarkDelay)
      .as[AsOfEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfBuffer, AsOfEnriched](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[AsOfEvent], state: GroupState[AsOfBuffer]) =>
          val st = state.getOption.getOrElse(AsOfBuffer(Nil, Nil))
          val incoming = rows.toList
          val clicks0 = st.clicks ++
            incoming.filter(_.kind == 0).map(e => (e.tus, e.event_id))
          val pending0 = st.pending ++
            incoming.filter(_.kind == 1).map(e => (e.tus, e.event_id))
          // watermark in event-time µs; 0 before the first watermark.
          // Finalize STRICTLY below the watermark: Spark only drops late
          // rows strictly older than it, so a click with event time exactly
          // equal to the watermark can still arrive — finalizing a same-
          // instant purchase now would miss it (ADVICE r5).
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val clicks = clicks0.sorted
          val (ripe, still) = pending0.partition(_._1 < wmUs)
          val out = ripe.sorted.map { case (pt, pid) =>
            // latest click at or before pt; ties -> max id (list is
            // sorted by (tus, id), lastOption picks it)
            AsOfEnriched(pid, uid, clicks.filter(_._1 <= pt).lastOption.map(_._2))
          }
          // evict: keep the newest strictly-below-watermark click + all
          // newer (mirrors the strict finalize cut: pending purchases all
          // have time >= watermark, and among clicks strictly below it only
          // the newest can ever be their backward match)
          val cut = clicks.lastIndexWhere(_._1 < wmUs)
          val keptClicks = if (cut > 0) clicks.drop(cut) else clicks
          if (still.isEmpty && keptClicks.isEmpty && incoming.isEmpty) {
            state.remove() // nothing buffered and nothing to remember
          } else {
            state.update(AsOfBuffer(keptClicks, still))
            if (still.nonEmpty)
              // fire as soon as the watermark passes the oldest purchase
              state.setTimeoutTimestamp(still.map(_._1).min / 1000L + 1)
            else
              // periodic wake only; the last-click memory is kept — it is
              // the one fact any future purchase may still need. Callers
              // who accept losing it for hard GC can drop it here instead.
              state.setTimeoutTimestamp(
                math.max(wmUs / 1000L, state.getCurrentWatermarkMs()) + gcHorizonMs)
          }
          out.iterator
      }
  }
}
