package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** SURVEY §2.5 window-function inventory (W1-W6), §2.6 sorts/top-k (O1-O5)
  * and the M1 time-ordered split, over `events` (per-user time series — the
  * analogue of the reference's per-city series, ml/features.py:27-50).
  *
  * pandas-parity traps encoded here (SURVEY §2.5 notes):
  *  - rolling(w) ⇒ min_periods = w ⇒ guard with count(...) >= w;
  *  - .std() is ddof=1 ⇒ stddev_samp;
  *  - dayofweek 0=Monday ⇒ Spark `weekday`, DuckDB `isodow - 1`;
  *  - shift(±k) never crosses group boundaries ⇒ lag/lead over partitionBy.
  *
  * Scale: one hash shuffle on user_id per window stage; all window exprs over
  * the same spec fuse into a single WindowExec. The global-order ops (o2, m1)
  * note their 100 TB strategy inline.
  */
object WindowQueries {

  // per-user, time-ordered — event_id is the unique monotone tiebreak
  private val W = Window.partitionBy("user_id").orderBy("event_id")

  val defs: Map[String, Q] = Map(
    // W1 lag k∈{1,3} + W2 lead 1 (features.py:35-39,50)
    "w1_lag_lead" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
          lag(col("value"), 1).over(W).as("lag1"),
          lag(col("value"), 3).over(W).as("lag3"),
          lead(col("value"), 1).over(W).as("next_value"))
        .orderBy("event_id")
    }),

    // W3/W4 rolling mean/std, window 3, pandas min_periods=w semantics
    // (features.py:44-46): partial windows yield NULL, not partial stats.
    "w3_rolling_mean_std" -> ((s, d) => {
      val frame = W.rowsBetween(-2, 0)
      val full = count(col("value")).over(frame) >= 3
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          when(full, round(avg(col("value")).over(frame), 4)).as("roll_mean"),
          when(full, round(stddev_samp(col("value")).over(frame), 4)).as("roll_std"))
        .orderBy("event_id")
    }),

    // W5 temporal extraction (features.py:30-31): hour + 0=Monday weekday
    "w5_hour_weekday" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          hour(col("ts")).as("h"),
          weekday(col("ts")).as("dow"))
        .orderBy("event_id")
    }),

    // W6 epoch↔timestamp (features.py:9-13): ts → epoch seconds → ts again,
    // formatted (proves the round trip; F1's "yyyyMMdd_HHmmss" batch-id fmt)
    "w6_epoch_roundtrip" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          unix_timestamp(col("ts")).as("epoch_s"),
          date_format(timestamp_seconds(unix_timestamp(col("ts"))),
            "yyyyMMdd_HHmmss").as("batch_id"))
        .orderBy("event_id")
    }),

    // O2 top-k by time (main.py:130: sort_values('timestamp').tail(limit)).
    // Plans as TakeOrderedAndProject — no full sort at any scale.
    "o2_topk_by_time" -> ((s, d) => {
      Tables.events(s, d)
        .orderBy(col("ts").desc, col("event_id").desc)
        .limit(100)
        .select(col("event_id"), col("event_type"), col("value"))
        .orderBy("event_id")
    }),

    // S5/T4 latest-per-key snapshot (load.py:51-62 current_weather) via the
    // idiomatic row_number()=1; deterministic tiebreak on event_id.
    "o3_latest_per_key" -> ((s, d) => {
      val byRecency = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(byRecency))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("latest_event"),
          col("event_type"), col("value"))
        .orderBy("user_id")
    }),

    // O5 argmax-of-metric per group (registry.py:23-28 best-run selection).
    // row_number idiom on both engines (DuckDB arg_max lacks tiebreaks).
    "o5_argmax_per_group" -> ((s, d) => {
      val byValue = Window.partitionBy("event_type")
        .orderBy(col("value").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(byValue))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("event_id").as("best_event"),
          col("value").as("best_value"))
        .orderBy("event_type")
    }),

    // the SCALE form of o5: event_type is LOW-cardinality, so the o5
    // window puts each type's entire posting on one task (the x26/x31
    // hazard class). max(struct(value, event_id)) is a true AGGREGATE —
    // map-side partial per input partition, a hot group costs one struct
    // per task — and struct ordering (value, then event_id, both desc
    // via max) reproduces the window's exact tiebreak.
    "o5b_argmax_agg" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(max(struct(col("value"), col("event_id"))).as("m"))
        .select(col("event_type"), col("m.event_id").as("best_event"),
          col("m.value").as("best_value"))
        .orderBy("event_type")
    }),

    // W7 running (cumulative) aggregate — exact decimal accumulation so the
    // prefix sums match DuckDB's segment-tree evaluation bit-for-bit
    "w7_running_sum" -> ((s, d) => {
      val frame = W.rowsBetween(Window.unboundedPreceding, 0)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .over(frame).cast("double").as("running_value"),
          count(lit(1)).over(frame).as("running_n"))
        .orderBy("event_id")
    }),

    // W8 ranking family (not in the reference; part of the full window
    // surface): rank/dense_rank with real ties (event_type ordering) and
    // ntile over the unique order
    "w8_ranks" -> ((s, d) => {
      val byType = Window.partitionBy("user_id").orderBy("event_type")
      Tables.events(s, d)
        .select(col("event_id"),
          rank().over(byType).as("rnk"),
          dense_rank().over(byType).as("drnk"),
          ntile(4).over(W).as("quartile"))
        .orderBy("event_id")
    }),

    // W8b distribution ranks (percent_rank / cume_dist) over the unique
    // per-user order — single divisions of identical integers on both
    // engines, so the doubles match bit-for-bit without rounding.
    "w9_dist_ranks" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          percent_rank().over(W).as("pr"),
          cume_dist().over(W).as("cd"))
        .orderBy("event_id")
    }),

    // O6 sessionization (gaps-and-islands): a new session starts when the
    // per-user gap exceeds 8 hours; session_id is the running count of
    // boundaries. Timestamps cross the oracle as epoch SECONDS (ns parquet:
    // Spark truncates to µs, DuckDB keeps ns — see Tables.events) and the
    // window orders on (epoch_s, event_id) so both engines see the same
    // sequence even for same-second ties. Scale: one shuffle on user_id;
    // state is O(1) per row — the streaming twin is session_window.
    "o6_sessionize" -> ((s, d) => {
      val gapS = 28800L
      val byTime = Window.partitionBy("user_id").orderBy("epoch_s", "event_id")
      // floor division (a - pmod)/b, not `div`: div truncates toward zero
      // and would diverge from DuckDB's `//` on pre-1970 timestamps
      Tables.events(s, d)
        .withColumn("epoch_s",
          expr("CAST((unix_micros(ts) - pmod(unix_micros(ts), 1000000)) / 1000000 AS BIGINT)"))
        .withColumn("new_sess",
          when(col("epoch_s") - lag(col("epoch_s"), 1).over(byTime) > gapS, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_sess"))
          .over(byTime.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("epoch_s")).as("start_s"),
          max(col("epoch_s")).as("end_s"))
        .orderBy("user_id", "session_id")
    }),

    // W8c frame-edge family: first/last/nth value over a running frame —
    // rounds out the window surface (first_value = per-user baseline,
    // last_value over the running frame = current, nth = second reading)
    "w10_first_last" -> ((s, d) => {
      val frame = W.rowsBetween(Window.unboundedPreceding, 0)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          first(col("value")).over(frame).as("first_val"),
          last(col("value")).over(frame).as("running_last"),
          nth_value(col("value"), 2).over(frame).as("second_val"))
        .orderBy("event_id")
    }),

    // M1 TimeSeriesSplit(n_splits=5) chunking (training.py:25-26): 6 equal
    // time-ordered chunks; fold i trains on chunks 0..i, validates on i+1.
    // Scale-safe exact plan (no global single-partition window): coarse
    // range-block boundaries come from approxQuantile (plan-time literals),
    // the exact global rank is then per-block offset + within-block
    // row_number — every window partitions on the block key, so the sort
    // parallelism is ~defaultParallelism at any corpus size. The two
    // plan-construction actions (quantile probe + per-block counts) touch
    // one long column and return O(#blocks) metadata — the price every
    // boundary-based global-order operator pays, vs. funneling all rows
    // through ONE task in the naive Window.orderBy form (equivalence with
    // that form is asserted in ScaleSpec; absence of any empty-partition
    // window in PlanSpec).
    "m1_ts_split_chunks" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val nBlocks = s.sparkContext.defaultParallelism
      val probs = (1 until nBlocks).map(_.toDouble / nBlocks).toArray
      val bounds = ev.stat.approxQuantile("event_id", probs, 0.001)
        .map(_.toLong).distinct.sorted
      // block = #bounds strictly below event_id — a pure function of the
      // row and literal bounds, so both passes below agree bit-for-bit
      val blockOf = bounds.foldLeft(lit(0)) { (acc, b) =>
        acc + when(col("event_id") > b, 1).otherwise(0) }
      val withBlock = ev.select(col("event_id"), blockOf.as("blk"))
      val cnts = withBlock.groupBy("blk").agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val n = cnts.map(_._2).sum
      val offsets: Map[Int, Long] =
        cnts.map(_._1).zip(cnts.scanLeft(0L)(_ + _._2)).toMap
      val wBlk = Window.partitionBy("blk").orderBy("event_id")
      withBlock
        .withColumn("rn", row_number().over(wBlk).cast("long")
          + element_at(typedLit(offsets), col("blk")))
        .select(col("event_id"),
          expr(s"((rn - 1) * 6) div ${n}L").cast(IntegerType).as("chunk"))
        .orderBy("event_id")
    }))

  val oracles: Map[String, String] = Map(
    "w1_lag_lead" ->
      """SELECT event_id, user_id, value,
                lag(value, 1)  OVER (PARTITION BY user_id ORDER BY event_id) AS lag1,
                lag(value, 3)  OVER (PARTITION BY user_id ORDER BY event_id) AS lag3,
                lead(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS next_value
         FROM events ORDER BY event_id""",

    "w3_rolling_mean_std" ->
      """SELECT event_id, user_id,
                CASE WHEN cnt >= 3 THEN round(m, 4) END AS roll_mean,
                CASE WHEN cnt >= 3 THEN round(sd, 4) END AS roll_std
         FROM (
           SELECT event_id, user_id,
                  count(value) OVER w AS cnt,
                  avg(value) OVER w AS m,
                  stddev_samp(value) OVER w AS sd
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
         ORDER BY event_id""",

    "w5_hour_weekday" ->
      """SELECT event_id, CAST(hour(ts) AS INT) AS h,
                CAST(isodow(ts) - 1 AS INT) AS dow
         FROM events ORDER BY event_id""",

    "w6_epoch_roundtrip" ->
      """SELECT event_id, epoch_ms(ts) // 1000 AS epoch_s,
                strftime(to_timestamp(epoch_ms(ts) // 1000), '%Y%m%d_%H%M%S') AS batch_id
         FROM events ORDER BY event_id""",

    "o2_topk_by_time" ->
      """SELECT event_id, event_type, value
         FROM (SELECT * FROM events ORDER BY ts DESC, event_id DESC LIMIT 100)
         ORDER BY event_id""",

    "o3_latest_per_key" ->
      """SELECT user_id, event_id AS latest_event, event_type, value
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn FROM events)
         WHERE rn = 1 ORDER BY user_id""",

    "o5_argmax_per_group" ->
      """SELECT event_type, event_id AS best_event, value AS best_value
         FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                 ORDER BY value DESC, event_id DESC) AS rn FROM events)
         WHERE rn = 1 ORDER BY event_type""",

    // deliberately the same rank SQL as o5: the aggregate form must
    // reproduce the window form's result exactly
    "o5b_argmax_agg" ->
      """SELECT event_type, event_id AS best_event, value AS best_value
         FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                 ORDER BY value DESC, event_id DESC) AS rn FROM events)
         WHERE rn = 1 ORDER BY event_type""",

    "w7_running_sum" ->
      """SELECT event_id, user_id,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_value,
                COUNT(*) OVER w AS running_n
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    "w8_ranks" ->
      """SELECT event_id,
                CAST(rank() OVER (PARTITION BY user_id ORDER BY event_type) AS INT) AS rnk,
                CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) AS INT) AS drnk,
                CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY event_id) AS INT) AS quartile
         FROM events ORDER BY event_id""",

    "w9_dist_ranks" ->
      """SELECT event_id,
                percent_rank() OVER (PARTITION BY user_id ORDER BY event_id) AS pr,
                cume_dist()    OVER (PARTITION BY user_id ORDER BY event_id) AS cd
         FROM events ORDER BY event_id""",

    // CAST the running SUM: DuckDB widens SUM(BIGINT) to HUGEINT, which
    // pandas renders float64 and the driver's stringified hash rejects
    "o6_sessionize" ->
      """WITH ev AS (
           SELECT user_id, event_id, epoch_ms(ts) // 1000 AS epoch_s FROM events),
         flagged AS (
           SELECT user_id, event_id, epoch_s,
                  CASE WHEN epoch_s - lag(epoch_s) OVER
                         (PARTITION BY user_id ORDER BY epoch_s, event_id) > 28800
                       THEN 1 ELSE 0 END AS new_sess
           FROM ev),
         sess AS (
           SELECT user_id, epoch_s,
                  CAST(SUM(new_sess) OVER (PARTITION BY user_id
                    ORDER BY epoch_s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                    AS session_id
           FROM flagged)
         SELECT user_id, session_id, COUNT(*) AS n_events,
                min(epoch_s) AS start_s, max(epoch_s) AS end_s
         FROM sess GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",

    "w10_first_last" ->
      """SELECT event_id, user_id,
                first_value(value) OVER w AS first_val,
                last_value(value)  OVER w AS running_last,
                nth_value(value, 2) OVER w AS second_val
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    "m1_ts_split_chunks" ->
      """SELECT event_id,
                CAST(((rn - 1) * 6) // (SELECT count(*) FROM events) AS INT) AS chunk
         FROM (SELECT event_id, row_number() OVER (ORDER BY event_id) AS rn
               FROM events)
         ORDER BY event_id""")
}
