package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2.4 aggregation inventory (A1-A8), re-expressed over the
  * TPC-H-ish oracle tables. Reference semantics: /root/reference/load.py:93-113
  * (the per-batch stats document) and scattered response builders.
  *
  * Scale notes: all of these are single-shuffle hash aggregations with
  * map-side partial aggregation; countDistinct plans as two-phase
  * HashAggregate (no driver materialization). At 100 TB the same plans hold —
  * the shuffle carries only the group keys + partial buffers.
  */
object AggQueries {
  import Det._

  val defs: Map[String, Q] = Map(
    // A1: count(*) — load.py:96 total_records
    "a1_count_star" -> ((s, d) => {
      Tables.lineitem(s, d).agg(count(lit(1)).as("total_records"))
    }),

    // A2: count distinct per group — load.py:97 cities_count analogue.
    // Exact distinct (expands to two-phase agg); the approx variant is a8.
    "a2_count_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("distinct_parts"))
        .orderBy("l_returnflag")
    }),

    // A3: avg per group — load.py:98,101 (exact-decimal policy, see Det)
    "a3_avg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(avgExact(col("l_quantity")).as("avg_qty"))
        .orderBy("l_returnflag")
    }),

    // A4: min/max — load.py:99-100
    "a4_min_max" -> ((s, d) => {
      Tables.lineitem(s, d).agg(
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        min(col("l_shipdate")).as("min_shipdate"),
        max(col("l_shipdate")).as("max_shipdate"))
    }),

    // A5: collect distinct list — load.py:78,102 cities list. Output as a
    // sorted comma-joined string (canonical across engines; collect_set
    // order is undefined in both systems — SURVEY §7.3.2).
    "a5_collect_distinct" -> ((s, d) => {
      val nation = Tables.nation(s, d)
      val region = Tables.region(s, d)
      nation.join(broadcast(region),
          nation("n_regionkey") === region("r_regionkey"))
        .groupBy("r_name")
        .agg(concat_ws(",", sort_array(collect_set(col("n_name")))).as("nations"))
        .orderBy("r_name")
    }),

    // A6: value_counts — load.py:103 weather_conditions
    "a6_value_counts" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .orderBy("event_type")
    }),

    // A7: conditional bucket counts (fixed-band histogram) — load.py:105-112
    // temperature_distribution, re-banded over events.value. Single pass,
    // one partial-agg per band (count of a conditional), no extra shuffle.
    "a7_bucket_histogram" -> ((s, d) => {
      val v = col("value")
      def band(c: org.apache.spark.sql.Column) = count(when(c, lit(1)))
      Tables.events(s, d).agg(
        band(v < 40).as("very_low"),
        band(v >= 40 && v < 80).as("low"),
        band(v >= 80 && v < 120).as("mid"),
        band(v >= 120 && v < 160).as("high"),
        band(v >= 160 && v < 200).as("very_high"),
        band(v >= 200).as("extreme"))
    }),

    // A7b: generalized histogram via a range-bucket dimension join
    // (width_bucket-style; also exercises the non-equi/range join J-path,
    // SURVEY §2.3). Six literal bands broadcast against lineitem.
    "a7b_range_bucket_join" -> ((s, d) => {
      import s.implicits._
      val bands = Seq(
        ("b0_under10", 0.0, 10.0), ("b1_10_20", 10.0, 20.0),
        ("b2_20_30", 20.0, 30.0), ("b3_30_40", 30.0, 40.0),
        ("b4_40_50", 40.0, 50.0), ("b5_over50", 50.0, 1e9))
        .toDF("bucket", "lo", "hi")
      Tables.lineitem(s, d)
        .join(broadcast(bands),
          col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
        .groupBy("bucket").agg(count(lit(1)).as("cnt"))
        .orderBy("bucket")
    }),

    // A11b: weighted average (quantity-weighted mean price) — both sums
    // exact-decimal, so the final double division is deterministic
    "a11_weighted_avg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg((sum(dec(col("l_extendedprice")) * dec(col("l_quantity"))).cast("double")
          / sum(dec(col("l_quantity"))).cast("double")).as("wavg_price"))
        .orderBy("l_returnflag")
    }),

    // A8: multi-agg one-row stats document — load.py:93-113 composed:
    // count, distinct, avg, min, max in ONE aggregation pass.
    "a8_stats_doc" -> ((s, d) => {
      Tables.events(s, d).agg(
        count(lit(1)).as("total_records"),
        countDistinct(col("user_id")).as("users_count"),
        countDistinct(col("event_type")).as("event_types"),
        avgExact(col("value")).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
    }))

  val oracles: Map[String, String] = Map(
    "a1_count_star" ->
      "SELECT COUNT(*) AS total_records FROM lineitem",

    "a2_count_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS distinct_parts
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "a3_avg" ->
      """SELECT l_returnflag,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "a4_min_max" ->
      """SELECT min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
                min(l_shipdate) AS min_shipdate, max(l_shipdate) AS max_shipdate
         FROM lineitem""",

    "a5_collect_distinct" ->
      """SELECT r_name,
                array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",

    "a6_value_counts" ->
      """SELECT event_type, COUNT(*) AS cnt FROM events
         GROUP BY event_type ORDER BY event_type""",

    "a7_bucket_histogram" ->
      """SELECT COUNT(*) FILTER (WHERE value < 40) AS very_low,
                COUNT(*) FILTER (WHERE value >= 40 AND value < 80) AS low,
                COUNT(*) FILTER (WHERE value >= 80 AND value < 120) AS mid,
                COUNT(*) FILTER (WHERE value >= 120 AND value < 160) AS high,
                COUNT(*) FILTER (WHERE value >= 160 AND value < 200) AS very_high,
                COUNT(*) FILTER (WHERE value >= 200) AS extreme
         FROM events""",

    "a7b_range_bucket_join" ->
      """SELECT bucket, COUNT(*) AS cnt
         FROM (VALUES ('b0_under10', 0.0, 10.0), ('b1_10_20', 10.0, 20.0),
                      ('b2_20_30', 20.0, 30.0), ('b3_30_40', 30.0, 40.0),
                      ('b4_40_50', 40.0, 50.0), ('b5_over50', 50.0, 1e9)) AS bands(bucket, lo, hi)
         JOIN lineitem ON l_quantity >= lo AND l_quantity < hi
         GROUP BY bucket ORDER BY bucket""",

    "a11_weighted_avg" ->
      """SELECT l_returnflag,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                  / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wavg_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "a8_stats_doc" ->
      """SELECT COUNT(*) AS total_records,
                COUNT(DISTINCT user_id) AS users_count,
                COUNT(DISTINCT event_type) AS event_types,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS avg_value,
                min(value) AS min_value, max(value) AS max_value
         FROM events""")
}
