package graft.queries

import graft.{Q, Tables}
import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Breadth queries rounding out the scalar/aggregate surface beyond the
  * reference's own usage (SURVEY §2.4/§2.8 "ship the full surface"):
  * percentiles, correlation, date parts, null-handling, string family,
  * explode/word-frequency.
  */
object MiscQueries {

  val defs: Map[String, Q] = Map(
    // exact interpolated percentiles (median + tail) per group
    "a9_percentiles" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("median_value"),
          round(expr("percentile(value, 0.95)"), 4).as("p95_value"))
        .orderBy("event_type")
    }),

    // Pearson correlation + sample covariance per group
    "a10_corr" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("covar_qty_disc"))
        .orderBy("l_returnflag")
    }),

    // date-part extraction and arithmetic
    "f2_date_parts" -> ((s, d) => {
      val dt = col("o_orderdate").cast("date")
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          // dates cross the oracle as ISO strings: pandas renders DuckDB
          // DATE as datetime64 but parquet date32 as datetime.date, which
          // would hash-mismatch even for equal values
          date_format(date_add(dt, 30), "yyyy-MM-dd").as("plus30"),
          date_format(last_day(dt), "yyyy-MM-dd").as("month_end"),
          datediff(lit("2024-06-01").cast("date"), dt).as("days_to_june"))
        .orderBy("o_orderkey")
    }),

    // null-handling family: coalesce/nullif/greatest/least/case
    "f3_null_funcs" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          coalesce(nullif(col("event_type"), lit("error")), lit("ERR")).as("type_or_err"),
          greatest(col("value"), lit(100.0)).as("at_least_100"),
          least(col("value"), lit(100.0)).as("at_most_100"),
          when(col("value") > 150, "high").when(col("value") > 50, "mid")
            .otherwise("low").as("band"))
        .orderBy("event_id")
    }),

    // wider string family: substring/trim/pad/replace/regexp_replace/split
    "f5_string_more" -> ((s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"),
          substring(col("p_name"), 1, 4).as("prefix4"),
          trim(lit(" pad ")).as("trimmed"),
          lpad(col("p_brand"), 10, "#").as("padded"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
          size(split(col("p_name"), " ")).as("n_words"),
          upper(col("p_type")).as("utype"))
        .orderBy("p_partkey")
    }),

    // regex family: extract-all (scalarized as a joined string — array
    // outputs never cross the oracle), count, and an rlike filter
    "f7_regex_funcs" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_name").rlike("^[a-n]"))
        .select(col("p_partkey"),
          concat_ws(",", regexp_extract_all(col("p_name"), lit("([a-z]+)"), lit(1)))
            .as("alpha_runs"),
          size(regexp_extract_all(col("p_name"), lit("([a-z]+)"), lit(1)))
            .as("n_runs"),
          regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"))
        .orderBy("p_partkey")
    }),

    // time-bucket aggregation (date_trunc) — the batch analogue of the T5
    // tumbling-window stats stream: one shuffle on the month bucket,
    // partial aggregation map-side; bucket crosses the oracle as a string
    "f8_month_buckets" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(date_format(date_trunc("month", col("o_orderdate")),
          "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n_orders"),
          Det.sumExact(col("o_totalprice")).as("month_total"))
        .orderBy("month")
    }),

    // window-over-aggregate: month-over-month delta and share of total —
    // the standard reporting shape (agg once, then lag/sum over the tiny
    // aggregated frame; the window never touches base rows). All outputs
    // derive from exact-decimal sums, so raw doubles cross the oracle
    // without rounding.
    "f9_mom_delta" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // totals stay DECIMAL through the lag and the grand-total window
      // (window-summing doubles would be order-dependent); doubles appear
      // only at the output boundary, where every operand is exact
      val monthly = Tables.orders(s, d)
        .groupBy(date_format(date_trunc("month", col("o_orderdate")),
          "yyyy-MM").as("month"))
        .agg(sum(Det.dec(col("o_totalprice"))).as("total_dec"))
      monthly
        .withColumn("prev_dec", lag(col("total_dec"), 1).over(Window.orderBy("month")))
        .withColumn("grand_dec", sum(col("total_dec")).over(Window.partitionBy()))
        .select(col("month"),
          col("total_dec").cast("double").as("total"),
          (col("total_dec") - col("prev_dec")).cast("double").as("mom_delta"),
          (col("total_dec").cast("double") * 100.0
            / col("grand_dec").cast("double")).as("pct_of_grand"))
        .orderBy("month")
    }),

    // explode + word frequency over the corpus (the classic flatten-agg)
    "x13_word_freq" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("freq"))
        .orderBy("token")
    }))

  val oracles: Map[String, String] = Map(
    "a9_percentiles" ->
      """SELECT event_type,
                round(quantile_cont(value, 0.5), 4) AS median_value,
                round(quantile_cont(value, 0.95), 4) AS p95_value
         FROM events GROUP BY event_type ORDER BY event_type""",

    "a10_corr" ->
      """SELECT l_returnflag,
                round(corr(l_extendedprice, l_quantity), 6) AS corr_qty_price,
                round(covar_samp(l_discount, l_quantity), 6) AS covar_qty_disc
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "f2_date_parts" ->
      """SELECT o_orderkey,
                CAST(year(o_orderdate) AS INT) AS y,
                CAST(month(o_orderdate) AS INT) AS m,
                CAST(day(o_orderdate) AS INT) AS dom,
                strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
                strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
                CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2024-06-01') AS INT) AS days_to_june
         FROM orders ORDER BY o_orderkey""",

    "f3_null_funcs" ->
      """SELECT event_id,
                coalesce(nullif(event_type, 'error'), 'ERR') AS type_or_err,
                greatest(value, 100.0) AS at_least_100,
                least(value, 100.0) AS at_most_100,
                CASE WHEN value > 150 THEN 'high'
                     WHEN value > 50 THEN 'mid'
                     ELSE 'low' END AS band
         FROM events ORDER BY event_id""",

    "f5_string_more" ->
      """SELECT p_partkey,
                substr(p_name, 1, 4) AS prefix4,
                trim(' pad ') AS trimmed,
                lpad(p_brand, 10, '#') AS padded,
                regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
                CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
                upper(p_type) AS utype
         FROM part ORDER BY p_partkey""",

    "f7_regex_funcs" ->
      """SELECT p_partkey,
                array_to_string(regexp_extract_all(p_name, '([a-z]+)', 1), ',')
                  AS alpha_runs,
                CAST(len(regexp_extract_all(p_name, '([a-z]+)', 1)) AS INT)
                  AS n_runs,
                regexp_extract(p_type, '^(\w+)', 1) AS type_head
         FROM part WHERE regexp_matches(p_name, '^[a-n]')
         ORDER BY p_partkey""",

    "f8_month_buckets" ->
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
                COUNT(*) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS month_total
         FROM orders GROUP BY 1 ORDER BY month""",

    "f9_mom_delta" ->
      """WITH monthly AS (
           SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
                  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total_dec
           FROM orders GROUP BY 1)
         SELECT month,
                CAST(total_dec AS DOUBLE) AS total,
                CAST(total_dec - lag(total_dec) OVER (ORDER BY month) AS DOUBLE) AS mom_delta,
                CAST(total_dec AS DOUBLE) * 100.0
                  / CAST(SUM(total_dec) OVER () AS DOUBLE) AS pct_of_grand
         FROM monthly ORDER BY month""",

    "x13_word_freq" ->
      """SELECT token, COUNT(*) AS freq FROM (
           SELECT unnest(string_split(text, ' ')) AS token FROM documents)
         GROUP BY token ORDER BY token""")
}
