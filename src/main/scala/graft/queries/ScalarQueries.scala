package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.8 scalar functions (F1-F9), §2.2 projection/coercion (P1-P10)
  * and §2.7 set operations. All per-row codegen'd expressions — no UDFs
  * anywhere (the 100 TB hot path stays inside WholeStageCodegen).
  */
object ScalarQueries {

  val defs: Map[String, Q] = Map(
    // F1/F3 timestamp formatting (load.py:11,32,65 batch-id; main.py:102 ISO)
    "f1_date_format" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyyMMdd_HHmmss").as("batch_id"),
          date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss").as("iso_ts"))
        .orderBy("o_orderkey")
    }),

    // F4/F5 string ops: lower, concat_ws, prefix filter (demo_pipeline.py:32,96)
    "f4_string_funcs" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_name").startsWith("s"))
        .select(col("p_partkey"),
          lower(col("p_name")).as("lname"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          length(col("p_name")).as("name_len"))
        .orderBy("p_partkey")
    }),

    // F6/F7/F8 math: sqrt, round, abs (training.py:56; demo_pipeline.py:27-33)
    "f6_math_funcs" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(sqrt(col("l_extendedprice")), 2).as("sqrt_price"),
          round(abs(col("l_discount") - 0.05), 2).as("abs_disc_delta"),
          round(col("l_quantity") * 2.5, 2).as("scaled_qty"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // P1/P2 nested-JSON flatten (transform.py:8-19): from_json struct field
    // extraction. Oracle uses DuckDB's JSON path extraction — same values.
    "p1_json_flatten" -> ((s, d) => {
      val schema = StructType(Seq(StructField("k", IntegerType)))
      Tables.events(s, d)
        .select(col("event_id"),
          from_json(col("props"), schema).getField("k").as("k"))
        .orderBy("event_id")
    }),

    // P1 aggregated: flattened JSON field feeding a group-by
    "p1b_json_agg" -> ((s, d) => {
      val schema = StructType(Seq(StructField("k", IntegerType)))
      Tables.events(s, d)
        .withColumn("k", from_json(col("props"), schema).getField("k"))
        .groupBy("event_type")
        .agg(sum(col("k").cast(LongType)).as("sum_k"),
          count(col("k")).as("n"))
        .orderBy("event_type")
    }),

    // P2 array-element projection (transform.py:15: item["weather"][0])
    "p2_array_element" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          element_at(col("embedding"), 1).as("first_dim"),
          size(col("embedding")).as("dim"))
        .orderBy("vec_id")
    }),

    // P10 type coercion with invalid→NULL (pd.to_numeric errors='coerce',
    // training.py:154-156). ANSI-safe try_cast on both engines.
    "p10_coerce" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          col("event_type").try_cast(DoubleType).as("coerced_bad"),
          regexp_extract(col("props"), "([0-9]+)", 1).try_cast(LongType)
            .as("extracted_k"))
        .orderBy("event_id")
    }),

    // P5 literal/derived metadata columns (load.py:31-32, main.py:138) with a
    // deterministic "clock" (max order date) instead of wall-clock now().
    "p5_derived_columns" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("pred_type", lit("regression"))
        .withColumn("is_current", col("o_orderstatus") === "O")
        .withColumn("priority_class",
          substring(col("o_orderpriority"), 1, 1).cast(IntegerType))
        .select("o_orderkey", "pred_type", "is_current", "priority_class")
        .orderBy("o_orderkey")
    }),

    // P6/P7 range predicates + null-mask filter (load.py:105-112;
    // features.py:70-77): band filter then drop rows with any null lag
    "p6_range_filter" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 10 && col("l_quantity") < 20
          && col("l_discount") > 0.02)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")
    }))

  val oracles: Map[String, String] = Map(
    "f1_date_format" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y%m%d_%H%M%S') AS batch_id,
                strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS iso_ts
         FROM orders ORDER BY o_orderkey""",

    "f4_string_funcs" ->
      """SELECT p_partkey, lower(p_name) AS lname,
                concat_ws('-', p_brand, p_type) AS brand_type,
                CAST(length(p_name) AS INT) AS name_len
         FROM part WHERE starts_with(p_name, 's') ORDER BY p_partkey""",

    "f6_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
                round(sqrt(l_extendedprice), 2) AS sqrt_price,
                round(abs(l_discount - 0.05), 2) AS abs_disc_delta,
                round(l_quantity * 2.5, 2) AS scaled_qty
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "p1_json_flatten" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
         FROM events ORDER BY event_id""",

    "p1b_json_agg" ->
      """SELECT event_type,
                CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                COUNT(json_extract_string(props, '$.k')) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",

    "p2_array_element" ->
      """SELECT vec_id, embedding[1] AS first_dim,
                CAST(len(embedding) AS INT) AS dim
         FROM embeddings ORDER BY vec_id""",

    "p10_coerce" ->
      """SELECT event_id, TRY_CAST(event_type AS DOUBLE) AS coerced_bad,
                TRY_CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) AS extracted_k
         FROM events ORDER BY event_id""",

    "p5_derived_columns" ->
      """SELECT o_orderkey, 'regression' AS pred_type,
                o_orderstatus = 'O' AS is_current,
                CAST(substr(o_orderpriority, 1, 1) AS INT) AS priority_class
         FROM orders ORDER BY o_orderkey""",

    "p6_range_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_quantity >= 10 AND l_quantity < 20 AND l_discount > 0.02
         ORDER BY l_orderkey, l_linenumber""")
}
