package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.3 join surface. The reference itself performs no relational key
  * joins (only pandas index alignments, J1-J3 — designed out per SURVEY
  * §7.3.3), but the engine ships the full Spark join surface:
  * broadcast/sort-merge, inner/left/semi/anti, equi + range, and an as-of
  * join composed from union + window (the operator Spark lacks natively).
  *
  * Scale notes: dimension sides (region/nation/customer at TPC-H ratios) are
  * broadcast — no shuffle of the fact table; fact-fact joins shuffle on the
  * join key once and AQE handles skew. The as-of avoids the O(n·m)
  * range-join blowup entirely: one shuffle on user_id, one sort, linear scan.
  */
object JoinQueries {
  import Det._

  val defs: Map[String, Q] = Map(
    // inner equi-join, broadcast dim: revenue per market segment
    "j1_inner_broadcast" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sumExact(col("o_totalprice")).as("revenue"))
        .orderBy("c_mktsegment")
    }),

    // 5-table star join: revenue per nation within one region (TPC-H Q5 shape)
    "j2_star_join_5way" -> ((s, d) => {
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("n_name")
        .agg(revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    // supplier-side dimension join (rounds out the fixture surface):
    // per-nation supplier counts + exact-decimal balance stats
    "j7_supplier_stats" -> ((s, d) => {
      val sup = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      sup.join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_suppliers"),
          Det.sumExact(col("s_acctbal")).as("total_bal"),
          max(col("s_acctbal")).as("max_bal"))
        .orderBy("n_name")
    }),

    // TPC-H Q3 shape: filtered star join → grouped exact-decimal revenue →
    // top-10. Plans as joins + partial agg + TakeOrderedAndProject; the
    // sort key is the exact revenue (decimal-derived), so ranking ties are
    // impossible to get wrong across engines, with orderkey as tiebreak.
    "j8_topk_revenue" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1997-06-01").cast("timestamp"))
      val l = Tables.lineitem(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .agg(Det.revenueExact(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // left outer + count of matches (zero-preserving)
    "j3_left_join_count" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    }),

    // left semi (EXISTS): customers with at least one high-value order
    "j4_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // left anti (NOT EXISTS): customers with no top-value order
    "j5_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 490000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // TPC-H Q13 shape (customer order-count distribution): left OUTER join
    // with a predicate on the INNER side inside ON (zero-order customers
    // survive with c_count = 0), then a second aggregation over the first —
    // the one classic double-agg outer-join shape. Scale: join shuffles on
    // custkey once, both aggregations are two-phase; the second groups on
    // a low-cardinality count so its shuffle is trivial.
    "j9_custdist" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey")
          && o("o_orderpriority") =!= "1-URGENT", "left")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // As-of join (operator Spark lacks): for each purchase, the latest click
    // by the same user at-or-before the purchase. Composed as union + running
    // last(ignoreNulls) over (user_id, time) — one shuffle, no range-join
    // explosion; the same plan holds at 100 TB (shuffle on user_id only).
    "j6_asof_join" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .withColumn("click_id",
          when(col("event_type") === "click", col("event_id")))
        .withColumn("last_click", last(col("click_id"), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("last_click").as("click_id"))
        .orderBy("purchase_id")
    }),

    // NATIVE as-of join (graft.plans.AsOfJoin: custom logical node +
    // strategy + merge exec): purchases pick up the latest click at or
    // before them. Same semantics as j6's window composition, but as a
    // genuine two-table join — one shuffle per side on user_id, sorted
    // merge, no candidate blowup. Clicks are pre-aggregated to one row per
    // (user, time) so tie-breaking is deterministic across engines; times
    // compare as integer microseconds on both engines (ns-truncation
    // parity with DuckDB's epoch_us).
    "j10_asof_native" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("tus", unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("tus"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id").as("c_user"), col("tus").as("c_tus"))
        .agg(max("event_id").as("click_id"))
      graft.plans.AsOfJoinOps.asofJoin(purchases, clicks,
          Seq("user_id"), Seq("c_user"), "tus", "c_tus")
        .select("purchase_id", "user_id", "click_id")
        .orderBy("purchase_id")
    }),

    // forward direction of the native as-of: each purchase's NEXT click
    // (attribution lookahead). Same physical shape; only the merge's
    // match rule differs.
    "j10b_asof_forward" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("tus", unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("tus"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id").as("c_user"), col("tus").as("c_tus"))
        .agg(max("event_id").as("click_id"))
      graft.plans.AsOfJoinOps.asofJoin(purchases, clicks,
          Seq("user_id"), Seq("c_user"), "tus", "c_tus",
          direction = "forward")
        .select("purchase_id", "user_id", "click_id")
        .orderBy("purchase_id")
    }))

  val oracles: Map[String, String] = Map(
    "j1_inner_broadcast" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "j2_star_join_5way" ->
      """SELECT n_name,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
                COUNT(*) AS n_items
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name ORDER BY n_name""",

    "j7_supplier_stats" ->
      """SELECT n_name, COUNT(*) AS n_suppliers,
                CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
                max(s_acctbal) AS max_bal
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",

    "j8_topk_revenue" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1997-06-01'
         GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",

    "j9_custdist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
           SELECT c_custkey, COUNT(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
           GROUP BY c_custkey)
         GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",

    "j3_left_join_count" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",

    "j4_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 400000)
         ORDER BY c_custkey""",

    "j5_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 490000)
         ORDER BY c_custkey""",

    // the window form mirrors the Spark plan exactly (same (ts, event_id)
    // tie order); DuckDB's ASOF JOIN agrees except when a click and a
    // purchase share a timestamp, where ASOF's inclusive bound can pick a
    // click the running window hasn't seen yet
    "j6_asof_join" ->
      """SELECT event_id AS purchase_id, user_id, last_click AS click_id
         FROM (
           SELECT event_id, user_id, event_type,
                  last_value(CASE WHEN event_type = 'click' THEN event_id END
                             IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS last_click
           FROM events WHERE event_type IN ('purchase', 'click'))
         WHERE event_type = 'purchase'
         ORDER BY purchase_id""",

    // DuckDB's native ASOF LEFT JOIN, against our native AsOfJoinExec
    "j10_asof_native" ->
      """WITH clicks AS (
           SELECT user_id AS c_user, epoch_us(ts) AS c_tus,
                  MAX(event_id) AS click_id
           FROM events WHERE event_type = 'click' GROUP BY 1, 2
         ), purchases AS (
           SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS tus
           FROM events WHERE event_type = 'purchase'
         )
         SELECT p.purchase_id, p.user_id, c.click_id
         FROM purchases p ASOF LEFT JOIN clicks c
           ON p.user_id = c.c_user AND p.tus >= c.c_tus
         ORDER BY p.purchase_id""",

    // DuckDB expresses the forward direction by flipping the inequality
    "j10b_asof_forward" ->
      """WITH clicks AS (
           SELECT user_id AS c_user, epoch_us(ts) AS c_tus,
                  MAX(event_id) AS click_id
           FROM events WHERE event_type = 'click' GROUP BY 1, 2
         ), purchases AS (
           SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS tus
           FROM events WHERE event_type = 'purchase'
         )
         SELECT p.purchase_id, p.user_id, c.click_id
         FROM purchases p ASOF LEFT JOIN clicks c
           ON p.user_id = c.c_user AND p.tus <= c.c_tus
         ORDER BY p.purchase_id""")
}
