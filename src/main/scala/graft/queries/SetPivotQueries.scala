package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2.7 set operations (free built-ins exercised by the harness) and
  * §2.9 pivot / one-hot encoding (features.py:67 get_dummies).
  */
object SetPivotQueries {

  // Known category values at all scale factors (checked against the data;
  // pinned so pivot output columns are stable — pandas get_dummies parity
  // requires deterministic, sorted category order, SURVEY §2.9 E1).
  val eventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  val defs: Map[String, Q] = Map(
    // union distinct of two key sets
    "set_union" -> ((s, d) => {
      val a = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .select(col("c_custkey"))
      val b = Tables.orders(s, d).filter(col("o_totalprice") > 450000)
        .select(col("o_custkey").as("c_custkey"))
      a.union(b).distinct().orderBy("c_custkey")
    }),

    "set_intersect" -> ((s, d) => {
      val a = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey"))
      val b = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("c_custkey"))
      a.intersect(b).orderBy("c_custkey")
    }),

    "set_except" -> ((s, d) => {
      val a = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey"))
      val b = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("c_custkey"))
      a.except(b).orderBy("c_custkey")
    }),

    // E1 pivot: counts per user × event_type, missing combos = 0.
    // Explicit value list ⇒ no extra distinct-collection job, stable schema.
    "e1_pivot_counts" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", eventTypes)
        .count()
        .na.fill(0, eventTypes)
        .orderBy("user_id")
    }),

    // E1 one-hot booleans (get_dummies dtype=bool, features.py:67)
    "e1_onehot" -> ((s, d) => {
      val base = Tables.events(s, d)
      val oh = eventTypes.map(v =>
        (col("event_type") === v).as(s"is_$v"))
      base.select(col("event_id") +: oh: _*).orderBy("event_id")
    }),

    // union ALL (bag semantics; duplicates preserved)
    "set_union_all" -> ((s, d) => {
      val a = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .select(col("c_custkey"))
      val b = Tables.orders(s, d).filter(col("o_totalprice") > 450000)
        .select(col("o_custkey").as("c_custkey"))
      a.union(b).orderBy("c_custkey")
    }),

    // cube: all grouping sets over the two-level hierarchy
    "agg_cube" -> ((s, d) => {
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      val c = Tables.customer(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .cube(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"))
        .select(
          coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("n_cust"))
        .orderBy("region", "nation")
    }),

    // E1-inverse: unpivot/melt — the wide→long reshape (pandas melt; the
    // pivot surface must round-trip both ways). Narrow slice keyed by
    // (orderkey, linenumber, metric); value columns share DoubleType so the
    // melt needs no cast.
    "p11_unpivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") <= 1000)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "val")
        // pin NULL semantics: Spark unpivot keeps NULL value rows, DuckDB
        // UNPIVOT drops them — match DuckDB explicitly (no-op for this
        // fixture, where the measures are non-null)
        .filter(col("val").isNotNull)
        // (orderkey, linenumber) is NOT unique in the synthetic data — val
        // joins the sort key so any residual ties are full-row duplicates
        .orderBy("l_orderkey", "l_linenumber", "metric", "val")
    }),

    // A-extra: arbitrary GROUPING SETS (beyond cube/rollup): per-status,
    // per-priority, and grand-total margins in one pass — one shuffle, the
    // expand operator replicates rows per set map-side.
    "agg_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          Det.sumExact(col("o_totalprice")).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority")
    }),

    // A-extra: rollup (grouping-sets surface, free built-in — SURVEY §2.4
    // note). Subtotals + grand total over a two-level hierarchy.
    "agg_rollup" -> ((s, d) => {
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      val c = Tables.customer(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"))
        .select(
          coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("n_cust"))
        .orderBy("region", "nation")
    }))

  val oracles: Map[String, String] = Map(
    "set_union" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 9000
         UNION
         SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 450000
         ORDER BY c_custkey""",

    "set_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 5000
         INTERSECT
         SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
         ORDER BY c_custkey""",

    "set_except" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 5000
         EXCEPT
         SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
         ORDER BY c_custkey""",

    "set_union_all" ->
      """SELECT c_custkey FROM (
           SELECT c_custkey FROM customer WHERE c_acctbal > 9000
           UNION ALL
           SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 450000)
         ORDER BY c_custkey""",

    "agg_cube" ->
      """SELECT coalesce(r_name, 'ALL') AS region,
                coalesce(n_name, 'ALL') AS nation,
                COUNT(*) AS n_cust
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY CUBE (r_name, n_name)
         ORDER BY region, nation""",

    "e1_pivot_counts" ->
      """SELECT user_id,
                COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
                COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
                COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
                COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
                COUNT(*) FILTER (WHERE event_type = 'view')     AS view
         FROM events GROUP BY user_id ORDER BY user_id""",

    "e1_onehot" ->
      """SELECT event_id,
                event_type = 'click'    AS is_click,
                event_type = 'error'    AS is_error,
                event_type = 'purchase' AS is_purchase,
                event_type = 'signup'   AS is_signup,
                event_type = 'view'     AS is_view
         FROM events ORDER BY event_id""",

    "p11_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, val FROM (
           SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
           FROM lineitem WHERE l_orderkey <= 1000)
         UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice, l_discount))
         ORDER BY l_orderkey, l_linenumber, metric, val""",

    "agg_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
                coalesce(o_orderpriority, 'ALL') AS priority,
                COUNT(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY status, priority""",

    "agg_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region,
                coalesce(n_name, 'ALL') AS nation,
                COUNT(*) AS n_cust
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY region, nation""")
}
