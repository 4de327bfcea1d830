package graft.queries

import graft.{Q, Tables}

/** SQL-subquery surface, oracle-gated: CTE, uncorrelated IN, correlated
  * EXISTS, and a scalar subquery in a predicate. Previously exercised only
  * in SqlSurfaceSpec; these rows put the same shapes through the DuckDB
  * hash-compare. The Spark side IS `spark.sql` over registered views —
  * Catalyst rewrites IN/EXISTS into semi joins and the scalar subquery into
  * a broadcast one-row join, so the physical plans are the scale-safe ones
  * the DataFrame inventory already proves (j4/j5 shapes).
  *
  * Determinism: only exact values cross the comparison — counts, keys, and
  * a max-derived scalar threshold (max is order-independent; 0.5 * max is
  * exact binary scaling) — so no decimal massaging is needed here.
  */
object SubqueryQueries {

  private def sql(text: String): Q = (s, d) => {
    Tables.registerAll(s, d)
    s.sql(text)
  }

  // CTE feeding a join + second aggregation; SUM of a COUNT stays BIGINT on
  // both engines via the explicit CAST (DuckDB would widen to HUGEINT)
  private val cteAgg =
    """WITH big AS (
         SELECT o_custkey, COUNT(*) AS n
         FROM orders WHERE o_totalprice > 300000
         GROUP BY o_custkey)
       SELECT c_mktsegment, COUNT(*) AS n_cust,
              CAST(SUM(n) AS BIGINT) AS n_big_orders
       FROM customer JOIN big ON c_custkey = o_custkey
       GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  // uncorrelated IN over a second dimension table
  private val inSub =
    """SELECT c_custkey, c_name FROM customer
       WHERE c_nationkey IN (
         SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000)
       ORDER BY c_custkey"""

  // correlated EXISTS (the SQL-text twin of j4's left_semi DataFrame form)
  private val existsSub =
    """SELECT c_custkey, c_mktsegment FROM customer c
       WHERE EXISTS (
         SELECT 1 FROM orders o
         WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
       ORDER BY c_custkey"""

  // scalar subquery in a predicate: threshold = half the max order price
  // (max is exact; *0.5 is exact IEEE scaling — no float-sum divergence)
  private val scalarSub =
    """SELECT o_orderpriority, COUNT(*) AS n_above
       FROM orders
       WHERE o_totalprice > 0.5 * (SELECT max(o_totalprice) FROM orders)
       GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // TPC-H Q17 shape: correlated scalar AGGREGATE subquery — for each part,
  // lineitems below half that part's average quantity. Catalyst rewrites the
  // correlated agg into a per-key aggregate + join (no per-row re-scan); the
  // same rewrite DuckDB applies. Determinism: the threshold is an exact
  // decimal sum divided once (one rounding, same on both engines), and the
  // revenue sum crosses engines as a decimal.
  private val corrScalarAgg =
    """SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_small,
              round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                    / 7.0, 2) AS avg_yearly
       FROM lineitem JOIN part ON p_partkey = l_partkey
       WHERE l_quantity < (
         SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       / COUNT(*))
         FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
       GROUP BY p_brand ORDER BY p_brand"""

  val defs: Map[String, Q] = Map(
    "sq1_cte_agg"          -> sql(cteAgg),
    "sq2_in_subquery"      -> sql(inSub),
    "sq3_exists_corr"      -> sql(existsSub),
    "sq4_scalar_sub"       -> sql(scalarSub),
    "sq5_corr_scalar_agg"  -> sql(corrScalarAgg))

  // the SQL is dialect-portable as written — the oracle runs the same text
  val oracles: Map[String, String] = Map(
    "sq1_cte_agg"         -> cteAgg,
    "sq2_in_subquery"     -> inSub,
    "sq3_exists_corr"     -> existsSub,
    "sq4_scalar_sub"      -> scalarSub,
    "sq5_corr_scalar_agg" -> corrScalarAgg)
}
