package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: registered temp views + spark.sql must agree with the
  * DataFrame inventory (same Catalyst plans underneath).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf0001

  test("spark.sql over registered views matches the DataFrame flagship query") {
    Tables.registerAll(spark, sf)
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                COUNT(1) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""").collect()
    val df = SparkEntry.entry(spark)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order").collect()
    assert(sql.map(_.toSeq).toSeq == df.map(_.toSeq).toSeq)
  }

  test("CTE + IN-subquery + correlated EXISTS agree with the semi-join") {
    Tables.registerAll(spark, sf)
    import org.apache.spark.sql.functions._
    val dfCount = Tables.customer(spark, sf).join(
      Tables.orders(spark, sf).filter(col("o_totalprice") > 400000),
      col("c_custkey") === col("o_custkey"), "left_semi").count()
    val inCte = spark.sql(
      """WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
         SELECT count(*) FROM customer WHERE c_custkey IN (SELECT o_custkey FROM big)"""
    ).head().getLong(0)
    val exists = spark.sql(
      """SELECT count(*) FROM customer c WHERE EXISTS (
           SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)"""
    ).head().getLong(0)
    assert(inCte == dfCount && exists == dfCount)
  }

  test("scalar subquery in a predicate plans and computes correctly") {
    Tables.registerAll(spark, sf)
    import org.apache.spark.sql.functions._
    val got = spark.sql(
      """SELECT count(*) FROM orders
         WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)"""
    ).head().getLong(0)
    val o = Tables.orders(spark, sf)
    val mean = o.agg(avg(col("o_totalprice"))).head().getDouble(0)
    assert(got == o.filter(col("o_totalprice") > mean).count())
  }

  test("oracle SQL dialect: every declared oracle references known tables") {
    // cheap guard against typos: each oracle references at least one table
    val tables = Tables.names.toSet
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(tables.exists(t => sql.contains(t)), s"$name references no known table")
    }
  }
}
