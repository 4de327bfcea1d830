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

  test("oracle SQL dialect: every declared oracle references known tables") {
    // cheap guard against typos: each oracle references at least one table
    val tables = Tables.names.toSet
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(tables.exists(t => sql.contains(t)), s"$name references no known table")
    }
  }
}
