package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.AggQueries

class AggQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf0001

  test("a1 count star = 6000 at sf0.001") {
    val r = AggQueries.defs("a1_count_star")(spark, sf).collect().head
    assert(r.getAs[Long]("total_records") == 6000L)
  }

  test("a7 histogram bands sum to total (load.py:96,105-112 invariant)") {
    val r = AggQueries.defs("a7_bucket_histogram")(spark, sf).collect().head
    val bands = Seq("very_low", "low", "mid", "high", "very_high", "extreme")
    val total = bands.map(r.getAs[Long]).sum
    assert(total == Tables.events(spark, sf).count())
  }

  test("a5 collect_distinct produces sorted comma-joined nation lists") {
    val rows = AggQueries.defs("a5_collect_distinct")(spark, sf).collect()
    assert(rows.length == 5) // 5 regions
    rows.foreach { r =>
      val ns = r.getAs[String]("nations").split(",")
      assert(ns.sorted.sameElements(ns), "nation list must be sorted")
      assert(ns.distinct.length == ns.length, "nation list must be distinct")
    }
  }

  test("a3 avg qty within physical bounds (1..50 per TPC-H-ish gen)") {
    AggQueries.defs("a3_avg")(spark, sf).collect().foreach { r =>
      val v = r.getAs[Double]("avg_qty")
      assert(v > 1 && v < 51)
    }
  }
}
