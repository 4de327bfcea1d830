package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LayoutOps

/** Z-order layout: bit-interleave parity against a driver-side reference,
  * bucket bounds, and the actual pruning claim — a predicate on the SECOND
  * layout dimension touches far fewer files under a Z-ordered write than
  * under a first-dimension linear sort (measured from real per-file min/max
  * ranges, the same stats parquet row-group skipping uses).
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf0001

  test("zorderKey matches the driver-side reference interleave") {
    import spark.implicits._
    val pairs = Seq((0, 0), (255, 255), (1, 0), (0, 1), (3, 5), (170, 85),
      (255, 0), (0, 255), (128, 64), (37, 201)) ++
      (0 until 50).map(i => ((i * 37) % 256, (i * 101) % 256))
    val df = pairs.toDF("a", "b")
      .withColumn("zk", LayoutOps.zorderKey(col("a"), col("b")))
    val got = df.select("a", "b", "zk").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    got.foreach { case (a, b, zk) =>
      assert(zk === LayoutOps.zorderKeyRef(a, b), s"($a,$b)")
    }
  }

  test("withZKey buckets stay inside [0, buckets) at the domain edges") {
    val l = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey")
    val z = LayoutOps.withZKey(l, "l_partkey", "l_suppkey", buckets = 256,
      keepBuckets = true)
    val r = z.agg(min("zb_a"), max("zb_a"), min("zb_b"), max("zb_b"),
      min("zkey"), max("zkey")).head()
    assert(r.getLong(0) >= 0 && r.getLong(1) <= 255)
    assert(r.getLong(2) >= 0 && r.getLong(3) <= 255)
    assert(r.getLong(4) >= 0 && r.getLong(5) <= 65535)
    // min maps to cell 0; max maps to floor(span·buckets/(span+1)) — 255
    // only when the domain spans ≥255 values (suppkey spans 10 at sf0.001)
    val b = Tables.lineitem(spark, sf)
      .agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey")).head()
    val spanA = b.getLong(1) - b.getLong(0)
    val spanB = b.getLong(3) - b.getLong(2)
    assert(r.getLong(0) === 0 && r.getLong(1) === spanA * 256 / (spanA + 1))
    assert(r.getLong(2) === 0 && r.getLong(3) === spanB * 256 / (spanB + 1))
  }

  test("second-dimension predicate prunes files under Z-order, not under linear sort") {
    val l = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey")
    val dir = Files.createTempDirectory("graft-layout").toString
    val zPath = s"$dir/zorder"
    val linPath = s"$dir/linear"
    LayoutOps.writeZOrdered(l, "l_partkey", "l_suppkey", zPath, numFiles = 16)
    l.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(linPath)

    // per-file [min,max] of the SECOND dimension — what row-group /
    // file-skipping would consult for a suppkey predicate
    def fileRanges(path: String): Array[(Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name()).agg(
          min("l_suppkey").as("mn"), max("l_suppkey").as("mx"))
        .select("mn", "mx").collect().map(r => (r.getLong(0), r.getLong(1)))

    val bounds = l.agg(min("l_suppkey"), max("l_suppkey")).head()
    val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
    // a narrow window: the first eighth of the suppkey domain
    val hi = mn + (mx - mn) / 8
    def touched(rs: Array[(Long, Long)]): Int =
      rs.count { case (a, b) => a <= hi && b >= mn }

    val zTouched = touched(fileRanges(zPath))
    val linTouched = touched(fileRanges(linPath))
    assert(fileRanges(zPath).length === 16)
    // linear-by-partkey files all span ~the full suppkey range; Z-order
    // files carry tight boxes, so most skip the window outright
    assert(zTouched * 2 <= linTouched,
      s"zorder touched $zTouched of 16, linear $linTouched of 16")
  }

  test("second-dimension predicate row-group-prunes the SCAN under Z-order: observed metric") {
    // the r10 stretch ask: the pruning claim as an OBSERVED scan win —
    // run the same pushed-down predicate against both layouts and read
    // numOutputRows off the executed FileSourceScan node. The parquet
    // reader drops whole row groups whose min/max exclude the predicate,
    // so the scan's own output-row count (rows surviving row-group
    // pruning, BEFORE the row-level Filter above it) is the metric that
    // proves files' stats actually skipped data, not just that the
    // geometry looked tight.
    val l = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey")
    val dir = Files.createTempDirectory("graft-layout-scan").toString
    val zPath = s"$dir/zorder"
    val linPath = s"$dir/linear"
    LayoutOps.writeZOrdered(l, "l_partkey", "l_suppkey", zPath, numFiles = 16)
    l.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(linPath)

    val bounds = l.agg(min("l_suppkey"), max("l_suppkey")).head()
    val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
    val hi = mn + (mx - mn) / 8

    def scanOutputRows(path: String): Long = {
      val df = spark.read.parquet(path).filter(col("l_suppkey") <= hi)
      df.collect()
      val executed = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val scans = executed.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty, s"no FileSourceScan in:\n$executed")
      // sanity: the predicate actually reached the scan
      assert(scans.exists(_.metadata.get("PushedFilters")
          .exists(_.contains("LessThanOrEqual"))),
        "suppkey predicate was not pushed to the parquet scan")
      scans.map(_.metrics("numOutputRows").value).sum
    }

    val zRows = scanOutputRows(zPath)
    val linRows = scanOutputRows(linPath)
    val total = l.count()
    // both scans return the same ANSWER (row-level filter above), but the
    // z-ordered scan's row groups skip: it must surface at most half the
    // rows the linear layout's scan does (in practice far less)
    assert(zRows * 2 <= linRows,
      s"scan output rows: zorder $zRows vs linear $linRows (table $total)")
    // and the linear-by-partkey layout can't skip anything for a suppkey
    // predicate — every row group spans the full suppkey domain
    assert(linRows === total,
      s"expected the linear layout to read everything, got $linRows of $total")
  }

  test("writeZOrdered is a pure relayout: same rows, zkey column dropped") {
    val l = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey")
    val dir = Files.createTempDirectory("graft-layout-rt").toString
    LayoutOps.writeZOrdered(l, "l_partkey", "l_suppkey", dir, numFiles = 4)
    val back = spark.read.parquet(dir)
    assert(back.columns.sorted.toSeq === Seq("l_partkey", "l_suppkey"))
    val a = l.agg(count(lit(1)), sum("l_partkey"), sum("l_suppkey")).head()
    val b = back.agg(count(lit(1)), sum("l_partkey"), sum("l_suppkey")).head()
    assert(a === b)
  }
}
