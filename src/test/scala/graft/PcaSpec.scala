package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PcaOps

/** Distributed PCA: exact fixed-point Gram/mean aggregation, the
  * driver-side Jacobi eigensolver, and the projection fold.
  */
class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("jacobiEigen recovers a known spectrum") {
    // symmetric 3x3 with eigenvalues 6, 3, 1 (constructed as Q D Q^T
    // for a rotation Q) — here a simple diagonal-dominant case with a
    // hand-checkable spectrum: [[2,1,0],[1,2,0],[0,0,5]] has
    // eigenvalues 5, 3, 1
    val m = Array(
      Array(2.0, 1.0, 0.0),
      Array(1.0, 2.0, 0.0),
      Array(0.0, 0.0, 5.0))
    val (vals, vecs) = PcaOps.jacobiEigen(m)
    assert(vals.sorted.zip(Array(1.0, 3.0, 5.0))
      .forall { case (a, b) => math.abs(a - b) < 1e-10 })
    // V diag(vals) V^T reconstructs the input
    val d = m.length
    for (i <- 0 until d; j <- 0 until d) {
      val r = (0 until d).map(k => vecs(i)(k) * vals(k) * vecs(j)(k)).sum
      assert(math.abs(r - m(i)(j)) < 1e-10, s"($i,$j): $r vs ${m(i)(j)}")
    }
  }

  private def vecsDf(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("gramUpper matches the brute-force quantized products") {
    val data = Seq(
      1L -> Seq(0.1f, -0.2f, 0.3f),
      2L -> Seq(0.05f, 0.25f, -0.15f),
      3L -> Seq(-0.3f, 0.1f, 0.2f))
    val got = PcaOps.gramUpper(vecsDf(data: _*), "embedding")
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        r.getDecimal(2).longValueExact)).toMap
    val q = data.map { case (_, v) =>
      v.map(x => math.floor(x.toDouble * 10000).toLong)
    }
    for (i <- 0 until 3; j <- i until 3) {
      val want = q.map(r => r(i) * r(j)).sum
      assert(got((i, j)) == want, s"($i,$j)")
    }
    assert(got.size == 6)
  }

  test("principalComponents finds the dominant direction; projection folds match") {
    // points spread along (1,1,0)/sqrt(2) with small noise off-axis:
    // PC0 must align with it and capture most variance
    val base = (0 until 40).map { k =>
      val t = (k - 20) / 10.0
      val noise = (k % 3 - 1) * 0.01
      (k.toLong, Seq((t + noise).toFloat, (t - noise).toFloat,
        (noise * 2).toFloat))
    }
    val df = vecsDf(base: _*)
    val comps = PcaOps.principalComponents(
      PcaOps.gramUpper(df, "embedding"),
      PcaOps.dimSums(df, "embedding"), dim = 3, k = 2)
    val rows = comps.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    val pc0 = rows.filter(_._1 == 0).sortBy(_._2).map(_._3)
    val e0 = rows.find(_._1 == 0).get._4
    val e1 = rows.find(_._1 == 1).get._4
    assert(e0 > e1 && e1 >= -1e-12)
    // dominant direction ~ (1,1,0)/sqrt(2); sign-fixed positive
    assert(math.abs(pc0(0) - math.sqrt(0.5)) < 0.01, pc0.toSeq.toString)
    assert(math.abs(pc0(1) - math.sqrt(0.5)) < 0.01)
    assert(math.abs(pc0(2)) < 0.05)
    // orthonormal components
    val pc1 = rows.filter(_._1 == 1).sortBy(_._2).map(_._3)
    assert(math.abs(pc0.zip(pc1).map { case (a, b) => a * b }.sum) < 1e-9)
    assert(math.abs(pc0.map(x => x * x).sum - 1.0) < 1e-9)
    // projection: per-row fold over the component literals
    val proj = PcaOps.project(df, "vec_id", "embedding", comps)
      .filter(col("vec_id") === 0L).orderBy("comp").collect()
      .map(_.getDouble(2))
    val v0 = base.head._2.map(_.toDouble)
    val manual = Seq(pc0, pc1).map { c =>
      val dot = v0.zip(c).map { case (a, b) => a * b }
        .foldLeft(0.0)(_ + _)
      math.floor(dot * 10000) / 10000.0
    }
    assert(proj.toSeq == manual)
  }

  test("components are reproducible (deterministic sweep + sign fix)") {
    val df = vecsDf((0 until 20).map(k =>
      (k.toLong, Seq(math.sin(k * 1.7).toFloat,
        math.cos(k * 0.9).toFloat, (k / 20.0).toFloat))): _*)
    def run() = PcaOps.principalComponents(
      PcaOps.gramUpper(df, "embedding"),
      PcaOps.dimSums(df, "embedding"), dim = 3, k = 3)
      .orderBy("comp", "pos").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(run() == run())
  }
}
