package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MultimodalOps, PackingOps}

/** Per-class score calibration (exact tie-inclusive percentiles from
  * the distinct-score aggregate) and scene-cut detection over frame
  * hashes.
  */
class CalibrateSceneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("calibrateByClass: tie-inclusive cumulative counts, exact floor bps") {
    // class a: scores 1,2,2,3 — n_le: 1,3,3,4 of 4
    // class b: single doc — always 10000 bps
    val df = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 2.0), (4L, "a", 3.0),
      (9L, "b", 0.1)).toDF("id", "cls", "score")
    val out = PackingOps.calibrateByClass(df, "cls", "score")
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_le"), r.getAs[Long]("n_class"),
          r.getAs[Long]("calib_bps"))))
      .toMap
    assert(out(1L) == ((1L, 4L, 2500L)))
    assert(out(2L) == ((3L, 4L, 7500L)))
    assert(out(3L) == ((3L, 4L, 7500L)))
    assert(out(4L) == ((4L, 4L, 10000L)))
    assert(out(9L) == ((1L, 1L, 10000L)))
  }

  test("calibrateByClass matches the window cume form on fixture data") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("source"),
        (col("n_chars") % 23).cast("double").as("score")) // coarse ties
    val got = PackingOps.calibrateByClass(docs, "source", "score")
      .select("doc_id", "n_le", "n_class")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("score")
      .rangeBetween(Long.MinValue, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
    val want = docs
      .withColumn("n_le", count(lit(1)).over(w).cast("long"))
      .withColumn("n_class", count(lit(1)).over(wAll).cast("long"))
      .select("doc_id", "n_le", "n_class")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("calibrateByClass: NULL scores survive the join and rank lowest") {
    // a plain equi-join would silently drop row 2 (NULL != NULL)
    val df = Seq((1L, "a", Some(1.0)), (2L, "a", None),
      (3L, "a", Some(2.0))).toDF("id", "cls", "score")
    val out = PackingOps.calibrateByClass(df, "cls", "score")
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_le"), r.getAs[Long]("calib_bps"))))
      .toMap
    assert(out.size == 3, "the NULL-scored row must not vanish")
    assert(out(2L) == ((1L, 3333L)), out.toString) // NULL ranks lowest
    assert(out(1L) == ((2L, 6666L)))
    assert(out(3L) == ((3L, 10000L)))
  }

  test("reliabilityBins: hand-computed bins, half-up rounding, NULL-den drop") {
    import graft.ml.Calibration
    // scores as rationals: 1/10 -> 1000bp bin 1; 25/100 -> 2500bp bin 2
    // (two rows, labels 0 and 1 -> acc 5000); 999/1000 -> 9990bp bin 9;
    // 10000bp exactly -> clamped into bin 9; zero denominator dropped
    val df = Seq((1L, 10L, 0L), (25L, 100L, 0L), (25L, 100L, 1L),
      (999L, 1000L, 1L), (1L, 1L, 1L), (7L, 0L, 1L))
      .toDF("num", "den", "lab")
    val out = Calibration.reliabilityBins(df, col("num"), col("den"),
        col("lab"), bins = 10)
      .orderBy("bin").collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
        r.getAs[Long]("n_pos"), r.getAs[Long]("conf_bp"),
        r.getAs[Long]("acc_bp"), r.getAs[Long]("gap_bp")))
    assert(out.toSeq == Seq(
      (1L, 1L, 0L, 1000L, 0L, 1000L),
      (2L, 2L, 1L, 2500L, 5000L, 2500L),
      (9L, 2L, 2L, 9995L, 10000L, 5L)))
  }

  test("reliabilityBins: bins partition the defined-score rows; ECE folds exactly") {
    import graft.ml.Calibration
    import graft.operators.TextOps
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val (qNum, qDen) = TextOps.qualityRat(col("text"), col("n_chars"))
    val bins = Calibration.reliabilityBins(docs, qNum, qDen,
      (col("n_chars") > 300).cast("long"), bins = 10).collect()
    assert(bins.map(_.getAs[Long]("n")).sum == docs.count())
    bins.foreach { r =>
      val (c, a, g) = (r.getAs[Long]("conf_bp"), r.getAs[Long]("acc_bp"),
        r.getAs[Long]("gap_bp"))
      assert(c >= 0 && c <= 10000 && a >= 0 && a <= 10000)
      assert(g == math.abs(c - a))
      assert(r.getAs[Long]("n_pos") <= r.getAs[Long]("n"))
    }
    // a perfectly calibrated score (score == label) folds to ECE 0
    val perfect = Seq((1L, 1L, 1L), (0L, 1L, 0L), (1L, 1L, 1L))
      .toDF("num", "den", "lab")
    val p = Calibration.reliabilityBins(perfect, col("num"), col("den"),
      col("lab"), bins = 10).collect()
    assert(p.map(r => r.getAs[Long]("gap_bp") * r.getAs[Long]("n")).sum == 0L)
  }

  test("epochOrder rejects duplicate weight rows (silent-multiply guard)") {
    val docs = Seq((1L, "a")).toDF("doc_id", "cls")
    val w = Seq(("a", 10000L), ("a", 20000L)).toDF("cls", "w_bps")
    val e = intercept[IllegalArgumentException] {
      PackingOps.epochOrder(docs, "doc_id", "cls", w, "s")
    }
    assert(e.getMessage.contains("duplicate"), e.getMessage)
  }

  private def frame(asset: Long, idx: Long, rLo: Long, rHi: Long,
      cLo: Long, cHi: Long) = (asset, idx, rLo, rHi, cLo, cHi)

  test("sceneCuts: first frame opens scene 0; cuts on distance > threshold") {
    val frames = Seq(
      frame(1L, 0L, 0L, 0L, 0L, 0L),
      frame(1L, 1L, 3L, 0L, 0L, 0L),          // dist 2 — same scene
      frame(1L, 2L, 0xFFFFL, 0xFFL, 0L, 0L),  // big jump — cut
      frame(1L, 3L, 0xFFFFL, 0xFFL, 1L, 0L),  // dist 1 — same scene
      frame(2L, 0L, 7L, 7L, 7L, 7L))          // new asset — scene 0
      .toDF("asset_id", "frame_idx",
        "dh_r_lo", "dh_r_hi", "dh_c_lo", "dh_c_hi")
    val out = MultimodalOps.sceneCuts(frames, threshold = 4)
      .orderBy("asset_id", "frame_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getAs[java.lang.Long]("hamming")).map(_.toLong),
        r.getBoolean(r.fieldIndex("is_cut")),
        r.getLong(r.fieldIndex("scene_id"))))
    assert(out(0) == ((1L, 0L, None, true, 0L)))
    assert(out(1) == ((1L, 1L, Some(2L), false, 0L)))
    assert(out(2)._4 && out(2)._5 == 1L)
    assert(!out(3)._4 && out(3)._5 == 1L)
    assert(out(4) == ((2L, 0L, None, true, 0L)))
  }
}
