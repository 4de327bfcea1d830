package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** MODEL-BASED quality gating — the classifier-score curation step real
  * corpora run (a learned scorer instead of hand-tuned ratio thresholds):
  * train a logistic regression on cheap text features with WEAK labels
  * drawn from the hand-crafted quality score's extremes, persist the
  * learned weights as a plain coefficient TABLE, and score the corpus as
  * an integer dot-product over those weights — no UDF, no model object on
  * the hot path, and (because the persisted weights are quantized
  * integers over integer features) a score any engine reproduces
  * bit-for-bit from the same artifact. The reference's classifier surface
  * (training.py:66-90, model_type="logreg") applied to curation.
  *
  * Scale design: training touches only the weak-label EXTREMES of the
  * corpus (one filtered pass; LBFGS over 4 features is driver-trivial at
  * any corpus size since each iteration is a map-side-combined
  * treeAggregate). Scoring is a one-row broadcast of the pivoted weight
  * table crossed into per-row codegen'd arithmetic — zero shuffles, and
  * the margin feeds the histogram gate ([[graft.operators.PackingOps]])
  * through a fixed integer bucketing, so no per-class rank window ever
  * sees the corpus.
  */
object QualityClassifier {

  /** Coefficients are persisted as round(w · 10⁶) — integer weights make
    * the margin exact integer arithmetic in every engine.
    */
  val weightScale = 1000000L

  /** Margin clamp / bucket width for the quantized gate score:
    * score_q = (clamp(margin, ±marginClamp) + marginClamp) div bucketWidth
    * — at most 10⁴+1 distinct values, the histogram-gate contract.
    */
  val marginClamp = 5000000000L
  val bucketWidth = 1000000L

  /** The integer, engine-portable feature columns (name → expression)
    * over a (text, n_chars) pair: capped length, non-stopword mass,
    * capped chars, and the top-bigram repetition count. All pure
    * `functions._` per-row arithmetic — codegen'd, no shuffle.
    */
  def features(textCol: Column, nCharsCol: Column): Seq[(String, Column)] = {
    val toks = TextOps.tokens(textCol)
    val nt = size(toks).cast("long")
    val sw = size(filter(toks, t => t.isInCollection(TextOps.stopwords)))
      .cast("long")
    Seq(
      "f_len" -> least(nt, lit(100L)),
      "f_nonstop" -> (nt - sw),
      "f_chars" -> least(nCharsCol.cast("long"), lit(500L)),
      "f_rep" -> TextOps.topBigramCount(toks).cast("long"))
  }

  val featureNames: Seq[String] = Seq("f_len", "f_nonstop", "f_chars", "f_rep")

  /** Train on WEAK labels from the x9 quality rational's extremes
    * (quality ≥ hiBps/10⁴ → positive, ≤ loBps/10⁴ → negative, middle
    * dropped — pure integer cross-multiply, no float threshold) and
    * return the quantized coefficient table `(feature, w)` with an
    * `intercept` row. Fails loudly if either extreme is empty — a
    * degenerate threshold choice must not train a silent constant model.
    */
  def trainWeak(docs: DataFrame, textCol: String, nCharsCol: String,
      loBps: Long, hiBps: Long, maxIter: Int = 100): DataFrame = {
    require(loBps < hiBps, "weak-label extremes must be disjoint")
    val spark = docs.sparkSession
    val (qNum, qDen) = TextOps.qualityRat(col(textCol), col(nCharsCol))
    val feats = features(col(textCol), col(nCharsCol))
    val labeled = feats.foldLeft(
        docs.filter(size(TextOps.tokens(col(textCol))) > 0)) {
        case (df, (n, e)) => df.withColumn(n, e)
      }
      .withColumn("label",
        when(lit(10000L) * qNum >= lit(hiBps) * qDen, 1.0)
          .when(lit(10000L) * qNum <= lit(loBps) * qDen, 0.0))
      .filter(col("label").isNotNull)
      .select((col("label") +: featureNames.map(col)): _*)
    val classes = labeled.select("label").distinct().count()
    require(classes == 2,
      s"weak labels must cover both extremes, got $classes class(es)")
    val assembled = new VectorAssembler()
      .setInputCols(featureNames.toArray).setOutputCol("features")
      .transform(labeled)
    val model = new LogisticRegression()
      .setFeaturesCol("features").setLabelCol("label")
      .setMaxIter(maxIter)
      .fit(assembled)
    import spark.implicits._
    (("intercept", math.round(model.intercept * weightScale)) +:
      featureNames.zip(model.coefficients.toArray
        .map(c => math.round(c * weightScale))))
      .toDF("feature", "w")
  }

  /** Score `docs` with a persisted coefficient table: appends an integer
    * `margin` column (= w_intercept + Σ w_f · f, weights 10⁶-scaled) and
    * its bucketed gate form `score_q`. The weight table pivots to ONE row
    * and broadcasts — the dot product is per-row codegen'd arithmetic,
    * nothing shuffles, nothing collects.
    */
  def scoreMargin(docs: DataFrame, textCol: String, nCharsCol: String,
      weights: DataFrame): DataFrame = {
    val wide = weights.groupBy().pivot("feature").agg(first("w"))
      .select((col("intercept").as("_w0") +:
        featureNames.map(n => col(n).as(s"_w_$n"))): _*)
    val feats = features(col(textCol), col(nCharsCol))
    val margin = feats.map { case (n, e) => col(s"_w_$n") * e }
      .foldLeft(col("_w0"))(_ + _)
    docs.crossJoin(broadcast(wide))
      .withColumn("margin", margin)
      // integer `div` (never a float division + floor: a near-integer
      // double quotient could floor differently across engines); operands
      // are made non-negative by the clamp+offset so div == floor-div in
      // DuckDB (`//`) too
      .withColumn("score_q", expr(
        s"(least(greatest(margin, ${-marginClamp}L), ${marginClamp}L) " +
          s"+ ${marginClamp}L) div ${bucketWidth}L"))
      .drop("_w0" +: featureNames.map(n => s"_w_$n"): _*)
  }
}
