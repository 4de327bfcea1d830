package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reliability-diagram binning for a probability-like score against a
  * binary label — the calibration audit a model-based quality gate
  * ([[QualityClassifier]], the x46 family) needs before its scores can
  * drive keep/drop thresholds: a well-calibrated score's mean confidence
  * tracks its empirical positive rate per bin, and the per-bin gap is
  * the Expected-Calibration-Error integrand.
  *
  * Everything is EXACT integer / fixed-point arithmetic (the [[graft.queries.Det]]
  * discipline): the score arrives as a rational (num, den), is rounded
  * half-up to basis points (0..10000) by the shared `(num·20000 + den)
  * div (2·den)` form, and the bin, per-bin mean confidence, accuracy,
  * and gap are all integer expressions — both engines produce the
  * identical table, so calibration itself sits under the oracle gate.
  *
  * Scale: one partial-aggregated groupBy over ≤ `bins` keys — map-side
  * combine reduces each partition to ≤ `bins` rows before the shuffle;
  * per-row work is codegen'd integer math. Composes with any scored
  * frame at any corpus size.
  */
object Calibration {

  /** Per-bin reliability rows: `bin` (0-based, width 10000/bins basis
    * points, top edge clamped into the last bin), `n`, `n_pos`,
    * `conf_bp` (rounded mean score, basis points), `acc_bp` (rounded
    * positive rate, basis points), `gap_bp` = |conf − acc|. Empty bins
    * don't appear (no rows — same census both engines). ECE in basis
    * points = Σ gap_bp·n / Σ n over the result — a two-line consumer
    * fold, kept out of the row schema so the per-bin table stays the
    * product.
    *
    * `scoreNum`/`scoreDen` is the score as an integer rational in
    * [0, 1]; `label` must evaluate to 0/1. Rows with a zero denominator
    * carry a NULL basis-point score and are dropped (they have no
    * defined bin; the caller's score design owns its degenerate cases —
    * the [[graft.queries.Det.round4Rat]] NULL contract). `label` must be
    * non-null for counted rows: a NULL label would be skipped by the
    * positive-count sum while still counting toward `n` (both engines),
    * deflating the bin's accuracy — resolve labels upstream.
    */
  def reliabilityBins(df: DataFrame, scoreNum: Column, scoreDen: Column,
      label: Column, bins: Int): DataFrame = {
    require(bins > 0 && bins <= 10000, s"need 0 < bins <= 10000, got $bins")
    val num = scoreNum.cast("long")
    val den = scoreDen.cast("long")
    // half-up rational rounding to basis points — round4Rat's integer
    // core, kept as a LONG (not /10⁴) so binning and averaging stay
    // integer-exact
    val a = num * lit(20000L) + den
    val b = den * lit(2L)
    val bp = when(den === 0, lit(null).cast("long"))
      .otherwise(((a - pmod(a, b)) / b).cast("long"))
    // integer-exact floor(bp·bins/10⁴): subtract the remainder before the
    // double division so the quotient is integer-valued (≤ 10⁴, exact)
    val binRaw = bp * lit(bins.toLong)
    // guard the clamp explicitly: least() SKIPS nulls (both engines), so
    // a NULL score would otherwise clamp into the last bin instead of
    // propagating — filter on the score itself, before binning
    val bin = least(
      ((binRaw - pmod(binRaw, lit(10000L))) / 10000L).cast("long"),
      lit((bins - 1).toLong))
    df.select(bin.as("bin"), bp.as("_bp"), label.cast("long").as("_lab"))
      .filter(col("_bp").isNotNull)
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum("_lab").as("n_pos"),
        sum("_bp").as("_sum_bp"))
      .select(col("bin"), col("n"), col("n_pos"),
        ((col("_sum_bp") * 2 + col("n") - pmod(col("_sum_bp") * 2 + col("n"),
          col("n") * 2)) / (col("n") * 2)).cast("long").as("conf_bp"),
        ((col("n_pos") * 20000L + col("n") - pmod(col("n_pos") * 20000L + col("n"),
          col("n") * 2)) / (col("n") * 2)).cast("long").as("acc_bp"))
      .withColumn("gap_bp", abs(col("conf_bp") - col("acc_bp")))
  }
}
