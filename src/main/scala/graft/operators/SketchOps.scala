package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators — the incremental-statistics pattern at
  * 100 TB. A distinct-count over an ever-growing corpus must not re-scan
  * history on every refresh; instead each partition/day/batch persists a
  * fixed-size HLL sketch (Apache DataSketches, built into Spark via
  * `hll_sketch_agg`), and a refresh unions sketch BYTES — kilobytes per
  * group, never rows. Sketch union is exact over sketch state, so the
  * incremental path returns byte-identical estimates to a global rebuild
  * (SketchOpsSpec asserts equality, not approximation).
  *
  * This is also the A2 (count-distinct) scale story: the exact
  * `a2_count_distinct` stays the oracle semantics; sketches are the
  * opt-in for continuous refresh over unbounded data.
  */
object SketchOps {

  /** One HLL sketch per group — a persistable summary table. `lgK` trades
    * size for error (2^lgK buckets; 12 → ~0.8 % relative error, ~4 KB).
    */
  def distinctSketches(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Merge a sketch table down to estimates per (coarser) grouping —
    * the refresh path: reads summaries, never raw rows.
    *
    * Contract: the union == global rebuild EXACTLY only when every input
    * sketch was built with the SAME `lgK` end to end (any value — the
    * union adopts the sketches' own precision; SketchOpsSpec asserts this
    * at both the default and a non-default lgK). Mixing lgK values fails
    * by default; pass `allowDifferentLgK = true` to accept the mix, in
    * which case the result downgrades to the coarsest precision present
    * and the exactness contract no longer applies.
    */
  def mergeEstimate(sketches: DataFrame, groupCols: Seq[String],
      allowDifferentLgK: Boolean = false): DataFrame = {
    val merged = hll_union_agg(col("sketch"), lit(allowDifferentLgK)).as("merged")
    val g = if (groupCols.isEmpty) sketches.agg(merged)
      else sketches.groupBy(groupCols.map(col): _*).agg(merged)
    g.withColumn("distinct_est", hll_sketch_estimate(col("merged")))
      .drop("merged")
  }

  /** Single-shot estimate (the non-incremental form, for comparison). */
  def distinctEstimate(df: DataFrame, valueCol: String, lgK: Int = 12): DataFrame =
    df.agg(hll_sketch_estimate(
      hll_sketch_agg(col(valueCol), lit(lgK))).as("distinct_est"))
}
