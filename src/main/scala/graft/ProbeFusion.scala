package graft

/** Dev probe: the fusion-overlap gate's wall at corpus scale, full
  * population vs the sampled scale form (judge r17 #1 — the ProbeMrr
  * measurement discipline on the x126c composite). Usage:
  *
  *   tools/run_main.sh graft.ProbeFusion <sfDir> <variant> [sampleMod]
  *
  * `variant` = `full` (every doc_id % 101 == 0 slice doc plays —
  * x126c's reference semantics; benched work grows ~quadratically in
  * scale factor because the exact brute-force arm is O(corpus) per
  * query and the query population itself grows with the corpus) or
  * `sampled` (the q_id-residue sample applied identically to BOTH arms
  * — x126d's shape). `sampleMod` (sampled only, default 2) is the
  * residue dial: pick it so the QUERY COUNT matches across dirs (the
  * ProbeBm25/ProbeMrr matched-count discipline — an overlap gate at
  * corpus scale holds its query budget fixed, not its query fraction;
  * past sampling error, more queries don't sharpen the estimate).
  *
  * Two timed runs (cold, steady), the single gate row collected, one
  * JSON line on stdout.
  */
object ProbeFusion {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val variant = args(1)
    require(Set("full", "sampled", "budgeted")(variant),
      s"variant: $variant")
    // full population means NO sample — reject a stray sampleMod operand
    // instead of echoing misleading provenance into the recorded JSON
    // (advisor r18: a `full` run printed a non-zero sample_mod)
    require(variant != "full" || args.length <= 2,
      "sampleMod is only meaningful for sampled/budgeted variants")
    val sampleMod = if (variant == "full") None
      else if (args.length > 2) Some(args(2).toLong) else Some(2L)
    val spark = GraftSession.build("graft-probe-fusion")
    if (variant == "budgeted") {
      // the x126e composite: the sampled census judged against the WIDE
      // sanity floor plus the (3/margin)² budget verdict — the variant
      // that demonstrates a CONFIDENT sampled verdict at scale (r18 #4)
      def once(): (Double, org.apache.spark.sql.Row) = {
        val t0 = System.nanoTime()
        val r = graft.queries.Ext4Queries
          .fusionGateBudgeted(spark, dir, sampleMod).collect().head
        graft.operators.StageIO.cleanScratch(spark)
        ((System.nanoTime() - t0) / 1e9, r)
      }
      val (cold, rC) = once()
      val (steady, r) = once()
      require(rC.getLong(0) == r.getLong(0),
        s"nondeterministic census: ${rC.getLong(0)} vs ${r.getLong(0)}")
      println(s"""PROBE_FUSION: {"dir":"$dir","variant":"$variant",""" +
        s""""sample_mod":${sampleMod.getOrElse(0L)},""" +
        s""""n_exact":${r.getLong(0)},"n_both":${r.getLong(1)},""" +
        s""""overlap_bp":${r.getLong(2)},"margin_bp":${r.getLong(3)},""" +
        s""""n_required":${if (r.isNullAt(4)) "null" else r.getLong(4)},""" +
        s""""sanity_ok":${r.getBoolean(5)},""" +
        s""""confident":${r.getBoolean(6)},""" +
        s""""cold_sec":$cold,"steady_sec":$steady}""")
      spark.stop()
      return
    }
    def once(): (Double, org.apache.spark.sql.Row) = {
      val t0 = System.nanoTime()
      val mod = if (variant == "full") None else sampleMod
      val r = graft.queries.Ext4Queries.fusionOverlapGate(spark, dir, mod)
        .collect().head
      graft.operators.StageIO.cleanScratch(spark)
      ((System.nanoTime() - t0) / 1e9, r)
    }
    val (cold, rC) = once()
    val (steady, r) = once()
    require(rC.getLong(0) == r.getLong(0),
      s"nondeterministic census: ${rC.getLong(0)} vs ${r.getLong(0)}")
    println(s"""PROBE_FUSION: {"dir":"$dir","variant":"$variant",""" +
      s""""sample_mod":${sampleMod.getOrElse(0L)},""" +
      s""""n_exact":${r.getLong(0)},"n_approx":${r.getLong(1)},""" +
      s""""n_both":${r.getLong(2)},"overlap_bp":${r.getLong(3)},""" +
      s""""fusion_ok":${r.getBoolean(4)},""" +
      s""""cold_sec":$cold,"steady_sec":$steady}""")
    spark.stop()
  }
}
