package graft

/** Dev probe: the MRR gate's wall at corpus scale, full-population vs
  * scale form (judge r16 #1 — the x127b "capped ≈ flat" measurement on
  * the x132 composite). Usage:
  *
  *   tools/run_main.sh graft.ProbeMrr <sfDir> <variant> [sampleMod]
  *
  * `variant` = `full` (uncapped truth pair join, every truth doc plays
  * the query — x132's reference semantics) or `scale` (DF-capped truth
  * arm + q_id-residue query sample + shared postings state — x132b's
  * shape). `sampleMod` (scale only, default 3) is the residue dial:
  * pick it so the QUERY COUNT matches across dirs (the ProbeBm25
  * matched-count discipline — an MRR gate at corpus scale holds its
  * query budget fixed, not its query fraction).
  *
  * Two timed runs (cold, steady), full collect of the per-query gate
  * rows, one JSON line on stdout.
  */
object ProbeMrr {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val variant = args(1)
    require(variant == "full" || variant == "scale", s"variant: $variant")
    val sampleMod = if (args.length > 2) Some(args(2).toLong)
      else if (variant == "scale") Some(3L) else None
    val spark = GraftSession.build("graft-probe-mrr")
    def once(): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows =
        if (variant == "full")
          graft.queries.Ext4Queries.mrrGate(spark, dir, cap = None,
            sampleMod = None, fromSharedState = false).collect()
        else
          graft.queries.Ext4Queries.mrrGate(spark, dir, cap = Some(8L),
            sampleMod = sampleMod, fromSharedState = true).collect()
      graft.operators.StageIO.cleanScratch(spark)
      ((System.nanoTime() - t0) / 1e9, rows.length.toLong)
    }
    val (cold, qC) = once()
    val (steady, qS) = once()
    require(qC == qS, s"nondeterministic query count: $qC vs $qS")
    println(s"""PROBE_MRR: {"dir":"$dir","variant":"$variant",""" +
      s""""sample_mod":${sampleMod.getOrElse(0L)},"queries":$qS,""" +
      s""""cold_sec":$cold,"steady_sec":$steady}""")
    spark.stop()
  }
}
