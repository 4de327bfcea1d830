package graft

/** Dev probe: the x126c fusion-overlap census at a chosen scale factor —
  * used to set `fusionOverlapGateBps` from measured arm physics rather
  * than a guess. Usage: `tools/run_main.sh graft.ProbeFusion <sfDir>`.
  * Prints the single gate row as JSON.
  */
object ProbeFusion {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.build("graft-probe-fusion")
    val r = SparkEntry.queries("x126c_fusion_overlap_gate")(spark, dir)
      .collect().head
    println(s"""PROBE_FUSION: {"dir":"$dir","n_exact":${r.getLong(0)},""" +
      s""""n_approx":${r.getLong(1)},"n_both":${r.getLong(2)},""" +
      s""""overlap_bp":${r.getLong(3)},"fusion_ok":${r.getBoolean(4)}}""")
    spark.stop()
  }
}
