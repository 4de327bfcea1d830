package graft

/** Dev utility: time named queries twice in one JVM to split one-time
  * planning/codegen cost from steady-state execution (the first run pays
  * Janino + AQE planning; the delta is what Bench's per-query numbers
  * carry as fixed overhead). Usage:
  *   tools/run_main.sh graft.TimeTwice [sfDir] [query ...]
  */
object TimeTwice {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("time-twice")
    spark.range(1000).selectExpr("sum(id)").collect()
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("x2_dedup_minhash_lsh", "x4_dedup_jaccard")
    for (name <- names; i <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sf).count()
      println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
