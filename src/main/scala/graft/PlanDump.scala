package graft

/** Dev utility (optimization rounds): write `.explain("formatted")` for
  * named queries to `plans/<tag>/<name>_<suffix>.txt` so plan-shape
  * claims in OPTIMIZATION notes are checkable without running Spark.
  * Usage:
  *   tools/run_main.sh graft.PlanDump <tag> <suffix> [sfDir] <query ...>
  * e.g. tools/run_main.sh graft.PlanDump r19 before /root/testdata/sf0.1 \
  *        x132_bm25_mrr x143_takedown_e2e
  * Queries with construction-time stage writes run those writes (the
  * SparkEntry contract); the dumped plan is the RETURNED frame's.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <tag> <suffix> [sfDir] <query ...>")
    val tag = args(0)
    val suffix = args(1)
    val (sf, names) =
      if (args(2).startsWith("/")) (args(2), args.drop(3).toSeq)
      else ("/root/testdata/sf0.1", args.drop(2).toSeq)
    val spark = GraftSession.build("plan-dump")
    val dir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(dir)
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] no such query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sf)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(dir.resolve(s"${name}_$suffix.txt"),
              txt.getBytes("UTF-8"))
            println(s"[plandump] wrote plans/$tag/${name}_$suffix.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
          } finally graft.operators.StageIO.cleanScratch(spark)
      }
    }
    spark.stop()
  }
}
