package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")
    // warm the JVM/session once so the first timed query isn't paying
    // codegen + scheduler + parquet-reader startup
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.queries.get("a1_count_star")
      .foreach(fn => try fn(spark, sfDir).count() catch { case _: Throwable => })
    // fixed alphabetical order: per-round timings stay comparable and cache
    // effects hit the same queries each round
    // optional comma-separated filter for timing individual queries locally;
    // the driver never sets it, so the full suite runs per-round
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // a typo'd filter would otherwise emit a clean-looking total=0 line
    only.foreach(_.diff(SparkEntry.queries.keySet).foreach(n =>
      System.err.println(s"[bench] WARNING: SPARK_GRAFT_ONLY name '$n' matches no query")))
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          // a failing query must be visible, not a fast timing
          failed ::= name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // outside the timed region: drop any intermediates a query persisted
      // so later timings are neither helped nor starved by earlier caches
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(json)
    // the driver tail-captures stdout and has truncated the head of this
    // line before (BENCH_r02 lost its totals) — also persist the artifact
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}") }
    spark.stop()
  }
}
