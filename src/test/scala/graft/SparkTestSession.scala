package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole forked test JVM (sbt Test/fork := true).
  * Suites must NOT stop it.
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    sys.props.put("SPARK_GRAFT_CPUS_OVERRIDE", "8")
    // JVM-private warehouse: StageIO scratch/artifact roots derive from
    // warehouse.dir, so sharing the repo-default `spark-warehouse` with a
    // concurrently running Verify/Bench process lets that process's
    // cleanScratch delete THIS JVM's in-flight stage handoffs (observed:
    // 7 spurious suite failures during a parallel Verify run). A
    // pid-unique dir makes the test JVM immune to any concurrent driver.
    val wh = s"${sys.props("java.io.tmpdir")}/graft-test-warehouse-" +
      ProcessHandle.current().pid()
    // reclaim it when the forked test JVM exits — pid-unique dirs would
    // otherwise accumulate in tmpdir, one per `sbt test` run (artifacts
    // deliberately survive cleanScratch, so nothing else deletes them)
    sys.addShutdownHook {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(wh)).deleteRecursively()
    }
    SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
  val sf0001 = "/root/testdata/sf0.001"
}
