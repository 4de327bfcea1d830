package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole forked test JVM (sbt Test/fork := true).
  * Suites must NOT stop it.
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    sys.props.put("SPARK_GRAFT_CPUS_OVERRIDE", "8")
    SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
  val sf0001 = "/root/testdata/sf0.001"
}
