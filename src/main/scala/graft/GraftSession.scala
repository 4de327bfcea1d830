package graft

import org.apache.spark.sql.SparkSession

/** Standard session factory: every entry point (Verify, Bench, tests)
  * builds its session here so config is uniform.
  *
  * - shuffle partitions sized to local cores (not the 200 default);
  * - AQE on (runtime coalescing + skew-join handling — the 100 TB path);
  * - UTC session TZ (oracle parity);
  * - nanos-as-long parquet read: the driver's `events` table carries
  *   TIMESTAMP(NANOS) which Spark 4 otherwise refuses to read
  *   ([PARQUET_TYPE_ILLEGAL]); Tables.events converts ns → microsecond
  *   TimestampType with exact integer arithmetic.
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def build(appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
