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
      // Tz-naive parquet timestamps (isAdjustedToUTC=false, the driver's
      // current events.ts encoding) would otherwise infer as TIMESTAMP_NTZ,
      // which unix_micros()/window functions reject. With a UTC session TZ
      // the TIMESTAMP reading is value-identical to the NTZ one and matches
      // the DuckDB oracle. Tables.events additionally carries a defensive
      // NTZ→TIMESTAMP cast for sessions built without this config.
      .config("spark.sql.parquet.inferTimestampNTZType", "false")
      // v2 commit: tasks move output into place directly instead of the
      // job-commit driver loop renaming every partition dir serially —
      // the delta/ingest state logs write O(100) `pfx=` dirs per batch
      // and the v1 rename loop dominated their wall clock. Correctness
      // posture is unchanged for these writers: every partitioned log is
      // overwrite-mode into a batch-keyed dir, and commit is signaled by
      // the MANIFEST partition landing last, not by dir visibility (on a
      // real cluster an object-store committer replaces this anyway).
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
