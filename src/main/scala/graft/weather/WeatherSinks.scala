package graft.weather

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sink fan-out (SURVEY §2.1 S3-S11): the reference's 4-collection MongoDB
  * fan-out (load.py:22-115) re-expressed as a parquet table layout:
  *
  *   tables/raw_weather_data/          append-only log (S4)
  *   tables/current_weather/           overwrite snapshot (S5)
  *   tables/weather_batches/batch_id=… partitioned batch log (S6) —
  *                                     partitionBy replaces the reference's
  *                                     collection-per-batch scheme
  *   tables/weather_statistics/        1-row-per-batch stats append (S7)
  *   tables/predictions/               prediction append (S11)
  *
  * All writes are distributed (no driver materialization); the snapshot
  * overwrite is atomic at the directory level, matching the reference's
  * delete_many-then-insert semantics without its read-gap.
  */
class WeatherSinks(root: String) {
  val rawPath = s"$root/${WeatherConfig.rawTable}"
  val currentPath = s"$root/${WeatherConfig.currentTable}"
  val batchesPath = s"$root/${WeatherConfig.batchesTable}"
  val statsPath = s"$root/${WeatherConfig.statsTable}"
  val predictionsPath = s"$root/${WeatherConfig.predictionsTable}"

  /** S3: timestamped CSV export (load.py:8-20). */
  def saveCsv(df: DataFrame, batchId: String): String = {
    val path = s"$root/csv/weather_data_$batchId"
    df.write.mode("overwrite").option("header", "true").csv(path)
    path
  }

  /** S4: append to the raw log. */
  def appendRaw(df: DataFrame): Unit =
    df.write.mode("append").parquet(rawPath)

  /** S5: replace the current snapshot (load.py:51-62; is_current +
    * updated_at stamps per load.py:56-58).
    */
  def overwriteCurrent(df: DataFrame): Unit =
    df.withColumn("is_current", lit(true))
      .withColumn("updated_at", current_timestamp())
      .write.mode("overwrite").parquet(currentPath)

  /** S6: partitioned batch log — `batch_id=` directories instead of the
    * reference's weather_batch_<ts> collection-per-batch (load.py:64-84).
    * Partition pruning then replaces its newest-collection-by-name scan.
    */
  def appendBatch(df: DataFrame): Unit =
    df.write.mode("append").partitionBy("batch_id").parquet(batchesPath)

  /** S7: stats document append. */
  def appendStats(stats: DataFrame): Unit =
    stats.write.mode("append").parquet(statsPath)

  /** S2 companion: malformed documents kept for inspection (the reference
    * logs-and-skips; quarantining preserves the evidence).
    */
  val quarantinePath = s"$root/quarantine"
  def appendQuarantine(df: DataFrame): Unit =
    df.write.mode("append").parquet(quarantinePath)

  /** S11: predictions append with pred_type metadata (main.py:134-141). */
  def appendPredictions(df: DataFrame, predType: String): Unit =
    df.withColumn("pred_type", lit(predType))
      .write.mode("append").parquet(predictionsPath)

  /** S8/S9: scan a table back (drop of Mongo's _id is structural here —
    * no system column exists to begin with).
    */
  def scan(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(s"$root/$table")

  /** S10: catalog listing (list_collection_names → directory listing). */
  def listTables(): Seq[String] = {
    val dir = new java.io.File(root)
    Option(dir.listFiles()).map(_.filter(_.isDirectory).map(_.getName).sorted.toSeq)
      .getOrElse(Seq.empty)
  }
}
