package graft.weather

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Facade over the weather pipeline — the engine-native equivalent of the
  * reference's 11 FastAPI endpoints (SURVEY §2.12, main.py): runEtl ≙
  * run-etl-mongodb; latest ≙ the top-k scan feeding the predict endpoints;
  * query ≙ weather-data/collection; listTables ≙ collections.
  *
  * The ETL path (SURVEY §3.1) is: flatten → CSV export + 3-way parquet
  * fan-out + stats doc, all from ONE cached lineage — the reference re-reads
  * and re-materializes at every step.
  */
class WeatherEngine(spark: SparkSession, tablesRoot: String) {
  val sinks = new WeatherSinks(tablesRoot)

  /** Run one ETL batch over already-flattened records.
    * `clock` pins batch identity for determinism (tests inject a fixed one;
    * production passes current_timestamp()).
    */
  def runEtl(records: DataFrame, clock: org.apache.spark.sql.Column): DataFrame = {
    val stamped = WeatherTransform.withBatchMetadata(records, clock).cache()
    try {
      val batchId = stamped.select(col("batch_id")).head().getString(0)
      sinks.saveCsv(records, batchId)                       // S3
      sinks.appendRaw(stamped)                              // S4
      sinks.overwriteCurrent(stamped)                       // S5
      sinks.appendBatch(stamped)                            // S6
      val stats = WeatherStats.fullStatsDoc(stamped, lit(batchId), clock)
      sinks.appendStats(stats)                              // S7
      stats
    } finally stamped.unpersist()
  }

  /** Run one ETL batch from raw nested JSON documents. */
  def runEtlFromJson(rawJson: DataFrame, clock: org.apache.spark.sql.Column): DataFrame =
    runEtl(WeatherTransform.flatten(rawJson), clock)

  /** Newest `limit` rows by observation time (main.py:130's
    * sort_values('timestamp').tail(limit), planned as TakeOrderedAndProject
    * — never a full sort).
    */
  def latest(table: String, limit: Int): DataFrame =
    sinks.scan(spark, table)
      .orderBy(col("timestamp").desc)
      .limit(limit)

  /** Predicate scan of a stored table (load.py:129-154 — but with pushdown:
    * the filter reaches the parquet reader).
    */
  def query(table: String, predicate: Option[String] = None): DataFrame = {
    val df = sinks.scan(spark, table)
    predicate.map(df.filter).getOrElse(df)
  }

  def listTables(): Seq[String] = sinks.listTables()
}
