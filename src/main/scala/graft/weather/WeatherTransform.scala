package graft.weather

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The flatten transform (SURVEY §2.2 P1/P2): nested JSON documents → the
  * canonical flat record, with the exact column mapping of
  * /root/reference/transform.py:8-19.
  *
  * Spark-first: this is a single `select` of struct-field and array-element
  * projections over a `from_json` column — all codegen'd, no UDF, no
  * driver-side loop (the reference iterates dicts in Python).
  */
object WeatherTransform {

  /** Flatten a DataFrame holding one raw JSON document per row in `jsonCol`. */
  def flatten(raw: DataFrame, jsonCol: String = "json"): DataFrame = {
    val doc = from_json(col(jsonCol), WeatherSchema.rawJson)
    raw.select(
      doc.getField("name").as("city"),                                  // transform.py:9
      doc.getField("sys").getField("country").as("country"),            // :10
      doc.getField("main").getField("temp").as("temperature"),          // :11
      doc.getField("main").getField("feels_like").as("feels_like"),     // :12
      doc.getField("main").getField("humidity").as("humidity"),         // :13
      doc.getField("main").getField("pressure").as("pressure"),         // :14
      element_at(doc.getField("weather"), 1).getField("main").as("weather"),           // :15
      element_at(doc.getField("weather"), 1).getField("description").as("description"), // :16
      doc.getField("wind").getField("speed").as("wind_speed"),          // :17
      doc.getField("dt").as("timestamp"))                               // :18
  }

  /** S2: split a flattened batch into (good, quarantine). The reference
    * logs-and-skips failed records (extract.py:19-20); here a malformed
    * document flattens to an all-null row (PERMISSIVE from_json), and the
    * quarantine keeps it for inspection instead of dropping it silently.
    */
  def quarantine(flat: DataFrame): (DataFrame, DataFrame) = {
    val bad = col("city").isNull || col("timestamp").isNull
    (flat.filter(!bad), flat.filter(bad))
  }

  /** Read a captured flat CSV batch (header row, declared schema — the
    * reference's golden outputs, e.g. data/weather_data_20250903_200821.csv).
    */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(WeatherSchema.record)
      .csv(path)

  /** Load-time metadata columns (load.py:31-32): a batch id + insertion
    * timestamp. `clock` is injected for determinism (SURVEY §7.3.2 —
    * the reference stamps wall-clock time; tests pin it).
    */
  def withBatchMetadata(df: DataFrame, clock: org.apache.spark.sql.Column): DataFrame =
    df.withColumn("inserted_at", clock)
      .withColumn("batch_id", date_format(clock, "yyyyMMdd_HHmmss"))
}
