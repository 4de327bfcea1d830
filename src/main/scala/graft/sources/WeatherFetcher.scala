package graft.sources

import graft.weather.{WeatherSinks, WeatherTransform}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The injectable HTTP seam behind S1 live ingestion. The engine ships the
  * whole fetch LOOP (scheduling, per-city error tolerance, flatten,
  * quarantine, sink fan-out — extract.py:4-22 + main.py's cadence) as
  * tested surface; this trait is the one line a deployment provides, e.g.
  * a `java.net.http.HttpClient` GET against the weather API. It exists as
  * a seam because the build/test sandbox has zero egress — the loop is
  * testable end to end with a stub client, which is exactly how the spec
  * drives it.
  */
trait FetchClient extends Serializable {
  /** One city's raw JSON document, or Left(reason) on failure. */
  def fetch(city: String): Either[String, String]
}

/** S1: scheduled live-source ingestion as a Structured Streaming
  * `foreachBatch` loop. Each trigger tick fetches every configured city
  * through the [[FetchClient]], flattens the JSON (P1/P2), splits off the
  * quarantine (S2 — malformed documents are kept, not dropped), and fans
  * the good rows out to the raw log + current snapshot (S4/S5).
  *
  * The per-tick fetch runs on the driver, like the reference's loop: the
  * city list is configuration-sized (dozens), not data — the fetched batch
  * immediately becomes a distributed DataFrame for everything downstream.
  * Per-city failures are logged and skipped (extract.py:19-20); a whole
  * failed tick is logged and the stream continues (T7).
  */
object WeatherFetcher {

  /** One tick of the loop, standalone: fetch every city, flatten, split
    * into (good, quarantine). Also the unit a one-shot batch ingest calls.
    */
  def fetchBatch(spark: SparkSession, cities: Seq[String],
      client: FetchClient): (DataFrame, DataFrame) = {
    import spark.implicits._
    val (errs, docs) = cities.map(c => c -> client.fetch(c)).partitionMap {
      case (c, Left(err))   => Left(c -> err)
      case (_, Right(json)) => Right(json)
    }
    errs.foreach { case (c, e) =>
      System.err.println(s"[fetch] $c failed: $e") } // log-and-skip
    WeatherTransform.quarantine(WeatherTransform.flatten(docs.toDF("json")))
  }

  /** Start the scheduled fetch loop. `ticks` injects the trigger stream
    * (tests drive it with a MemoryStream); None uses the rate source with
    * the trigger supplying the reference's 5-minute cadence (T1).
    */
  def start(spark: SparkSession, cities: Seq[String], client: FetchClient,
      sinks: WeatherSinks, trigger: Trigger = Trigger.ProcessingTime(0),
      ticks: Option[DataFrame] = None): StreamingQuery = {
    val tickStream = ticks.getOrElse(
      spark.readStream.format("rate").option("rowsPerSecond", "1").load())
    tickStream.writeStream
      .queryName("weather-fetch")
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (_: Dataset[Row], batchId: Long) =>
        try {
          val (good, bad) = fetchBatch(spark, cities, client)
          val stamp = (df: DataFrame) => df
            .withColumn("batch_id", format_string("batch_%06d", lit(batchId)))
            .withColumn("inserted_at", current_timestamp())
          if (!bad.isEmpty) sinks.appendQuarantine(stamp(bad))
          if (!good.isEmpty) {
            val g = stamp(good).persist()
            try {
              sinks.appendRaw(g)
              sinks.overwriteCurrent(g)
            } finally g.unpersist()
          }
        } catch { // T7: log-and-continue
          case e: Exception =>
            System.err.println(s"[fetch] tick $batchId failed: ${e.getMessage}")
        }
      }
      .start()
  }
}
