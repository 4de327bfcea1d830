package graft.weather

/** Static configuration parity with /root/reference/config.py: the 50-city
  * fetch list (config.py:11-22), table names (collection names,
  * config.py:31-36), model names (config.py:39-41), and the 5-minute
  * reprocessing cadence (ml/scheduler.py:49). Environment-dependent secrets
  * (API keys, connection strings) are intentionally absent — sources here
  * are parquet/JSON/CSV, not HTTP+Mongo.
  */
object WeatherConfig {
  /** The reference's fetch list. Note the API canonicalizes some names in
    * responses ("Bangalore"→"Bengaluru", "Kiev"→"Kyiv" — SURVEY §5.1), so
    * this list keys the FETCH, not the stored `city` column.
    */
  val cities: Seq[String] = Seq(
    "New York", "London", "Tokyo", "Paris", "Sydney",
    "Mumbai", "Delhi", "Bangalore", "Chennai", "Kolkata",
    "Moscow", "Beijing", "Shanghai", "Los Angeles", "Chicago",
    "Toronto", "Mexico City", "Sao Paulo", "Buenos Aires", "Cairo",
    "Lagos", "Nairobi", "Johannesburg", "Dubai", "Istanbul",
    "Madrid", "Rome", "Berlin", "Amsterdam", "Stockholm",
    "Oslo", "Helsinki", "Warsaw", "Prague", "Vienna",
    "Budapest", "Bucharest", "Athens", "Lisbon", "Dublin",
    "Edinburgh", "Brussels", "Zurich", "Geneva", "Copenhagen",
    "Singapore", "Hong Kong", "Seoul", "Bangkok", "Kiev")

  val rawTable = "raw_weather_data"
  val currentTable = "current_weather"
  val batchesTable = "weather_batches"
  val statsTable = "weather_statistics"
  val predictionsTable = "predictions"

  val tempModelName = "temp_rf"
  val conditionModelName = "cond_rf"

  /** scheduler.py:49: APScheduler interval minutes=5. */
  val reprocessInterval = "5 minutes"
}
