package graft.weather

import org.apache.spark.sql.types._

/** Declared schemas for the weather domain (SURVEY §1.2-1.4). The reference
  * infers schema dynamically everywhere (no declaration exists in it); we fix
  * it by construction, which deletes its defensive re-coercion layer
  * (/root/reference/ml/training.py:154-157, ml/predict.py:65-88).
  */
object WeatherSchema {

  /** The canonical flat weather record — column-for-column the output of
    * the reference's flatten (/root/reference/transform.py:8-19).
    */
  val record: StructType = StructType(Seq(
    StructField("city", StringType, nullable = false),
    StructField("country", StringType),
    StructField("temperature", DoubleType),
    StructField("feels_like", DoubleType),
    StructField("humidity", IntegerType),
    StructField("pressure", IntegerType),
    StructField("weather", StringType),
    StructField("description", StringType),
    StructField("wind_speed", DoubleType),
    StructField("timestamp", LongType) // Unix epoch seconds (features.py:7)
  ))

  /** Schema of the raw nested OpenWeather JSON document the flatten consumes
    * (the nested-object + nested-array shape of /root/reference/transform.py:
    * item["main"]["temp"], item["sys"]["country"], item["weather"][0]["main"]).
    */
  val rawJson: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("dt", LongType),
    StructField("sys", StructType(Seq(
      StructField("country", StringType)))),
    StructField("main", StructType(Seq(
      StructField("temp", DoubleType),
      StructField("feels_like", DoubleType),
      StructField("humidity", IntegerType),
      StructField("pressure", IntegerType)))),
    StructField("weather", ArrayType(StructType(Seq(
      StructField("main", StringType),
      StructField("description", StringType))))),
    StructField("wind", StructType(Seq(
      StructField("speed", DoubleType))))
  ))
}

/** Typed view of the canonical record for Dataset[WeatherRecord] APIs. */
case class WeatherRecord(
  city: String, country: String,
  temperature: Double, feels_like: Double,
  humidity: Int, pressure: Int,
  weather: String, description: String,
  wind_speed: Double, timestamp: Long)
