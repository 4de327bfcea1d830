package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** S12: seeded synthetic weather batches (SURVEY §2.1), matching the value
  * distributions of /root/reference/demo_pipeline.py:12-38 but fully
  * deterministic: every "random" draw is a hash of (city, step, seed, tag),
  * so results are identical regardless of partitioning or retry — the
  * reference's generator is unseeded (SURVEY §5.1) and ours must not be.
  *
  * Generation is `spark.range`-based: distributed, no driver-side loops,
  * linear in rows at any scale.
  */
object SyntheticWeather {

  val cities: Seq[String] = Seq("Mumbai", "Delhi", "London", "Paris", "Tokyo",
    "Sydney", "Cairo", "Lagos", "Lima", "Oslo")
  val conditions: Seq[String] = Seq("Clear", "Clouds", "Mist", "Rain", "Thunderstorm")
  val intensities: Seq[String] = Seq("heavy", "light", "moderate")

  /** Uniform [0,1) draw keyed by (city, step, seed, tag). */
  private def u(tag: Int) =
    (pmod(xxhash64(col("city"), col("step"), lit(tag)), lit(1000000L)).cast("double")
      / 1000000.0)

  /** `nSteps` observations per city, `stepSeconds` apart, starting at
    * `baseEpoch`. Columns match the canonical record schema exactly.
    */
  def batches(spark: SparkSession, nSteps: Int, stepSeconds: Long = 300L,
      seed: Long = 42L, baseEpoch: Long = 1756909800L): DataFrame = {
    import spark.implicits._
    val cityDf = cities.toDF("city")
    val steps = spark.range(nSteps).select((col("id") + seed * 1000000).as("step"))
    cityDf.crossJoin(steps)
      .withColumn("country", lit("XX"))
      // demo_pipeline.py:27: base U(15,40) + variation U(-5,5)
      .withColumn("temperature", round(lit(15.0) + u(1) * 25.0 + (u(2) * 10.0 - 5.0), 2))
      .withColumn("feels_like", round(col("temperature") + u(3) * 4.0 - 2.0, 2))
      .withColumn("humidity", (lit(40) + u(4) * 50.0).cast(IntegerType))   // U(40,90)
      .withColumn("pressure", (lit(1000) + u(5) * 20.0).cast(IntegerType)) // U(1000,1020)
      .withColumn("weather",
        element_at(typedLit(conditions), (u(6) * conditions.size).cast(IntegerType) + 1))
      .withColumn("description",
        concat(element_at(typedLit(intensities), (u(7) * 3).cast(IntegerType) + 1),
          lit(" "), lower(col("weather"))))
      .withColumn("wind_speed", round(lit(1.0) + u(8) * 14.0, 2))          // U(1,15)
      .withColumn("timestamp",
        lit(baseEpoch) + (col("step") - seed * 1000000) * stepSeconds)
      .drop("step")
  }
}
