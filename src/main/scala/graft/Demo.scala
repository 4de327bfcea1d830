package graft

import org.apache.spark.sql.functions._
import graft.sources.SyntheticWeather
import graft.weather.WeatherEngine

/** Runnable end-to-end smoke (the engine-native demo_pipeline.py): synthetic
  * batches → ETL fan-out → train → predict → evaluate → promote, printing a
  * summary. Unlike the reference's demo (unseeded, assert-free,
  * demo_pipeline.py:40-127) this is deterministic and exits non-zero on any
  * violated invariant.
  *
  * Run: tools/run_main.sh graft.Demo [workDir]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString)
    val spark = GraftSession.build("graft-demo")
    val engine = new WeatherEngine(spark, root)

    println(s"== graft demo (tables at $root) ==")
    val all = SyntheticWeather.batches(spark, 30)
    for (b <- 0 until 3) {
      val batch = all.filter(col("timestamp").between(
        1756909800L + b * 10 * 300, 1756909800L + (b * 10 + 9) * 300))
      val stats = engine.runEtl(batch,
        lit(s"2025-09-0${b + 1} 00:00:00").cast("timestamp")).head()
      println(f"batch ${b + 1}: ${stats.getAs[Long]("total_records")}%3d records, " +
        f"avg temp ${stats.getAs[Double]("avg_temperature")}%6.2f, " +
        s"cities ${stats.getAs[Long]("cities_count")}")
    }
    require(engine.query("raw_weather_data").count() == 300, "raw log size")
    require(engine.query("current_weather").count() == 100, "snapshot size")

    val folds = engine.train(numTrees = 20, nSplits = 3)
    println(s"train: ${folds.size} CV folds, rmse = " +
      folds.map(f => f"${f("rmse")}%.2f").mkString(", "))

    val preds = engine.predictTemp(limit = 50)
    println(s"predict/temp: ${preds.count()} predictions")
    preds.orderBy(col("timestamp").desc).show(5, truncate = false)

    val m = engine.evaluate(limit = 200)
    println(f"monitor/eval: mae=${m("mae")}%.2f rmse=${m("rmse")}%.2f")
    require(m("rmse") > 0 && !m("rmse").isNaN, "finite rmse")

    val promoted = engine.promoteBest()
    println(s"registry/promote: version $promoted -> Production")
    require(promoted.isDefined, "promotion")

    // ---- training-data pipeline ops over the fixture corpus ----
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sfDir)
    val dups = graft.operators.DedupOps.minhashNearDups(docs, "text", "doc_id", 0.8)
    val keep = graft.operators.DedupOps.survivors(docs, dups, "doc_id")
    val (nDocs, nKeep) = (docs.count(), keep.count())
    println(s"dedup: $nDocs docs, ${dups.count()} near-dup pairs, $nKeep survivors")
    require(nKeep < nDocs, "planted dups must be removed")
    println("train/val/test split (md5-deterministic):")
    SparkEntry.queries("x16_hash_split")(spark, sfDir)
      .groupBy("split").agg(sum("n_docs").as("n")).orderBy("split")
      .show(truncate = false)
    println("kNN label vote for query vector 0:")
    SparkEntry.queries("x18_knn_vote")(spark, sfDir).show(truncate = false)

    println("== demo OK ==")
    spark.stop()
  }
}
