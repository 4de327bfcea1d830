package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M8/M9: versioned model store + stage promotion (SURVEY §2.10), replacing
  * the reference's MLflow registry (ml/registry.py) with a metadata table +
  * versioned paths. Best-run selection is the O5 argmin/argmax idiom
  * (registry.py:23-28: order by metric, take first).
  */
class ModelRegistry(spark: SparkSession, root: String) {
  private val metaPath = s"$root/_registry"

  private def metadata(): Option[DataFrame] =
    if (new java.io.File(metaPath).exists())
      Some(spark.read.parquet(metaPath))
    else None

  /** Next version number for a model name. */
  private def nextVersion(name: String): Int =
    metadata()
      .map(_.filter(col("name") === name)
        .agg(coalesce(max(col("version")), lit(0))).head().getInt(0) + 1)
      .getOrElse(1)

  /** Save a fitted model with its metrics; returns the version. */
  def save(name: String, model: PipelineModel, metrics: Map[String, Double],
      stage: String = "Staging"): Int = {
    import spark.implicits._
    val v = nextVersion(name)
    model.write.overwrite().save(s"$root/$name/v$v")
    Seq((name, v, stage, metrics.getOrElse("rmse", Double.NaN),
      metrics.getOrElse("f1", Double.NaN), System.nanoTime()))
      .toDF("name", "version", "stage", "rmse", "f1", "saved_at")
      .write.mode("append").parquet(metaPath)
    v
  }

  /** Best version by a metric (registry.py:23-28: lower-is-better for rmse,
    * higher for f1); deterministic tiebreak on newest version.
    */
  def bestVersion(name: String, metric: String, ascending: Boolean): Option[Int] =
    metadata().flatMap { m =>
      val ord = if (ascending) col(metric).asc else col(metric).desc
      m.filter(col("name") === name && !isnan(col(metric)))
        .orderBy(ord, col("version").desc)
        .limit(1).collect().headOption.map(_.getAs[Int]("version"))
    }

  /** Promote a version to a stage (registry.py:30-44) by appending the new
    * stage row (latest row per version wins on read).
    */
  def promote(name: String, version: Int, stage: String = "Production"): Unit = {
    import spark.implicits._
    Seq((name, version, stage, Double.NaN, Double.NaN, System.nanoTime()))
      .toDF("name", "version", "stage", "rmse", "f1", "saved_at")
      .write.mode("append").parquet(metaPath)
  }

  /** Per-fold artifact logging (training.py:99-142: MLflow logs each CV
    * fold's metrics under the run) — one row per (version, fold, metric) in
    * a `_folds` table beside the registry metadata, so a run's full fold
    * history survives and is queryable like any other table.
    */
  def logFolds(name: String, version: Int,
      folds: Seq[Map[String, Double]]): Unit = {
    import spark.implicits._
    val rows = for ((fold, i) <- folds.zipWithIndex; (metric, value) <- fold.toSeq)
      yield (name, version, i, metric, value, System.nanoTime())
    if (rows.nonEmpty)
      rows.toDF("name", "version", "fold", "metric", "value", "logged_at")
        .write.mode("append").parquet(s"$root/_folds")
  }

  /** Fold history for a run: (fold, metric, value), fold-ordered. */
  def foldHistory(name: String, version: Int): DataFrame = {
    require(new java.io.File(s"$root/_folds").exists(),
      s"no fold history under $root")
    spark.read.parquet(s"$root/_folds")
      .filter(col("name") === name && col("version") === version)
      .select("fold", "metric", "value")
      .orderBy("fold", "metric")
  }

  /** Load with stage fallback (predict.py:18-43: Production → latest). */
  def load(name: String, preferStage: String = "Production"): Option[PipelineModel] =
    metadata().flatMap { m =>
      val mine = m.filter(col("name") === name)
      // newest row per version defines its current stage
      val current = mine.groupBy("version")
        .agg(max(struct(col("saved_at"), col("stage"))).as("s"))
        .select(col("version"), col("s.stage").as("stage"))
      val staged = current.filter(col("stage") === preferStage)
        .orderBy(col("version").desc).limit(1).collect().headOption
      val any = current.orderBy(col("version").desc).limit(1).collect().headOption
      staged.orElse(any).map(r =>
        PipelineModel.load(s"$root/$name/v${r.getAs[Int]("version")}"))
    }
}
