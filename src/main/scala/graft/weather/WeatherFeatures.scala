package graft.weather

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Time-series feature engineering (SURVEY §2.5 W1-W6 + §2.9 E1): the
  * Spark re-expression of /root/reference/ml/features.py:16-79 with exact
  * pandas-parity semantics:
  *
  *  - rolling(w) has min_periods = w ⇒ partial windows are NULL, not
  *    partial aggregates (features.py:44-46);
  *  - .std() is ddof=1 ⇒ stddev_samp;
  *  - dt.dayofweek is 0=Monday ⇒ `weekday`, NOT Spark's 1=Sunday
  *    `dayofweek`;
  *  - groupby().shift(±k) never crosses city boundaries ⇒ lag/lead over
  *    partitionBy(city) (NULL at partition edges, as NaN is);
  *  - get_dummies(drop_first=True) ⇒ deterministic sorted category order
  *    with the first column dropped.
  *
  * The whole feature lineage is ONE shuffle (hash partition on city) — every
  * window expression shares the same WindowSpec. The reference sorts the
  * entire frame first (features.py:27); the window spec orders within
  * partitions instead, so no global sort exists in the plan.
  */
object WeatherFeatures {

  val lagCols = Seq("temperature", "humidity", "wind_speed", "pressure")
  val defaultLags = Seq(1, 3)
  val defaultRollWindow = 3

  private val byCity: WindowSpec =
    Window.partitionBy("city").orderBy("timestamp")

  /** Rolling aggregate with pandas min_periods=w semantics. */
  private def rolling(agg: Column => Column, c: Column, w: Int): Column = {
    val frame = byCity.rowsBetween(-(w - 1), 0)
    when(count(c).over(frame) >= w, agg(c).over(frame))
  }

  /** Full feature set (features.py:16-79). `inference = true` keeps rows
    * whose target is null (features.py:71-72); training mode drops any row
    * with a null feature or target (features.py:70-77). `lags`/`rollWindow`
    * are the knobs the fallback ladder lightens (training.py:29-40).
    */
  def engineer(df: DataFrame, inference: Boolean = false,
      lags: Seq[Int] = defaultLags, rollWindow: Int = defaultRollWindow): DataFrame = {
    val ts = timestamp_seconds(col("timestamp"))       // features.py:9-13 (coerce ⇒ NULL)
    var out = df
      .withColumn("hour", hour(ts))                    // :30
      .withColumn("dayofweek", weekday(ts))            // :31 (0=Monday)

    for (c <- lagCols; k <- lags)                      // :35-39
      out = out.withColumn(s"${c}_lag$k", lag(col(c), k).over(byCity))

    out = out
      .withColumn("temperature_roll_mean",             // :44
        rolling(avg, col("temperature"), rollWindow))
      .withColumn("temperature_roll_std",              // :45 (ddof=1)
        rolling(stddev_samp, col("temperature"), rollWindow))
      .withColumn("humidity_roll_mean",                // :46
        rolling(avg, col("humidity"), rollWindow))
      .withColumn("target_temp_next",                  // :50 lead(1)
        lead(col("temperature"), 1).over(byCity))
      .withColumn("target_condition", col("weather"))  // :52

    val featureCols = out.columns.filterNot(Seq("description", "weather",
      "target_temp_next", "target_condition", "city", "country", "timestamp").contains)
    if (inference) out                                 // keep-all (features.py:71-72)
    else out.na.drop("any",
      featureCols ++ Seq("target_temp_next", "target_condition")) // :70-77
  }

  /** One-hot encode with pandas get_dummies(drop_first=True) parity
    * (features.py:67): categories sorted, first dropped, boolean dtype.
    * Category lists must be supplied (collected once, sorted) so the output
    * schema is deterministic and identical between train and inference —
    * this deletes the reference's _align_features layer (predict.py:65-88).
    */
  def oneHot(df: DataFrame, cols: Seq[String], categories: Map[String, Seq[String]]): DataFrame =
    cols.foldLeft(df) { (acc, c) =>
      val cats = categories(c).sorted.drop(1) // drop_first=True
      val dummies = cats.map(v => (col(c) === v).as(s"${c}_$v"))
      acc.select(col("*") +: dummies: _*).drop(c)
    }

  /** Collect sorted category values for the one-hot columns (one small
    * distinct aggregation per column; at scale these are low-cardinality
    * dimension attributes). This is the library's one driver-side collect
    * over data-derived values, so it is CAPPED: the probe fetches at most
    * `maxCategories + 1` distinct values and fails loudly past the cap —
    * one-hot over a high-cardinality column would otherwise both OOM the
    * driver here and explode the feature schema downstream.
    */
  def categoryValues(df: DataFrame, cols: Seq[String],
      maxCategories: Int = 1000): Map[String, Seq[String]] =
    cols.map { c =>
      val vals = df.select(col(c).cast("string")).distinct()
        .limit(maxCategories + 1)
        .collect().map(_.getString(0)).filter(_ != null).sorted.toSeq
      require(vals.size <= maxCategories,
        s"column '$c' has more than $maxCategories distinct values — " +
          "not a categorical column; raise maxCategories only if the " +
          "one-hot width is truly intended")
      c -> vals
    }.toMap
}
