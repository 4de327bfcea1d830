package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md and /root/repo/FIXTURES.md §B).
  *
  * All reads go through `spark.read.parquet` so Catalyst gets full
  * filter/column pushdown into the scan; at cluster scale these would be
  * partitioned/bucketed tables behind a catalog, but the read API is the
  * same.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has shipped in three parquet encodings across driver
    * testdata regens; normalize all of them to microsecond TimestampType:
    *
    *  - TIMESTAMP(NANOS): with spark.sql.legacy.parquet.nanosAsLong (set in
    *    [[GraftSession]]) it reads as LongType nanos → integer-divide to µs
    *    (`div`, not `/`: ns epoch values exceed 2^53, double math would
    *    corrupt them).
    *  - tz-naive timestamp[us] (isAdjustedToUTC=false): reads as
    *    TIMESTAMP_NTZ when spark.sql.parquet.inferTimestampNTZType is true
    *    (GraftSession pins it false, but sessions built elsewhere may not)
    *    → cast to TimestampType; with a UTC session TZ the cast is
    *    value-preserving and DuckDB-parity holds.
    *  - tz-aware timestamp[us]: already TimestampType, pass through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view (for the SQL surface). `events`
    * goes through its encoding normalizer so SQL sees microsecond
    * TimestampType no matter how the fixture was written.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
