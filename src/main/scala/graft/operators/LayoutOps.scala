package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton curve) data layout for multi-dimensional scan pruning.
  *
  * At 100 TB a table is pruned at two granularities: partition directories
  * (coarse, one column) and parquet row-group min/max stats (fine, any
  * column — but only useful if values are CLUSTERED within files). Sorting
  * by one column gives perfect clustering on that column and none on any
  * other; interleaving the bits of two (or more) quantized columns gives
  * every file a tight bounding BOX in all dimensions at once, so a
  * predicate on either column — or both — skips most row groups.
  *
  * Everything here is map-side arithmetic over a broadcast 1-row min/max
  * frame: no global sort, no window, no shuffle beyond the final
  * `repartitionByRange` that materializes the layout (which any layout
  * rewrite needs). That is the property that survives a 100× scale-up —
  * rank-based quantization (ntile) would need a global sort just to bucket.
  *
  * Bit-spreading uses the classic portable magic-shift sequence, exactly
  * expressible in both Spark and DuckDB SQL (shifts + bitwise and/or), so
  * the z-key itself is oracle-checkable bit-for-bit (query x50).
  */
object LayoutOps {

  /** Spread the low 16 bits of `c` to the even bit positions of a 32-bit
    * value (0bxyz → 0b0x0y0z). Four magic-shift steps, all in Long
    * arithmetic so Spark and DuckDB agree exactly.
    */
  def spread16(c: Column): Column = {
    val x0 = c.cast(LongType).bitwiseAND(lit(0xFFFFL))
    val x1 = (x0.bitwiseOR(shiftleft(x0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
    (x3.bitwiseOR(shiftleft(x3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton interleave of two ≤16-bit bucket ids: a occupies even bits,
    * b odd bits. Monotone in the Z-curve order.
    */
  def zorderKey(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Reference bit-interleave on the driver (spec parity check). */
  def zorderKeyRef(a: Int, b: Int): Long = {
    def spread(v: Long): Long = {
      var x = v & 0xFFFFL
      x = (x | (x << 8)) & 0x00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0FL
      x = (x | (x << 2)) & 0x33333333L
      (x | (x << 1)) & 0x55555555L
    }
    spread(a.toLong) | (spread(b.toLong) << 1)
  }

  /** Exact floor-division bucket of a non-negative offset: given global
    * `mn`/`mx` for the column, maps values into [0, buckets). Uses the
    * pmod idiom from [[graft.queries.Det]] so the integer division is
    * bit-exact on both engines (DuckDB: `((c - mn) * buckets) // span`).
    */
  def minMaxBucket(c: Column, mn: Column, mx: Column, buckets: Int): Column = {
    val a = (c.cast(LongType) - mn.cast(LongType)) * lit(buckets.toLong)
    val b = mx.cast(LongType) - mn.cast(LongType) + lit(1L)
    ((a - pmod(a, b)) / b).cast(LongType)
  }

  /** Add `zkey` over two numeric columns, bucketized to `buckets` cells per
    * dimension via one global min/max aggregate (broadcast 1-row frame —
    * no sort, no window; the 100 TB-safe quantization). With `keepBuckets`
    * the per-dimension cell ids survive as `zb_a`/`zb_b` (layout audits).
    */
  def withZKey(df: DataFrame, colA: String, colB: String,
               buckets: Int = 256, keepBuckets: Boolean = false): DataFrame = {
    require(buckets > 0 && buckets <= 65536, s"buckets must be in (0, 65536]: $buckets")
    val bounds = df.agg(
      min(col(colA)).as("__mna"), max(col(colA)).as("__mxa"),
      min(col(colB)).as("__mnb"), max(col(colB)).as("__mxb"))
    val j = df.crossJoin(broadcast(bounds))
    val z = j.withColumn("zb_a", minMaxBucket(col(colA), col("__mna"), col("__mxa"), buckets))
      .withColumn("zb_b", minMaxBucket(col(colB), col("__mnb"), col("__mxb"), buckets))
      .withColumn("zkey", zorderKey(col("zb_a"), col("zb_b")))
      .drop("__mna", "__mxa", "__mnb", "__mxb")
    if (keepBuckets) z else z.drop("zb_a", "zb_b")
  }

  /** Materialize a Z-ordered layout: range-partition on the z-key into
    * `numFiles` output files, sort within each, write parquet. Row groups
    * inside every file then carry tight min/max boxes on BOTH layout
    * columns, so either-column predicates prune.
    */
  def writeZOrdered(df: DataFrame, colA: String, colB: String, path: String,
                    numFiles: Int, buckets: Int = 256): Unit =
    withZKey(df, colA, colB, buckets)
      .repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions("zkey")
      .drop("zkey")
      .write.mode("overwrite").parquet(path)
}
