package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine determinism policy shared by every oracle-checked query.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * declared SQL, so values must match byte-for-byte, not just "close":
  *
  *  - SUM over doubles is order-dependent in the last ulps (Spark sums
  *    per-partition in arbitrary order). We cast to DECIMAL(18,2) first:
  *    decimal addition is exact and associative, so Spark and DuckDB agree
  *    bit-for-bit. Final cast back to DOUBLE for a stable output schema.
  *  - AVG is expressed as exact-decimal SUM / COUNT (double division of two
  *    identical values is deterministic IEEE-754 on both engines).
  *  - Windowed stats over tiny frames (rolling mean/std) stay in doubles but
  *    get round(_, 4) on both sides.
  *  - Every query ends in orderBy over a unique key; Spark's ASC NULLS FIRST
  *    default differs from DuckDB's NULLS LAST, so order keys are non-null.
  *  - md5 is the shared deterministic hash (identical hex on both engines);
  *    Spark xxhash64 / DuckDB hash() do NOT match and never cross the oracle.
  */
object Det {
  /** Exact fixed-point view of a 2-decimal double (prices, quantities). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent exact sum of a 2-decimal double column, as double.
    * DuckDB equivalent: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE).
    */
  def sumExact(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Deterministic average: exact sum / count.
    * DuckDB: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x).
    */
  def avgExact(c: Column): Column = sumExact(c) / count(c)

  /** Exact half-up rounding of a non-negative integer ratio num/den to 4
    * decimals, in pure integer arithmetic. round(double, 4) is NOT
    * engine-portable when the true value sits on a .00005 boundary (Spark
    * rounds the decimal expansion of the double, DuckDB rounds a float-
    * scaled copy — observed divergent at sf0.1). Integer math sidesteps
    * the boundary entirely: floor((num·2·10⁴ + den) / (2·den)) / 10⁴.
    * The final divisions are exact in IEEE754 (integer-valued quotient,
    * then a /10⁴ applied identically on both engines).
    * DuckDB equivalent: ((num*20000 + den) // (2*den)) / 10000.0
    */
  def round4Rat(num: Column, den: Column): Column = {
    val a = num.cast(org.apache.spark.sql.types.LongType) * lit(20000L) +
      den.cast(org.apache.spark.sql.types.LongType)
    val b = den.cast(org.apache.spark.sql.types.LongType) * lit(2L)
    // explicit NULL on a zero denominator: pmod(_, 0) happens to yield NULL
    // in non-ANSI mode, but the oracle side raises on integer-// by zero, so
    // both engines pin the degenerate case as NULL (oracle: NULLIF(den, 0))
    when(den === 0, lit(null).cast(DoubleType)).otherwise(
      // (a - a mod b)/b is an exact integer-valued double division (a div b)
      ((a - pmod(a, b)) / b).cast(org.apache.spark.sql.types.LongType) / lit(10000.0))
  }

  /** [[round4Rat]] for magnitudes past the long/double-exact envelope:
    * `num·20000 + den` overflows Long past num ≈ 4.6e14, and the final
    * integer-valued division leaves double-exact range past 2^53 — at
    * corpus scale (token totals in the trillions) both bite. This
    * variant runs the identical half-up rational rounding in
    * decimal(38,0): exact up to num ≈ 10^33. The decimal quotient is
    * integer-valued and ≤ 20001, so the precision-loss scale Spark
    * assigns to decimal division cannot distort it.
    * DuckDB equivalent: ((CAST(num AS HUGEINT)*20000 + den) // (2*den)) / 10000.0
    */
  def round4RatBig(num: Column, den: Column): Column = {
    val d38 = DecimalType(38, 0)
    val a = num.cast(d38) * lit(20000L).cast(d38) + den.cast(d38)
    val b = den.cast(d38) * lit(2L).cast(d38)
    when(den === 0, lit(null).cast(DoubleType)).otherwise(
      ((a - pmod(a, b)) / b).cast(org.apache.spark.sql.types.LongType) / lit(10000.0))
  }

  /** Integer basis points of a rational: half-up round of 10⁴·num/den as
    * a LONG — [[round4RatBig]] before its final /10⁴, for callers that go
    * on to SUM the rounded terms (per-term BM25 / reciprocal-rank scores).
    * Summing the bp integers is exact and order-independent where summing
    * the /10⁴ doubles would not be; consumers divide once at the end, or
    * keep the integer. Same decimal(38,0) envelope as [[round4RatBig]] on
    * the inputs; the ROUNDED bp itself must fit a long (callers' ratios
    * are bounded scores — BM25 terms, reciprocal ranks — so 10⁴·num/den
    * stays far under 2⁶³; a wider ratio overflows the final cast loudly,
    * never silently).
    * DuckDB equivalent: (CAST(num AS HUGEINT)*20000 + den) // (2*den)
    * (guard the zero denominator with NULLIF(den, 0)).
    */
  def rat4BpBig(num: Column, den: Column): Column = {
    val d38 = DecimalType(38, 0)
    val a = num.cast(d38) * lit(20000L).cast(d38) + den.cast(d38)
    val b = den.cast(d38) * lit(2L).cast(d38)
    when(den === 0, lit(null).cast(org.apache.spark.sql.types.LongType))
      .otherwise(((a - pmod(a, b)) / b).cast(org.apache.spark.sql.types.LongType))
  }

  /** Exact revenue-style product sum: price*(1-discount) computed entirely
    * in decimal, then the exact decimal sum cast to double.
    * DuckDB: CAST(SUM(CAST(p AS DECIMAL(18,2)) * (1 - CAST(d AS DECIMAL(18,2)))) AS DOUBLE).
    */
  def revenueExact(price: Column, discount: Column): Column =
    sum(dec(price) * (lit(1).cast(DecimalType(18, 2)) - dec(discount))).cast(DoubleType)
}
