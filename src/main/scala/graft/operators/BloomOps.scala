package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Bloom-filter runtime pruning for semi joins (the explicit, deterministic
  * form of Spark's own `InjectRuntimeFilter` rewrite).
  *
  * The 100 TB problem this solves: a selective dimension (say 10M surviving
  * keys) is far too large for a broadcast-hash semi join (Spark caps
  * broadcasts well below that), so the planner sort-merge-joins — shuffling
  * the ENTIRE fact table even though <1% of it survives. A bloom filter of
  * the 10M keys is ~10 bits/key ≈ 16 MB — broadcastable — and filters the
  * fact table BEFORE its shuffle, cutting shuffle bytes by the join
  * selectivity at the cost of one tiny pre-aggregation on the dim.
  *
  * The filter is built distributed (xxhash64 → bitwise ops → `bit_or`
  * aggregate), then the finished bit array — numBits/64 longs, KBs at the
  * default and 16 MB at the 10M-key setting — is materialized once and
  * inlined into the probe as a SINGLE array literal. That is the same
  * value-materialization Spark's runtime filter performs when it evaluates
  * the bloom subquery and ships the result into the probe side; a literal
  * (rather than a scalar subquery per hash, or a broadcast cross join)
  * keeps the probe a plain codegen'd Filter sitting directly on the fact
  * scan, where no join reorder can lift it above the shuffle it prunes —
  * Catalyst's `PushDownLeftSemiAntiJoin` legally hoisted a cross-join form
  * of this probe ABOVE the semi join, running the exact join first and
  * pruning nothing (BloomSpec pins the corrected shape).
  *
  * False positives are removed by the exact join that follows, so the
  * composed operator is semantically IDENTICAL to
  * `fact.join(dim, key, "left_semi")` — which is exactly what the x51
  * oracle asserts (the bloom never touches the result, only the plan).
  */
object BloomOps {

  /** Per-hash bit position: xxhash64(key, seed) mod numBits. xxhash64 is
    * deterministic and partition-independent, so the filter (and every
    * plan decision downstream of it) is reproducible run to run.
    */
  private def bitPos(key: Column, seed: Int, numBits: Int): Column =
    pmod(xxhash64(key, lit(seed)), lit(numBits.toLong))

  private def require64(numBits: Int, numHashes: Int): Unit = {
    require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64: $numBits")
    require(numHashes > 0 && numHashes <= 16, s"numHashes must be in [1,16]: $numHashes")
  }

  /** Build the bloom as a ONE-ROW frame holding word-index → 64-bit word
    * (`map<int,bigint>`). Sparse map, not a dense array: only words with
    * set bits appear, so an almost-empty filter costs almost nothing.
    */
  def buildBloom(dim: DataFrame, dimKey: String, numBits: Int,
                 numHashes: Int): DataFrame = {
    require64(numBits, numHashes)
    val k = dim.select(col(dimKey).as("__k")).where(col("__k").isNotNull)
    val entries = k.select(explode(array((0 until numHashes).map { s =>
      bitPos(col("__k"), s, numBits)
    }: _*)).as("__pos"))
    entries
      .select((col("__pos") / 64).cast(IntegerType).as("__word"),
        call_function("shiftleft", lit(1L), pmod(col("__pos"), lit(64L)).cast(IntegerType)).as("__mask"))
      .groupBy("__word").agg(bit_or(col("__mask")).as("__bits"))
      .agg(map_from_entries(collect_list(struct(col("__word"), col("__bits")))).as("__bloom"))
  }

  /** [[buildBloom]], materialized to the dense bit array the probe inlines.
    * The collect is the filter itself — numBits/64 longs, bounded by the
    * caller's sizing choice, never by the data.
    */
  def buildBloomArray(dim: DataFrame, dimKey: String, numBits: Int,
                      numHashes: Int): Array[Long] = {
    require64(numBits, numHashes)
    val dense = new Array[Long](numBits / 64)
    val sparse = buildBloom(dim, dimKey, numBits, numHashes)
      .select(explode(map_entries(col("__bloom"))).as("e"))
      .select(col("e.key"), col("e.value")).collect()
    sparse.foreach(r => dense(r.getInt(0)) |= r.getLong(1))
    dense
  }

  /** Probe against the sparse 1-row-frame form (map column): all
    * `numHashes` bits set. Missing words (coalesce 0) fail the probe, so
    * an empty dim yields an everywhere-false filter.
    */
  def mightContain(key: Column, bloom: Column, numBits: Int,
                   numHashes: Int): Column =
    (0 until numHashes).map { s =>
      val pos = bitPos(key, s, numBits)
      val word = (pos / 64).cast(IntegerType)
      val mask = call_function("shiftleft", lit(1L), pmod(pos, lit(64L)).cast(IntegerType))
      coalesce(element_at(bloom, word), lit(0L)).bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)

  /** Probe against the dense literal form (1-indexed `element_at`). One
    * ArrayType literal holds the whole filter — data, not expression tree,
    * so codegen stays flat regardless of `numBits`.
    */
  def mightContainArray(key: Column, bits: Array[Long], numBits: Int,
                        numHashes: Int): Column = {
    val arr = typedLit(bits.toSeq)
    (0 until numHashes).map { s =>
      val pos = bitPos(key, s, numBits)
      val word = (pos / 64).cast(IntegerType)
      val mask = call_function("shiftleft", lit(1L), pmod(pos, lit(64L)).cast(IntegerType))
      element_at(arr, word + 1).bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)
  }

  /** Left-semi join with bloom pre-pruning of the fact side. Result is
    * provably equal to the plain semi join; the win is plan-shaped — the
    * fact table is filtered BEFORE its shuffle. `numBits` sizing: ~10 bits
    * per distinct dim key gives <1% false positives at `numHashes`=5
    * (2^27 bits = 16 MB covers ~13M keys). Building the filter runs the
    * dim-side aggregation eagerly (one small job), like every runtime
    * filter does.
    */
  def prunedLeftSemi(fact: DataFrame, factKey: String, dim: DataFrame,
                     dimKey: String, numBits: Int = 1 << 16,
                     numHashes: Int = 5): DataFrame = {
    val bits = buildBloomArray(dim, dimKey, numBits, numHashes)
    val pruned = fact.where(col(factKey).isNotNull &&
      mightContainArray(col(factKey), bits, numBits, numHashes))
    pruned.join(dim.select(col(dimKey)).where(col(dimKey).isNotNull),
      pruned(factKey) === col(dimKey), "left_semi")
  }
}
