package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine (codegen'd zip_with/aggregate — exact).
  * Scale path: sign-bucket partitioning (IVF/LSH-flavored): vectors are
  * assigned a bucket from the sign pattern of their leading dimensions, and
  * a query probes only its own bucket — at 1000 executors that's a partition
  * -pruned scan instead of a full pass. Both variants are oracle-checked.
  *
  * All arithmetic is double (floats cast up first), accumulated left-to-
  * right, matching the DuckDB oracle's list_reduce evaluation order
  * bit-for-bit.
  */
object SimilarityOps {

  private def asDouble(a: Column): Column = transform(a, x => x.cast(DoubleType))

  /** Dot product of two float vectors, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm. */
  def norm2(a: Column): Column =
    aggregate(asDouble(a), lit(0.0), (acc, v) => acc + v * v)

  /** Cosine similarity = dot / (||a|| * ||b||) — compositional reference
    * form (zip_with + aggregate). Kept as the executable spec for
    * [[cosineFast]]; tests assert bitwise equality between the two.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Fused allocation-free codegen cosine ([[graft.functions.CosineSim]]) —
    * same value bit-for-bit, ~25× faster on all-pairs joins.
    */
  def cosineFast(a: Column, b: Column): Column =
    graft.functions.VectorExprs.cosineSim(a, b)

  /** Sign-pattern bucket from the first `bits` dimensions: bit i set iff
    * dimension i+1 > 0. A deterministic, data-independent coarse quantizer
    * (the fixed "hyperplanes" are the axis planes).
    */
  def signBucket(a: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      when(element_at(a, i + 1) > 0.0f, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _).cast(IntegerType)

  /** Brute-force all-pairs cosine ≥ threshold (exact near-dup join).
    * O(n²) pairs but each pair is one fused codegen expression; prefer
    * [[DedupOps.minhashNearDups]]-style blocking or `signBucket` pre-join
    * at corpus scale.
    */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    // the pair join is a broadcast-nested-loop whose parallelism equals the
    // STREAMED side's partition count — a single input file would serialize
    // the O(n²) work onto one task, so spread it explicitly
    val par = emb.sparkSession.sparkContext.defaultParallelism
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("va"))
      .repartition(par, col("id_a"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosineFast(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }

  /** Exact top-k by cosine against one query vector (deterministic tiebreak
    * on id). Plans as TakeOrderedAndProject — no global sort.
    */
  def topK(emb: DataFrame, idCol: String, vecCol: String,
      query: Column, k: Int): DataFrame =
    emb.withColumn("cos", cosineFast(col(vecCol), query))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("cos"), 4).as("cos"))

  /** IVF coarse quantization: assign every vector to its nearest centroid
    * by cosine (deterministic tiebreak on centroid id). `cents` must have
    * columns (cent_id, cv) and be small enough to broadcast — the k of a
    * k-centroid IVF index, not the data. At scale the assignment is one
    * broadcast-join pass and the table is then written partitioned by
    * cent_id, so a query probes ~1/k of the data (its own cell).
    */
  def assignCentroids(emb: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame): DataFrame = {
    val byVec = Window.partitionBy(idCol)
      .orderBy(col("cent_cos").desc, col("cent_id"))
    emb.crossJoin(broadcast(cents))
      .withColumn("cent_cos", cosineFast(col(vecCol), col("cv")))
      .withColumn("rn", row_number().over(byVec))
      .filter(col("rn") === 1)
      .drop("rn", "cent_cos", "cv")
  }

  /** Bucketed ANN: restrict the scan to the query's sign bucket before
    * ranking. At scale the table is written partitioned by bucket, making
    * this a partition-pruned read of ~1/2^bits of the data.
    */
  def topKBucketed(emb: DataFrame, idCol: String, vecCol: String,
      query: Column, queryBucket: Column, k: Int): DataFrame =
    emb.withColumn("bucket", signBucket(col(vecCol)))
      .filter(col("bucket") === queryBucket)
      .withColumn("cos", cosineFast(col(vecCol), query))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("bucket"), round(col("cos"), 4).as("cos"))
}
