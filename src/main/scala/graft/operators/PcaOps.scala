package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Distributed PCA over embedding columns — the third member of the
  * embedding-compression family (scalar quantization: `SimilarityOps`,
  * data-oblivious JL projection: x59): a DATA-AWARE orthogonal
  * projection onto the top-k covariance eigendirections, the standard
  * pre-step before low-dim ANN indexing and the whitening step of
  * SemDeDup-style semantic curation.
  *
  * Architecture (the 100 TB shape):
  *  - the corpus-sized work is TWO exact integer aggregations — the
  *    per-dimension sums and the upper-triangle Gram matrix of
  *    fixed-point-quantized coordinates (`floor(x·scale)`, the
  *    engine-portable quantizer used across this codebase). Products
  *    and sums are integers in decimal(38,0): exact, order-independent,
  *    and map-side combinable, so each task emits at most d(d+1)/2
  *    combiner rows no matter how many rows it scanned — the shuffle
  *    carries O(d²) rows total, not O(corpus).
  *  - the d×d Gram matrix is the MODEL ARTIFACT (the PqOps codebook
  *    precedent): collecting it is bounded by the embedding dimension
  *    (d=64 → 2,080 rows), never by data size.
  *  - eigendecomposition runs on the driver over that artifact (cyclic
  *    Jacobi, deterministic sweep order, sign-fixed eigenvectors) —
  *    O(d³) on a d×d input is microseconds and has no distributed
  *    algorithm worth its shuffle at any corpus size.
  *  - projection back over the corpus broadcasts the k×d component
  *    table as literal arrays and folds per-row in dimension order
  *    (the [[SimilarityOps.dot]] discipline), so projected values are
  *    bit-identical across engines given the same artifact.
  *
  * Exactness contract: quantization loses at most `1/scale` per
  * coordinate ONCE (a documented, bounded model-input rounding — the
  * scalar-quantization bargain), after which every cross-row reduction
  * is integer-exact; nothing downstream depends on float summation
  * order.
  */
object PcaOps {

  /** `floor(x·scale)` per coordinate, as long — exact, portable. */
  private def quant(vecCol: Column, scale: Int): Column =
    transform(vecCol,
      x => floor(x.cast(DoubleType) * scale).cast(LongType))

  /** Per-dimension exact sums of the quantized coordinates:
    * `(pos, s, n)` — the mean vector's numerator, d rows.
    */
  def dimSums(df: DataFrame, vecCol: String, scale: Int = 10000)
      : DataFrame =
    df.select(posexplode(quant(col(vecCol), scale)).as(Seq("pos", "q")))
      .groupBy("pos")
      .agg(sum(col("q").cast(DecimalType(38, 0))).as("s"),
        count(lit(1)).as("n"))

  /** Upper-triangle Gram matrix of the quantized vectors:
    * `(i, j, s)` with `i ≤ j`, `s = Σ_rows q_i·q_j` exact in
    * decimal(38,0). d(d+1)/2 groups; map-side combine keeps the
    * shuffle at O(d²) rows per task.
    */
  def gramUpper(df: DataFrame, vecCol: String, scale: Int = 10000)
      : DataFrame =
    df.select(quant(col(vecCol), scale).as("_q"))
      .select(posexplode(col("_q")).as(Seq("i", "xi")), col("_q"))
      .select(col("i"), col("xi"),
        posexplode(col("_q")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .groupBy("i", "j")
      // cast BEFORE the multiply: a LONG xi*xj silently wraps past ~3e5
      // coordinate magnitude at the default scale, breaking the "exact
      // integer aggregation" contract (ADVICE r12); decimal(19,0)² is
      // widened by Spark to an exact decimal(38,0) product. The oracle
      // twin multiplies in HUGEINT for the same reason.
      .agg(sum(col("xi").cast(DecimalType(19, 0)) *
        col("xj").cast(DecimalType(19, 0))).as("s"))

  /** Top-k principal components from the persisted [[gramUpper]] +
    * [[dimSums]] artifacts: centers the second moment
    * (C = S/n − μμᵀ, in the original coordinate units), runs cyclic
    * Jacobi, and returns `(comp, pos, v, eigval)` rows — components
    * ordered by eigenvalue descending, each sign-fixed so its
    * largest-magnitude coordinate is positive (the artifact is unique,
    * not unique-up-to-sign).
    */
  def principalComponents(gram: DataFrame, sums: DataFrame, dim: Int,
      k: Int, scale: Int = 10000): DataFrame = {
    val spark = gram.sparkSession
    // bounded collects: d(d+1)/2 and d rows — the model artifact
    val g = gram.select("i", "j", "s").collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        r.getDecimal(2).toBigInteger.doubleValue)).toMap
    val sRows = sums.select("pos", "s", "n").collect()
    require(sRows.nonEmpty, "principalComponents: empty input")
    val n = sRows.head.getLong(2).toDouble
    val mu = Array.ofDim[Double](dim)
    sRows.foreach { r =>
      mu(r.getInt(0)) = r.getDecimal(1).toBigInteger.doubleValue / n
    }
    val sc2 = scale.toDouble * scale
    val c = Array.tabulate(dim, dim) { (i, j) =>
      val s = g.getOrElse((math.min(i, j), math.max(i, j)), 0.0)
      (s / n - mu(i) * mu(j)) / sc2
    }
    val (eigvals, vecs) = jacobiEigen(c)
    val top = eigvals.indices.sortBy(i => (-eigvals(i), i)).take(k)
    import spark.implicits._
    top.zipWithIndex.flatMap { case (ei, comp) =>
      val v = Array.tabulate(dim)(p => vecs(p)(ei))
      val mx = v.indices.maxBy(p => (math.abs(v(p)), -p))
      val sgn = if (v(mx) < 0) -1.0 else 1.0
      v.indices.map(p => (comp, p, v(p) * sgn, eigvals(ei)))
    }.toDF("comp", "pos", "v", "eigval")
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector columns). Deterministic: fixed sweep
    * order (row-major upper triangle), fixed convergence threshold,
    * bounded sweeps. O(d³) per sweep on the driver — the input is the
    * bounded d×d artifact, never data-sized.
    */
  private[graft] def jacobiEigen(m: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-14 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // copysign, not signum: theta == 0 (equal diagonal, the 45°
            // rotation) must still rotate, and signum(0) = 0 would skip
            // it forever
            val t = (if (theta >= 0) 1.0 else -1.0) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val cth = 1.0 / math.sqrt(t * t + 1.0)
            val sth = t * cth
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = cth * aip - sth * aiq
              a(i)(q) = sth * aip + cth * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = cth * api - sth * aqi
              a(q)(i) = sth * api + cth * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = cth * vip - sth * viq
              v(i)(q) = sth * vip + cth * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    s
  }

  /** Project the corpus onto persisted components: one row per
    * `(idCol, comp)` with the projection floor-quantized to 4 decimals.
    * The k×d component table rides as literal arrays (bounded — the
    * broadcast-LUT discipline); the fold is [[SimilarityOps.dot]]'s
    * left-to-right dimension order, so values are bit-identical across
    * engines and the floor is safe.
    */
  def project(df: DataFrame, idCol: String, vecCol: String,
      comps: DataFrame): DataFrame =
    projectVectors(df, idCol, vecCol, comps)
      .select(col(idCol), posexplode(col("pv")).as(Seq("comp", "val")))

  /** [[project]] in VECTOR form — `(idCol, pv)` with `pv` the length-k
    * floor-quantized projection array, ready for downstream cosine /
    * ANN machinery (the compressed-domain search path: rank in k dims
    * instead of d).
    */
  def projectVectors(df: DataFrame, idCol: String, vecCol: String,
      comps: DataFrame): DataFrame = {
    // bounded collect: k×d doubles — the model artifact
    val byComp = comps.select("comp", "pos", "v").collect()
      .groupBy(_.getInt(0))
      .toSeq.sortBy(_._1)
      .map { case (cIdx, rows) =>
        (cIdx, rows.sortBy(_.getInt(1)).map(_.getDouble(2)))
      }
    val mat = byComp.map(_._2.toArray).toArray
    // one fused mat-vec pass (same per-coordinate fold order as the
    // chained-dot form — values identical), floors applied elementwise
    df.select(col(idCol),
      transform(graft.functions.PqExprs.matVec(col(vecCol), mat),
        d => floor(d * 10000) / 10000.0).as("pv"))
  }
}
