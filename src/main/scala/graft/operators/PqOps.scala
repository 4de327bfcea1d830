package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Product quantization (PQ) for embedding columns — the compressed-domain
  * ANN path (Jégou, Douze, Schmid, "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011; the IVFADC family FAISS popularized).
  *
  * Why it matters at 100 TB: a 64-dim float vector is 256 bytes; its PQ
  * code at m=8 subspaces × 16 codewords is 8 bytes (codeword ids fit a
  * byte at k ≤ 256) — a 32× shrink. The ADC scan then reads CODES, not
  * vectors: the linear pass a query pays touches 8 bytes/row and does m
  * table lookups + (m-1) adds per row instead of a 64-dim float kernel.
  * That is the difference between an ANN sweep that is scan-bound on
  * 100 TB of raw vectors and one that is scan-bound on 3 TB of codes —
  * and the codes frame partitions/bucketizes like any other table, so
  * every stage below is an equi-join or a map-side-combined aggregate,
  * never a crossJoin of vector payloads.
  *
  * Determinism contract (the DuckDB oracle replays encode + ADC from the
  * persisted codebook artifact, x53):
  *  - all distances are exact squared-L2 in double, accumulated
  *    left-to-right in element order ([[dist2]] ↔ the oracle's
  *    `list_reduce` twin — same bits, 0.0+x is exact);
  *  - nearest-codeword ties break on the smaller code_id, top-k ties on
  *    the smaller vector id, on both engines;
  *  - the ADC sum adds per-subspace terms in sub_id order on both engines
  *    (sorted struct array here, `list(d ORDER BY sub_id)` there).
  * Training itself is NOT replayed by the oracle — like the x14b IVF
  * centroids, the codebook parquet written by [[pqTrain]] is the shared
  * input both engines read, so its float summation order is free.
  */
object PqOps {

  private def asDouble(a: Column): Column = transform(a, x => x.cast(DoubleType))

  /** Exact squared L2 distance in double, left-to-right — the metric every
    * PQ stage (train / encode / LUT / rerank) shares. Native codegen
    * kernel ([[graft.functions.Dist2]] — allocation-free, same
    * accumulation order); [[dist2Spec]] keeps the compositional
    * zip_with+aggregate form as the line-for-line oracle-auditable spec
    * and PqOpsSpec pins value equality.
    */
  def dist2(a: Column, b: Column): Column =
    graft.functions.PqExprs.dist2Native(a, b)

  /** The compositional spec of [[dist2]] (the DuckDB `list_reduce`
    * twin, kept executable for the parity test).
    */
  def dist2Spec(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Split each vector into `m` contiguous subvectors:
    * (idCol, carry…, sub_id, sv: array<double>). Row-local (no shuffle, no
    * driver knowledge of the dimension — sub length is size/m per row); at
    * scale this is a generate inside the scan stage. `carry` columns ride
    * along untouched (e.g. the cell a residual was taken against).
    */
  def subvectors(df: DataFrame, idCol: String, vecCol: String, m: Int,
      carry: Seq[String] = Nil): DataFrame = {
    val subLen = (size(col(vecCol)) / m).cast("int")
    df.select(col(idCol) +: carry.map(col) :+ col(vecCol): _*)
      .withColumn("sub_id", explode(array((0 until m).map(lit): _*)))
      .select(col(idCol) +: carry.map(col) :+ col("sub_id") :+
        asDouble(slice(col(vecCol), col("sub_id") * subLen + 1, subLen))
          .as("sv"): _*)
  }

  /** Train per-subspace codebooks: k codewords per subspace via Lloyd's
    * iterations, ALL m subspaces in the same two jobs per iteration
    * (one assign pass, one mean pass) — not m sequential fits.
    * Deterministic init: the subvectors of the k lowest-id vectors
    * (TakeOrderedAndProject, no global sort). Empty codes keep their
    * previous codeword. Returns (sub_id, code_id, cw: array<double>).
    *
    * Driver state is the codebook itself (m·k rows — the model, same
    * bounded-collect discipline as the bloom filter's bit array and the
    * IVF centroid table): each iteration collects the new means and
    * rebroadcasts them, so lineage stays one-iteration deep.
    *
    * Scale: cost is O(iters · m · k · corpus) distance kernels on the
    * assign side and a map-side-combined (sub_id, code_id, pos) mean on
    * the update side. Train on a deterministic sample (the standard PQ
    * recipe — codebooks need ~100k points, not the corpus) and encode
    * everything; `emb` here IS that sample.
    */
  def pqTrain(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int = 3): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // seed: k lowest-id vectors' subvectors, code_id = rank of the id
    var cb: Seq[(Int, Int, Seq[Double])] =
      subvectors(emb, idCol, vecCol, m)
        .select(col(idCol).as("_pq_id"), col("sub_id"), col("sv"))
        .join(broadcast(
          emb.select(col(idCol).as("_pq_id")).orderBy("_pq_id").limit(k)
            .withColumn("code_id",
              row_number().over(org.apache.spark.sql.expressions.Window
                .orderBy("_pq_id")) - 1)),
          Seq("_pq_id"))
        .select(col("sub_id"), col("code_id"), col("sv"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
        .toSeq
    for (_ <- 0 until iters) {
      // assign: SCAN-LOCAL argmin — the same native one-pass kernel the
      // bulk encode uses ([[graft.functions.PqEncode]], codebook as a
      // literal), so an iteration is one projection + one map-side-
      // combined mean. The previous join+struct-min form planned a
      // SortAggregate over n·m·k candidate rows (the struct carried the
      // subvector ARRAY, which de-hashes the aggregate) — measured as
      // the bulk of x53's 14 s train at 2 000 vectors.
      val bookArr: Array[Array[Array[Double]]] = (0 until m).map { s =>
        cb.filter(_._1 == s).sortBy(_._2).map(_._3.toArray).toArray
      }.toArray
      val subLen = (size(col(vecCol)) / m).cast("int")
      val assigned = emb.select(col(vecCol),
          posexplode(graft.functions.PqExprs.pqEncode(col(vecCol), bookArr))
            .as(Seq("sub_id", "code_id")))
        .select(col("sub_id"), col("code_id"),
          asDouble(slice(col(vecCol), col("sub_id") * subLen + 1, subLen))
            .as("sv"))
      // update: element-wise mean per (subspace, code) — posexplode keeps
      // the mean a plain groupBy (partial-aggregated map-side), never a
      // whole-array reduce on one task
      val means = assigned
        .select(col("sub_id"), col("code_id"), posexplode(col("sv")))
        .groupBy("sub_id", "code_id", "pos").agg(avg("col").as("mu"))
        .groupBy("sub_id", "code_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mu")))),
          s => s.getField("mu")).as("cw"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2)))
        .toMap
      cb = cb.map { case (s, c, old) => (s, c, means.getOrElse((s, c), old)) }
    }
    cb.toDF("sub_id", "code_id", "cw")
  }

  /** Encode the corpus against a trained codebook: nearest codeword per
    * (vector, subspace) by exact [[dist2]], tie → lower code_id.
    * `cb` must be (sub_id, code_id, cw) and broadcast-sized (m·k rows).
    * Returns the long form (idCol, sub_id, code_id) the ADC join consumes;
    * [[pack]] folds it to the stored shape. One broadcast-join pass over
    * the corpus — embarrassingly parallel, no shuffle beyond the
    * map-side-combined argmin.
    */
  def pqEncode(emb: DataFrame, idCol: String, vecCol: String,
      cb: DataFrame, m: Int): DataFrame =
    subvectors(emb, idCol, vecCol, m)
      .join(broadcast(cb), Seq("sub_id"))
      .withColumn("d", dist2(col("sv"), col("cw")))
      .groupBy(col(idCol), col("sub_id"))
      .agg(min(struct(col("d"), col("code_id"))).as("_m"))
      .select(col(idCol), col("sub_id"), col("_m.code_id").as("code_id"))

  /** SCAN-LOCAL encode, directly in the packed shape: the codebook
    * travels as a nested literal (m·k·(dim/m) doubles — it IS the model),
    * and each row computes its m argmin codes inside one projection —
    * no join, no argmin groupBy, no shuffle at all. [[pqEncode]]'s
    * join+aggregate form plans a SortAggregate over n·m·k candidate rows
    * (struct-min is sort-based); this form makes the corpus-wide encode
    * pass embarrassingly parallel by construction, which is the shape a
    * 100 TB bulk encode needs. Same codes bit for bit (same left-to-right
    * double arithmetic, same keep-first-on-tie = lowest code_id;
    * PqOpsSpec asserts equality) — the join form remains as the
    * line-for-line twin of the oracle SQL.
    */
  def pqEncodePacked(emb: DataFrame, idCol: String, vecCol: String,
      cb: DataFrame, m: Int): DataFrame = {
    val book = collectBook(cb, m)
    emb.select(col(idCol),
      graft.functions.PqExprs.pqEncode(col(vecCol), book).as("codes"))
  }

  /** The codebook as driver arrays, validated contiguous per subspace —
    * the model-sized collect both encode forms share.
    */
  private def collectBook(cb: DataFrame, m: Int): Array[Array[Array[Double]]] = {
    val rows = cb.orderBy("sub_id", "code_id").collect() // model-sized
    (0 until m).map { s =>
      val forS = rows.filter(_.getInt(0) == s).sortBy(_.getInt(1))
      require(forS.nonEmpty, s"no codewords for subspace $s")
      require(forS.zipWithIndex.forall { case (r, i) => r.getInt(1) == i },
        s"non-contiguous code ids in subspace $s")
      forS.map(_.getSeq[Double](2).toArray).toArray
    }.toArray
  }

  /** The compositional higher-order-function spec of [[pqEncodePacked]]
    * (kept executable: PqOpsSpec pins code equality against the native
    * kernel; this form was the x53 profile at 7.7 s / 2 000 vectors —
    * ~m·k interpreted mini-folds per row — and is not on any hot path).
    */
  def pqEncodePackedSpec(emb: DataFrame, idCol: String, vecCol: String,
      cb: DataFrame, m: Int): DataFrame = {
    val book: Seq[Seq[Seq[Double]]] =
      collectBook(cb, m).map(_.map(_.toSeq).toSeq).toSeq
    val k = book.head.length
    val bookLit = typedlit(book)
    val subLen = (size(col(vecCol)) / m).cast("int")
    val codesCol = transform(sequence(lit(0), lit(m - 1)), s => {
      val sv = transform(slice(col(vecCol), s * subLen + 1, subLen),
        x => x.cast(DoubleType))
      aggregate(sequence(lit(0), lit(k - 1)),
        struct(lit(Double.MaxValue).as("d"), lit(0).as("c")),
        (acc, c) => {
          val cw = element_at(element_at(bookLit, s + 1), c + 1)
          val d = aggregate(zip_with(sv, cw, (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, v) => a + v)
          // strict < keeps the FIRST (lowest) code on ties — the same
          // order min(struct(d, code_id)) yields
          when(d < acc.getField("d"),
            struct(d.as("d"), c.cast("int").as("c"))).otherwise(acc)
        },
        acc => acc.getField("c"))
    })
    emb.select(col(idCol), codesCol.as("codes"))
  }

  /** The stored shape: one row per vector, codes in sub_id order —
    * (idCol, codes: array<int>), m·log2(k) bits of payload per vector.
    * At rest this is the 8-bytes-per-vector table the ADC scan reads.
    */
  def pack(codes: DataFrame, idCol: String): DataFrame =
    codes.groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(struct(col("sub_id"), col("code_id")))),
        s => s.getField("code_id")).as("codes"))

  /** Inverse of [[pack]] — restore the (id, sub_id, code_id) long form the
    * ADC equi-join consumes from the stored packed table.
    */
  def unpack(packed: DataFrame, idCol: String): DataFrame =
    packed.select(col(idCol), posexplode(col("codes")))
      .select(col(idCol), col("pos").cast("int").as("sub_id"),
        col("col").cast("int").as("code_id"))

  private def selfGuard(idCol: String, qidCol: String, on: Boolean): Column =
    if (on) col(idCol) =!= col(qidCol) else lit(true)

  /** Asymmetric-distance (ADC) top-k for a query batch over PQ codes.
    * Per query: a LUT of exact query-subvector→codeword distances (m·k
    * doubles, broadcast), then ONE pass over the codes frame — each
    * (vector, subspace) row meets exactly one LUT row per query on the
    * (sub_id, code_id) equi-join, the per-vector approx distance is the
    * sub_id-ordered sum of its m lookups, and top-k is the bounded-heap
    * [[graft.functions.TopKByScore]] aggregate (map-side pruning to k,
    * never a full per-query candidate shuffle). Returns
    * (qidCol, idCol, adist) — adist is the ADC squared-L2 estimate.
    */
  def adcTopKBatch(codes: DataFrame, idCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      cb: DataFrame, m: Int, k: Int,
      excludeSelf: Boolean = false): DataFrame = {
    val lut = adcLut(queries, qidCol, qvecCol, cb, m)
    val cand = codes.join(broadcast(lut), Seq("sub_id", "code_id"))
      .filter(selfGuard(idCol, qidCol, excludeSelf))
    adcTail(cand, qidCol, idCol, k)
  }

  /** The per-query distance lookup table: exact query-subvector→codeword
    * distances, (qidCol, sub_id, code_id, d) — q·m·k doubles, always
    * broadcast-sized.
    */
  private[operators] def adcLut(queries: DataFrame, qidCol: String,
      qvecCol: String, cb: DataFrame, m: Int): DataFrame =
    subvectors(queries, qidCol, qvecCol, m)
      .join(broadcast(cb), Seq("sub_id"))
      .select(col(qidCol), col("sub_id"), col("code_id"),
        dist2(col("sv"), col("cw")).as("d"))

  /** ADC tail shared by [[adcTopKBatch]] and [[AnnIndex.probe]]'s
    * cell-restricted candidates: per-(query, vector) sub_id-ordered sum of
    * the m LUT lookups, then bounded-heap top-k. `cand` carries
    * (qidCol, idCol, sub_id, d) with exactly one row per
    * (query, vector, subspace); extra grouping columns (e.g. the cell a
    * candidate came from) survive via `carry`.
    */
  private[operators] def adcTail(cand: DataFrame, qidCol: String,
      idCol: String, k: Int, carry: Seq[String] = Nil): DataFrame = {
    val scored = cand
      .groupBy(col(qidCol) +: col(idCol) +: carry.map(col): _*)
      .agg(collect_list(struct(col("sub_id"), col("d"))).as("_ds"))
      .select(col(qidCol) +: col(idCol) +: carry.map(col) :+
        aggregate(transform(array_sort(col("_ds")), s => s.getField("d")),
          lit(0.0), (acc, v) => acc + v).as("adist"): _*)
    val top = scored.groupBy(col(qidCol))
      .agg(graft.functions.AggExprs.topKByScore(negate(col("adist")),
        col(idCol).cast(LongType), k).as("_tk"))
      .select(col(qidCol), explode(col("_tk")).as("_e"))
      .select(col(qidCol), col("_e.id").as(idCol),
        negate(col("_e.score")).as("adist"))
    if (carry.isEmpty) top
    else top.join(scored.drop("adist"), Seq(qidCol, idCol))
  }

  /** The standard two-stage retrieval: ADC shortlist of `shortlist`
    * candidates from the codes, then EXACT squared-L2 rerank of only
    * those against the raw vectors → top `k`. The corpus-wide pass stays
    * in the compressed domain; full vectors are touched for
    * shortlist·|queries| rows only (a broadcast semi-join against the
    * vector table — at scale, a point-lookup-friendly read of q·shortlist
    * rows, not a scan). Returns (qidCol, idCol, l2sq).
    */
  def adcRerankTopKBatch(emb: DataFrame, idCol: String, vecCol: String,
      codes: DataFrame, queries: DataFrame, qidCol: String, qvecCol: String,
      cb: DataFrame, m: Int, k: Int, shortlist: Int,
      excludeSelf: Boolean = false): DataFrame = {
    val short = adcTopKBatch(codes, idCol, queries, qidCol, qvecCol,
        cb, m, shortlist, excludeSelf)
      .select(col(qidCol), col(idCol))
    emb.select(col(idCol), col(vecCol))
      .join(broadcast(short), Seq(idCol))
      .join(broadcast(queries.select(col(qidCol), col(qvecCol))), Seq(qidCol))
      .withColumn("_nd", negate(dist2(col(vecCol), col(qvecCol))))
      .groupBy(col(qidCol))
      .agg(graft.functions.AggExprs.topKByScore(col("_nd"),
        col(idCol).cast(LongType), k).as("_tk"))
      .select(col(qidCol), explode(col("_tk")).as("_e"))
      .select(col(qidCol), col("_e.id").as(idCol),
        negate(col("_e.score")).as("l2sq"))
  }

  /** Exact squared-L2 top-k for every query in a batch — the ground truth
    * [[SimilarityOps.recallAtK]] measures the ADC paths against (the L2
    * twin of [[SimilarityOps.topKBatch]]'s cosine form).
    */
  def l2TopKBatch(emb: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int,
      excludeSelf: Boolean = false): DataFrame =
    emb.select(col(idCol), col(vecCol)).crossJoin(broadcast(queries))
      .filter(selfGuard(idCol, qidCol, excludeSelf))
      .withColumn("_nd", negate(dist2(col(vecCol), col(qvecCol))))
      .groupBy(col(qidCol))
      .agg(graft.functions.AggExprs.topKByScore(col("_nd"),
        col(idCol).cast(LongType), k).as("_tk"))
      .select(col(qidCol), explode(col("_tk")).as("_e"))
      .select(col(qidCol), col("_e.id").as(idCol),
        negate(col("_e.score")).as("l2sq"))
}
