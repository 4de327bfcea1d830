package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Deduplication operators for the LLM-data-pipeline surface: exact,
  * MinHash+LSH, SimHash, and n-gram-Jaccard near-dup detection.
  *
  * Scale design (the 100 TB story):
  *  - exact dedup groups on md5(text) — a 16-byte shuffle key instead of the
  *    full document; one shuffle.
  *  - MinHash/LSH never compares all pairs: shingles → fixed-width signature
  *    → band keys → shuffle on band key → pairs only within buckets. Work is
  *    O(docs × hashes) + O(Σ bucket²) with bucket sizes bounded by real
  *    collisions, not corpus size.
  *  - SimHash bands 64 bits into 4×16-bit chunks: near-identical docs agree
  *    on ≥1 chunk (Hamming ≤ 3 pigeonhole), so candidate generation is again
  *    an equi-join, never a cross join.
  *  - The md5-based MinHash is deliberately engine-portable (identical hex
  *    in DuckDB) so the full LSH pipeline is oracle-checked end to end.
  */
object DedupOps {
  import TextOps._

  /** Exact dedup: first (min-id) survivor per identical text.
    * Groups on md5(text): at 100 TB the shuffle carries 16-byte keys.
    * (md5 collisions are ignorable at any realistic corpus size.)
    */
  def exactDedup(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("survivor"), count(lit(1)).as("n_copies"))

  /** Spread docs across the cluster before a per-doc kernel + self-join:
    * a single input file would otherwise put the whole kernel AND the join
    * probe on ONE task (join parallelism = streamed-side partitions).
    * Gated: an input already at ≥ half the cluster's parallelism keeps its
    * partitioning — no extra full-text shuffle (ADVICE r2).
    */
  private[graft] def spreadByDoc(docs: DataFrame, idCol: String): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    if (docs.rdd.getNumPartitions * 2 >= par) docs
    else docs.repartition(par, col(idCol))
  }

  /** MinHash signature over a shingle array: element i is
    * min over shingles of md5(shingle ++ ":" ++ i) — a lexicographic min on
    * hex strings, identical across engines.
    */
  def minhashSignature(shingleArr: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map { i =>
      array_min(transform(shingleArr, s => md5(concat(s, lit(s":$i")))))
        .as(s"mh$i")
    }

  /** LSH band keys: md5 over `rowsPerBand` consecutive signature slots
    * joined with '|'. Docs sharing any band key are candidate pairs.
    */
  def bandKeys(numHashes: Int, rowsPerBand: Int): Seq[Column] = {
    require(numHashes % rowsPerBand == 0)
    (0 until numHashes / rowsPerBand).map { b =>
      val slots = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      md5(concat_ws("|", slots: _*)).as(s"band$b")
    }
  }

  /** Full MinHash-LSH near-dup pipeline:
    * docs → 3-shingles → 12-slot signature → 3 bands × 4 rows → bucket join
    * → verified n-gram Jaccard ≥ `threshold`.
    * Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    */
  def minhashNearDups(docs: DataFrame, textCol: String, idCol: String,
      threshold: Double, numHashes: Int = 12, rowsPerBand: Int = 4): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val base = spreadByDoc(docs, idCol)
      .select(col(idCol).as("doc_id"),
        graft.functions.HashExprs.distinctShingles(tokens(col(textCol))).as("sh"))
    // fused one-pass signature kernel (== minhashSignature, see HashExprs).
    // No cache: both sides of the band self-join shuffle the SAME subplan on
    // the same key, and canonicalized plan equality (aliases normalized away)
    // lets ReuseExchange serve side b from side a's shuffle files — the
    // shingle+signature kernel runs once, with zero persisted state left
    // behind (CacheSpec asserts both properties).
    val sig = base.withColumn("sig",
      graft.functions.HashExprs.minhashHexSig(col("sh"), numHashes))
    val bandCols = (0 until numBands).map { b =>
      md5(concat_ws("|", (0 until rowsPerBand).map(r =>
        element_at(col("sig"), b * rowsPerBand + r + 1)): _*))
    }
    // one row per (doc, band) — shuffle key is the band hash
    val exploded = sig.select(col("doc_id"), col("sh"),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_key")))
    val a = exploded.select(col("band_idx"), col("band_key"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = exploded.select(col("band_idx"), col("band_key"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val cand = a.join(b, Seq("band_idx", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b")
      .dropDuplicates("doc_a", "doc_b")
    cand.withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    inter / (size(a) + size(b) - inter)
  }

  /** All-pairs n-gram Jaccard ≥ threshold via an inverted shingle index
    * (exact, no LSH approximation): explode shingles, equi-join on shingle,
    * count per pair, join back sizes. Never materializes the cross product —
    * pair work is Σ_shingle freq², bounded by shingle selectivity.
    */
  def jaccardNearDups(docs: DataFrame, textCol: String, idCol: String,
      threshold: Double): DataFrame =
    jaccardNearDups(docs, textCol, idCol, threshold, None)

  /** As above, with an optional document-frequency cap: shingles appearing
    * in more than `maxShingleDf` docs are dropped from the index before the
    * pair join (set sizes are recomputed over the remaining shingles). This
    * is THE skew control at corpus scale — pair work is Σ df², so one
    * boilerplate shingle shared by 1M docs costs 10¹² pairs unless capped.
    * Capping trades exactness on boilerplate-heavy pairs for a hard bound
    * on per-key join fan-out; the uncapped form stays the oracle-checked
    * reference semantics.
    */
  def jaccardNearDups(docs: DataFrame, textCol: String, idCol: String,
      threshold: Double, maxShingleDf: Option[Long]): DataFrame = {
    // join on the 64-bit hash of the shingle, not the string: the inverted-
    // index shuffle carries 8-byte keys instead of ~25-byte text (collision
    // probability over a corpus-scale shingle vocabulary is ~2^-64·n² —
    // ignorable). Each row also carries its doc's shingle-set size, so the
    // pair aggregation has |A| and |B| in hand and no doc-keyed size join
    // (two shuffles fewer) is needed afterwards — at any scale the extra
    // long per row is cheaper than re-shuffling the pair set twice.
    // No cache: the self-join shuffles both sides on s from the same
    // canonical subplan, so ReuseExchange runs the shingle kernel once
    // (CacheSpec asserts the reuse and that no persisted state remains).
    val sh0 = spreadByDoc(docs, idCol)
      .select(col(idCol).as("doc_id"),
        graft.functions.HashExprs.distinctShingles(tokens(col(textCol))).as("sharr"))
      .select(col("doc_id"), size(col("sharr")).cast(LongType).as("n"),
        explode(col("sharr")).as("s0"))
      .select(col("doc_id"), col("n"), xxhash64(col("s0")).as("s"))
    val sh = maxShingleDf.fold(sh0) { cap =>
      // drop corpus-hot shingles, then recount each doc's remaining set
      val hot = sh0.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") > cap).select("s")
      sh0.join(hot, Seq("s"), "left_anti")
        .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
    }
    sh.as("x").join(sh.as("y"), col("x.s") === col("y.s")
        && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"),
        first(col("x.n")).as("na"), first(col("y.n")).as("nb"))
      .withColumn("jaccard",
        col("inter").cast(DoubleType) / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Train/eval DECONTAMINATION scan: find training documents sharing at
    * least `minOverlap` of an evaluation document's word n-gram shingles —
    * the benchmark-leakage check an LLM data pipeline runs before
    * training. Asymmetric by design: overlap is measured against the EVAL
    * doc's shingle count (a tiny eval snippet fully contained in a long
    * training doc scores 1.0, which is exactly the leak being hunted).
    *
    * Scale shape mirrors jaccardNearDups: explode to an inverted index,
    * equi-join on a portable 60-bit md5 shingle key (8-byte shuffle keys,
    * never text), aggregate per (train, eval) pair. Pair work is
    * Σ_shingle df_train·df_eval — bounded because the eval side is small
    * by nature; `maxShingleDf` additionally caps boilerplate fan-out on
    * the train side (overlap then undercounts capped shingles; eval-side
    * counts stay exact, so ratios only DROP — contamination is never
    * invented, and the uncapped form remains the reference semantics).
    */
  def crossContamination(train: DataFrame, eval: DataFrame, textCol: String,
      idCol: String, minOverlap: Double,
      maxShingleDf: Option[Long] = None): DataFrame = {
    def index(df: DataFrame, out: String) = spreadByDoc(df, idCol)
      .select(col(idCol).as(out),
        graft.functions.HashExprs.distinctShingles(tokens(col(textCol))).as("sharr"))
      .filter(size(col("sharr")) > 0)
      .select(col(out), size(col("sharr")).cast(LongType).as("n"),
        explode(col("sharr")).as("s0"))
      .select(col(out), col("n"),
        conv(substring(md5(col("s0")), 1, 15), 16, 10).cast(LongType).as("s"))
    val ev = index(eval, "eval_id").withColumnRenamed("n", "n_eval")
    val tr0 = index(train, "train_id").drop("n")
    val tr = maxShingleDf.fold(tr0) { cap =>
      val hot = tr0.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") > cap).select("s")
      tr0.join(hot, Seq("s"), "left_anti")
    }
    ev.join(tr, "s")
      .groupBy("eval_id", "train_id")
      .agg(count(lit(1)).as("inter"), first("n_eval").as("n_eval"))
      .filter(col("inter").cast(DoubleType) / col("n_eval") >= minOverlap)
      .select(col("eval_id"), col("train_id"), col("inter"), col("n_eval"))
  }

  /** 64-bit SimHash over the token multiset (xxhash64-based — Spark-native,
    * not oracle-portable; checked by rows-only gate + unit tests).
    * Bit j of the result is the sign of Σ_tokens (bit j of xxhash64(token)
    * ? +1 : -1).
    */
  def simhash(toks: Column): Column = {
    val hashed = transform(toks, t => xxhash64(t))
    val bits = (0 until 64).map { j =>
      val vote = aggregate(hashed, lit(0L),
        (acc, h) => acc + when((shiftright(h, j).bitwiseAND(1L)) === 1L, 1L).otherwise(-1L))
      when(vote > 0, lit(1L).cast(LongType)).otherwise(lit(0L))
    }
    bits.zipWithIndex.map { case (b, j) => shiftleft(b, j) }
      .reduce(_ bitwiseOR _)
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist (< 16), using
    * 4×16-bit chunk banding for candidate generation (pigeonhole: hamming ≤ 3
    * ⇒ at least one chunk identical) then exact popcount verification.
    */
  def simhashNearDups(docs: DataFrame, textCol: String, idCol: String,
      maxDist: Int = 3): DataFrame = {
    val sim = spreadByDoc(docs, idCol)
      .select(col(idCol).as("doc_id"),
        graft.functions.HashExprs.simhash64(tokens(col(textCol))).as("sim"))
    val chunks = sim.select(col("doc_id"), col("sim"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("sim"), c * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk_idx", "chunk")))
    val a = chunks.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("doc_a"), col("sim").as("sim_a"))
    val b = chunks.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("doc_b"), col("sim").as("sim_b"))
    a.join(b, Seq("chunk_idx", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Engine-portable SimHash near-dup pairs: 60-bit md5-derived SimHash
    * ([[graft.functions.Md5SimHash60]]), 4×15-bit chunk banding (pigeonhole:
    * Hamming ≤ 3 ⇒ ≥ 1 identical chunk), exact popcount verification.
    * Identical bit-for-bit in DuckDB, so — unlike [[simhashNearDups]] —
    * the whole pipeline crosses the oracle.
    */
  def simhashNearDupsPortable(docs: DataFrame, textCol: String, idCol: String,
      maxDist: Int = 3): DataFrame = {
    val sim = spreadByDoc(docs, idCol)
      .select(col(idCol).as("doc_id"),
        graft.functions.HashExprs.md5Simhash60(tokens(col(textCol))).as("sim"))
    val chunks = sim.select(col("doc_id"), col("sim"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("sim"), c * 15).bitwiseAND(0x7FFFL)): _*))
        .as(Seq("chunk_idx", "chunk")))
    val a = chunks.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("doc_a"), col("sim").as("sim_a"))
    val b = chunks.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("doc_b"), col("sim").as("sim_b"))
    a.join(b, Seq("chunk_idx", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Canopy-blocked edit-distance fuzzy pairs — the character-level member
    * of the near-dup family. Blocking is a real EQUI-join key (the first
    * `canopyLen` characters), so candidate generation shuffles on the
    * canopy hash and pair work is Σ canopy-block² at ANY corpus size —
    * never a cross join (the literal-id-filter "block" this replaces only
    * bounded a demo corpus). Within a block, Levenshtein runs on the
    * `headLen`-char head under a `maxDist` budget.
    *
    * The canopy is exact-prefix by construction: a pair whose edit
    * distance lives entirely inside the first `canopyLen` chars is missed
    * (the canopy trade — same recall/cost dial as MinHash bands; lower
    * `canopyLen` for recall, raise it to shrink blocks).
    */
  def editDistancePairs(docs: DataFrame, textCol: String, idCol: String,
      canopyLen: Int = 12, headLen: Int = 32, maxDist: Int = 8): DataFrame = {
    val d = spreadByDoc(docs, idCol).select(col(idCol).as("doc_id"),
      substring(col(textCol), 1, canopyLen).as("canopy"),
      substring(col(textCol), 1, headLen).as("head"))
    val a = d.select(col("canopy"), col("doc_id").as("doc_a"), col("head").as("ha"))
    val b = d.select(col("canopy"), col("doc_id").as("doc_b"), col("head").as("hb"))
    a.join(b, Seq("canopy"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("dist", levenshtein(col("ha"), col("hb")))
      .filter(col("dist") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("dist"))
  }

  /** Connected components over the near-dup pair graph: every document
    * that appears in `pairs` (columns doc_a, doc_b) is labeled with the
    * MINIMUM doc id reachable from it — the cluster id. This is what makes
    * dedup correct on chains: A~B and B~C put all three in one cluster
    * even though (A,C) was never emitted as a pair.
    *
    * Algorithm: iterative min-label propagation to a fixpoint. Each round
    * every vertex takes the min of its own label and its neighbors'
    * labels — one equi-join + one aggregation per round, converging in
    * O(cluster diameter) rounds. Near-dup clusters are shallow (dups of a
    * common source), so 2-4 rounds is typical; `maxIter` is a safety rail
    * and the loop fails loudly rather than returning a half-converged
    * labeling. Convergence is detected by the exact decimal sum of labels
    * (labels only ever decrease, so an unchanged sum IS the fixpoint —
    * one cheap aggregate instead of an old-vs-new join).
    *
    * Scale shape: per round one shuffle of the edge list joined to the
    * label table (both O(pairs)), intermediates persisted and the final
    * labeling written through a parquet handoff so the returned frame has
    * flat lineage and NO cached state stays behind. For graphs with
    * pathological diameter, swap the propagation body for alternating
    * small-star/large-star contraction — the loop scaffolding stays.
    */
  def clusterLabels(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs.select(col("doc_a").cast(LongType).as("src"),
      col("doc_b").cast(LongType).as("dst"))
    val undirected = edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    // seed with round 1 already applied: label(v) = min(v, min neighbor)
    // (identical to propagating once from identity labels, one round and
    // one convergence action cheaper)
    var labels = undirected.groupBy(col("src"))
      .agg(min(col("dst")).as("mn"))
      .select(col("src").as("doc_id"), least(col("src"), col("mn")).as("label"))
      .persist()
    try {
      var prevSum: java.math.BigDecimal = null
      var iter = 0
      var done = false
      while (!done && iter < maxIter) {
        val propagated = undirected
          .join(labels.withColumnRenamed("doc_id", "src"), "src")
          .select(col("dst").as("doc_id"), col("label"))
        val next = labels.union(propagated)
          .groupBy("doc_id").agg(min("label").as("label"))
          .persist()
        val curSum =
          try next.agg(sum(col("label").cast("decimal(38,0)")))
            .head().getDecimal(0)
          catch { case e: Throwable => next.unpersist(); throw e }
        labels.unpersist()
        labels = next
        done = curSum == null || curSum == prevSum
        prevSum = curSum
        iter += 1
      }
      require(done, s"clusterLabels did not converge in $maxIter rounds — " +
        "pathological cluster diameter; use star-contraction")
      // flatten lineage through a handoff so callers get a plain scan and
      // no persisted state survives the call (even on failure — finally)
      val out = java.nio.file.Files
        .createTempDirectory("graft-clusters").toString + "/labels"
      labels.select(col("doc_id"), col("label").as("cluster_id"))
        .write.mode("overwrite").parquet(out)
      spark.read.parquet(out)
    } finally {
      labels.unpersist()
      undirected.unpersist()
    }
  }

  /** Keep one survivor per near-dup cluster: connected components over
    * the pair graph ([[clusterLabels]]), then keep each cluster's min-id
    * member. Transitively correct — a chain A~B~C keeps only A, where the
    * old one-iteration min-id propagation wrongly kept B when (A,C) was
    * never emitted.
    */
  def survivors(docs: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    val dropped = clusterLabels(pairs)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(idCol))
    docs.join(dropped, Seq(idCol), "left_anti")
  }
}
