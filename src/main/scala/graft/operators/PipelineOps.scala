package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end training-set build: the composition a data team actually
  * runs, wired from the engine's own operators —
  *
  *   quality gate → exact dedup → decontamination vs the eval split →
  *   stratified sampling → sequence packing
  *
  * Every stage is deterministic (md5-keyed decisions, exact integer
  * quality rationals), so the whole manifest is reproducible end to end
  * and oracle-checkable — re-running the pipeline over the same corpus
  * yields byte-identical training shards, the property that makes a
  * 100 TB data build auditable.
  *
  * Scale shape: the gate and sample are shuffle-free filters; dedup is
  * one hash shuffle on the content key; decontamination is the inverted
  * shingle-index join (eval side small by nature); packing is one shard
  * shuffle. Nothing global, nothing driver-side.
  */
object PipelineOps {

  /** Build the packed training manifest from a raw document corpus.
    *
    * @param evalSources   `source` values forming the held-out eval split
    *                      (never trained on; used for decontamination)
    * @param minQualityBps quality floor in basis points (e.g. 4000 =
    *                      quality ≥ 0.40 on x9's integer-exact score)
    * @param contamThreshold eval-shingle overlap above which a training
    *                      doc is dropped as leaked
    * @param rates / defaultRate per-language keep rates (stratified)
    * @param capacity / shards sequence-packing geometry
    * @return (shard, chunk_id, doc_id, tok_in_chunk) manifest rows
    */
  def trainingManifest(docs: DataFrame, evalSources: Seq[String],
      minQualityBps: Long, contamThreshold: Double,
      rates: Map[String, Double], defaultRate: Double,
      capacity: Int, shards: Int): DataFrame = {
    val isEval = col("source").isInCollection(evalSources)

    // quality gate — x9's integer rational, compared exactly:
    // quality >= bps/10000  <=>  10000*qNum >= bps*qDen
    val toks = TextOps.tokens(col("text"))
    val nt = size(toks).cast("long")
    val sw = size(filter(toks, t => t.isInCollection(TextOps.stopwords))).cast("long")
    val qNum = lit(20L) * nt * least(nt, lit(100L)) +
      lit(1500L) * (nt - sw) +
      lit(3L) * nt * least(col("n_chars").cast("long"), lit(500L))
    val qDen = lit(5000L) * nt
    val gated = docs.filter(!isEval)
      .filter(nt > 0 && lit(10000L) * qNum >= lit(minQualityBps) * qDen)

    // exact dedup: keep the smallest doc_id per content hash
    val byContent = Window.partitionBy(md5(col("text")))
    val deduped = gated
      .withColumn("survivor", min("doc_id").over(byContent))
      .filter(col("doc_id") === col("survivor")).drop("survivor")

    // decontamination: drop anything leaking the eval split
    val leaked = DedupOps.crossContamination(deduped, docs.filter(isEval),
        "text", "doc_id", contamThreshold)
      .select(col("train_id").as("doc_id")).distinct()
    val clean = deduped.join(leaked, Seq("doc_id"), "left_anti")

    val sampled = PackingOps.stratifiedSample(clean, "lang", "doc_id",
      rates, defaultRate)
    PackingOps.chunkPack(sampled, "doc_id", "text", capacity, shards)
  }
}
