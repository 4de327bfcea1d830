package graft

/** Dev probe: the deletion path's READ-side cost — does the tombstone
  * anti-join add a corpus-scale term to from-state reads? Usage:
  *
  *   tools/run_main.sh graft.ProbeDelete <sfDir> <variant>
  *
  * `variant` = `none` / `del` (the postings surface: x134's
  * `bm25TopKFromState` read) or `ann-none` / `ann-del` (the similarity
  * surface, judge r18 #3: the x134c probe read — tombstones anti-join
  * AFTER the cell prune, BEFORE candidacy). Builds the store untimed —
  * identical in both variants of a pair; the `*del` variants commit one
  * tombstone batch retracting every id % 7 == 3 document/vector WITHOUT
  * compacting, so the timed read pays the live anti-join, not a purged
  * store. Two timed passes (cold, steady), one JSON line. The claim
  * under test on both surfaces: `del` ≈ `none` at every scale, because
  * the tombstone set is model-sized and broadcasts into the pruned scan
  * (one map-side anti-join, zero extra shuffles), while the del variant
  * scores FEWER candidates.
  */
object ProbeDelete {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val variant = args(1)
    require(Set("none", "del", "ann-none", "ann-del")(variant),
      s"variant: $variant")
    val spark = GraftSession.build("graft-probe-delete")
    if (variant.startsWith("ann-")) { annProbe(spark, dir, variant); return }
    import org.apache.spark.sql.functions._
    import graft.operators.{RetrievalOps, StageIO}
    import graft.streaming.PostingsStream
    val docs = Tables.documents(spark, dir)
    val store = StageIO.resolve(spark, None, "probe-del-store")
    (0L to 2L).foreach { k =>
      PostingsStream.applyBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === k), store, k)
    }
    if (variant == "del")
      PostingsStream.deleteBatch(
        docs.filter(pmod(col("doc_id"), lit(7)) === 3).select("doc_id"),
        store, 0L)
    val kept =
      if (variant == "del") docs.filter(pmod(col("doc_id"), lit(7)) =!= 3)
      else docs
    val qids = kept.filter(pmod(col("doc_id"), lit(101)) === 0)
      .select(col("doc_id").as("q_id"))
    // no cleanScratch between passes: the maintained store IS the state
    // under test, and the steady pass measures a fresh read of it
    def once(): (Double, Long) = {
      val t0 = System.nanoTime()
      val tf = PostingsStream.readTf(spark, store)
        .getOrElse(sys.error("probe: empty tf log"))
      val dl = PostingsStream.readDl(spark, store)
        .getOrElse(sys.error("probe: empty dl log"))
      val n = RetrievalOps.bm25TopKFromState(tf, dl, kept, qids, 3).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val (cold, nC) = once()
    val (steady, nS) = once()
    require(nC == nS, s"nondeterministic result size: $nC vs $nS")
    println(s"""PROBE_DELETE: {"dir":"$dir","variant":"$variant",""" +
      s""""rows":$nS,"cold_sec":$cold,"steady_sec":$steady}""")
    spark.stop()
  }

  /** The x134c read: a fresh IVF-PQ index (untimed build — identical in
    * both variants), the `ann-del` variant committing the % 7 == 3
    * tombstone batch with NO compaction, then two timed passes of the
    * x54-shaped probe (fixed 10-query budget at any scale — the
    * matched-count discipline).
    */
  private def annProbe(spark: org.apache.spark.sql.SparkSession,
      dir: String, variant: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.{AnnIndex, StageIO}
    val emb = Tables.embeddings(spark, dir)
    val base = s"${StageIO.artifactRoot(spark)}/probe_ann_del/" +
      new java.io.File(dir).getName
    AnnIndex.init(spark, emb.filter(col("vec_id") % 3 === 0),
      "vec_id", "embedding", base, kCells = 8, m = 16, kCodewords = 64)
    AnnIndex.appendBatch(spark, emb.filter(col("vec_id") % 3 === 1),
      "vec_id", "embedding", base, batchId = 1L)
    AnnIndex.appendBatch(spark, emb.filter(col("vec_id") % 3 === 2),
      "vec_id", "embedding", base, batchId = 2L)
    if (variant == "ann-del")
      AnnIndex.deleteBatch(spark,
        emb.filter(pmod(col("vec_id"), lit(7)) === 3).select("vec_id"),
        "vec_id", base, batchId = 3L)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def once(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = AnnIndex.probe(spark, queries, "qid", "qv", base, "vec_id",
        5, nprobe = 2, excludeSelf = true).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val (cold, nC) = once()
    val (steady, nS) = once()
    require(nC == nS, s"nondeterministic result size: $nC vs $nS")
    println(s"""PROBE_DELETE: {"dir":"$dir","variant":"$variant",""" +
      s""""rows":$nS,"cold_sec":$cold,"steady_sec":$steady}""")
    spark.stop()
  }
}
