package graft

/** Dev probe: the deletion path's READ-side cost — does the tombstone
  * anti-join add a corpus-scale term to from-state retrieval? Usage:
  *
  *   tools/run_main.sh graft.ProbeDelete <sfDir> <variant none|del>
  *
  * Builds the postings log in three doc-disjoint waves (untimed — the
  * build is identical in both variants); `del` additionally commits one
  * tombstone batch retracting every doc_id % 7 == 3 document (the x134
  * slice). Both variants then run two timed passes (cold, steady) of
  * `bm25TopKFromState` over the surviving %101 queries at k = 3 — the
  * x134 read exactly. The claim under test: `del` ≈ `none` at every
  * scale, because the tombstone set is model-sized and broadcasts into
  * the pruned scan (one map-side anti-join, zero extra shuffles), while
  * the del variant actually scores FEWER candidates. One JSON line.
  */
object ProbeDelete {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val variant = args(1)
    require(variant == "none" || variant == "del", s"variant: $variant")
    val spark = GraftSession.build("graft-probe-delete")
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
}
