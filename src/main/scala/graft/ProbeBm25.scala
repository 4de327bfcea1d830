package graft

import org.apache.spark.sql.functions._

/** Dev probe: BM25 wall with the QUERY SET HELD FIXED while the corpus
  * scales — the operator-level exponent the bench probe can't measure
  * (the x124 row's `doc_id % 101` query set grows WITH the corpus, so
  * the benched pair work scales ~quadratically at 10×: 10× queries ×
  * 10× candidate docs; SCALE.md r16). Usage:
  *
  *   tools/run_main.sh graft.ProbeBm25 <sfDir> <modulus> [k]
  *
  * Pick the modulus so the query COUNT matches across dirs (101 at
  * sf0.1's 5,000 docs ≈ 50 queries; 1010 at a 10× fixture's 50,000).
  * Two timed runs (cold, steady), full collect of the tiny top-k output
  * (all upstream work materializes), one JSON line on stdout.
  */
object ProbeBm25 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mod = args(1).toLong
    val k = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.build("graft-probe-bm25")
    val docs = Tables.documents(spark, dir)
    val qids = docs.filter(pmod(col("doc_id"), lit(mod)) === 0)
      .select(col("doc_id").as("q_id"))
    val nq = qids.count()
    def once(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = graft.operators.RetrievalOps.bm25TopK(docs, qids, k)
        .collect().length
      graft.operators.StageIO.cleanScratch(spark)
      ((System.nanoTime() - t0) / 1e9, n.toLong)
    }
    val (cold, rowsC) = once()
    val (steady, rowsS) = once()
    require(rowsC == rowsS, s"nondeterministic row count: $rowsC vs $rowsS")
    println(s"""PROBE_BM25: {"dir":"$dir","modulus":$mod,"queries":$nq,""" +
      s""""rows":$rowsS,"cold_sec":$cold,"steady_sec":$steady}""")
    spark.stop()
  }
}
