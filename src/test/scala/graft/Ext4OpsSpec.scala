package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps
import graft.queries.Ext4Queries

/** Round-16 containment / collocation kernels: the asymmetric-containment
  * semantics Jaccard can't see, the DF-cap discipline on the containment
  * index, and the PMI-lift formula replayed row by row.
  */
class Ext4OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pairsOf(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap

  test("containmentPairs: a short doc embedded in a long one scores 1.0 " +
      "in that direction only; verbatim duplicates contain mutually") {
    val quote = "alpha beta gamma delta epsilon zeta"
    val docs = Seq[(Long, String)](
      0L -> quote,
      1L -> (s"$quote eta theta iota kappa lambda mu nu xi omicron pi " +
        "rho sigma tau upsilon phi chi psi omega aleph bet gimel dalet"),
      2L -> quote, // verbatim dup of 0
      3L -> "completely different tokens one two three four five six seven")
      .toDF("doc_id", "text")
    val got = pairsOf(DedupOps.containmentPairs(docs, "text", "doc_id",
      8000L).collect())
    assert(got.contains((0L, 1L)), s"short-in-long missing: $got")
    assert(got((0L, 1L))._3 == 1.0, "full containment must be exactly 1.0")
    assert(!got.contains((1L, 0L)),
      "the long doc is NOT contained in the short one")
    assert(got.contains((0L, 2L)) && got.contains((2L, 0L)),
      "verbatim duplicates contain each other")
    assert(got((0L, 2L))._3 == 1.0 && got((2L, 0L))._3 == 1.0)
    assert(!got.keySet.exists(k => k._1 == 3L || k._2 == 3L),
      "the unrelated doc shares no shingle")
    // ratio is the exact rational of the reported integers
    got.foreach { case (_, (inter, nSub, c)) =>
      val bp = (BigInt(inter) * 20000 + nSub) / (BigInt(nSub) * 2)
      assert(c == bp.toLong / 10000.0)
      assert(inter * 10000 >= nSub * 8000, "gate must hold on every row")
    }
  }

  test("containmentPairs: the DF cap drops boilerplate-driven pairs and " +
      "recounts the contained side over surviving shingles") {
    // doc 0 and doc 1 share ONLY a boilerplate run present in every doc
    val boiler = "one two three four five"
    val docs = Seq[(Long, String)](
      0L -> s"$boiler alpha beta gamma",
      1L -> s"$boiler delta epsilon zeta",
      2L -> s"$boiler eta theta iota",
      3L -> s"$boiler kappa lambda mu")
      .toDF("doc_id", "text")
    val uncapped = DedupOps.containmentPairs(docs, "text", "doc_id", 3000L)
      .collect()
    assert(uncapped.nonEmpty, "boilerplate creates pairs uncapped")
    val capped = DedupOps.containmentPairs(docs, "text", "doc_id", 3000L,
      maxShingleDf = Some(2L)).collect()
    assert(capped.isEmpty,
      s"df-capped index must drop the boilerplate-only pairs: " +
        s"${capped.mkString(",")}")
  }

  test("x127 fixture run: every direction of a mutual pair agrees on " +
      "inter, and containment >= jaccard on shared pairs") {
    val sf = SparkTestSession.sf0001
    val cont = SparkEntry.queries("x127_containment_pairs")(spark, sf)
      .collect()
    assert(cont.nonEmpty, "fixture planted dups must produce containments")
    val jac = DedupOps.jaccardNearDups(Tables.documents(spark, sf),
      "text", "doc_id", 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val byPair = pairsOf(cont)
    jac.foreach { case ((a, b), j) =>
      val c = byPair.get((a, b)).orElse(byPair.get((b, a)))
      assert(c.isDefined, s"jaccard-0.8 pair ($a,$b) missing at gate 0.8")
      assert(c.get._3 >= j - 1e-9,
        s"containment ${c.get._3} < jaccard $j for ($a,$b)")
    }
  }

  test("x128: every reported lift_bp replays from its own counts and the " +
      "corpus scalars; ordering and support gate hold") {
    val sf = SparkTestSession.sf0001
    val out = SparkEntry.queries("x128_pmi_collocations")(spark, sf)
      .collect()
    assert(out.nonEmpty && out.length <= 20)
    val docs = Tables.documents(spark, sf)
    val toks = docs.select(explode(
      graft.operators.TextOps.tokensNonEmpty(col("text"))).as("w"))
    val nTok = toks.count()
    val nBig = docs.select(explode(graft.operators.TextOps.bigrams(
      graft.operators.TextOps.tokensNonEmpty(col("text")))).as("g")).count()
    var prev = Long.MaxValue
    out.foreach { r =>
      val (cab, ca, cb, lift) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(cab >= 5, "support gate")
      val num = BigInt(cab) * nTok * nTok
      val den = BigInt(nBig) * ca * cb
      assert(lift == ((num * 20000 + den) / (den * 2)).toLong,
        s"lift replay failed for row $r")
      assert(lift <= prev, "rows must be lift-descending")
      prev = lift
    }
  }

  test("x131b: per-iteration deltas are positive, shrink as the damped " +
      "iteration mixes, and the converged bit replays the named gate") {
    val sf = SparkTestSession.sf0001
    val out = SparkEntry.queries("x131b_pagerank_convergence")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.map(_._1).toSeq == (1L to 5L), "one row per iteration")
    out.foreach { case (_, d, c) =>
      assert(d >= 0L)
      assert(c == (d <= 10000L), "converged must replay delta <= 10000")
    }
    assert(out.last._2 < out.head._2,
      "movement must shrink from the uniform start toward the fixpoint")
  }

  test("x132b: every sampled query sits on the q_id % 3 = 0 residue, " +
      "ranks/rr_bp keep the x132 contracts, and the sample is real " +
      "(strictly fewer queries than the full-population row)") {
    val sf = SparkTestSession.sf0001
    val full = SparkEntry.queries("x132_bm25_mrr")(spark, sf).collect()
    val samp = SparkEntry.queries("x132b_bm25_mrr_sampled")(spark, sf)
      .collect()
    assert(samp.nonEmpty, "planted dup families must survive cap+sample")
    assert(samp.length < full.length, "the residue sample must bound " +
      s"the query population (${samp.length} vs ${full.length})")
    samp.foreach { r =>
      assert(r.getLong(0) % 3 == 0, s"off-residue query ${r.getLong(0)}")
      assert(r.getLong(1) >= 1L, "n_rel >= 1 by construction")
      if (!r.isNullAt(2)) {
        val rank = r.getLong(2)
        assert(rank >= 1L)
        assert(r.getLong(3) == (20000L + rank) / (2 * rank),
          "rr_bp must replay 1/best_rank in half-up bps")
      } else assert(r.getLong(3) == 0L, "no-candidate queries score 0")
    }
  }

  test("mrrGate: the r20 MaxScore-pruned rank kernel is row-identical " +
      "to the unpruned reference tail (full-population and " +
      "capped+sampled forms)") {
    val sf = SparkTestSession.sf0001
    // full-population x132 shape (one-pass postings, uncapped truth)
    val refFull = Ext4Queries.mrrGate(spark, sf, cap = None,
      sampleMod = None, fromSharedState = false, pruned = false)
      .collect().toSeq
    val gotFull = Ext4Queries.mrrGate(spark, sf, cap = None,
      sampleMod = None, fromSharedState = false, pruned = true)
      .collect().toSeq
    assert(refFull.nonEmpty, "planted dup families must produce queries")
    assert(gotFull == refFull,
      s"pruned != reference (full): ${gotFull.diff(refFull)} vs " +
        s"${refFull.diff(gotFull)}")
    // capped + sampled x132b shape off the shared staged state
    val refS = Ext4Queries.mrrGate(spark, sf, cap = Some(8L),
      sampleMod = Some(3L), fromSharedState = true, pruned = false)
      .collect().toSeq
    val gotS = Ext4Queries.mrrGate(spark, sf, cap = Some(8L),
      sampleMod = Some(3L), fromSharedState = true, pruned = true)
      .collect().toSeq
    assert(gotS == refS,
      s"pruned != reference (sampled): ${gotS.diff(refS)} vs " +
        s"${refS.diff(gotS)}")
  }

  test("x126c: one gate row; n_both bounded by both arms; overlap_bp " +
      "replays the exact rational; fusion_ok replays the named gate") {
    val sf = SparkTestSession.sf0001
    val rows = SparkEntry.queries("x126c_fusion_overlap_gate")(spark, sf)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    val (ne, na, nb, bp, ok) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getBoolean(4))
    assert(ne > 0 && na > 0, "both fused arms must produce results")
    assert(nb <= math.min(ne, na))
    assert(bp == (nb * 20000L + ne) / (2 * ne), "overlap_bp replay")
    assert(ok == (bp >= 6000L), "fusion_ok must replay the 60% gate")
  }
}
