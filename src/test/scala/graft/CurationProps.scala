package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, PackingOps}

/** Properties for the corpus-curation operators added in round 7:
  * shared-span recovery and mixture-rate invariants must hold for ANY
  * planted input, not just the fixture.
  */
object CurationProps extends Properties("curation") {
  lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  property("sharedSpanPairs recovers a planted span's exact length and window count") =
    forAll(Gen.choose(8, 24), Gen.choose(0, 6), Gen.choose(0, 6)) { (l, pre, suf) =>
      import spark.implicits._
      // disjoint vocabularies outside the span — no accidental matches
      val span = (1 to l).map(i => s"s$i").mkString(" ")
      val d1 = ((1 to pre).map(i => s"p$i") :+ span).mkString(" ")
      val d2 = (span +: (1 to suf).map(i => s"t$i")).mkString(" ")
      val docs = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
      val out = DedupOps.sharedSpanPairs(docs, "text", "doc_id", 8).collect()
      out.length == 1 &&
        out.head.getAs[Long]("max_span") == l &&
        out.head.getAs[Long]("n_matches") == l - 7
    }

  property("spanTrim removes exactly the planted span from the larger id") =
    forAll(Gen.choose(8, 24), Gen.choose(0, 6), Gen.choose(0, 6)) { (l, pre, suf) =>
      import spark.implicits._
      // disjoint vocabularies outside the span — doc 2 (larger id) must
      // lose exactly the l span tokens; doc 1 keeps its copy verbatim
      val span = (1 to l).map(i => s"s$i")
      val d1 = (1 to 3).map(i => s"p$i") ++ span ++ (1 to 2).map(i => s"q$i")
      val d2 = (1 to pre).map(i => s"u$i") ++ span ++ (1 to suf).map(i => s"v$i")
      val docs = Seq((1L, d1.mkString(" ")), (2L, d2.mkString(" ")))
        .toDF("doc_id", "text")
      val out = DedupOps.spanTrim(docs, "text", "doc_id",
          windowLen = 8, minSpan = 8L)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      val doc2Expected = (1 to pre).map(i => s"u$i") ++ (1 to suf).map(i => s"v$i")
      out(1L) == ((d1.length.toLong, d1.mkString(" "))) &&
        (if (doc2Expected.isEmpty) !out.contains(2L)
         else out(2L) == ((doc2Expected.length.toLong, doc2Expected.mkString(" "))))
    }

  /** Independent in-memory reference of [[DedupOps.exactSubstringDedup]]
    * — the spec re-derived from scratch (window census with occurrence
    * ordering by (doc_id, pos), optional df cap, per-doc island
    * chaining, minSpan filter, position removal) so the distributed
    * plan is pinned against a second implementation on ARBITRARY
    * corpora, not just the fixture. Small closed vocabulary on purpose:
    * duplication is dense, so every branch (keep-first, intra-doc
    * repeats, cap exclusion, run splitting) fires.
    */
  private def refExactSubstr(docs: Seq[(Long, String)], w: Int,
      minSpan: Int, cap: Option[Int]): Map[Long, String] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val occ = for {
      (id, ts) <- toks.toSeq
      i <- 0 to ts.length - w
    } yield (ts.slice(i, i + w).mkString(" "), id, i)
    val dup: Set[(Long, Int)] = occ.groupBy(_._1).iterator.flatMap {
      case (_, os) =>
        val eligible = cap.forall(c => os.map(_._2).distinct.size <= c)
        if (os.size >= 2 && eligible)
          os.sortBy(o => (o._2, o._3)).drop(1).map(o => (o._2, o._3))
        else Nil
    }.toSet
    val removed: Map[Long, Set[Int]] = dup.groupBy(_._1).map {
      case (id, ps) =>
        val sorted = ps.map(_._2).toSeq.sorted
        // islands of consecutive dup positions -> spans
        val runs = sorted.foldLeft(List.empty[List[Int]]) {
          case (acc @ (h :: t), p) if h.head == p - 1 => (p :: h) :: t
          case (acc, p) => List(p) :: acc
        }
        val kill = runs.filter(r => r.length + w - 1 >= minSpan).flatMap {
          r => r.min until (r.min + r.length + w - 1) }
        id -> kill.toSet
    }
    toks.flatMap { case (id, ts) =>
      val keep = ts.zipWithIndex.collect {
        case (t, i) if !removed.getOrElse(id, Set.empty)(i) => t }
      if (keep.isEmpty) None else Some(id -> keep.mkString(" "))
    }
  }

  property("exactSubstringDedup matches an independent reference on random corpora") =
    forAll(Gen.choose(42L, 100000L), Gen.oneOf[Option[Int]](None, Some(2))) {
      (seed, cap) =>
        import spark.implicits._
        val rnd = new scala.util.Random(seed)
        val vocab = Seq("aa", "bb", "cc")
        val docs = (0L until 8L).map { id =>
          val n = rnd.nextInt(14)
          id -> (0 until n).map(_ => vocab(rnd.nextInt(3))).mkString(" ")
        }
        val expect = refExactSubstr(docs, w = 3, minSpan = 4, cap = cap)
        val got = graft.operators.DedupOps.exactSubstringDedup(
            docs.toDF("doc_id", "text"), "text", "doc_id",
            windowLen = 3, minSpan = 4L, maxWindowDf = cap.map(_.toLong))
          .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
        got == expect
    }

  property("hotSpanScrub removes a planted window iff its df reaches minDf") =
    forAll(Gen.choose(2, 6), Gen.choose(2L, 6L)) { (copies, minDf) =>
      import spark.implicits._
      // `copies` docs carry the same 8-token window between disjoint
      // per-doc vocabularies; scrubbed everywhere iff copies >= minDf
      val hot = (1 to 8).map(i => s"h$i")
      val docs = (1 to copies).map { d =>
        (d.toLong, ((1 to 2).map(i => s"p${d}_$i") ++ hot :+ s"q$d").mkString(" "))
      }.toDF("doc_id", "text")
      val out = DedupOps.hotSpanScrub(docs, "text", "doc_id",
          windowLen = 8, minDf = minDf)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      val expected = (1 to copies).map { d =>
        val keep = (1 to 2).map(i => s"p${d}_$i") :+ s"q$d"
        val full = (1 to 2).map(i => s"p${d}_$i") ++ hot :+ s"q$d"
        d.toLong -> (if (copies >= minDf) keep else full).mkString(" ")
      }.toMap
      out == expected
    }

  property("topNByScore equals the rank form under heavy score ties") =
    forAll(Gen.choose(1L, 5L), Gen.listOfN(20, Gen.choose(0, 3))) { (n, scores) =>
      import spark.implicits._
      // quantized scores from a 4-value domain force boundary-bucket ties
      val df = scores.zipWithIndex.map { case (sc, i) =>
        (i.toLong, if (i % 2 == 0) "a" else "b", sc / 10.0)
      }.toDF("doc_id", "cls", "score")
      val hist = PackingOps.topNByScore(df, "cls", "score", "doc_id", n)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val w = Window.partitionBy("cls").orderBy(col("score").desc, col("doc_id"))
      val rank = df.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= n)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      hist == rank
    }

  property("derived-rate frame sampling equals map sampling for any mixture") =
    forAll(Gen.choose(2, 4), Gen.choose(0L, Long.MaxValue)) { (k, seed) =>
      import spark.implicits._
      // arbitrary mixtures produce arbitrary k/10^4 rates — the broadcast
      // join path must make the identical integer-exact membership
      // decisions as the collected-map path (the x24c composition glue)
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 120).map { i =>
        (i.toLong, s"c${i % k}", 1L + rnd.nextInt(300))
      }.toDF("doc_id", "cls", "n_tok")
      val targets = (0 until k).map(i => s"c$i" -> (500L + rnd.nextInt(5000))).toMap
      val ratesDf = PackingOps.mixtureRatesCounted(docs, "cls", "n_tok",
        targets, 1L).persist()
      try {
        val byFrame = PackingOps.stratifiedSampleByRates(docs, "cls",
          "doc_id", ratesDf).select("doc_id")
        val m = ratesDf.collect()
          .map(r => r.getString(0) -> r.getDouble(3)).toMap
        val byMap = PackingOps.stratifiedSample(docs, "cls", "doc_id", m, 0.0)
          .select("doc_id")
        byFrame.exceptAll(byMap).isEmpty && byMap.exceptAll(byFrame).isEmpty
      } finally { ratesDf.unpersist(); () }
    }

  property("mixtureRates: binding class keeps 1.0, all rates <= 1, mixture hit within rounding") =
    forAll(Gen.choose(2, 4).flatMap(k =>
      Gen.listOfN(k, Gen.zip(Gen.choose(5, 400), Gen.choose(500, 5000)))),
      Gen.choose(0L, Long.MaxValue)) { (classes, seed) =>
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      // one doc per class holding `tok` tokens; targets in basis points
      val named = classes.zipWithIndex.map { case ((tok, bps), i) =>
        (s"c$i", tok.toLong, bps.toLong)
      }
      val docs = named.zipWithIndex.map { case ((cls, tok, _), i) =>
        (i.toLong, cls, Vector.fill(tok.toInt)("w").mkString(" "))
      }.toDF("doc_id", "cls", "text")
      val targets = named.map { case (cls, _, bps) => cls -> bps }.toMap
      val rates = PackingOps.mixtureRates(docs, "cls", "text", targets, 1L)
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("n_tokens"), r.getDouble(3))).toMap
      val ratio = named.map { case (cls, tok, bps) => (cls, tok.toDouble / bps) }
      val binding = ratio.minBy { case (c, r) => (r, c) }._1
      rates.values.forall(_._2 <= 1.0) &&
        rates(binding)._2 == 1.0 &&
        named.forall { case (cls, tok, bps) =>
          // post-sample tokens / target share must equal the binding
          // class's, up to the 4-decimal rate rounding
          val (t, rate) = rates(cls)
          val achieved = rate * t / bps
          val want = rates(binding)._1.toDouble / targets(binding)
          math.abs(achieved - want) <= 5.1e-5 * t / bps
        }
    }
}
