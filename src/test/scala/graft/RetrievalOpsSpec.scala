package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RetrievalOps

/** Round-16 retrieval surface: BM25 over word-bigram terms replayed by an
  * independent driver-side reference (BigInt exact arithmetic), degenerate
  * -document contracts, the rat4BpBig rounding kernel, and the RRF /
  * char-entropy invariants the oracle gate can't phrase.
  */
class RetrievalOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- independent BM25 reference (pure Scala, BigInt-exact) ----

  private def refTokens(text: String): Seq[String] =
    text.split(" ").filter(_.nonEmpty).toSeq
  private def refBigrams(text: String): Seq[String] = {
    val t = refTokens(text)
    if (t.size < 2) Seq.empty else t.sliding(2).map(_.mkString(" ")).toSeq
  }
  private def bits(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong

  /** Exact replay of RetrievalOps.bm25PairScores at ngram=2: same idf
    * buckets, same per-term half-up basis points, same integer sums.
    */
  private def refBm25(corpus: Seq[(Long, String)],
      queryIds: Set[Long]): Map[(Long, Long), Long] = {
    val grams = corpus.map { case (id, t) => id -> refBigrams(t) }.toMap
    val tf = corpus.flatMap { case (id, t) =>
      refBigrams(t).groupBy(identity).map { case (g, os) => (id, g, os.size.toLong) }
    }
    val n = corpus.size.toLong
    val bigT = tf.map(_._3).sum
    val dl = tf.groupBy(_._1).map { case (id, rs) => id -> rs.map(_._3).sum }
    val df = tf.groupBy(_._2).map { case (g, rs) => g -> rs.size.toLong }
    val out = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for (q <- queryIds.toSeq.sorted; g <- grams(q).distinct) {
      val idf = bits(n) - bits(df(g))
      if (idf >= 1) {
        tf.filter(r => r._2 == g && r._1 != q).foreach { case (d, _, f) =>
          val num = BigInt(22) * idf * f * bigT
          val den = BigInt(10) * f * bigT + BigInt(3) * bigT + BigInt(9) * dl(d) * n
          val bp = (num * 20000 + den) / (den * 2)
          out((q, d)) = out.getOrElse((q, d), 0L) + bp.toLong
        }
      }
    }
    out.toMap
  }

  test("bm25PairScores matches the independent BigInt reference on a " +
      "mixed corpus (shared phrases, rare phrases, degenerate docs)") {
    val corpus = Seq[(Long, String)](
      0L -> "the quick brown fox jumps over the lazy dog",
      1L -> "quick brown fox seen near the river bank today",
      2L -> "the lazy dog sleeps by the river bank",
      3L -> "stock market closes higher on quiet trading day",
      4L -> "quick brown fox quick brown fox quick brown fox",
      5L -> "", // empty: no terms, never a candidate
      6L -> "single", // 1 token: no bigrams, never a candidate
      7L -> "the quick brown fox jumps over the lazy dog") // dup of 0
    val docs = corpus.toDF("doc_id", "text")
    val qids = Seq(0L).toDF("q_id")
    val got = RetrievalOps.bm25PairScores(docs, qids)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = refBm25(corpus, Set(0L))
    assert(got == want, s"got $got\nwant $want")
    // sanity on the semantics the numbers should encode:
    assert(!got.keySet.exists(k => k._2 == 5L || k._2 == 6L),
      "degenerate docs must never be candidates")
    assert(!got.contains((0L, 0L)), "a query never scores itself")
    assert(!got.contains((0L, 3L)),
      "a doc sharing no phrase with the query is never a candidate")
    assert(got((0L, 7L)) > got((0L, 2L)),
      "the verbatim duplicate must outscore the partial-overlap doc")
  }

  test("bm25PairScores: a query that is itself degenerate returns nothing") {
    val docs = Seq(0L -> "", 1L -> "only", 2L -> "a real document here")
      .toDF("doc_id", "text")
    assert(RetrievalOps.bm25PairScores(docs, Seq(0L, 1L).toDF("q_id"))
      .count() === 0)
  }

  test("bm25TopK equals the rank-window form of the pair scores " +
      "(score desc, doc_id asc), and bm25Ranks numbers it 1-based") {
    val sf = SparkTestSession.sf0001
    val docs = Tables.documents(spark, sf)
    val qids = docs.filter(pmod(col("doc_id"), lit(101)) === 0)
      .select(col("doc_id").as("q_id"))
    val pairs = RetrievalOps.bm25PairScores(docs, qids).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.nonEmpty, "fixture queries should retrieve something")
    val wantTop = pairs.groupBy(_._1).toSeq.flatMap { case (q, rs) =>
      rs.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
        .map { case ((_, d, s), i) => (q, d, i + 1L, s) }.toSeq
    }.toSet
    val gotRanks = RetrievalOps.bm25Ranks(docs, qids, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(gotRanks == wantTop)
    val gotTop = RetrievalOps.bm25TopK(docs, qids, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotTop == wantTop.map(t => (t._1, t._2, t._4)))
  }

  test("stagedCorpusState: ranks from the shared staged state equal the " +
      "one-pass form, and a second call reuses the artifact pair " +
      "without rebuilding") {
    val sf = SparkTestSession.sf0001
    val docs = Tables.documents(spark, sf)
    val qids = docs.filter(pmod(col("doc_id"), lit(101)) === 0)
      .select(col("doc_id").as("q_id"))
    val (tf, dl) = RetrievalOps.stagedCorpusState(docs, "spec-shared")
    def ranksOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = ranksOf(RetrievalOps.bm25Ranks(docs, qids, 3))
    assert(ranksOf(
      RetrievalOps.bm25RanksFromState(tf, dl, docs, qids, 3)) == want)
    // reuse check: a marker dropped into the staged dir survives the
    // second call only if the memo skips the overwrite rebuild
    // (underscore-prefixed files are invisible to the parquet reader)
    val base = s"${graft.operators.StageIO.artifactRoot(spark)}" +
      "/bm25_state/spec-shared-n2"
    val marker = new org.apache.hadoop.fs.Path(s"$base/tf/_spec_marker")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    fs.create(marker, true).close()
    val (tf2, dl2) = RetrievalOps.stagedCorpusState(docs, "spec-shared")
    assert(fs.exists(marker), "second call must not rebuild the state")
    assert(ranksOf(
      RetrievalOps.bm25RanksFromState(tf2, dl2, docs, qids, 3)) == want)
  }

  test("corpusTag: the memo key survives a basename collision (advisor " +
      "r17) and is stable for one canonical path") {
    val a = RetrievalOps.corpusTag("docs", "/tmp/fixture-a/data")
    val b = RetrievalOps.corpusTag("docs", "/tmp/fixture-b/data")
    assert(a != b,
      "same basename under different parents must not share a tag")
    assert(a == RetrievalOps.corpusTag("docs", "/tmp/fixture-a/data"))
    // lexical normalization folds into the canonical path, so surface
    // spellings of ONE directory do share the staged state
    assert(a == RetrievalOps.corpusTag("docs", "/tmp/./fixture-a//data"))
    assert(a.startsWith("docs-") && a.matches("docs-[0-9a-f]{16}"))
  }

  test("phraseOccurrences: positional AND sees ADJACENCY, not bigram " +
      "co-occurrence; repeated true occurrences count; order matters") {
    val docs = Seq[(Long, String)](
      0L -> "a b c x", // the query doc: phrase = [a, b, c]
      1L -> "z a b c z a b c", // two true occurrences
      2L -> "a b x x b c", // BOTH bigrams present, NO phrase anchor
      3L -> "a b c", // one occurrence
      4L -> "c b a") // the tokens, wrong order
      .toDF("doc_id", "text")
    val pos = RetrievalOps.positionalPostings(docs)
    val tt = graft.operators.TextOps.tokensNonEmpty(col("text"))
    val phrases = docs.filter(col("doc_id") === 0)
      .select(col("doc_id").as("q_id"),
        posexplode(slice(tt, 1, 3)).as(Seq("off", "tok")))
      .select(col("q_id"), col("tok"), col("off").cast("long").as("off"),
        lit(3L).as("plen"))
    val got = RetrievalOps.phraseOccurrences(pos, phrases).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 1L) -> 2L, (0L, 3L) -> 1L),
      s"bigram co-occurrence must NOT match and dup occurrences must " +
        s"count: $got")
  }

  // ---- Det.rat4BpBig ----

  test("rat4BpBig: half-up integer basis points, exact past the long " +
      "envelope, NULL on a zero denominator") {
    val cases = Seq[(Long, Long)](
      (1L, 61L), (1L, 80L), (1L, 3L), (0L, 7L), (7L, 7L),
      (1L, 20000L), (1L, 40000L), (3L, 40000L), // .00005 boundaries
      (123456789012345L, 987654321L),
      (9007199254740993L, 30000L)) // quotient > 2^53: double math would drift
    val df = cases.toDF("num", "den")
      .select(col("num"), col("den"),
        queries.Det.rat4BpBig(col("num"), col("den")).as("bp"))
    df.collect().foreach { r =>
      val (num, den) = (r.getLong(0), r.getLong(1))
      val want = ((BigInt(num) * 20000 + den) / (BigInt(den) * 2)).toLong
      assert(r.getLong(2) == want, s"$num/$den")
    }
    val z = Seq((5L, 0L)).toDF("num", "den")
      .select(queries.Det.rat4BpBig(col("num"), col("den"))).collect()
    assert(z(0).isNullAt(0), "zero denominator must be NULL")
  }

  // ---- x125 char-entropy invariants ----

  test("x125: surprise is 0 exactly for single-character-alphabet docs, " +
      "positive otherwise, and n_chars_seen equals the text length") {
    val sf = SparkTestSession.sf0001
    val out = SparkEntry.queries("x125_char_entropy")(spark, sf)
    val byId = out.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.keySet == docs.keySet, "every doc keeps a row")
    byId.foreach { case (id, (n, distinct, surprise)) =>
      assert(n == docs(id), s"doc $id char count")
      assert(surprise >= 0, s"doc $id negative surprise")
      if (distinct > 1) assert(surprise > 0, s"doc $id multi-char alphabet")
    }
    // driver replay of the bucket formula itself on constructed extremes
    def surprise(t: String): Long = {
      val cs = t.groupBy(identity).map(_._2.length.toLong); val n = cs.sum
      cs.map(c => c * (bits(n) - bits(c))).sum
    }
    assert(surprise("aaaaaaaa") == 0L)
    assert(surprise("abcdefgh") == 8L * (bits(8) - bits(1)))
  }

  // ---- bm25PairScoresForTerms ----

  test("bm25PairScoresForTerms with each query doc's own bigrams equals " +
      "bm25PairScores exactly") {
    val corpus = Seq[(Long, String)](
      0L -> "the quick brown fox jumps over the lazy dog",
      1L -> "quick brown fox seen near the river bank today",
      2L -> "the lazy dog sleeps by the river bank",
      3L -> "stock market closes higher on quiet trading day")
    val docs = corpus.toDF("doc_id", "text")
    val qids = Seq(0L, 2L).toDF("q_id")
    val viaIds = RetrievalOps.bm25PairScores(docs, qids).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val qterms = Seq(0L, 2L).flatMap { q =>
      refBigrams(corpus.find(_._1 == q).get._2).distinct.map(q -> _)
    }.toDF("q_id", "tok")
    val viaTerms = RetrievalOps.bm25PairScoresForTerms(docs, qterms)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(viaTerms == viaIds)
  }

  // ---- x129 agreement census invariants ----

  test("x129: n_both <= min(n_lex, n_sem) <= 10, and agreement replays " +
      "from the reported integers") {
    val sf = SparkTestSession.sf0001
    val out = SparkEntry.queries("x129_lex_sem_agreement")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nl, ns, nb) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nl <= 10 && ns <= 10, s"shortlists capped at 10: $r")
      assert(nb <= math.min(nl, ns), s"overlap bound violated: $r")
      val u = nl + ns - nb
      if (u == 0) assert(r.isNullAt(4))
      else {
        val want = ((BigInt(nb) * 20000 + u) / (BigInt(u) * 2)).toLong / 10000.0
        assert(r.getDouble(4) == want, s"agreement replay failed: $r")
      }
    }
  }

  // ---- x130 PRF invariants ----

  test("x130: expansion only ADDS terms, so the expanded candidate set " +
      "contains the seed candidate set, and output is top-3 per query") {
    val sf = SparkTestSession.sf0001
    val docs = Tables.documents(spark, sf)
    val qids = docs.filter(pmod(col("doc_id"), lit(101)) === 0)
      .select(col("doc_id").as("q_id"))
    val seedCands = RetrievalOps.bm25PairScores(docs, qids).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = SparkEntry.queries("x130_bm25_prf")(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.length <= 3, s"query $q emitted ${rs.length} rows")
    }
    // the re-scored pass sees every seed candidate (superset term set):
    // any output row absent from the seed candidate set must have been
    // reached via an expansion term, which is fine — but a seed TOP
    // result can only be displaced, never dropped from candidacy. Check
    // via the pair-scores form of the expanded pass:
    import graft.operators.{StageIO, TextOps}
    import graft.functions.AggExprs
    val seed = RetrievalOps.bm25TopK(docs, qids, 3)
      .select(col("q_id"), col("doc_id"))
    val fb = RetrievalOps.termCounts(docs, 2).join(seed, "doc_id")
      .groupBy("q_id", "tok").agg(sum(col("tf")).cast("long").as("ftf"))
      .select(col("q_id"), col("tok"),
        TextOps.md5Key60(col("tok")).as("hk"), col("ftf"))
    val top5 = fb.groupBy("q_id")
      .agg(AggExprs.topKByScore(col("ftf").cast("double"), col("hk"), 5)
        .as("_tk"))
      .select(col("q_id"), explode(col("_tk")).as("_e"))
    val expansion = top5.join(fb.select(col("q_id").as("_q"),
        col("hk").as("_hk"), col("tok")),
        col("q_id") === col("_q") && col("_e.id") === col("_hk"))
      .select(col("q_id"), col("tok"))
    val qt = RetrievalOps.stageQueryTerms(docs, qids, 2)
      .select(col("q_id"), col("tok")).union(expansion).distinct()
    val expCands = RetrievalOps.bm25PairScoresForTerms(docs, qt).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(seedCands.subsetOf(expCands),
      s"missing seed candidates: ${(seedCands -- expCands).take(5)}")
  }

  // ---- x132 MRR gate invariants ----

  test("x132: every near-dup query keeps a row, ranks are >= 1, rr_bp " +
      "replays from best_rank, and the fixture's dup partners are " +
      "retrieved at rank 1 (they share nearly all phrases)") {
    val sf = SparkTestSession.sf0001
    val out = SparkEntry.queries("x132_bm25_mrr")(spark, sf).collect()
    assert(out.nonEmpty, "fixture plants near-dup families")
    val truthQs = graft.operators.DedupOps
      .jaccardNearDups(Tables.documents(spark, sf), "text", "doc_id", 0.8)
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(out.map(_.getLong(0)).toSet == truthQs,
      "one row per doc with a truth partner, exactly")
    out.foreach { r =>
      assert(r.getLong(1) >= 1, s"n_rel: $r")
      if (r.isNullAt(2)) assert(r.getLong(3) == 0L, s"no-candidate rr: $r")
      else {
        val rank = r.getLong(2)
        assert(rank >= 1, s"rank: $r")
        val want = ((BigInt(1) * 20000 + rank) / (BigInt(rank) * 2)).toLong
        assert(r.getLong(3) == want, s"rr replay: $r")
      }
    }
    // near-verbatim duplicates share nearly every phrase: rank 1 is the
    // expected fixture-wide outcome and pins truth/retrieval coherence
    assert(out.forall(r => !r.isNullAt(2) && r.getLong(2) == 1L),
      "a planted near-dup must be the top BM25 result for its twin")
  }

  // ---- x126 fusion invariants ----

  test("x126: every fused row carries at least one rank, rrf_bp is the " +
      "exact sum of its reciprocal-rank terms, and top-3 per query holds") {
    val sf = SparkTestSession.sf0001
    val out = SparkEntry.queries("x126_hybrid_rrf")(spark, sf).collect()
    assert(out.nonEmpty)
    def term(rank: Any): Long = rank match {
      case null => 0L
      case r: Long => ((BigInt(1) * 20000 + (60 + r)) / (2 * (BigInt(60) + r))).toLong
    }
    out.foreach { r =>
      val lex = if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2))
      val sem = if (r.isNullAt(3)) null else java.lang.Long.valueOf(r.getLong(3))
      assert(lex != null || sem != null, s"rankless row $r")
      val want = term(if (lex == null) null else lex.longValue()) +
        term(if (sem == null) null else sem.longValue())
      assert(r.getLong(4) == want, s"rrf_bp mismatch in $r")
    }
    val perQ = out.groupBy(_.getLong(0))
    perQ.foreach { case (q, rs) => assert(rs.length <= 3, s"query $q") }
  }
}
