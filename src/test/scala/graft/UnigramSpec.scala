package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.UnigramExprs
import graft.operators.UnigramLmOps

class UnigramSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def segment(word: String, table: Seq[(String, Long)]): Seq[String] = {
    val total = table.map(_._2).sum
    def bl(x: Long) = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val pieces = table.map(_._1).toArray
    val costs = table.map(t => bl(total) - bl(t._2)).toArray
    Seq(word).toDF("w")
      .select(UnigramExprs.unigramSegment(col("w"), pieces, costs).as("p"))
      .head().getSeq[String](0)
  }

  test("segmentation picks the min-bit-cost path, not min pieces") {
    // total 8 (bitlen 4): a:4→cost 1, b:2→2, ab:2→2.
    // [ab] cost 2 beats [a,b] cost 3.
    assert(segment("ab", Seq(("a", 4L), ("b", 2L), ("ab", 2L)))
      == Seq("ab"))
    // but a CHEAP char pair can beat an expensive long piece:
    // total 16 (bitlen 5): a:8→1, b:7→2, ab:1→4 — [a,b]=3 < [ab]=4
    assert(segment("ab", Seq(("a", 8L), ("b", 7L), ("ab", 1L)))
      == Seq("a", "b"))
  }

  test("cost tie breaks on fewer pieces, then lexicographic path") {
    // total 8: x:2→2, y:2→2, xy:4→1, so [xy]=1 wins over [x,y]=4
    assert(segment("xy", Seq(("x", 2L), ("y", 2L), ("xy", 4L)))
      == Seq("xy"))
    // equal cost AND k: "abc" as [a,bc] vs [ab,c] — craft equal costs:
    // total 16: a:4→2, c:4→2, ab:4→2, bc:4→2 → both paths cost 4, k=2;
    // lexicographic: ["a","bc"] < ["ab","c"] (a < ab)
    assert(segment("abc",
        Seq(("a", 4L), ("c", 4L), ("ab", 2L), ("bc", 2L)))
      == Seq("a", "bc"))
  }

  test("unseen character falls back to a max-cost single-char piece") {
    val got = segment("aqb", Seq(("a", 4L), ("b", 2L), ("ab", 2L)))
    assert(got == Seq("a", "q", "b"))
  }

  test("train: chars always survive with count >= 1; prune drops light pieces") {
    val docs = (1 to 50).map(i => (i.toLong, "lowlow lower"))
      .toDF("doc_id", "text")
    val table = UnigramLmOps.train(docs, "text", maxPieceLen = 4,
        maxSeed = 8, rounds = 2, pruneBp = 50L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // every character of the corpus alphabet is present
    "lower".foreach(c => assert(table.contains(c.toString), s"char $c"))
    assert(table.values.forall(_ >= 1L))
    // a dominant substring survives as a multi-char piece
    assert(table.keys.exists(_.length >= 2), s"no multi piece: $table")
  }

  test("tokenCountsPerDoc: occurrences join the per-word segmentation") {
    val docs = Seq((1L, "ab ab"), (2L, "ab"), (3L, "")).toDF("doc_id", "text")
    // force [ab] single-piece segmentation
    val pieces = Seq(("a", 1L), ("b", 1L), ("ab", 8L)).toDF("piece", "cnt")
    val got = UnigramLmOps.tokenCountsPerDoc(docs, "doc_id", "text", pieces)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L)) // doc 3 empty → absent
  }

  test("UnigramStream merged log equals one-pass counts; compact folds; driver runs") {
    import graft.streaming.UnigramStream
    val sf = SparkTestSession.sf0001
    val docs = Tables.documents(spark, sf)
    val pieces = spark.read.parquet(
      graft.queries.Ext3Queries.x122Build(spark, sf))
    val store = graft.operators.StageIO.resolve(spark, None, "ug-spec")
    (0L to 2L).foreach { k =>
      UnigramStream.applyBatch(docs.filter(pmod(col("doc_id"), lit(3)) === k),
        "text", pieces, store, k)
    }
    // materialize BEFORE compact: the lazy readCounts plan references
    // batch files the compaction swap deletes
    val merged = UnigramStream.readCounts(spark, store).get
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocab = docs
      .select(explode(graft.operators.TextOps.tokensRegex(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcount"))
    val direct = UnigramLmOps.pieceCounts(
        UnigramLmOps.segmentVocabTable(vocab, pieces))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == direct)
    UnigramStream.compact(spark, store)
    val folded = UnigramStream.readCounts(spark, store).get
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(folded == merged)
    // streaming driver: one wave through the real foreachBatch query
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val store2 = graft.operators.StageIO.resolve(spark, None, "ug-spec2")
    val q = UnigramStream.startCountMaintenance(
      input.toDF().toDF("doc_id", "text"), "text", pieces, store2,
      graft.operators.StageIO.resolve(spark, None, "ug-ckpt"))
    try {
      input.addData(docs.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = UnigramStream.readCounts(spark, store2).get
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == direct)
  }

  test("greedy maximal-munch: longest piece wins; unknown chars pass through") {
    import graft.functions.UnigramExprs
    def greedy(word: String, pieces: Seq[String]): Seq[String] =
      Seq(word).toDF("w")
        .select(UnigramExprs.greedySegment(col("w"), pieces.toArray).as("p"))
        .head().getSeq[String](0)
    // longest match at each position, not best-scoring overall:
    // "abcd" with {ab, abc, d, a, b, c} → [abc, d] (abc beats ab)
    assert(greedy("abcd", Seq("ab", "abc", "d", "a", "b", "c"))
      == Seq("abc", "d"))
    // greedy can be SUBOPTIMAL vs Viterbi: "abc" with {ab, c, a, bc} →
    // greedy [ab, c]; a Viterbi under equal costs could pick [a, bc] —
    // the disagreement x123 measures
    assert(greedy("abc", Seq("ab", "c", "a", "bc")) == Seq("ab", "c"))
    // unknown char emits itself and the walk continues
    assert(greedy("axb", Seq("a", "b")) == Seq("a", "x", "b"))
  }

  test("train output matches the x122 query surface at sf0.001") {
    val out = SparkEntry.queries("x122_unigram_train")(
      spark, SparkTestSession.sf0001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // single chars of the corpus alphabet all present; counts positive
    assert(rows.forall(_.getLong(1) >= 1L))
    val pieces = rows.map(_.getString(0))
    assert(pieces.distinct.length == pieces.length)
  }
}
