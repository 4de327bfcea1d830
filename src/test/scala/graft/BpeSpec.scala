package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeOps

/** [[graft.operators.BpeOps]] — the training loop (iterated weighted-pair
  * argmax, the part the x57 oracle cannot replay in SQL) against a
  * hand-computed Sennrich-style fixture, the documented single-pass
  * re-pick semantics on consecutive runs, determinism, and the
  * conservation/reconstruction invariants of application on the real
  * sf0.001 fixture.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** One doc per word occurrence keeps the weighted counts obvious. */
  private def corpus(words: (String, Int)*) = {
    import spark.implicits._
    words.flatMap { case (w, n) => Seq.fill(n)(w) }.toDF("text")
  }

  test("train reproduces the hand-computed merge sequence with counts") {
    // low×5 lower×2 newest×6 widest×3 — worked pair tables in comments:
    //   step1: (e,s)=(s,t)=(t,</w>)=9 tie → lhs asc → (e,s)
    //   step2: (es,t)=(t,</w>)=9 tie → (es,t)
    //   step3: (est,</w>)=9
    //   step4: (l,o)=(o,w)=7 tie → (l,o)
    //   step5: (lo,w)=7
    //   step6: (e,w)=(n,e)=(w,est</w>)=6 tie → (e,w)
    val docs = corpus("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
    val got = BpeOps.train(docs, "text", numMerges = 6)
      .orderBy("rank")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val want = Seq(
      (0, "e", "s", 9L),
      (1, "es", "t", 9L),
      (2, "est", "</w>", 9L),
      (3, "l", "o", 7L),
      (4, "lo", "w", 7L),
      (5, "e", "w", 6L))
    assert(got == want, s"merge table mismatch: $got")
  }

  test("consecutive runs re-pick the same pair across steps (single-pass semantics)") {
    // 'aaaab' → 'a a a a b </w>': one replace pass leaves 'aa a a b </w>'
    // (the second occurrence's separator was consumed), so (a,a) is
    // still the argmax — (aa,a)=3 ties but lhs 'a' < 'aa', and (a,b)=3
    // ties but rhs 'a' < 'b' — and gets rank 1 too: the documented
    // engine-portable variant of canonical greedy BPE.
    val docs = corpus("aaaab" -> 3)
    val got = BpeOps.train(docs, "text", numMerges = 3)
      .orderBy("rank").select("lhs", "rhs", "cnt")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got.take(2) == Seq(("a", "a", 9L), ("a", "a", 3L)),
      s"expected (a,a) re-picked at rank 1: $got")
    // after 'aa aa b </w>': (aa,aa)=(aa,b)=(b,</w>)=3 → lhs then rhs asc
    assert(got(2) == (("aa", "aa", 3L)), s"rank-2 merge: $got")
  }

  test("training is deterministic and stops early below minCount") {
    val docs = corpus("ab" -> 3, "cd" -> 1)
    val a = BpeOps.train(docs, "text", 8).collect().toSeq
    val b = BpeOps.train(docs, "text", 8).collect().toSeq
    assert(a == b, "two trainings diverged")
    // viable merges: (a,b)=3, (ab,</w>)=3; the cd word's pairs are all
    // count 1 < minCount=2 → early stop at 2 merges despite numMerges=8
    assert(a.size == 2, s"expected early stop at 2 merges: $a")
  }

  test("doc-level tokenization preserves order, rebuilds text, keeps empty docs") {
    import spark.implicits._
    val train = corpus("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
    val merges = BpeOps.train(train, "text", numMerges = 6)
    val docs = Seq((1L, "low lower"), (2L, ""), (3L, "newest"))
      .toDF("doc_id", "text")
    val out = BpeOps.tokenizeDocs(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
    // exact sequences under the hand-verified merge table
    assert(out(0) == ((1L, Seq("low", "</w>", "low", "e", "r", "</w>"))),
      s"doc 1: ${out(0)}")
    assert(out(1) == ((2L, Seq())), s"empty doc must keep an empty row: ${out(1)}")
    assert(out(2) == ((3L, Seq("n", "ew", "est</w>"))), s"doc 3: ${out(2)}")
    // reconstruction: strip markers → the original word sequence
    def rebuild(toks: Seq[String]) =
      toks.mkString("").replace("</w>", " ").trim
    assert(rebuild(out(0)._2) == "low lower")
  }

  test("application conserves words and reconstructs them (sf0.001)") {
    val docs = Tables.documents(spark, sf)
    val merges = BpeOps.train(docs, "text", numMerges = 8)
    val words = BpeOps.tokenizeWords(docs, "text", merges)
    // exactly one token per word carries the </w> marker, and it is last
    val markerViolations = words.filter(
      size(filter(col("tokens"), t => t.contains("</w>"))) =!= 1 ||
        !element_at(col("tokens"), -1).contains("</w>")).count()
    assert(markerViolations == 0L)
    // concatenating a word's tokens (marker stripped) rebuilds the word
    val rebuildViolations = words.filter(
      regexp_replace(concat_ws("", col("tokens")), "</w>$", "") =!= col("word"))
      .count()
    assert(rebuildViolations == 0L)
    // token-count conservation: Σ n over marker-carrying token types ==
    // total word occurrences in the corpus
    val counts = BpeOps.tokenCounts(docs, "text", merges)
    val markerTotal = counts.filter(col("token").contains("</w>"))
      .agg(sum("n")).head().getLong(0)
    val wordTotal = docs.select(
        explode(graft.operators.TextOps.tokensRegex(col("text"))).as("w"))
      .count()
    assert(markerTotal == wordTotal,
      s"marker-token mass $markerTotal != word occurrences $wordTotal")
    // token-type cardinality is bounded by |alphabet| + numMerges
    val alphabet = docs.select(
        explode(split(concat_ws("", lit(" "),
          graft.operators.TextOps.tokensRegex(col("text")).cast("string")), ""))
          .as("c"))
      .filter(col("c").rlike("[a-z0-9]")).select("c").distinct().count()
    assert(counts.count() <= alphabet + 1 + 8,
      "token types exceed |alphabet| + marker + numMerges")
  }
}
