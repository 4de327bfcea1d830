package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Hand-computed cases for the Gopher rule battery and C4 line cleaning
  * ([[TextOps.gopherRules]] / [[TextOps.c4Clean]]) — each rule tripped in
  * isolation, the keep conjunction, and the cleaned-text transform
  * (including the NULL page drop). The x96/x97 oracle rows gate the same
  * kernels against DuckDB over the planted corpus; this spec pins the
  * arithmetic on inputs small enough to verify by eye.
  */
class GopherC4Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def gopherRow(text: String) = {
    import spark.implicits._
    TextOps.gopherRules(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").collect()(0)
  }

  private def c4Row(text: String) = {
    import spark.implicits._
    TextOps.c4Clean(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").collect()(0)
  }

  // 56 normal words over 7 lines: every rule passes
  private val goodDoc = (0 until 7).map { i =>
    s"the quick brown fox jumps over lazy dog$i."
  }.mkString("\n")

  test("gopher: a clean 56-word doc passes all seven rules") {
    val r = gopherRow(goodDoc)
    assert(r.getAs[Long]("n_words") == 56)
    assert(r.getAs[Long]("n_lines") == 7)
    assert(r.getAs[Long]("n_stop") == 7)  // 'the' x7; 'over' not in list
    (Seq("r_wordcount", "r_wordlen", "r_symbol", "r_ellipsis", "r_bullet",
      "r_alpha", "r_stopword") :+ "keep").foreach(c =>
      assert(r.getAs[Long](c) == 1L, c))
  }

  test("gopher: word-count floor trips r_wordcount only") {
    val r = gopherRow("the cat sat on the mat with that")
    assert(r.getAs[Long]("n_words") == 8)
    assert(r.getAs[Long]("r_wordcount") == 0)
    assert(r.getAs[Long]("r_stopword") == 1) // the, with, that
    assert(r.getAs[Long]("keep") == 0)
  }

  test("gopher: mean word length bounds (r_wordlen)") {
    // 56 single-char words: mean 1 < 3
    val short = (0 until 7).map(_ => "a b c d e f g h").mkString("\n")
    assert(gopherRow(short).getAs[Long]("r_wordlen") == 0)
    // long pseudo-words: mean > 10
    val long = (0 until 7).map(_ =>
      "abcdefghijklm " * 7 + "abcdefghijklm").mkString("\n")
    assert(gopherRow(long).getAs[Long]("r_wordlen") == 0)
  }

  test("gopher: symbol ratio over 10% trips r_symbol") {
    // 8 of 56 words are '#': 8*10 > 56
    val doc = (0 until 7).map(i =>
      if (i == 0) "# # # # # # # #"
      else "the quick brown fox jumps over lazy dog").mkString("\n")
    val r = gopherRow(doc)
    assert(r.getAs[Long]("n_sym") == 8)
    assert(r.getAs[Long]("r_symbol") == 0)
    // 8 non-alpha of 56 still leaves alpha fraction >= 0.8 (240 >= 224)
    assert(r.getAs[Long]("n_alpha") == 48)
    assert(r.getAs[Long]("r_alpha") == 1)
  }

  test("gopher: ellipsis and bullet line fractions") {
    // 3 of 7 lines end '...': 30 > 21 -> trip
    val ell = (0 until 7).map(i =>
      "the quick brown fox" + (if (i < 3) "..." else ".")).mkString("\n")
    assert(gopherRow(ell).getAs[Long]("r_ellipsis") == 0)
    // 2 of 7: 20 <= 21 -> pass
    val ell2 = (0 until 7).map(i =>
      "the quick brown fox" + (if (i < 2) "..." else ".")).mkString("\n")
    assert(gopherRow(ell2).getAs[Long]("r_ellipsis") == 1)
    // all lines bullets: 70 > 63 -> trip
    val bul = (0 until 7).map(_ => "- the quick brown fox.").mkString("\n")
    assert(gopherRow(bul).getAs[Long]("r_bullet") == 0)
  }

  test("gopher: required-stopword floor uses the Gopher list, not the scoring list") {
    // 'a'/'in'/'is' are scoring stopwords but NOT Gopher-required
    val r = gopherRow((0 until 7).map(_ => "a cat is in a big red box").mkString("\n"))
    assert(r.getAs[Long]("n_stop") == 0)
    assert(r.getAs[Long]("r_stopword") == 0)
  }

  test("c4: keeps only terminal-punctuated lines with >= 5 words") {
    val doc = Seq(
      "one two three four five.",   // kept
      "too short.",                 // < 5 words
      "no terminal punctuation at all here", // no punct
      "does this question have five words?", // kept
      "she said it was \"quoted\"").mkString("\n") // ends with quote, 5 words
    val r = c4Row(doc)
    assert(r.getAs[Long]("n_lines") == 5)
    assert(r.getAs[Long]("n_kept") == 3)
    assert(r.getAs[Long]("keep") == 1)
    assert(r.getAs[String]("cleaned") ==
      "one two three four five.\ndoes this question have five words?\n" +
        "she said it was \"quoted\"")
  }

  test("c4: page-level drops (lorem ipsum, curly brace, too few kept lines)") {
    val base = Seq(
      "one two three four five.",
      "six seven eight nine ten.",
      "eleven twelve thirteen fourteen fifteen.").mkString("\n")
    assert(c4Row(base).getAs[Long]("keep") == 1)
    val lorem = base + "\nthis page has Lorem Ipsum filler."
    val rl = c4Row(lorem)
    assert(rl.getAs[Long]("keep") == 0)
    assert(rl.getAs[String]("cleaned") == null)
    val curly = base + "\nfunction() { return 0; }"
    assert(c4Row(curly).getAs[Long]("keep") == 0)
    val twoKept = Seq("one two three four five.",
      "six seven eight nine ten.", "short.").mkString("\n")
    val rt = c4Row(twoKept)
    assert(rt.getAs[Long]("n_kept") == 2)
    assert(rt.getAs[Long]("keep") == 0)
    assert(rt.getAs[String]("cleaned") == null)
  }
}
