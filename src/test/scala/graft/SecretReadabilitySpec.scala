package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Hand-computed cases for the secret scanner ([[TextOps.luhnValid]] /
  * [[TextOps.secretScan]], x98) and the Flesch–Kincaid readability
  * kernel ([[TextOps.readability]], x99).
  */
class SecretReadabilitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def luhnOf(s: String): Boolean = {
    import spark.implicits._
    Seq(s).toDF("d").select(TextOps.luhnValid(col("d")).as("v"))
      .collect()(0).getBoolean(0)
  }

  test("luhn: classic test numbers") {
    assert(luhnOf("4111111111111111"))      // canonical Luhn-valid
    assert(!luhnOf("4111111111111112"))
    assert(luhnOf("4539578763621486"))      // x98's valid plant (…%10==6)
    assert(!luhnOf("4539578763621480"))
  }

  test("luhn: Column kernel equals the reference on a seeded batch") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val cases = (0 until 300).map(_ =>
      (0 until 16).map(_ => rnd.nextInt(10)).mkString)
    val got = cases.toDF("d")
      .select(col("d"), TextOps.luhnValid(col("d")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach(c => assert(got(c) == LuhnProps.ref(c), c))
    assert(cases.exists(LuhnProps.ref), "seeded batch should hit a valid case")
  }

  test("secretScan: Luhn gates the CC redaction; hex keys always redact") {
    import spark.implicits._
    val rows = TextOps.secretScan(Seq(
      (1L, "pay 4111111111111111 now"),            // valid -> <CC>
      (2L, "order 4111111111111112 ref"),          // invalid -> untouched
      (3L, "key deadbeefdeadbeefdeadbeefdeadbeef end"), // -> <KEY>
      (4L, "clean text only")).toDF("doc_id", "text"),
      "doc_id", "text").orderBy("doc_id").collect()
    assert(rows(0).getAs[Long]("n_cc_cand") == 1 &&
      rows(0).getAs[Long]("n_cc_valid") == 1 &&
      rows(0).getAs[String]("redacted") == "pay <CC> now")
    assert(rows(1).getAs[Long]("n_cc_cand") == 1 &&
      rows(1).getAs[Long]("n_cc_valid") == 0 &&
      rows(1).getAs[String]("redacted") == "order 4111111111111112 ref")
    assert(rows(2).getAs[Long]("n_keys") == 1 &&
      rows(2).getAs[String]("redacted") == "key <KEY> end")
    assert(rows(3).getAs[String]("redacted") == "clean text only")
  }

  test("canonicalizeCode: comment- and whitespace-blind, prose preserved") {
    import spark.implicits._
    def canon(s: String): String =
      Seq(s).toDF("t").select(TextOps.canonicalizeCode(col("t")).as("c"))
        .collect()(0).getString(0)
    val a = "int f() {\n  // say hi\n  return 1; /* v1 */\n}"
    val b = "int f() { /* totally\n different\n comments */ return 1;\n}"
    assert(canon(a) == canon(b) && canon(a) == "int f() { return 1; }")
    // a '/*' inside a line comment must not eat following code (block
    // comments strip FIRST, so an unmatched '/*' in a // comment is
    // removed with its line, not paired across lines)
    val c = "x = 1; // open /* here\ny = 2;"
    assert(canon(c) == "x = 1; y = 2;", canon(c))
    assert(canon("plain prose stays put") == "plain prose stays put")
  }

  test("readability: hand-computed grade and bands") {
    import spark.implicits._
    def row(text: String) =
      TextOps.readability(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text").collect()(0)
    // "the cat\nran far." -> W=4 S=2 Syl=4;
    // num = 39*16 + 1180*8 - 1559*8 = 624 + 9440 - 12472 < 0 -> clamp 0
    val r = row("the cat\nran far.")
    assert(r.getAs[Long]("n_words") == 4 && r.getAs[Long]("n_sent") == 2 &&
      r.getAs[Long]("n_syll") == 4)
    assert(r.getAs[Double]("fk_grade") == 0.0)
    assert(r.getAs[String]("band") == "easy")
    // one long polysyllabic sentence: W=4 S=1, vowel groups:
    // unconstitutional=6, extraordinary=5, incomprehensibility=8,
    // onomatopoeia=5 -> Syl=24
    // num = 39*16 + 1180*24 - 1559*4 = 624 + 28320 - 6236 = 22708
    // den = 400 -> grade 56.77 -> hard
    val h = row("unconstitutional extraordinary incomprehensibility onomatopoeia")
    assert(h.getAs[Long]("n_syll") == 24, s"syll=${h.getAs[Long]("n_syll")}")
    assert(h.getAs[Double]("fk_grade") == 56.77)
    assert(h.getAs[String]("band") == "hard")
  }
}
