package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Unicode canonicalization ([[graft.functions.NfcNormalize]] +
  * [[TextOps.canonicalize]]): the NFC cases the ASCII fixture can't
  * exercise, the ASCII fast path, null flow, the SQL registration, and
  * the dedup consequence — byte-different renderings of the same visible
  * text land in one canonical group. All non-ASCII characters appear as
  * explicit \u escapes so the test is independent of source encoding.
  */
class TextNormSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // e + COMBINING ACUTE ACCENT (U+0301) — the NFD rendering
  private val eAcuteNFD = "e\u0301"
  // precomposed LATIN SMALL LETTER E WITH ACUTE (U+00E9) — the NFC form
  private val eAcuteNFC = "\u00e9"

  private def canonOf(raw: Seq[String]): Seq[String] = {
    import spark.implicits._
    raw.toDF("text")
      .select(TextOps.canonicalize(col("text")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("NFC composes combining sequences to precomposed form") {
    import spark.implicits._
    val decomposed = s"caf$eAcuteNFD"
    val precomposed = s"caf$eAcuteNFC"
    assert(decomposed != precomposed, "fixture strings must differ in bytes")
    val out = Seq(decomposed, precomposed).toDF("text")
      .select(graft.functions.TextNormCol.nfcNormalize(col("text")).as("n"))
      .collect().map(_.getString(0))
    assert(out(0) == out(1) && out(1) == precomposed,
      s"NFC must compose: ${out.toSeq.map(_.map(c => f"\\u${c.toInt}%04x"))}")
  }

  test("ASCII fast path is the identity (bytes untouched)") {
    import spark.implicits._
    val s = "Plain ASCII text 123 !@#"
    val out = Seq(s).toDF("text")
      .select(graft.functions.TextNormCol.nfcNormalize(col("text")))
      .head().getString(0)
    assert(out == s)
  }

  test("null propagates, not crashes") {
    import spark.implicits._
    val out = Seq(Some("x"), None).toDF("text")
      .select(graft.functions.TextNormCol.nfcNormalize(col("text")))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(Some("x"), None))
  }

  test("nfc_normalize is on the SQL surface and stays in codegen") {
    // over a parquet-backed column — a literal would be constant-folded
    // and a local Seq would fold into the LocalRelation, leaving nothing
    // in the physical plan to assert on
    Tables.documents(spark, SparkTestSession.sf0001)
      .createOrReplaceTempView("nfc_spec_docs")
    val df = spark.sql(
      "SELECT nfc_normalize(text) AS n FROM nfc_spec_docs")
    assert(df.count() > 0)
    // the fixture is ASCII: the fast path must return it untouched
    assert(df.head().getString(0).nonEmpty)
    // the expression implements doGenCode: the projection must sit inside
    // a WholeStageCodegen span (starred operator), not an interpreted
    // Project fallback
    val plan = df.queryExecution.executedPlan.toString
    val projLine = plan.linesIterator
      .find(_.toLowerCase.contains("nfc_normalize"))
    assert(projLine.exists(_.contains("*(")),
      s"nfc_normalize not in a codegen span:\n$plan")
  }

  test("canonicalize folds case, whitespace runs, and composition form") {
    val c = canonOf(Seq(
      "Hello   World",
      "  hello world ",
      "HELLO\tWORLD",
      s"h${eAcuteNFC}llo world",
      s"h${eAcuteNFD}llo world"))
    assert(c(0) == "hello world" && c(1) == "hello world" && c(2) == "hello world")
    assert(c(3) == c(4) && c(3) == s"h${eAcuteNFC}llo world")
  }

  test("canonical dedup groups byte-different renderings of the same text") {
    import spark.implicits._
    // E + COMBINING ACUTE (decomposed uppercase) vs precomposed É
    val docs = Seq(
      (1L, "The  Quick Brown Fox"),
      (2L, "the quick brown fox"),            // case + spacing twin of 1
      (3L, s"caf$eAcuteNFC menu"),
      (4L, "CAFE\u0301   menu"),             // composition + case twin of 3
      (5L, "something else entirely"))
      .toDF("doc_id", "text")
    val groups = docs
      .groupBy(md5(TextOps.canonicalize(col("text"))).as("ck"))
      .agg(min("doc_id").as("survivor"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(groups == Map(1L -> 2L, 3L -> 2L, 5L -> 1L), s"got $groups")
  }
}
