package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DedupOps, SimilarityOps, TextOps}

class ExtOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("shingles: 3-grams of a 5-token doc; short docs empty") {
    val df = Seq("a b c d e", "a b").toDF("text")
      .select(TextOps.shingles(TextOps.tokens(col("text"))).as("sh"))
    val Array(r1, r2) = df.collect()
    assert(r1.getSeq[String](0) == Seq("a b c", "b c d", "c d e"))
    assert(r2.getSeq[String](0).isEmpty)
  }

  test("fingerprint is order-insensitive over the token bag") {
    val df = Seq("b a c a", "a b c c").toDF("text")
      .select(TextOps.fingerprint(TextOps.tokens(col("text"))).as("f"))
    val fps = df.collect().map(_.getString(0))
    assert(fps(0) == fps(1)) // same distinct-token set {a,b,c}
  }

  test("jaccard: hand-computed value") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(DedupOps.jaccard(col("x"), col("y")).as("j"))
    assert(math.abs(df.head().getDouble(0) - 2.0 / 4.0) < 1e-12)
  }

  test("exact dedup keeps min-id survivor and counts copies") {
    val docs = Seq((1L, "same"), (2L, "same"), (3L, "other")).toDF("doc_id", "text")
    val out = DedupOps.exactDedup(docs, "text", "doc_id")
      .orderBy("survivor").collect()
    assert(out.map(r => (r.getAs[Long]("survivor"), r.getAs[Long]("n_copies"))).toSeq
      == Seq((1L, 2L), (3L, 1L)))
  }

  test("duplicateDiscount: every copy kept, weight floors 1e6/group, singletons full") {
    val docs = Seq((1L, "same"), (2L, "same"), (3L, "same"),
      (4L, "other")).toDF("doc_id", "text")
    val out = DedupOps.duplicateDiscount(docs, md5(col("text")))
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("group_n"),
        r.getAs[Long]("weight_ppm")))
    // 1000000 div 3 = 333333 (both engines floor); the three copies'
    // discounted mass sums to one group's worth minus the floor dust
    assert(out.toSeq == Seq((1L, 3L, 333333L), (2L, 3L, 333333L),
      (3L, 3L, 333333L), (4L, 1L, 1000000L)))
  }

  test("prefixDups: token-boundary prefixes pair; mid-token and equal text don't") {
    val docs = Seq(
      (1L, "a b c d"),            // prefix of 2 and 3
      (2L, "a b c d e f"),        // prefix of 3
      (3L, "a b c d e f g h"),
      (4L, "a b c x"),            // same 3-token opening, diverges in-block
      (5L, "a b c d"),            // equal text to 1 — exact dedup's regime
      (6L, "a b c de")            // 'a b c d' is a CHAR prefix, not a token one
    ).toDF("doc_id", "text")
    val pairs = DedupOps.prefixDups(docs, "text", "doc_id", blockTokens = 3)
      .collect().map(r => (r.getAs[Long]("short_id"), r.getAs[Long]("long_id")))
      .toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (5L, 2L), (5L, 3L)),
      pairs)
  }

  test("prefixDups: a block over maxBlock is dropped from pairing (DF-cap)") {
    val hot = (1L to 5L).map(i => (i, s"same opener words here tail$i x"))
    val cold = Seq((10L, "cold start b"), (11L, "cold start b c d"))
    val pairs = DedupOps.prefixDups((hot ++ cold).toDF("doc_id", "text"),
        "text", "doc_id", blockTokens = 3, maxBlock = 4L)
      .collect().map(r => (r.getAs[Long]("short_id"), r.getAs[Long]("long_id")))
      .toSet
    assert(pairs == Set((10L, 11L)), pairs)
  }

  test("duplicateDiscount: NULL-keyed rows group together instead of vanishing") {
    val docs = Seq((1L, null: String), (2L, null: String), (3L, "t"))
      .toDF("doc_id", "text")
    val out = DedupOps.duplicateDiscount(docs, md5(col("text")))
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("group_n")))
    assert(out.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 1L)),
      "an equi-join on a NULL key must not drop the rows")
  }

  test("minhash LSH finds an exact duplicate pair with jaccard 1.0") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val docs = Seq((1L, base), (2L, base), (3L, "z1 z2 z3 z4 z5 z6 z7 z8"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.minhashNearDups(docs, "text", "doc_id", 0.8).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("doc_a") == 1L)
    assert(pairs.head.getAs[Long]("doc_b") == 2L)
    assert(pairs.head.getAs[Double]("jaccard") == 1.0)
  }

  test("survivors keeps each cluster's min id; untouched docs survive") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val pairs = Seq((1L, 3L, 1.0)).toDF("doc_a", "doc_b", "jaccard")
    val kept = DedupOps.survivors(docs, pairs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
  }

  test("survivors is transitive: a chain A~B~C keeps only A (connected components)") {
    val docs = (1L to 6L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    // chain 1~2~3 (pair (1,3) never emitted) + isolated pair 5~6
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.9), (5L, 6L, 0.9))
      .toDF("doc_a", "doc_b", "jaccard")
    val kept = DedupOps.survivors(docs, pairs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L))
    val labels = DedupOps.clusterLabels(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("bigrams + top-bigram count: hand-computed; sub-2-token docs are 0") {
    val df = Seq("a b a b a", "x", "").toDF("text")
      .select(TextOps.bigrams(TextOps.tokens(col("text"))).as("bg"),
        TextOps.topBigramCount(TextOps.tokens(col("text"))).as("top"))
    val rows = df.collect()
    assert(rows(0).getSeq[String](0) == Seq("a b", "b a", "a b", "b a"))
    assert(rows(0).getInt(1) == 2) // "a b" occurs twice
    assert(rows(1).getSeq[String](0).isEmpty && rows(1).getInt(1) == 0)
    // split("", " ") yields one empty token — still no bigram
    assert(rows(2).getSeq[String](0).isEmpty && rows(2).getInt(1) == 0)
  }

  test("x26: keeps exactly floor(2n/5) docs per language, the best-ranked ones") {
    val sf = SparkTestSession.sf0001
    val kept = SparkEntry.queries("x26_quality_topp")(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = Tables.documents(spark, sf)
      .filter(size(TextOps.tokens(col("text"))) > 0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.nonEmpty)
    kept.foreach { case (lang, k) => assert(k == totals(lang) * 2 / 5,
      s"$lang: kept $k of ${totals(lang)}") }
  }

  test("shared spans: copied paragraph found with exact run length") {
    // doc 2 copies a 12-token span of doc 1 (positions differ), doc 3 is
    // unrelated: 12 shared tokens = 5 matched 8-token windows, one run
    val span = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"pre1 pre2 $span tail1 tail2"),
      (2L, s"other lead in words here $span"),
      (3L, "completely different content with nothing shared at all here"))
      .toDF("doc_id", "text")
    val out = DedupOps.sharedSpanPairs(docs, "text", "doc_id", 8).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Long]("n_matches") == 5) // 12 - 8 + 1 windows
    assert(r.getAs[Long]("max_span") == 12)
  }

  test("shared spans: a DF-capped boilerplate window stops pairing docs") {
    // the same 8-token boilerplate sits in 3 docs (df=3); with cap 2 it
    // leaves the index, so docs sharing ONLY boilerplate no longer pair —
    // while the genuine 2-doc span keeps its pair
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val span = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler one1 one2"), (2L, s"$boiler two1 two2"),
      (3L, s"$boiler three1 three2"),
      (4L, s"lead4 $span"), (5L, s"other5 word5 $span"))
      .toDF("doc_id", "text")
    val uncapped = DedupOps.sharedSpanPairs(docs, "text", "doc_id", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
    val capped = DedupOps.sharedSpanPairs(docs, "text", "doc_id", 8, Some(2L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((4L, 5L)), s"boilerplate pairs must drop: $capped")
  }

  test("spanDedupDrop: keep-longest survivor; no surviving pair shares a span") {
    // docs 1+2 share a 12-token span, doc 2 is longer → 2 survives, 1
    // drops; doc 3 (chained to 2 by a different span) joins the SAME
    // cluster transitively, so only one of {1,2,3} remains
    val span = (1 to 12).map(i => s"s$i").mkString(" ")
    val span2 = (1 to 12).map(i => s"z$i").mkString(" ")
    val docs = Seq(
      (1L, s"pre1 pre2 $span tail1"),
      (2L, s"longer lead in words here $span and extra trailing content $span2"),
      (3L, s"alpha beta $span2 gamma"),
      (4L, "completely different content with nothing shared at all here"))
      .toDF("doc_id", "text")
    val out = DedupOps.spanDedupDrop(docs, "text", "doc_id",
      windowLen = 8, minSpan = 12L)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L, 4L), s"cluster {1,2,3} keeps its longest (2): $ids")
    // the verdict property: survivors re-checked against the kernel share
    // no span at or above the threshold
    val resid = DedupOps.sharedSpanPairs(out, "text", "doc_id", 8)
      .filter(col("max_span") >= 12)
    assert(resid.isEmpty)
  }

  test("spanTrim: the larger-id side loses exactly the shared span") {
    val span = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"u1 u2 u3 u4 u5 $span u6 u7"),
      (2L, s"v1 v2 v3 $span v4 v5 v6 v7 v8 v9 v10"),
      (3L, "plain unrelated words that stay whole"))
      .toDF("doc_id", "text")
    val out = DedupOps.spanTrim(docs, "text", "doc_id",
        windowLen = 4, minSpan = 8L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // min id (first occurrence) keeps its copy — untouched
    assert(out(1L) == (19L, s"u1 u2 u3 u4 u5 $span u6 u7"))
    // larger id is trimmed to exactly the non-span tokens, order kept
    assert(out(2L) == (10L, "v1 v2 v3 v4 v5 v6 v7 v8 v9 v10"))
    assert(out(3L)._2 == "plain unrelated words that stay whole")
  }

  test("span-surgery family: empty/whitespace docs disappear; runs of"
      + " spaces don't mint phantom tokens (the r15 property-found bug)") {
    // split("", " ") = [""] made docs that ARRIVE empty survive as
    // (id, n_tok=1, text=""); the family's tokenizer of record now
    // drops empty tokens, so they vanish like docs TRIMMED to empty do
    val span = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 $span a3"),
      (2L, s"b1 $span b2 b3"),
      (3L, ""), (4L, "   "),
      (5L, "c1  c2  c3 c4 c5 c6 c7 c8 c9")) // doubled spaces inside
      .toDF("doc_id", "text")
    for (out <- Seq(
        DedupOps.spanTrim(docs, "text", "doc_id", 4, 8L),
        DedupOps.exactSubstringDedup(docs, "text", "doc_id", 4, 8L),
        DedupOps.hotSpanScrub(docs, "text", "doc_id", 4, minDf = 9L))) {
      val m = out.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      assert(!m.contains(3L) && !m.contains(4L),
        s"empty/whitespace docs must vanish: ${m.keySet}")
      assert(m(5L) == (9L, "c1 c2 c3 c4 c5 c6 c7 c8 c9"),
        s"n_tok must count real tokens: ${m(5L)}")
    }
  }

  test("spanTrim: a fully-duplicated doc disappears; overlapping ranges union") {
    val span = (1 to 16).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"intro words $span closing remark"),
      (2L, span)) // doc 2 IS the span — loses every token
      .toDF("doc_id", "text")
    val out = DedupOps.spanTrim(docs, "text", "doc_id",
        windowLen = 4, minSpan = 8L)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L), s"doc 2 must vanish: $out")
  }

  test("exactSubstringDedup: one corpus-wide copy survives, not one per pair") {
    // the span sits in THREE docs: pairwise spanTrim keeps doc 1's copy
    // and trims 2 and 3; the corpus census must do the same here — but
    // the distinguishing case is doc 4, whose copy of a DIFFERENT span
    // shared only with doc 5 also loses to keep-first (5 > 4 ⇒ 5 trims)
    val span = (1 to 12).map(i => s"s$i").mkString(" ")
    val spanB = (1 to 12).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, s"u1 u2 u3 u4 u5 $span u6 u7"),
      (2L, s"v1 v2 v3 $span v4 v5 v6 v7 v8 v9 v10"),
      (3L, s"w1 w2 $span w3 w4 w5 w6 w7 w8 w9 w10 w11"),
      (4L, s"x1 x2 x3 $spanB x4 x5 x6 x7 x8 x9 x10"),
      (5L, s"y1 y2 $spanB y3 y4 y5 y6 y7 y8 y9 y10 y11"))
      .toDF("doc_id", "text")
    val out = DedupOps.exactSubstringDedup(docs, "text", "doc_id",
        windowLen = 4, minSpan = 8L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == s"u1 u2 u3 u4 u5 $span u6 u7") // corpus-first keeps
    assert(out(2L) == "v1 v2 v3 v4 v5 v6 v7 v8 v9 v10")
    assert(out(3L) == "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11")
    assert(out(4L) == s"x1 x2 x3 $spanB x4 x5 x6 x7 x8 x9 x10")
    assert(out(5L) == "y1 y2 y3 y4 y5 y6 y7 y8 y9 y10 y11")
  }

  test("exactSubstringDedup: intra-doc repetition trims the later copy; " +
      "sub-threshold runs stay; df cap excludes boilerplate") {
    val span = (1 to 12).map(i => s"s$i").mkString(" ")
    val boiler = (1 to 12).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 $span a3 a4 $span a5 a6"),   // repeats within one doc
      (2L, s"c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),  // no duplication at all
      (3L, s"d1 $boiler d2"),                    // boilerplate in 3 docs
      (4L, s"e1 $boiler e2"),
      (5L, s"f1 $boiler f2"))
      .toDF("doc_id", "text")
    val out = DedupOps.exactSubstringDedup(docs, "text", "doc_id",
        windowLen = 4, minSpan = 8L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // second intra-doc copy removed, first kept
    assert(out(1L) == s"a1 a2 $span a3 a4 a5 a6")
    assert(out(2L) == "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")
    // uncapped: boilerplate keeps its corpus-first copy (doc 3) only
    assert(out(3L) == s"d1 $boiler d2")
    assert(out(4L) == "e1 e2")
    assert(out(5L) == "f1 f2")
    // capped at df <= 2: the 3-doc boilerplate leaves the dup set
    // entirely — every copy stays (x38's scrub is the tool for it)
    val capped = DedupOps.exactSubstringDedup(docs, "text", "doc_id",
        windowLen = 4, minSpan = 8L, maxWindowDf = Some(2L))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(capped(4L) == s"e1 $boiler e2")
    assert(capped(5L) == s"f1 $boiler f2")
    // the intra-doc dup (df = 1) is still trimmed under the cap
    assert(capped(1L) == s"a1 a2 $span a3 a4 a5 a6")
  }

  test("hotSpanScrub: corpus-hot windows vanish from every doc; cold spans stay") {
    // the same 8-token boilerplate sits in docs 1-3 (df=3 >= minDf) — it
    // must disappear from ALL of them (no keep-first side, unlike
    // spanTrim); the span shared by only docs 4+5 (df=2) stays put
    val hot = (1 to 8).map(i => s"h$i").mkString(" ")
    val cold = (1 to 8).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 $hot a3"),
      (2L, s"b1 $hot b2 b3 b4"),
      (3L, hot), // doc 3 IS the boilerplate — scrubbed to nothing
      (4L, s"d1 d2 $cold d3"),
      (5L, s"e1 $cold e2"))
      .toDF("doc_id", "text")
    val out = DedupOps.hotSpanScrub(docs, "text", "doc_id",
        windowLen = 8, minDf = 3L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) == (3L, "a1 a2 a3"))
    assert(out(2L) == (4L, "b1 b2 b3 b4"))
    assert(!out.contains(3L), s"the all-boilerplate doc must vanish: $out")
    assert(out(4L) == (11L, s"d1 d2 $cold d3"))
    assert(out(5L) == (10L, s"e1 $cold e2"))
  }

  test("redactPii: typed placeholders, email-before-ip order, clean text unchanged") {
    import spark.implicits._
    val rows = Seq(
      (1L, "reach me at jane.doe+spam@sub.example.co or 192.168.1.1"),
      (2L, "digits-heavy local part 10.0.0.1@mail.example.com stays ONE email"),
      (3L, "call 555-123-4567 ext 9"),
      (4L, "no pii here at all"),
      (5L, "version 1.2.3 is not an ip, 1.2.3.4 is"))
      .toDF("id", "txt")
      .select(col("id"), graft.operators.TextOps.redactPii(col("txt")).as("clean"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) == "reach me at <EMAIL> or <IP>")
    assert(rows(2L) == "digits-heavy local part <EMAIL> stays ONE email")
    assert(rows(3L) == "call <PHONE> ext 9")
    assert(rows(4L) == "no pii here at all")
    assert(rows(5L) == "version 1.2.3 is not an ip, <IP> is")
  }

  test("x42: predictable bigrams score near zero; rare continuations score high") {
    val sf = SparkTestSession.sf0001
    val rows = SparkEntry.queries("x42_bigram_surprise")(spark, sf).collect()
    assert(rows.nonEmpty)
    val scores = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Double]("surprise")).toMap
    // bits(U) >= bits(B) always: surprise is non-negative, and an average
    // of integer bit gaps stays below 64
    assert(scores.values.forall(v => v >= 0.0 && v < 64.0))
    // the corpus's shared vocabulary means SOME doc sees a predictable
    // continuation (gap 0 for at least one bigram) while rare bigrams
    // (B=1) under hot left-unigrams push other docs well above zero
    assert(scores.values.max > 1.0, s"max ${scores.values.max}")
  }

  test("hotSpanScrub composes in front of the manifest build") {
    // the pre-clean a web corpus actually needs: scrub corpus-hot
    // boilerplate FIRST (metadata joined back by id, n_chars recomputed
    // on the scrubbed text), then run the standard gated build over the
    // cleaned frame — no packed doc carries the boilerplate forward
    import spark.implicits._
    val boiler = (1 to 8).map(i => s"nav$i").mkString(" ")
    val body = (1 to 30).map(i => s"word$i").mkString(" ")
    val docs = ((1 to 6).map(d => (d.toLong, s"$boiler $body doc$d", "en", "src1")) :+
      (7L, s"$body eval holdout", "en", "src9"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val scrubbed = DedupOps.hotSpanScrub(docs, "text", "doc_id",
        windowLen = 8, minDf = 3L)
      .join(docs.select("doc_id", "lang", "source"), "doc_id")
      .withColumn("n_chars", length(col("text")).cast("long"))
    assert(scrubbed.filter(col("text").contains("nav1")).isEmpty,
      "boilerplate must be gone before the build")
    val manifest = graft.operators.PipelineOps.trainingManifest(scrubbed,
      evalSources = Seq("src9"), minQualityBps = 0L, contamThreshold = 0.9,
      rates = Map("en" -> 1.0), defaultRate = 1.0, capacity = 16, shards = 2)
    // the near-identical bodies dedup to one exact survivor (scrubbing
    // unified nothing here — bodies differ by their docN suffix), and
    // every packed doc is a scrubbed doc
    val packedIds = manifest.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(packedIds.nonEmpty && packedIds.subsetOf((1L to 6L).toSet))
    val packedTexts = scrubbed.filter(col("doc_id").isInCollection(packedIds))
    assert(packedTexts.filter(col("text").contains("nav")).isEmpty)
  }

  test("a NULL source routes to the train side, not into the void") {
    // filter(p)/filter(!p) is NOT a partition when p can be NULL (the
    // CurationStream r8 lesson): a NULL-source doc must count as
    // NOT-eval and survive the gate, never vanish from both splits
    import spark.implicits._
    val body = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
        (1L, s"$body one", "en", "src1"),
        (2L, s"$body two", "en", null.asInstanceOf[String]),
        (3L, s"$body eval", "en", "src9"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val gated = graft.operators.PipelineOps.gateAndDedup(docs,
      evalSources = Seq("src9"), minQualityBps = 0L)
    val kept = gated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L),
      s"NULL source must be train-side, eval excluded: $kept")
  }

  test("x31: corpus-common docs score higher typicality than rare-token docs") {
    val sf = SparkTestSession.sf0001
    val rows = SparkEntry.queries("x31_typicality")(spark, sf).collect()
    assert(rows.length == 500)
    val scores = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("typicality")).toMap
    // every score is a valid df ratio: (0, 1]
    assert(scores.values.forall(s => s > 0.0 && s <= 1.0))
    // the fixture's shared SQL-word vocabulary means typical docs sit well
    // above the 1/n_docs floor a unique-token doc would get
    assert(scores.values.max > 0.5)
  }

  test("survivorsByScore: the best-scoring member survives, not the min id") {
    // chain 1~2~3 (transitive cluster); doc 2 has the top score — it
    // survives where plain survivors would keep doc 1. Doc 4 unclustered.
    val docs = Seq((1L, 0.2), (2L, 0.9), (3L, 0.5), (4L, 0.1))
      .toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val kept = DedupOps.survivorsByScore(docs, pairs, "doc_id", "score")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L))
  }

  test("clusterLabels: explicit stageDir receives the parquet handoff") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stage-test").toString
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val labels = DedupOps.clusterLabels(pairs, stageDir = Some(dir)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    val files = new java.io.File(s"$dir/labels").listFiles()
    assert(files != null && files.exists(_.getName.endsWith(".parquet")),
      s"handoff parquet must land under the caller's stageDir: $dir")
  }

  test("clusterLabels: a path far beyond maxIter converges via star contraction") {
    // a 100-node path has diameter 99; propagation alone needs ~50 rounds
    // (labels travel one hop per round from the min end), so maxIter=3
    // forces the large-star/small-star fallback — which must return the
    // same fully-converged labeling the propagation path would
    val ids = (0 until 100).map(i => (i * 13 + 7).toLong)
    val pairs = ids.zip(ids.tail).toDF("doc_a", "doc_b")
    val fast = DedupOps.clusterLabels(pairs, maxIter = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast.size == ids.size)
    assert(fast.values.toSet == Set(ids.min), "one cluster, labeled by the min id")
    val viaPropagation = DedupOps.clusterLabels(pairs, maxIter = 60).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == viaPropagation, "fallback and propagation must agree")
  }

  test("bucketed pair-dedup is a subset of exact pairs with identical cosines") {
    import graft.operators.SimilarityOps
    val emb = Tables.embeddings(spark, SparkTestSession.sf0001)
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = toMap(SimilarityOps.cosinePairs(emb, "vec_id", "embedding", 0.4))
    val blocked = toMap(SimilarityOps.cosinePairsBucketed(
      emb, "vec_id", "embedding", 0.4, bits = 4))
    assert(blocked.nonEmpty, "blocking must not kill all recall on the fixture")
    assert(blocked.keySet.subsetOf(exact.keySet),
      s"blocked pairs must be a subset of exact: ${blocked.keySet -- exact.keySet}")
    blocked.foreach { case (k, cos) =>
      assert(cos == exact(k), s"cosine must be the exact value for $k") }
    // each surviving pair appears exactly once even with multiprobe on
    val dup = SimilarityOps.cosinePairsBucketed(
        emb, "vec_id", "embedding", 0.4, bits = 4)
      .groupBy("id_a", "id_b").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1)
    assert(dup.isEmpty, "a pair may meet on at most one probe key")
  }

  test("simhash: identical docs have distance 0; near-identical within 3") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "qq ww ee rr tt yy uu ii oo pp")).toDF("doc_id", "text")
    val pairs = DedupOps.simhashNearDups(docs, "text", "doc_id", 3).collect()
    assert(pairs.exists(r => r.getAs[Long]("doc_a") == 1L
      && r.getAs[Long]("doc_b") == 2L && r.getAs[Int]("hamming") == 0))
    assert(!pairs.exists(r => r.getAs[Long]("doc_b") == 3L))
  }

  test("portable simhash pipeline: same behavior shape as the xxhash one") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "qq ww ee rr tt yy uu ii oo pp")).toDF("doc_id", "text")
    val pairs = DedupOps.simhashNearDupsPortable(docs, "text", "doc_id", 3).collect()
    assert(pairs.exists(r => r.getAs[Long]("doc_a") == 1L
      && r.getAs[Long]("doc_b") == 2L && r.getAs[Int]("hamming") == 0))
    assert(!pairs.exists(r => r.getAs[Long]("doc_b") == 3L))
  }

  test("cosine: orthogonal = 0, parallel = 1") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 2.0f), Seq(2.0f, 4.0f))).toDF("a", "b")
      .select(SimilarityOps.cosine(col("a"), col("b")).as("c"))
    val vs = df.collect().map(_.getDouble(0))
    assert(math.abs(vs(0)) < 1e-12)
    assert(math.abs(vs(1) - 1.0) < 1e-12)
  }

  test("signBucket maps sign pattern of leading dims") {
    val df = Seq(Seq(1.0f, -1.0f, 1.0f, -1.0f, -1.0f, -1.0f, -1.0f, -1.0f))
      .toDF("v").select(SimilarityOps.signBucket(col("v")).as("b"))
    assert(df.head().getInt(0) == (1 | 4)) // dims 1 and 3 positive
  }

  test("topK returns k best with deterministic tiebreak") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = SimilarityOps.topK(emb, "vec_id", "embedding",
      array(lit(1.0f), lit(0.0f)), 2).collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 4L)) // cos=1 both, id asc
  }

  test("langId tiebreak is lexicographic (db wins ties)") {
    val df = Seq("table stream").toDF("text")
      .select(TextOps.langId(TextOps.tokens(col("text"))).as("l"))
    assert(df.head().getString(0) == "db")
  }

  test("quality score bounded in [0,1]") {
    val docs = Tables.documents(spark, SparkTestSession.sf0001)
    val qs = docs.select(TextOps.qualityScore(col("n_chars"),
      TextOps.tokens(col("text"))).as("q")).collect().map(_.getDouble(0))
    assert(qs.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("sliding chunks: full coverage, exact overlap, nothing dropped") {
    val docs = Seq((1L, "abcdefghij"), (2L, "abc"), (3L, ""))
      .toDF("doc_id", "text")
    val ch = TextOps.slidingChunks(docs, "text", width = 4, stride = 3)
      .select("doc_id", "chunk_id", "chunk_start", "chunk")
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // len 10, w 4, s 3 → 1 + ceil(6/3) = 3 windows; last clamped
    assert(ch.filter(_._1 == 1L).map(c => (c._3, c._4)).toSeq ===
      Seq((0L, "abcd"), (3L, "defg"), (6L, "ghij")))
    // shorter than width → exactly one (clamped) window
    assert(ch.filter(_._1 == 2L).map(_._4).toSeq === Seq("abc"))
    // empty text still yields one (empty) chunk — no silent doc drop
    assert(ch.filter(_._1 == 3L).map(_._4).toSeq === Seq(""))
    // reconstruction: stride-aligned prefixes of the chunks concatenate
    // back to the original text (no gap, no repetition)
    val rebuilt = ch.filter(_._1 == 1L).map(_._4).toSeq match {
      case init :+ last => init.map(_.take(3)).mkString + last
    }
    assert(rebuilt === "abcdefghij")
  }

  test("sliding chunks on the fixture: every doc covered, count exact") {
    val docs = Tables.documents(spark, SparkTestSession.sf0001)
      .select("doc_id", "text")
    val ch = TextOps.slidingChunks(docs, "text", width = 120, stride = 90)
    val n = docs.count()
    assert(ch.select("doc_id").distinct().count() === n)
    // window-count formula cross-check in independent driver-side math
    val got = ch.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = docs.select(col("doc_id"), length(col("text")).as("l")).collect()
      .map(r => r.getLong(0) ->
        (1L + math.ceil(math.max(r.getInt(1) - 120, 0) / 90.0).toLong)).toMap
    assert(got === want)
  }

  test("snapshotDiff statuses partition both snapshots' id spaces") {
    import graft.operators.PipelineOps
    val docs = Tables.documents(spark, SparkTestSession.sf0001)
      .select("doc_id", "text")
    val v2 = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      .withColumn("text", when(pmod(col("doc_id"), lit(4)) === 0,
        concat(col("text"), lit("!"))).otherwise(col("text")))
    val diff = PipelineOps.snapshotDiff(docs, v2, "doc_id", "text")
    val by = diff.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    // current = added + changed + unchanged; prior = removed + changed + unchanged
    assert(by("added") + by("changed") + by("unchanged") == v2.count())
    assert(by("removed") + by("changed") + by("unchanged") == docs.count())
    // every id appears exactly once in the diff
    assert(diff.count() == diff.select("doc_id").distinct().count())
    // identical snapshots diff to all-unchanged
    val same = PipelineOps.snapshotDiff(docs, docs, "doc_id", "text")
    assert(same.filter(col("status") =!= "unchanged").isEmpty)
  }

  test("distributionDrift: zero on self, one on disjoint, exact on a hand case") {
    import graft.operators.PipelineOps
    import spark.implicits._
    def tv(a: Seq[String], b: Seq[String]): Double =
      PipelineOps.distributionDrift(a.toDF("k"), b.toDF("k"), "k")
        .head().getAs[Double]("tv_distance")
    assert(tv(Seq("a", "b", "a"), Seq("a", "b", "a")) == 0.0)
    assert(tv(Seq("a", "a"), Seq("b")) == 1.0)
    // p = (3/4, 1/4), q = (1/4, 3/4) → TV = 1/2
    assert(tv(Seq("a", "a", "a", "b"), Seq("a", "b", "b", "b")) == 0.5)
  }

  test("meanPool: singleton identity, exact means, group counts") {
    import graft.operators.SimilarityOps
    import spark.implicits._
    val df = Seq(
      (1L, 10L, Seq(1.0f, 2.0f)), (2L, 10L, Seq(3.0f, 4.0f)),
      (3L, 20L, Seq(5.0f, 6.0f))).toDF("vec_id", "grp", "embedding")
    val out = SimilarityOps.meanPool(df, "grp", "vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Double](1), r.getLong(2)))).toMap
    assert(out(10L) == ((Seq(2.0, 3.0), 2L)), out.toString)
    assert(out(20L) == ((Seq(5.0, 6.0), 1L)), out.toString)
  }

  test("snapshotDiff classifies NULL content by presence, not hash nullness") {
    import graft.operators.PipelineOps
    import spark.implicits._
    // md5(NULL) = NULL — presence must ride its own flag or a live doc
    // with NULL content masquerades as added/removed
    val prior = Seq((1L, null: String), (2L, "x"), (3L, null: String))
      .toDF("doc_id", "text")
    val cur = Seq((1L, "x"), (2L, null: String), (3L, null: String))
      .toDF("doc_id", "text")
    val by = PipelineOps.snapshotDiff(prior, cur, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(by == Map(1L -> "changed", 2L -> "changed", 3L -> "unchanged"),
      by.toString)
  }

  test("stripMarkup: blocks vanish, tags become boundaries, entities decode once") {
    val html =
      """<!DOCTYPE html><html><head><title>T</title>
        |<style> p { color: red } </style></head>
        |<body><h1>Head</h1><p>alpha<br>beta</p>
        |<script>if (1 < 2 && 2 > 1) { var s = "</p>"; }</script>
        |<!-- note --><p>&amp;amp; &lt;b&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p></body></html>"""
        .stripMargin
    val out = Seq(html).toDF("h")
      .select(TextOps.stripMarkup(col("h"))).head.getString(0)
    // script/style/comment content gone (including the decoy "</p>" and
    // the free < > math inside the script); <br> kept the word boundary;
    // &amp;amp; decoded exactly once; &lt;b&gt; rendered as text <b>
    assert(out == "T Head alpha beta &amp; <b> \"q\" 's' end", out)
  }

  test("stripMarkup: free-text comparisons outside blocks survive") {
    val out = Seq("x <p>1 < 2 and 3 > 1</p> y").toDF("h")
      .select(TextOps.stripMarkup(col("h"))).head.getString(0)
    assert(out == "x 1 < 2 and 3 > 1 y", out)
  }

  test("extractHrefs: anchors extract in document order; script/style/" +
      "comment decoys never mint a link; non-anchor hrefs are ignored") {
    val html =
      """<html><body><a href="http://a.com/1">one</a>
        |<script>var u = '<a href="http://decoy.invalid/js">x</a>';</script>
        |<!-- <a href="http://decoy.invalid/c">old</a> -->
        |<style>/* <a href="http://decoy.invalid/s">z</a> */</style>
        |<link href="http://decoy.invalid/css" rel="stylesheet">
        |<p>x < 1</p><A CLASS="k" href="https://b.com/2?q=1">two</A>
        |<a name="anchor-without-href">none</a></body></html>"""
        .stripMargin
    val out = Seq(html).toDF("h")
      .select(TextOps.extractHrefs(col("h"))).head
      .getSeq[String](0)
    assert(out == Seq("http://a.com/1", "https://b.com/2?q=1"), out)
  }

  test("urlHost: the host of a scheme://host URL, NULL otherwise — " +
      "composes with canonicalUrl into the host-graph edge key") {
    val rows = Seq("https://sub.example3.com/p/9?r=1",
        "http://h:8080/x", "not a url")
      .toDF("u").select(TextOps.urlHost(col("u"))).collect()
    assert(rows(0).getString(0) == "sub.example3.com")
    assert(rows(1).getString(0) == "h:8080")
    assert(rows(2).isNullAt(0))
    val viaCanon = Seq("HTTP://WWW.Sub.Example3.COM:80/p/9#f").toDF("u")
      .select(TextOps.urlHost(TextOps.canonicalUrl(col("u")))).head
    assert(viaCanon.getString(0) == "sub.example3.com")
  }

  test("canonicalUrl: case, www, default port, slash, tracking, order, fragment") {
    def canon(u: String) = Seq(u).toDF("u")
      .select(TextOps.canonicalUrl(col("u"))).head
    assert(canon("HTTP://WWW.Example.COM:80/Path/1/?utm_source=x&b=2&a=1&#frag")
      .getString(0) == "http://example.com/Path/1?a=1&b=2")
    // https default port; param value case preserved; path case preserved
    assert(canon("https://Api.Example.com:443/V1?q=Hello").getString(0)
      == "https://api.example.com/V1?q=Hello")
    // non-default and non-http(s) ports survive
    assert(canon("http://h:8080/x").getString(0) == "http://h:8080/x")
    assert(canon("ftp://Host:80/x").getString(0) == "ftp://host:80/x")
    // bare host: root path normalizes away entirely
    assert(canon("http://example.com/").getString(0) == "http://example.com")
  }

  test("canonicalUrl is idempotent over generated URL variants") {
    // the canonical form is itself a URL; re-canonicalizing must be the
    // identity (lowercase host stays, sorted params stay sorted, no
    // port/www/fragment left to strip)
    val rnd = new scala.util.Random(7)
    val schemes = Seq("http://", "HTTPS://", "ftp://", "http://WWW.")
    val ports = Seq("", ":80", ":443", ":8080")
    val paths = Seq("", "/", "/A/b", "/x/")
    val queries = Seq("", "?b=2&a=1", "?utm_source=x&Z=9&a=1&", "?q=Hello")
    val frags = Seq("", "#sec")
    val urls = (1 to 120).map { i =>
      schemes(rnd.nextInt(4)) + s"Host$i.Example.COM" +
        ports(rnd.nextInt(4)) + paths(rnd.nextInt(4)) +
        queries(rnd.nextInt(4)) + frags(rnd.nextInt(2))
    }
    val bad = urls.toDF("u")
      .select(TextOps.canonicalUrl(col("u")).as("c1"))
      .select(col("c1"), TextOps.canonicalUrl(col("c1")).as("c2"))
      .filter(!(col("c1") <=> col("c2")))
      .collect()
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("canonicalUrl: non-URLs and null canonicalize to NULL") {
    val out = Seq("not a url", "relative/path", "http//missing.colon")
      .toDF("u").select(TextOps.canonicalUrl(col("u"))).collect()
    assert(out.forall(_.isNullAt(0)), out.mkString(","))
    val n = Seq((1, null: String)).toDF("i", "u")
      .select(TextOps.canonicalUrl(col("u"))).head
    assert(n.isNullAt(0))
  }

  test("stripMarkup: case-insensitive multi-line blocks; null propagates") {
    val out = Seq("a<SCRIPT type=x>\nline1\nline2\n</SCRIPT >b")
      .toDF("h").select(TextOps.stripMarkup(col("h"))).head.getString(0)
    assert(out == "a b", out)
    val n = Seq((1, null: String)).toDF("i", "h")
      .select(TextOps.stripMarkup(col("h"))).head
    assert(n.isNullAt(0))
  }
}
