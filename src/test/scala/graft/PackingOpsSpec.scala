package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PackingOps, TextOps}

/** Sequence packing + stratified sampling invariants. */
class PackingOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  lazy val docs = Tables.documents(spark, "/root/testdata/sf0.01")

  test("chunk pack conserves every token exactly once") {
    val packed = PackingOps.chunkPack(docs, "doc_id", "text", 512, 8)
    val perDoc = packed.groupBy("doc_id")
      .agg(sum("tok_in_chunk").as("packed_tok"))
    val truth = docs.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
    val diff = perDoc.join(truth, "doc_id")
      .filter(col("packed_tok") =!= col("n_tok"))
    assert(diff.isEmpty, "every document's tokens must land in chunks exactly once")
  }

  test("every chunk except each shard's last is filled to capacity") {
    val packed = PackingOps.chunkPack(docs, "doc_id", "text", 512, 8)
    val fills = packed.groupBy("shard", "chunk_id")
      .agg(sum("tok_in_chunk").as("fill"))
    val lastChunk = fills.groupBy("shard").agg(max("chunk_id").as("last_id"))
    val partial = fills.join(lastChunk, "shard")
      .filter(col("chunk_id") =!= col("last_id") && col("fill") =!= 512)
    assert(partial.isEmpty, "interior chunks must be exactly capacity-full")
  }

  test("a document spans at most ceil(n_tok/cap)+1 consecutive chunks") {
    val packed = PackingOps.chunkPack(docs, "doc_id", "text", 64, 4)
    val spans = packed.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"),
      (max("chunk_id") - min("chunk_id") + 1).as("span"))
    assert(spans.filter(col("n_chunks") =!= col("span")).isEmpty,
      "chunks per doc must be consecutive")
  }

  test("stratified sample keeps per-class rates within binomial noise") {
    val sampled = PackingOps.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 0.4, "zh" -> 0.8), defaultRate = 0.6)
    val got = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, n) <- base) {
      val rate = lang match {
        case "en" => 0.4; case "zh" => 0.8; case _ => 0.6
      }
      val p = got.getOrElse(lang, 0L).toDouble / n
      // 3-sigma binomial envelope on a few hundred docs
      assert(math.abs(p - rate) < 3 * math.sqrt(rate * (1 - rate) / n),
        s"$lang: got $p want ~$rate over $n docs")
    }
  }

  test("decontamination flags a planted leak and respects the train-side cap") {
    import spark.implicits._
    val leak = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val train = Seq(
      (1L, leak + " plus extra trailing training context words here"),
      (2L, "totally unrelated training document about something else entirely"))
      .toDF("doc_id", "text")
    val eval = Seq(
      (10L, leak), // fully contained in train doc 1
      (11L, "pristine evaluation text sharing nothing with training data"))
      .toDF("doc_id", "text")
    val hits = graft.operators.DedupOps
      .crossContamination(train, eval, "text", "doc_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits == Set((10L, 1L)), s"only the planted leak must flag: $hits")

    // a DF cap of 0 drops every train shingle -> ratios only drop, never rise
    val capped = graft.operators.DedupOps
      .crossContamination(train, eval, "text", "doc_id", 0.5, Some(0L))
    assert(capped.isEmpty)
  }

  test("mixture rates: binding class keeps 1.0, others hit the target share") {
    import spark.implicits._
    // lang a: 30 tokens, lang b: 10 tokens, equal 50/50 target
    // → b binds (fewest tokens per unit share); a keeps 10/30 = 0.3333
    val docs = Seq(
      (1L, "a", Seq.fill(30)("w").mkString(" ")),
      (2L, "b", Seq.fill(10)("w").mkString(" "))).toDF("doc_id", "lang", "text")
    val rates = PackingOps.mixtureRates(docs, "lang", "text",
        Map("a" -> 5000L, "b" -> 5000L), defaultBps = 0L)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rates == Map("a" -> 0.3333, "b" -> 1.0))
    // post-sample token expectation: 30·⅓ : 10·1 == 1 : 1 — the target
  }

  test("topPctByScore: exact floor(k) per class with min-id boundary ties") {
    import spark.implicits._
    // class a: 10 docs — one 0.9, three tied 0.8 (ids 2,3,4), six 0.5.
    // keep 3/10 -> k=3: the 0.9 + exactly TWO of the tied 0.8s (min ids)
    val a = Seq((1L, "a", 0.9), (2L, "a", 0.8), (3L, "a", 0.8),
      (4L, "a", 0.8)) ++ (5L to 10L).map((_, "a", 0.5))
    // class b: 5 docs, distinct scores — keep 3/10 -> k=1 (floor(1.5))
    val b = (11L to 15L).map(i => (i, "b", i / 100.0))
    val docs = (a ++ b).toDF("doc_id", "cls", "score")
    val kept = PackingOps.topPctByScore(docs, "cls", "score", "doc_id", 3, 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 15L), kept)
  }

  test("topPctByScore equals the rank form on the fixture scores") {
    import org.apache.spark.sql.expressions.Window
    val scored = docs.select(col("doc_id"), col("lang"),
      (length(col("text")) % 7).cast("double").as("q")) // coarse ties
    val hist = PackingOps.topPctByScore(scored, "lang", "q", "doc_id", 4, 10)
      .select("doc_id")
    val w = Window.partitionBy("lang").orderBy(col("q").desc, col("doc_id"))
    val rank = scored
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .filter(col("rk") * 10 <= col("n") * 4).select("doc_id")
    assert(hist.exceptAll(rank).isEmpty && rank.exceptAll(hist).isEmpty)
  }

  test("fillTokenBudget: whole buckets pass, boundary cuts by id, zero-cost edge") {
    import spark.implicits._
    // class a, budget 600: score-9 bucket (mass 300) fits whole; score-8
    // bucket (three docs, 200 each) opens at 300 — id order keeps id 2
    // (cum 500) and drops 3, 4; the score-7 doc's bucket opens past the
    // budget and is excluded before any join.
    val a = Seq((1L, "a", 9L, 300L), (2L, "a", 8L, 200L),
      (3L, "a", 8L, 200L), (4L, "a", 8L, 200L), (5L, "a", 7L, 100L))
    // class b: total mass 550 under budget — all pass windowless
    val b = Seq((11L, "b", 5L, 250L), (12L, "b", 4L, 300L))
    // class d: the boundary bucket OPENS exactly at the budget — only
    // its zero-cost row still fits (prefix rule: cum 600 <= 600)
    val d = Seq((30L, "d", 9L, 600L), (31L, "d", 8L, 0L), (32L, "d", 8L, 50L))
    val kept = PackingOps.fillTokenBudget(
        (a ++ b ++ d).toDF("doc_id", "cls", "score", "toks"),
        "cls", "score", "toks", "doc_id", budget = 600L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 11L, 12L, 30L, 31L), kept)
  }

  test("fillTokenBudget: a negative cost fails loudly (monotone-mass contract)") {
    import spark.implicits._
    val bad = Seq((1L, "a", 9L, 300L), (2L, "a", 8L, -5L))
      .toDF("doc_id", "cls", "score", "toks")
    val ex = intercept[Exception] {
      PackingOps.fillTokenBudget(bad, "cls", "score", "toks", "doc_id", 600L)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("negative cost")), ex.getMessage)
  }

  test("fillTokenBudget equals the global window form on the fixture") {
    import org.apache.spark.sql.expressions.Window
    val scored = docs.select(col("doc_id"), col("source"),
      size(TextOps.tokens(col("text"))).cast("long").as("toks"),
      (length(col("text")) % 7).cast("long").as("score")) // coarse ties
    val hist = PackingOps.fillTokenBudget(scored, "source", "score",
      "toks", "doc_id", budget = 400L).select("doc_id")
    val w = Window.partitionBy("source")
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val win = scored.withColumn("cum", sum("toks").over(w))
      .filter(col("cum") <= 400L).select("doc_id")
    assert(hist.exceptAll(win).isEmpty && win.exceptAll(hist).isEmpty)
  }

  test("topNByScore: absolute cap with min-id boundary ties; small classes whole") {
    import spark.implicits._
    // class a: 1 at 0.9, three tied at 0.8 — cap 2 keeps the 0.9 and the
    // MIN-id 0.8 (rank-form tiebreak); class b has fewer than the cap
    val a = Seq((1L, "a", 0.9), (2L, "a", 0.8), (3L, "a", 0.8), (4L, "a", 0.8))
    val b = Seq((11L, "b", 0.5))
    val kept = PackingOps.topNByScore((a ++ b).toDF("doc_id", "cls", "score"),
        "cls", "score", "doc_id", n = 2L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 11L), kept)
  }

  test("topNByScore equals the rank form on the fixture scores") {
    import org.apache.spark.sql.expressions.Window
    val scored = docs.select(col("doc_id"), col("source"),
      (length(col("text")) % 7).cast("double").as("q")) // coarse ties
    val hist = PackingOps.topNByScore(scored, "source", "q", "doc_id", 10L)
      .select("doc_id")
    val w = Window.partitionBy("source").orderBy(col("q").desc, col("doc_id"))
    val rank = scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10).select("doc_id")
    assert(hist.exceptAll(rank).isEmpty && rank.exceptAll(hist).isEmpty)
  }

  test("curriculum packing conserves token mass and leads with the best docs") {
    val counted = docs.select(col("doc_id"), col("n_chars"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
    val cur = PackingOps.chunkPackByScore(counted, "doc_id", "n_tok",
      "n_chars", capacity = 512, shards = 8)
    val std = PackingOps.chunkPackCounted(counted, "doc_id", "n_tok", 512, 8)
    // same geometry, same mass — only the layout order changes
    assert(cur.agg(sum("tok_in_chunk")).head().getLong(0) ==
      std.agg(sum("tok_in_chunk")).head().getLong(0))
    // the first doc laid out in each shard is that shard's best scorer
    val firstPerShard = cur.filter(col("chunk_id") === 0)
      .join(counted, "doc_id")
      .groupBy("shard").agg(max("n_chars").as("first_max"))
    val bestPerShard = counted
      .withColumn("shard",
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % 8)
      .groupBy("shard").agg(max("n_chars").as("best"))
    val joined = firstPerShard.join(bestPerShard, "shard").collect()
    assert(joined.nonEmpty && joined.forall(r =>
      r.getAs[Long]("first_max") == r.getAs[Long]("best")))
  }

  test("counted mixture rates equal the tokenizing form") {
    val counted = docs.select(col("doc_id"), col("lang"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
    val a = PackingOps.mixtureRates(docs, "lang", "text",
      Map("en" -> 5000L, "zh" -> 3000L), defaultBps = 2000L)
    val b = PackingOps.mixtureRatesCounted(counted, "lang", "n_tok",
      Map("en" -> 5000L, "zh" -> 3000L), defaultBps = 2000L)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "pre-counted tokens must yield identical rates")
  }

  test("rate-frame sampling selects exactly the hand-fixed-map rows") {
    // the broadcast-join form must make the same integer-exact membership
    // decisions as the map form given equivalent rates (k/10^4 doubles
    // round-trip through round(rate*10000) exactly)
    import spark.implicits._
    val rateRows = Seq(("en", 0.4), ("zh", 0.8), ("de", 0.6))
      .toDF("lang", "rate")
    val byFrame = PackingOps.stratifiedSampleByRates(docs, "lang", "doc_id",
      rateRows).select("doc_id")
    val byMap = PackingOps.stratifiedSample(
        docs.filter(col("lang").isInCollection(Seq("en", "zh", "de"))),
        "lang", "doc_id", Map("en" -> 0.4, "zh" -> 0.8), defaultRate = 0.6)
      .select("doc_id")
    assert(byFrame.exceptAll(byMap).isEmpty && byMap.exceptAll(byFrame).isEmpty)
    // classes absent from the rate frame are dropped, not defaulted
    val none = PackingOps.stratifiedSampleByRates(docs, "lang", "doc_id",
      Seq(("xx", 1.0)).toDF("lang", "rate"))
    assert(none.isEmpty)
  }

  test("sampling is deterministic and subset-monotone in the rate") {
    val lo = PackingOps.stratifiedSample(docs, "lang", "doc_id",
      Map.empty, defaultRate = 0.3).select("doc_id")
    val hi = PackingOps.stratifiedSample(docs, "lang", "doc_id",
      Map.empty, defaultRate = 0.6).select("doc_id")
    assert(lo.exceptAll(hi).isEmpty, "lower rate must select a subset")
    val again = PackingOps.stratifiedSample(docs, "lang", "doc_id",
      Map.empty, defaultRate = 0.3).select("doc_id")
    assert(lo.exceptAll(again).isEmpty && again.exceptAll(lo).isEmpty)
  }

  test("sketch gate equals the exact histogram gate on the fixture's quantized scores") {
    // where BOTH gates apply (quantized scores), they must agree — the
    // sketch form is the histogram form's superset, not a variant
    val scored = docs.select(col("doc_id"), col("lang"),
      (length(col("text")) % 7).cast("double").as("q"))
    val hist = PackingOps.topPctByScore(scored, "lang", "q", "doc_id", 4, 10)
      .select("doc_id")
    val sk = PackingOps.topPctByScoreSketch(scored, "lang", "q", "doc_id",
        4, 10)
      .select("doc_id")
    assert(hist.exceptAll(sk).isEmpty && sk.exceptAll(hist).isEmpty)
  }

  test("topNByScoreSketch equals the rank form on continuous (never-tied) scores") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // gaussian scores never repeat — exactly the domain the quantized
    // histogram gate cannot take; the sketch gate must still match the
    // rank form row for row
    val rnd = new scala.util.Random(17)
    val scored = (1 to 2000)
      .map(i => (i.toLong, if (i % 4 == 0) "a" else "b", rnd.nextGaussian()))
      .toDF("doc_id", "cls", "score")
    val w = Window.partitionBy("cls").orderBy(col("score").desc, col("doc_id"))
    val rank = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 50).drop("rk")
    val sk = PackingOps.topNByScoreSketch(scored, "cls", "score", "doc_id", 50L)
    assert(sk.exceptAll(rank).isEmpty && rank.exceptAll(sk).isEmpty)
  }

  test("topPctByScoreSketch handles boundary-bucket ties like the rank form") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // coarse discrete scores force heavy tie mass INSIDE the threshold
    // bucket — the (score desc, id) boundary rank must break them the
    // rank form's way; a low bucketBits widens the bucket deliberately
    val rnd = new scala.util.Random(19)
    val scored = (1 to 1500)
      .map(i => (i.toLong, if (i % 3 == 0) "p" else "q",
        (rnd.nextInt(5) + 1).toDouble))
      .toDF("doc_id", "cls", "score")
    val w = Window.partitionBy("cls").orderBy(col("score").desc, col("doc_id"))
    val rank = scored
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("cls")))
      .filter(col("rk") * 10 <= col("n") * 3).drop("rk", "n")
    val sk = PackingOps.topPctByScoreSketch(scored, "cls", "score", "doc_id",
      3, 10, bucketBits = 4)
    assert(sk.exceptAll(rank).isEmpty && rank.exceptAll(sk).isEmpty)
  }

  test("clusterSplit: no near-dup cluster straddles two splits; singletons split like x16") {
    import graft.operators.DedupOps
    val pairs = DedupOps.jaccardNearDups(docs, "text", "doc_id", 0.5)
    val labels = DedupOps.clusterLabels(pairs)
    val split = PackingOps.clusterSplit(docs, "doc_id", labels)
    // the leakage guard itself: every cluster maps to exactly one split
    val straddlers = split.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
    assert(straddlers.isEmpty, "a cluster landed in two splits")
    // multi-doc clusters exist in the fixture, or the guard proves nothing
    assert(split.groupBy("cluster_id").count().filter(col("count") > 1)
      .count() > 0, "fixture has no near-dup clusters")
    // a doc in no pair is its own cluster → its bucket is the x16 per-doc
    // bucket, so the two splits agree on singletons
    val x16Bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 15),
      16, 10).cast("long") % 100
    val singletonMismatch = split
      .join(labels.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .withColumn("x16_split",
        when(x16Bucket < 80, "train").when(x16Bucket < 90, "val")
          .otherwise("test"))
      .filter(col("split") =!= col("x16_split"))
    assert(singletonMismatch.isEmpty,
      "singleton docs must split exactly like the per-doc hash")
    // total census: every doc appears exactly once
    assert(split.count() == docs.count())
  }

  test("temperatureRates: smallest class keeps 1.0; rates fall with size; ~sqrt law") {
    val rates = PackingOps.temperatureRates(docs, "lang", "text")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    val byTok = rates.sortBy(_._2)
    // the binding (fewest-token) class keeps everything
    assert(byTok.head._3 == 1.0, byTok.mkString(", "))
    // monotone: more tokens can never mean a higher keep rate
    assert(byTok.sliding(2).forall { case Array(a, b) => a._3 >= b._3 },
      byTok.mkString(", "))
    // alpha = 0.5: rate_c tracks sqrt(T_min/T_c) within share quantization
    val tMin = byTok.head._2.toDouble
    byTok.foreach { case (lang, t, rate) =>
      val want = math.sqrt(tMin / t)
      assert(math.abs(rate - want) < 0.02, s"$lang: $rate vs sqrt-law $want")
    }
  }

  test("clusterSplit fails fast on a non-integral id column") {
    import spark.implicits._
    val stringKeyed = Seq(("ab", "t")).toDF("doc_id", "text")
    val labels = Seq((1L, 1L)).toDF("doc_id", "cluster_id")
    val err = intercept[IllegalArgumentException] {
      PackingOps.clusterSplit(stringKeyed, "doc_id", labels)
    }
    assert(err.getMessage.contains("integral id column"), err.getMessage)
  }

  test("importanceVotes: hand-computed votes, scores, and keep set") {
    import spark.implicits._
    // target = {"a b a b"}: occurrences {a b: 2, b a: 1}, Nt = 3
    // raw: doc1 target-like, doc2 disjoint, doc3 too short; Nr = 6
    // votes (exact cross-multiply): a b → 2·6 > 2·3 → +1; b a → +1;
    // c d / d c → 0·6 < rc·3 → −1. Fixture buckets verified disjoint
    // at mod 256 (19, 142, 49, 118).
    val raw = Seq((1L, "a b a b"), (2L, "c d c d"), (3L, "a"))
      .toDF("doc_id", "text")
    val target = Seq((10L, "a b a b")).toDF("doc_id", "text")
    val out = PackingOps.importanceVotes(raw, target, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((3L, 3L, true)), out.toString)
    assert(out(2L) == ((3L, -3L, false)), out.toString)
    assert(out(3L) == ((0L, 0L, false)), out.toString)
  }

  test("importanceVotesFrom: buckets unseen by BOTH count tables tie to 0, not dropped") {
    import spark.implicits._
    // in the from-state path an arrival can carry a bigram whose bucket
    // neither the target artifact nor the corpus-so-far log has seen; a
    // 0/0 bucket is a tie (vote 0) and must still count in n_grams
    val raw = Seq((1L, "a b c")).toDF("doc_id", "text") // 2 bigrams
    val tCounts = Seq((300L, 5L)).toDF("k", "cnt") // keys outside any
    val rCounts = Seq((301L, 3L)).toDF("k", "cnt") // bucket of the doc
    val out = PackingOps.importanceVotesFrom(raw, "doc_id", "text",
        tCounts, rCounts).head()
    assert((out.getLong(1), out.getLong(2), out.getBoolean(3))
      == ((2L, 0L, false)), out.toString)
  }

  test("propagateClusterBest: best + min-id tie-break reach every member; singletons self") {
    import spark.implicits._
    val scored = Seq((1L, 5L), (2L, 9L), (3L, 7L), (4L, 7L), (5L, 3L))
      .toDF("doc_id", "qbps")
    // clusters: {1,2} (best 9 via 2), {3,4} (tie 7 — min id 3 wins);
    // 5 is a singleton (its own cluster, its own best)
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L))
      .toDF("doc_id", "cluster_id")
    val out = PackingOps.propagateClusterBest(scored, "doc_id", "qbps",
        labels)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(out(1L) == ((1L, 2L, 9L, 2L)), out.toString)
    assert(out(2L) == ((1L, 2L, 9L, 2L)), out.toString)
    assert(out(3L) == ((3L, 2L, 7L, 3L)), out.toString)
    assert(out(4L) == ((3L, 2L, 7L, 3L)), out.toString)
    assert(out(5L) == ((5L, 1L, 3L, 5L)), out.toString)
  }

  test("propagateClusterBest rejects a non-integral id column") {
    import spark.implicits._
    // a string id would cast to NULL, collapsing every singleton into
    // one NULL cluster annotated with the global singleton max — the
    // clusterSplit guard applies here too (advisor r11)
    val scored = Seq(("a", 5L), ("b", 9L)).toDF("doc_id", "qbps")
    val labels = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    val e = intercept[IllegalArgumentException] {
      PackingOps.propagateClusterBest(scored, "doc_id", "qbps", labels)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("epochOrder: whole epochs replicate, fractional epochs gate, order keys are reproducible") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "cls")
    // a: exactly 2 epochs; b: 1.5 epochs (md5-gated half)
    val w = Seq(("a", 20000L), ("b", 15000L)).toDF("cls", "w_bps")
    val out = PackingOps.epochOrder(docs, "doc_id", "cls", w, "seed1")
      .collect().map(r => (r.getString(2), r.getLong(1), r.getLong(3)))
    val byDoc = out.groupBy(x => (x._1, x._2)).view.mapValues(_.length)
    // every even doc appears exactly twice (rep 0 and 1)
    assert((0L until 200L by 2).forall(i => byDoc(("a", i)) == 2))
    // odd docs appear once or twice; the fractional rate lands near 50%
    val bCopies = out.count(_._1 == "b")
    assert(bCopies > 100 && bCopies < 200, bCopies.toString)
    assert((1L until 200L by 2).forall(i =>
      byDoc(("b", i)) == 1 || byDoc(("b", i)) == 2))
    // reps are dense from 0
    assert(out.filter(_._2 == 0L).map(_._3).sorted.toSeq == Seq(0L, 1L))
    // deterministic: the same seed reproduces the same manifest
    val again = PackingOps.epochOrder(docs, "doc_id", "cls", w, "seed1")
      .collect().map(r => (r.getString(2), r.getLong(1), r.getLong(3)))
    assert(out.sortBy(x => (x._2, x._3)).toSeq ==
      again.sortBy(x => (x._2, x._3)).toSeq)
    // a sub-epoch weight (no whole copy) keeps only the gated fraction
    val sub = PackingOps.epochOrder(docs, "doc_id", "cls",
        Seq(("a", 3000L), ("b", 0L)).toDF("cls", "w_bps"), "seed1")
      .collect()
    assert(sub.forall(_.getString(2) == "a"))
    assert(sub.length > 10 && sub.length < 60, sub.length.toString)
  }

  test("importanceVotes: raw == target scores every doc non-negative") {
    import spark.implicits._
    // when the two corpora coincide every bucket ties (tc·Nr == rc·Nt),
    // so all votes are 0 and nothing is kept — selection has no signal
    val docs = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val out = PackingOps.importanceVotes(docs, docs, "doc_id", "text")
      .collect().map(r => (r.getLong(2), r.getBoolean(3)))
    assert(out.forall { case (s, k) => s == 0L && !k }, out.mkString(","))
  }
}
