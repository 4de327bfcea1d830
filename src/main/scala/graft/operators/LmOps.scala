package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** N-gram language-model scoring — the perplexity-filter shape every
  * production LLM curation pipeline gates on (the CCNet/KenLM recipe:
  * score each document under a reference n-gram model, keep the
  * fluent band): trigram counts with STUPID BACKOFF (Brants et al.
  * 2007 — score s(w|w₋₂w₋₁) = c₃/c₂ when the trigram was seen, else
  * α·c₂/c₁ on the bigram, else α²·c₁/N on the unigram, α = 0.4),
  * which at corpus scale is the standard choice precisely because it
  * needs no discount fitting — counts are enough, and counts are
  * mergeable state.
  *
  * '''Exactness contract (the oracle discipline).''' Everything is
  * integer arithmetic end to end: α = 2/5 exactly, each token's score
  * is the rational `num/den` floor-quantized to BASIS POINTS
  * (`(num·10⁴) div den` — both engines' floor division), and a
  * document aggregates the exact integer sum of its occurrences'
  * bps. No log-space floats, no smoothing constants that two engines
  * could round differently — the hash gate pins every per-type backoff
  * decision and every per-doc sum.
  *
  * '''Scale shape.'''
  *  - count tables are DISTINCT-GRAM frames (Heaps' law: orders of
  *    magnitude smaller than the corpus), built by one map-side-
  *    combined aggregation per order;
  *  - scoring runs the BpeOps Heaps split: score each distinct
  *    trigram TYPE once (five vocab-sized equi-joins on the type
  *    frame, never on corpus positions), then one equi-join of
  *    per-doc type occurrences against the scored types and one
  *    aggregate — corpus-sized work is exactly two shuffles;
  *  - counts are mergeable by construction (plain sums), so a
  *    resident pipeline maintains them as a batch-keyed counter log
  *    ([[graft.streaming.NgramStream]]) and scores arrivals from
  *    state without ever rescanning the reference corpus;
  *  - a production deployment prunes the tail (`minCount`) exactly
  *    like KenLM — scores then shift conservatively (more backoff),
  *    the maxShingleDf direction; the unpruned form stays the
  *    oracle-checked reference semantics.
  */
object LmOps {

  /** Backoff numerator scale: α = 2/5 per backoff level, kept as the
    * exact integer pair (2·num, 5·den) / (4·num, 25·den).
    */
  private val alphaNum = 2L
  private val alphaDen = 5L

  /** N-gram count table of one order over the corpus:
    * `(gram, cnt)` — gram the space-joined window (tokensRegex words,
    * so joins on the string are exact), cnt its corpus frequency.
    */
  def ngramCounts(docs: DataFrame, textCol: String, order: Int): DataFrame =
    docs.select(explode(TextOps.shingles(
        TextOps.tokensRegex(col(textCol)), order)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))

  /** All three tables in one frame — `(ord, gram, cnt)`, the mergeable
    * state unit the counter log persists.
    */
  def ngramCountsTo(docs: DataFrame, textCol: String, maxOrder: Int = 3)
      : DataFrame =
    (1 to maxOrder).map(o =>
        ngramCounts(docs, textCol, o).select(lit(o).as("ord"),
          col("gram"), col("cnt")))
      .reduce(_ unionByName _)

  /** Floor of `num·10⁴ / den` — the per-token bps quantizer (DuckDB
    * twin: `(num * 10000) // den`). Runs in decimal(38,0): `num·10⁴`
    * leaves the double-exact envelope past counts of ~9·10¹¹ (real at
    * 100 TB), and the Det.round4RatBig precedent applies — the decimal
    * quotient is integer-valued and ≤ 10⁴, so no scale truncation can
    * distort it.
    */
  private def bps(num: Column, den: Column): Column = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val a = num.cast(LongType).cast(d38) * lit(10000L).cast(d38)
    val b = den.cast(LongType).cast(d38)
    ((a - pmod(a, b)) / b).cast(LongType)
  }

  /** Score every document under the count tables: one row per input
    * doc with `(n_scored, sum_bps)` — `n_scored` the number of scored
    * positions (full-trigram contexts: positions 3..len), `sum_bps`
    * the exact integer sum of per-token stupid-backoff scores in basis
    * points. Docs under 3 words score `(0, 0)`.
    *
    * `counts` is an `(ord, gram, cnt)` frame ([[ngramCountsTo]] or a
    * merged [[graft.streaming.NgramStream]] log read) — it need not
    * cover the scored corpus (that's the point: unseen trigrams back
    * off, unseen words floor at 0). Invariant used: a table built from
    * ANY corpus contains every prefix/suffix of every gram it
    * contains, so `c₃ > 0 ⇒ c₂(ctx) > 0` and `c₂ > 0 ⇒ c₁ > 0` — the
    * backoff denominators can never be NULL when their branch fires.
    */
  def backoffScore(docs: DataFrame, idCol: String, textCol: String,
      counts: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val uni = counts.filter(col("ord") === 1)
      .select(col("gram"), col("cnt"))
    val bi = counts.filter(col("ord") === 2)
      .select(col("gram"), col("cnt"))
    val tri = counts.filter(col("ord") === 3)
      .select(col("gram"), col("cnt"))
    // the model-size scalar: total training tokens (unigram mass)
    val nTotal = uni.agg(coalesce(sum("cnt"), lit(0L)).cast(LongType))
      .head().getLong(0)
    // per-doc trigram-type occurrences — the corpus-sized frame, two
    // narrow columns after the aggregate
    val occ = docs.select(col(idCol),
        explode(TextOps.shingles(TextOps.tokensRegex(col(textCol)), 3))
          .as("g"))
      .groupBy(col(idCol), col("g"))
      .agg(count(lit(1)).as("n_occ"))
    // Heaps split: score each distinct type ONCE (five vocab-sized
    // joins on the type frame), occurrences then join the scored types
    val w = split(col("g"), " ")
    val types = occ.select("g").distinct()
      .withColumn("_ctx2", concat_ws(" ",
        element_at(w, 1), element_at(w, 2)))
      .withColumn("_bi", concat_ws(" ",
        element_at(w, 2), element_at(w, 3)))
      .withColumn("_w2", element_at(w, 2))
      .withColumn("_w3", element_at(w, 3))
    def lk(tbl: DataFrame, on: String, out: String): DataFrame => DataFrame =
      df => df.join(tbl.select(col("gram").as(on), col("cnt").as(out)),
        Seq(on), "left")
    val looked = Seq(
      lk(tri, "g", "_c3"),
      lk(bi, "_ctx2", "_cctx"),
      lk(bi, "_bi", "_cbi"),
      lk(uni, "_w2", "_cw2"),
      lk(uni, "_w3", "_cw3"))
      .foldLeft(types)((df, f) => f(df))
    val scored = looked.select(col("g"),
      when(col("_c3").isNotNull, bps(col("_c3"), col("_cctx")))
        .when(col("_cbi").isNotNull,
          bps(col("_cbi") * alphaNum, col("_cw2") * alphaDen))
        .when(col("_cw3").isNotNull,
          bps(col("_cw3") * alphaNum * alphaNum,
            lit(nTotal) * alphaDen * alphaDen))
        .otherwise(lit(0L)).as("tok_bps"))
    val agg = occ.join(scored, Seq("g"))
      .groupBy(idCol)
      .agg(sum("n_occ").cast(LongType).as("n_scored"),
        sum(col("n_occ") * col("tok_bps")).cast(LongType).as("sum_bps"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        coalesce(col("sum_bps"), lit(0L)).as("sum_bps"))
  }
}
