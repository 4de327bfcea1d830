package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer (north-star extension: the
  * "train a subword vocabulary on the corpus you just curated" step of a
  * training-data pipeline).
  *
  * Words come from [[TextOps.tokensRegex]] (lowercase a-z0-9 runs), so the
  * symbol alphabet is closed and spaced symbol strings are unambiguous.
  * A word is represented as its characters joined by single spaces plus a
  * ` </w>` end-of-word marker (`"low"` → `"l o w </w>"`), the classic
  * Sennrich et al. 2016 formulation.
  *
  * '''Merge-step semantics (engine-portable by construction).''' One merge
  * step replaces the chosen adjacent pair `(l, r)` with the fused symbol
  * `lr` in a SINGLE leftmost non-overlapping replace-all pass over the
  * spaced symbol string — exactly what `replace()` does, identically, in
  * Spark and DuckDB. A consecutive run like `a a a a` keeps one `a a`
  * adjacency after a pass (the separator of the next occurrence is
  * consumed by the previous match); canonical greedy BPE resolves that
  * within the pass, this formulation resolves it across steps — the
  * trainer simply re-picks the pair while it remains the argmax, emitting
  * a repeated `(l, r)` row with its own rank. Appliers replay one pass per
  * merge-table ROW in rank order, so training-time and apply-time
  * tokenizations agree, and the DuckDB oracle can replay application with
  * a recursive CTE of plain `replace()` calls — no per-row loop semantics
  * that the two engines could disagree on.
  *
  * '''Scale shape.''' The corpus is scanned ONCE (the word-count shuffle);
  * every training step after that runs over the distinct-word vocabulary —
  * orders of magnitude smaller than the corpus (Heaps' law), cached once.
  * Each step is one pair-count aggregate (map-side combined) plus a 1-row
  * collect of the argmax — the collect IS the model step, the same
  * discipline as the IVF centroid collect. Merge application is a chained
  * `replace` expression (numMerges is bounded and small), fully inside
  * WholeStageCodegen: no UDFs, no joins, no per-merge jobs at apply time.
  * Token-type cardinality is bounded by |alphabet| + numMerges, so the
  * final counts frame is tiny no matter the corpus size.
  */
object BpeOps {

  /** Spaced symbol string of a word: chars joined by ' ' + ' </w>'. */
  def symbolize(word: Column): Column =
    concat(array_join(split(word, ""), " "), lit(" </w>"))

  /** Distinct-word frame of a corpus: (word, wcount, sym). One shuffle;
    * everything BPE does afterwards runs on this, not the corpus.
    */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokensRegex(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcount"))
      .withColumn("sym", symbolize(col("word")))

  /** One single-pass merge step on a spaced symbol string (see class doc
    * for the exact semantics). DuckDB twin:
    * `trim(replace(' '||s||' ', ' l r ', ' lr '))`.
    */
  def applyMerge(sym: Column, l: String, r: String): Column =
    trim(replace(concat(lit(" "), sym, lit(" ")),
      lit(s" $l $r "), lit(s" $l$r ")))

  /** The full merge chain as one codegen'd expression. */
  def applyMerges(sym: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(sym) { case (c, (l, r)) => applyMerge(c, l, r) }

  /** Weighted adjacent-pair counts over a (sym, wcount) frame. */
  def pairCounts(v: DataFrame, symCol: String = "sym",
                 wCol: String = "wcount"): DataFrame = {
    val syms = split(col(symCol), " ")
    val pairs = when(size(syms) >= 2,
        transform(sequence(lit(1), size(syms) - 1),
          i => struct(element_at(syms, i).as("lhs"),
            element_at(syms, i + lit(1)).as("rhs"))))
      .otherwise(array().cast("array<struct<lhs:string,rhs:string>>"))
    v.select(col(wCol), explode(pairs).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(wCol).as("cnt"))
  }

  /** Train a merge table: numMerges steps of (argmax pair → one replace
    * pass), stopping early when no pair reaches minCount. Returns
    * (rank, lhs, rhs, cnt) — cnt is the pair's weighted count at pick
    * time, a free training log. Deterministic: ties break on
    * (cnt DESC, lhs ASC, rhs ASC).
    *
    * The vocab is cached once; step k evaluates merges 0..k-1 as an
    * expression chain over that one cache (≤ numMerges chained replaces —
    * trivial codegen, no per-step persists, no lineage growth across
    * jobs).
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 2L): DataFrame = {
    val spark = docs.sparkSession
    val v = vocab(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val merges = Seq.newBuilder[(Int, String, String, Long)]
      var picked = Seq.empty[(String, String)]
      var rank = 0
      var done = false
      while (rank < numMerges && !done) {
        val stepped = v.select(
          applyMerges(col("sym"), picked).as("sym"), col("wcount"))
        val top = pairCounts(stepped)
          .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
          .limit(1).collect()
        if (top.isEmpty || top(0).getAs[Long]("cnt") < minCount) done = true
        else {
          val l = top(0).getString(0); val r = top(0).getString(1)
          merges += ((rank, l, r, top(0).getAs[Long]("cnt")))
          picked = picked :+ ((l, r))
          rank += 1
        }
      }
      spark.createDataFrame(merges.result())
        .toDF("rank", "lhs", "rhs", "cnt")
    } finally v.unpersist()
  }

  private def collectMerges(mergesDf: DataFrame): Seq[(String, String)] =
    mergesDf.orderBy("rank").select("lhs", "rhs").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
      // bounded: the merge table IS the model (numMerges rows), the same
      // always-collect discipline as the PQ codebook broadcast

  /** Distinct-word tokenization under a trained merge table:
    * (word, wcount, tokens array). The merge chain is one expression.
    * Building the vocab is one corpus scan + word-count shuffle; a
    * pipeline that already HAS the vocab frame (e.g. it just ran
    * [[train]], or staged the vocab to parquet) should pass it through
    * [[tokenizeVocab]] instead and pay zero rescans.
    */
  def tokenizeWords(docs: DataFrame, textCol: String,
                    mergesDf: DataFrame): DataFrame =
    tokenizeVocab(vocab(docs, textCol), mergesDf)

  /** [[tokenizeWords]] over a precomputed (word, wcount, sym) vocab frame
    * — the no-corpus-rescan form for train-then-apply pipelines.
    */
  def tokenizeVocab(vocabDf: DataFrame, mergesDf: DataFrame): DataFrame = {
    val merges = collectMerges(mergesDf)
    vocabDf.select(col("word"), col("wcount"),
      split(applyMerges(col("sym"), merges), " ").as("tokens"))
  }

  /** Corpus token-type counts under a trained merge table: (token, n),
    * n = total weighted occurrences. At most |alphabet| + numMerges rows.
    */
  def tokenCounts(docs: DataFrame, textCol: String,
                  mergesDf: DataFrame): DataFrame =
    tokenizeWords(docs, textCol, mergesDf)
      .select(explode(col("tokens")).as("token"), col("wcount"))
      .groupBy("token").agg(sum("wcount").as("n"))

  /** Doc-level tokenization: (idCol, tokens) with every document's FULL
    * ordered token sequence — the hand-off to sequence packing. Encoding
    * runs once per DISTINCT word ([[tokenizeWords]]) and occurrences
    * equi-join against it — the Heaps'-law split that keeps corpus-wide
    * tokenization proportional to the vocab, not the corpus, on the
    * encode side. Order is carried by posexplode →
    * array_sort(struct(pos, tokens)) → flatten, all codegen'd; an empty
    * document keeps an empty sequence (posexplode_outer + null-skipping
    * collect_list), so nothing silently disappears from the corpus.
    */
  def tokenizeDocs(docs: DataFrame, idCol: String, textCol: String,
      mergesDf: DataFrame): DataFrame = {
    val wtoks = tokenizeWords(docs, textCol, mergesDf)
      .select(col("word"), col("tokens"))
    docs.select(col(idCol),
        posexplode_outer(TextOps.tokensRegex(col(textCol)))
          .as(Seq("pos", "word")))
      .join(wtoks, Seq("word"), "left")
      .groupBy(idCol)
      .agg(flatten(transform(
        array_sort(collect_list(when(col("word").isNotNull,
          struct(col("pos"), col("tokens"))))),
        x => x.getField("tokens"))).as("tokens"))
  }

  /** Per-doc BPE token COUNTS without materializing sequences:
    * (idCol, n_tok). Consumers that only budget tokens — sequence
    * packing, mixture math — must not pay [[tokenizeDocs]]'s
    * collect/sort/flatten of every full sequence: here occurrences
    * equi-join the per-word token COUNT and sum per doc — one corpus
    * explode, one vocab-sized join, one aggregate. Empty documents
    * carry no occurrence rows and are absent (the packing convention:
    * zero tokens packs nothing).
    */
  def tokenCountsPerDoc(docs: DataFrame, idCol: String, textCol: String,
      mergesDf: DataFrame): DataFrame = {
    val wtoks = tokenizeWords(docs, textCol, mergesDf)
      .select(col("word"), size(col("tokens")).cast("long").as("_w_tok"))
    docs.select(col(idCol),
        explode(TextOps.tokensRegex(col(textCol))).as("word"))
      .join(wtoks, Seq("word"))
      .groupBy(idCol)
      .agg(sum("_w_tok").as("n_tok"))
  }
}
