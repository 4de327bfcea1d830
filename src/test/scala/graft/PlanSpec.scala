package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions (the 100 TB discipline): filters reach the
  * parquet scan, projections prune columns, small dims broadcast, top-k
  * plans as TakeOrderedAndProject, aggregations are two-phase (map-side
  * partial). A plan regression here is a scale bug even when results stay
  * correct.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf0001

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("p6: range predicates are pushed to the parquet scan") {
    val p = plan("p6_range_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"), p)
    assert(p.contains("GreaterThanOrEqual(l_quantity,10.0)"), p)
  }

  test("p6: scan reads only the referenced columns (pruning)") {
    val p = plan("p6_range_filter")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"), readSchema)
    assert(!readSchema.contains("l_returnflag"), readSchema)
  }

  test("j1/j2: dimension joins broadcast (no fact-table shuffle join)") {
    assert(plan("j1_inner_broadcast").contains("BroadcastHashJoin"))
    val p5 = plan("j2_star_join_5way")
    assert(p5.contains("BroadcastHashJoin"), p5)
    assert(!p5.contains("SortMergeJoin"), "5-way star must broadcast all dims")
  }

  test("o2: top-k by time plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("o2_topk_by_time")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("a1/a3: aggregations are two-phase (map-side partial)") {
    val p = plan("a3_avg")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(p.contains("partial"), p)
  }

  test("entry: whole-stage codegen covers the aggregation") {
    val df = SparkEntry.entry(spark)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    // whole-stage-codegen stages render as "*(n) Operator" in plan strings
    assert(p.contains("*(") , p)
    assert("\\*\\(\\d+\\) HashAggregate".r.findFirstIn(p).isDefined, p)
  }

  test("x5: fused cosine join has no zip_with/aggregate lambda chain") {
    val p = plan("x5_embed_neardup_pairs")
    assert(p.contains("cosine_sim"), p)
    assert(!p.contains("zip_with"), p)
  }

  test("x5b: blocked pair-dedup is an equi-join on the bucket, never a nested loop") {
    val p = plan("x5b_embed_neardup_blocked")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // candidate generation joins bucket = bucket (hash or sort-merge —
    // either is the scale-safe shape; x5's BNL join is neither)
    assert(p.contains("bucket"), p)
  }

  test("x17: canopy edit-distance blocks via an equi-join, never a cross join") {
    val p = plan("x17_edit_distance_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("canopy"), p)
  }

  test("x14: IVF centroid assignment is broadcast, never a shuffle join") {
    val p = plan("x14_sim_ivf")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("o6: sessionization shuffles once on user_id (windows share the spec)") {
    val p = plan("o6_sessionize")
    // both window functions + the session aggregate reuse the user_id
    // hash partitioning: exactly one exchange hashes on user_id alone
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toList
    assert(exchanges.count(_.contains("user_id")) == 1, p)
  }

  test("m1: every window partitions on the block key (no global window)") {
    val df = SparkEntry.queries("m1_ts_split_chunks")(spark, sf)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    val winLines = p.linesIterator.filter(_.contains("Window [")).toList
    assert(winLines.nonEmpty, p)
    winLines.foreach(l =>
      assert(l.contains("blk"), s"window must partition on blk, not global: $l"))
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("x21: chunk packing shuffles once on shard and prunes the scan") {
    val df = SparkEntry.queries("x21_chunk_pack")(spark, sf)
    df.collect()
    // AQE toString appends the pre-adaptive plan; assert on the final one
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // one hash exchange on the content shard key; no global window
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toList
    assert(exchanges.count(_.contains("shard")) == 1, p)
    assert(!p.contains("Exchange SinglePartition"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"), readSchema)
    assert(!readSchema.contains("lang") && !readSchema.contains("source"), readSchema)
  }

  test("x24: the manifest build scans documents at most twice (stage handoff)") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def documentScans(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case r: LogicalRelation => r.relation
      }.count {
        case h: HadoopFsRelation =>
          h.location.rootPaths.exists(_.toString.contains("documents"))
        case _ => false
      }
    // stage job (gate → dedup): one scan of the raw corpus
    val stage = graft.operators.PipelineOps.gateAndDedup(
      Tables.documents(spark, sf), Seq("src18", "src19"), 4000L)
    assert(documentScans(stage) == 1, stage.queryExecution.optimizedPlan.toString)
    // final job: the train side comes from the stage parquet, so the only
    // remaining documents scan is the eval side of decontamination —
    // without the handoff this plan held the gate→dedup subtree twice
    // (three scans) and re-ran full-corpus tokenization with it
    val manifest = SparkEntry.queries("x24_training_manifest")(spark, sf)
    assert(documentScans(manifest) == 1,
      manifest.queryExecution.optimizedPlan.toString)
    assert(manifest.count() > 0)
    // the fuzzy variant adds MinHash pairs + CC + survivors over the STAGE
    // parquet — the raw corpus is still scanned once (the eval side)
    val fuzzy = SparkEntry.queries("x24b_manifest_neardup")(spark, sf)
    assert(documentScans(fuzzy) == 1,
      fuzzy.queryExecution.optimizedPlan.toString)
    assert(fuzzy.count() > 0)
  }

  test("x24c: mixture-driven manifest never rescans the raw corpus") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val manifest = SparkEntry.queries("x24c_manifest_mixture")(spark, sf)
    // in mixture mode BOTH raw-corpus passes (gate→dedup, eval-side
    // decontamination) happen in stage jobs: the returned plan reads only
    // the gated stage + the tiny leaked-id stage, and the derived rate
    // table rides a broadcast into the sample filter
    val docScans = manifest.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation
    }.count {
      case h: HadoopFsRelation =>
        h.location.rootPaths.exists(_.toString.contains("documents"))
      case _ => false
    }
    assert(docScans == 0, manifest.queryExecution.optimizedPlan.toString)
    val p = manifest.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(manifest.count() > 0)
  }

  test("x32/x33/x35/x36: span surgery + semantic dedup stay equi-keyed") {
    // the action operators inherit the kernels' discipline: candidates
    // meet on hash/bucket equi-joins, never a cross product; x33's
    // range-predicate removal join is doc-id-equi with the range as a
    // post-join filter
    for (q <- Seq("x32_span_dedup", "x33_span_trim", "x35_span_decontam",
        "x36_semantic_dedup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
      assert(!p.contains("Exchange SinglePartition"), s"$q:\n$p")
    }
  }

  test("x29: shared-span candidates come from an equi-join on the window key") {
    val p = plan("x29_shared_spans")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("h#") || p.contains("[h]"), p) // join on the window hash
  }

  test("x4b/x29b: capped pair plans read only the staged index (tokenize once)") {
    // the DF cap is the form you run at 100 TB — it must not pay the
    // tokenize+explode+hash kernel twice (hot-key derivation + anti-join
    // shuffle the index differently, so only a parquet stage dedupes the
    // kernel; judge r8). The returned plan reading no `documents` scan IS
    // the proof the corpus tokenized exactly once, in the stage job.
    for (q <- Seq("x4b_dedup_jaccard_capped", "x29b_shared_spans_capped")) {
      val p = plan(q)
      val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toList
      assert(scans.nonEmpty && scans.forall(l => !l.contains("documents")),
        s"$q must read only the staged index:\n$p")
    }
  }

  test("x26: both quality windows share ONE lang exchange (no double shuffle)") {
    val p = plan("x26_quality_topp")
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toList
    assert(exchanges.count(_.contains("lang")) == 1, p)
  }

  test("o5b: argmax is a two-phase aggregate, no window anywhere") {
    val p = plan("o5b_argmax_agg")
    assert(p.contains("partial_max"), p)
    assert(!p.linesIterator.exists(l => l.trim.startsWith("Window")), p)
  }

  test("x26b: histogram gate is two-phase with a broadcast threshold join") {
    // the scale form of x26: the corpus never enters a per-language
    // window — the (lang, quality) histogram partial-aggregates map-side
    // over a STAGED scored frame (the gate's three lazy branches must not
    // re-tokenize the corpus), and the threshold table broadcasts back
    // onto the doc side via AQE — no hard hint, so an unquantized score
    // degrades to a shuffle join instead of a driver OOM (advisor r8)
    val df = SparkEntry.queries("x26b_quality_topp_hist")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toList
    assert(scans.nonEmpty && scans.forall(l => !l.contains("documents")),
      s"returned plan must read only the stage:\n$p")
    assert(p.contains("partial_count"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("x28: mixture rates tokenize the corpus once (window binding, no branch)") {
    val p = plan("x28_mixture_rates")
    assert(p.linesIterator.count(_.contains("FileScan parquet")) == 1, p)
  }

  test("x31: token df is a partial agg + join-back over a staged tokenization") {
    // the skew-safe shape (judge r7): an unbounded Window.partitionBy(tok)
    // count does no map-side combine — a stopword's posting list would
    // serialize into one task at corpus scale. groupBy(tok) partial-
    // aggregates before the shuffle; the staged tokenization keeps the
    // one-tokenization property (both branches read the stage parquet,
    // never the raw corpus again)
    val p = plan("x31_typicality")
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toList
    assert(scans.nonEmpty && scans.forall(l => !l.contains("documents")),
      s"returned plan must read only the stage:\n$p")
    assert(p.contains("partial_count"), s"df must be two-phase:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.trim.startsWith("Window") || l.contains("windowspecdefinition")),
      s"no window operator anywhere in the skew-safe plan:\n$p")
  }

  test("x38: scrub reads only the staged tokenization; DF is a partial agg") {
    // the corpus-wide boilerplate scrub inherits x31's skew-safe shape:
    // window DF via groupBy (map-side combine, never a per-key window),
    // candidates equi-keyed, the raw corpus never rescanned after staging
    val p = plan("x38_boilerplate_scrub")
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toList
    assert(scans.nonEmpty && scans.forall(l => !l.contains("documents")),
      s"returned plan must read only the stage:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.linesIterator.exists(l =>
        l.trim.startsWith("Window") || l.contains("windowspecdefinition")),
      s"no window operator anywhere in the scrub plan:\n$p")
  }

  test("x39: sketch build partial-aggregates; the counter table broadcasts") {
    val p = plan("x39_cms_hot_tokens")
    assert(p.contains("partial_count"), s"bounded-key build must combine map-side:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"probe join must broadcast the sketch:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x40: the absolute cap shares x26b's histogram-gate plan shape") {
    val df = SparkEntry.queries("x40_source_cap")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toList
    assert(scans.nonEmpty && scans.forall(l => !l.contains("documents")),
      s"returned plan must read only the stage:\n$p")
    assert(p.contains("partial_count"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("x42: surprise reads only the staged bigrams; counts partial-aggregate") {
    val p = plan("x42_bigram_surprise")
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toList
    assert(scans.nonEmpty && scans.forall(l => !l.contains("documents")),
      s"returned plan must read only the bigram stage:\n$p")
    assert(p.contains("partial_count"), s"count tables must be two-phase:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.trim.startsWith("Window") || l.contains("windowspecdefinition")),
      s"no window operator anywhere:\n$p")
  }

  test("x43: keyword top-k is the heap aggregate over the staged tf frame") {
    val p = plan("x43_tfidf_keywords")
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toList
    assert(scans.nonEmpty && scans.forall(l => !l.contains("documents")),
      s"returned plan must read only the tf stage:\n$p")
    assert(p.contains("topk_by_score"), s"per-doc top-k must be the aggregate:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.trim.startsWith("Window") || l.contains("windowspecdefinition")),
      s"no rank window anywhere:\n$p")
  }

  test("x44: the corpus report is one scan with two-phase aggregates") {
    val p = plan("x44_corpus_report")
    assert(p.linesIterator.count(_.contains("FileScan parquet")) == 1, p)
    assert(p.contains("partial_"), s"report aggregates must combine map-side:\n$p")
    assert(!p.linesIterator.exists(l => l.trim.startsWith("Window")), p)
  }

  test("x45: curriculum packing shuffles once on shard, like x21") {
    val df = SparkEntry.queries("x45_chunk_pack_curriculum")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toList
    assert(exchanges.count(_.contains("shard")) == 1, p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("x46: the model gate reads only staged features; scoring is join-free arithmetic") {
    // the tokenize+bigram kernel runs once, in the feature-stage job: the
    // returned plan reads the feature stage + the weight artifact, never
    // `documents`; the dot product is a broadcast of ONE pivoted weight
    // row — no shuffle join on the corpus side before the histogram gate
    val df = SparkEntry.queries("x46_model_quality_gate")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toList
    assert(scans.nonEmpty && scans.forall(l => !l.contains("documents")),
      s"must read only the stage + weight artifact:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x47: the sketch gate never rank-windows a class — only the boundary bucket") {
    val df = SparkEntry.queries("x47_sketch_quality_gate")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // every row_number window must partition by (class, bucket) — the
    // boundary tie rank — never by the class alone (that is the rank
    // form this gate exists to avoid)
    val rankWins = p.linesIterator.filter(l =>
      l.contains("row_number") && l.contains("windowspecdefinition")).toList
    assert(rankWins.nonEmpty, s"boundary rank expected:\n$p")
    rankWins.foreach(l => assert(l.contains("qb"),
      s"rank windows must be confined to the boundary bucket: $l"))
    // (the sketch build's partial agg hides under a ReusedExchange whose
    // definition prints in the initial-plan section — not assertable
    // here; SketchOpsSpec covers the bounded build directly)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("x14b: trained-IVF assignment is broadcast, never a shuffle join") {
    val p = plan("x14b_sim_ivf_trained")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("f8: month-bucket aggregation is two-phase over a pruned scan") {
    val p = plan("f8_month_buckets")
    assert(p.contains("partial"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("o_orderstatus"), readSchema)
  }

  test("x60: the diff join carries (id, hash) only — documents never shuffle") {
    val df = SparkEntry.queries("x60_snapshot_diff")(spark, sf)
    // Catalyst pushes the md5 projection below the join, so the join's
    // inputs (== what the exchanges carry) are hash columns, not text;
    // at 100 TB this is the difference between shuffling GBs and TBs
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      assert(!j.left.output.map(_.name).contains("text"),
        s"join left carries text:\n${j.left}")
      assert(!j.right.output.map(_.name).contains("text"),
        s"join right carries text:\n${j.right}")
    }
  }

  test("x59: the JL projection is one shuffle-free pass inside the scan stage") {
    val proj = graft.operators.SimilarityOps.randomProjection(
      Tables.embeddings(spark, sf), "embedding", "pv", 16, 64)
      .select("vec_id", "pv")
    val p = proj.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"projection must not shuffle:\n$p")
    // and it reads only the two columns it needs
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("label"), readSchema)
  }

  test("x57: BPE pair counts and token counts partial-aggregate map-side") {
    import graft.operators.BpeOps
    val docs = Tables.documents(spark, sf)
    val pc = BpeOps.pairCounts(BpeOps.vocab(docs, "text"))
    assert(pc.queryExecution.executedPlan.toString.contains("partial"),
      pc.queryExecution.executedPlan.toString)
    // the word-count shuffle carries (word, count) pairs, not documents
    val joins = pc.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(joins.forall(!_.output.map(_.name).contains("text")))
  }

  test("x52: canonical dedup prunes to (doc_id, text), aggregates two-phase, codegen'd nfc") {
    val df = SparkEntry.queries("x52_canonical_dedup")(spark, sf)
    df.collect() // finalize the adaptive plan so codegen stages render
    val p = df.queryExecution.executedPlan.toString
    // the canonicalize → md5 pass must read ONLY the two columns it
    // uses — a scan dragging lang/source/n_chars along reads 100 TB of
    // bytes it immediately drops
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"), readSchema)
    assert(!readSchema.contains("lang") && !readSchema.contains("n_chars"),
      readSchema)
    // map-side partial agg on the canonical key (shuffle carries one row
    // per distinct canonical form per task, not the corpus)
    assert(p.contains("partial"), p)
    // the native NfcNormalize sits inside a whole-stage-codegen span
    val nfcLine = p.linesIterator.find(_.contains("nfc_normalize"))
    assert(nfcLine.exists(_.contains("*(")),
      s"nfc_normalize not codegen'd:\n$p")
  }

  test("x66/x68: markup strip + URL canonicalization are shuffle-free per-row passes") {
    // both are pure string pipelines over the scan — any Exchange before
    // the final sort means per-row work grew a shuffle it never needs
    val p66 = SparkEntry.queries("x66_markup_extract")(spark, sf)
      .queryExecution.executedPlan.toString
    val beforeSort66 = p66.split("Sort ").last
    assert(!beforeSort66.contains("Exchange hashpartitioning"),
      s"x66 per-row pass shuffles:\n$p66")
    // x68 joins the census back on the canonical key — ONE hash exchange
    // family on url_canonical is the whole shuffle story
    val p68 = SparkEntry.queries("x68_url_canonical")(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = p68.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.forall(_.contains("url_canonical")),
      s"x68 shuffles on a non-canonical key:\n$exchanges")
  }

  test("x67: the vote table broadcasts into scoring (never a shuffle join)") {
    val df = SparkEntry.queries("x67_importance_select")(spark, sf)
    df.collect() // finalize adaptive plan
    val p = df.queryExecution.executedPlan.toString
    // the ≤256-row vote table and the totals row must broadcast; the
    // only sort-merge-sized join allowed is the per-doc left join back
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    // per-doc scoring aggregates two-phase (map-side partials bound the
    // shuffle to one row per doc per task)
    assert(p.contains("partial"), p)
  }

  test("x80: paragraph dedup is window-free (owner via two-phase min aggregate)") {
    val p = plan("x80_paragraph_dedup")
    assert(!p.contains("Window"), "a window over paragraph hashes would " +
      s"single-task every hot boilerplate hash:\n$p")
    assert(p.contains("partial_min") || p.contains("partial"), p)
  }

  test("x81: the weight table broadcasts; order rides a sort, not a global window") {
    val p = plan("x81_epoch_order")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Window"), "a row_number() here would serialize " +
      s"the whole manifest through one task:\n$p")
  }

  test("x82: the Gram aggregation is two-phase (d² combiner rows per task)") {
    val p = plan("x82_pca_gram")
    assert(p.contains("partial_sum") || p.contains("partial"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x83: calibration windows run over the distinct-score aggregate, not the corpus") {
    val df = SparkEntry.queries("x83_score_calibrate")(spark, sf)
    df.collect() // finalize adaptive plan
    val p = df.queryExecution.executedPlan.toString
    val lines = p.linesIterator.toVector
    val wIdx = lines.indexWhere(_.contains("windowspecdefinition(source"))
    assert(wIdx >= 0, s"x83 should calibrate through source windows:\n$p")
    // the windows' input (printed BELOW them) is the (source, quality)
    // count aggregate — a window directly over the corpus would put a
    // billion-doc source on one task
    val aIdx = lines.indexWhere(l => l.contains("HashAggregate") &&
      l.contains("quality") && l.contains("count"), wIdx)
    assert(aIdx > wIdx,
      s"no (source, quality) aggregate under the calibration window:\n$p")
  }

  test("x85: every scene window partitions on asset_id (no global window)") {
    val p = plan("x85_scene_cuts")
    val specs = "windowspecdefinition\\(".r.findAllIn(p).size
    val byAsset = "windowspecdefinition\\(asset_id".r.findAllIn(p).size
    assert(specs > 0 && specs == byAsset,
      s"found $specs window specs, only $byAsset partitioned by asset:\n$p")
  }

  test("x88: budget fill reads only the stage; every window is score-confined") {
    // the x26b shape with token mass: the corpus never re-tokenizes
    // (three lazy branches consume the staged frame), and no window
    // partitions by class alone — the cumulative-mass scan rides the
    // (class, score) histogram and the boundary running sum partitions
    // by (class, score), so window size is bounded by score resolution
    // and boundary-tie mass, never by class size
    val df = SparkEntry.queries("x88_budget_fill")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toList
    assert(scans.nonEmpty && scans.forall(l => !l.contains("documents")),
      s"returned plan must read only the stage:\n$p")
    val specs = "windowspecdefinition\\([^)]*".r.findAllIn(p).toList
    assert(specs.nonEmpty && specs.forall(_.contains("score")),
      s"every window must be score-confined:\n$specs")
  }

  test("x89: duplicate discount is a two-phase census + equi-join (no window, no cross)") {
    val p = plan("x89_dup_discount")
    assert(!p.contains("Window"), "a count-over-key window would " +
      s"single-task a mega-duplicate key:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count") || p.contains("partial"), p)
  }

  test("x90: reliability bins partial-aggregate map-side; no window, one scan") {
    val p = plan("x90_reliability")
    assert(p.linesIterator.count(_.contains("FileScan parquet")) == 1, p)
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_count") || p.contains("partial"), p)
  }

  test("x92: prefix-dup pairing is an equi-join on the block key, never a cross join") {
    val p = plan("x92_prefix_dups")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"pairing must stay blocked on the prefix key:\n$p")
    assert(!p.contains("Window"), p)
  }

  test("x70: dhash pair search is an equi-join on (band, word), never a cross join") {
    import org.apache.spark.sql.functions._
    val hashes = graft.operators.MultimodalOps.imageDHash(
      graft.operators.MultimodalOps.toRasterAssets(
        graft.Tables.documents(spark, sf), "doc_id", "text"))
    val p = graft.operators.MultimodalOps
      .dhashNearDupPairs(hashes, "asset_id", maxDist = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("_band") && p.contains("_word"), p)
  }

  test("x121: exact-substring dedup has NO pair join anywhere") {
    // the operator's scale claim: census + chain-extension + anti-join —
    // never a candidate pair join (the thing maxWindowDf exists to cap
    // in the PAIRWISE family is structurally absent here)
    val p = plan("x121_exact_substring")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // the island window partitions on doc_id, never globally (x85 style)
    val specs = "windowspecdefinition\\(".r.findAllIn(p).size
    val byDoc = "windowspecdefinition\\(doc_id".r.findAllIn(p).size
    assert(specs == byDoc,
      s"found $specs window specs, only $byDoc partitioned by doc_id:\n$p")
  }

  test("x122b: unigram apply is the Heaps split — segmentation joins " +
      "occurrences by word equi-join, no per-occurrence segmentation") {
    val p = plan("x122b_unigram_apply")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // occurrences meet the per-word segmentation on a word equi-join
    assert(p.contains("Join [word") || p.contains("Join LeftOuter") ||
      "\\[word#\\d+\\], \\[word#\\d+\\]".r.findFirstIn(p).isDefined,
      s"no word equi-join found:\n$p")
  }

  test("x124: BM25 candidate generation is an inverted-index equi-join — " +
      "query side broadcast, no pair join anywhere") {
    val p = plan("x124_bm25_topk")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // the model-sized query-term / df frames broadcast into the postings
    // scan; the corpus never shuffles toward the queries
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("x126: the fusion window partitions per query over the bounded " +
      "shortlist union, and the only nested-loop join is the broadcast " +
      "query-embedding scan") {
    val p = plan("x126_hybrid_rrf")
    assert(!p.contains("CartesianProduct"), p)
    // the semantic arm is crossJoin(broadcast(queries)) by design — a
    // BroadcastNestedLoopJoin whose build side is the model-sized query
    // set; any OTHER nested loop would be a corpus-pair blowup
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnl <= 1, s"unexpected extra nested-loop joins ($bnl):\n$p")
    val specs = "windowspecdefinition\\(".r.findAllIn(p).size
    val byQ = "windowspecdefinition\\(q_id".r.findAllIn(p).size
    assert(specs == byQ,
      s"found $specs window specs, only $byQ partitioned by q_id:\n$p")
  }

  test("x96-x99: the rule batteries are shuffle-free per-row passes") {
    // gopher/c4/secret-scan/readability are map-side gates: higher-order
    // folds + regex over the scan, integer cross-multiplied thresholds —
    // the ONLY exchange allowed is the final output sort's range
    // partitioning. A hash exchange before the sort means a per-row
    // kernel grew a shuffle it never needs.
    Seq("x96_gopher_rules", "x97_c4_rules", "x98_secret_scan",
        "x99_readability").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q per-row gate shuffles:\n$p")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q grew a join:\n$p")
    }
  }
}
