package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AnnIndex, PqOps, SimilarityOps}

/** The incrementally-maintained IVF-PQ index: tick-count invariance
  * (N appends ≡ 1 append — the x48/x49 incremental-equals-rebuild
  * discipline applied to the similarity surface), the partition-pruned
  * probe scan (asserted from the executed plan's PartitionFilters and
  * selected-partition count, not inferred from geometry), and the
  * nprobe recall dial.
  */
class AnnIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf01 = "/root/testdata/sf0.01"
  val kCells = 8; val m = 16; val kcw = 64

  lazy val emb = Tables.embeddings(spark, sf01).cache()
  lazy val seed = emb.filter(col("vec_id") % 3 === 0)
  lazy val b1 = emb.filter(col("vec_id") % 3 === 1)
  lazy val b2 = emb.filter(col("vec_id") % 3 === 2)
  lazy val queries = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  lazy val base: String = {
    val dir = graft.operators.StageIO.resolve(spark, None, "annix")
    AnnIndex.init(spark, seed, "vec_id", "embedding", dir, kCells, m, kcw)
    AnnIndex.appendBatch(spark, b1, "vec_id", "embedding", dir, 1L)
    AnnIndex.appendBatch(spark, b2, "vec_id", "embedding", dir, 2L)
    dir
  }

  private def probe(nprobe: Int, dir: String = base) =
    AnnIndex.probe(spark, queries, "qid", "qv", dir, "vec_id", 5, nprobe,
      excludeSelf = true)

  test("two ticks ≡ one tick: probe results identical either way") {
    val once = graft.operators.StageIO.resolve(spark, None, "annix1")
    AnnIndex.init(spark, seed, "vec_id", "embedding", once, kCells, m, kcw)
    AnnIndex.appendBatch(spark, b1.unionAll(b2), "vec_id", "embedding",
      once, 1L)
    val a = probe(2).orderBy("qid", "vec_id").collect()
    val b = probe(2, once).orderBy("qid", "vec_id").collect()
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
  }

  test("replaying a batch id is idempotent: postings unchanged") {
    val before = spark.read.parquet(AnnIndex.postingsDir(base))
      .orderBy("vec_id").collect()
    AnnIndex.appendBatch(spark, b2, "vec_id", "embedding", base, 2L)
    val after = spark.read.parquet(AnnIndex.postingsDir(base))
      .orderBy("vec_id").collect()
    assert(after.toSeq === before.toSeq)
  }

  test("the index holds every ingested vector exactly once, in one cell") {
    val postings = spark.read.parquet(AnnIndex.postingsDir(base))
    assert(postings.count() === emb.count())
    assert(postings.groupBy("vec_id").count()
      .filter(col("count") =!= 1).count() === 0)
    assert(postings.filter(size(col("codes")) =!= m).count() === 0)
  }

  test("probe scan is partition-pruned to the probed cells") {
    val df = probe(2)
    df.collect()
    // AQE nests the real operators inside query stages
    // (ResultQueryStageExec.plan etc.), which TreeNode.collect does not
    // enter — expand them explicitly
    def expand(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      p +: kids.flatMap(expand)
    }
    val scans = expand(df.queryExecution.executedPlan).collect {
      case s: FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("postings")) => s
    }
    assert(scans.nonEmpty, "no postings scan in the probe plan")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "cell")),
      s"no cell partition filter: ${scan.partitionFilters}")
    // the scan must select strictly fewer leaf partitions (batch × cell)
    // than the index holds — the probe reads the probe set, not the index
    val selected =
      scan.relation.location.listFiles(scan.partitionFilters, Nil).length
    val total = scan.relation.location.listFiles(Nil, Nil).length
    assert(selected < total,
      s"probe read all $total postings partitions — no pruning")
  }

  test("probing every cell recovers the full-ADC result; more cells ≥ recall") {
    val truth = PqOps.l2TopKBatch(emb, "vec_id", "embedding",
      queries, "qid", "qv", 5, excludeSelf = true)
    def recall(a: org.apache.spark.sql.DataFrame): Double =
      SimilarityOps.recallAtK(truth, a.select("qid", "vec_id"),
        "qid", "vec_id").agg(avg("recall")).head().getDouble(0)
    val r2 = recall(probe(2))
    val rAll = recall(probe(kCells))
    assert(rAll >= r2 - 1e-9, s"nprobe dial broken: all=$rAll < np2=$r2")
    assert(rAll > 0.3, s"full-probe ADC recall $rAll")
    // and the full probe must agree with the flat ADC scan over the same
    // codes + codebook (the index adds routing, not a different metric)
    val cb = spark.read.parquet(AnnIndex.codebookDir(base))
    val codes = PqOps.unpack(
      spark.read.parquet(AnnIndex.postingsDir(base)).select("vec_id", "codes"),
      "vec_id")
    val flat = PqOps.adcTopKBatch(codes, "vec_id", queries, "qid", "qv",
      cb, m, 5, excludeSelf = true)
    val got = probe(kCells).select("qid", "vec_id", "adist")
      .orderBy("qid", "vec_id").collect()
    val want = flat.orderBy("qid", "vec_id").collect()
    assert(got.toSeq === want.toSeq)
  }

  test("residual (IVFADC) encoding beats raw-vector encoding on recall") {
    val res = graft.operators.StageIO.resolve(spark, None, "annixr")
    AnnIndex.init(spark, seed, "vec_id", "embedding", res, kCells, m, kcw,
      residual = true)
    AnnIndex.appendBatch(spark, b1, "vec_id", "embedding", res, 1L)
    AnnIndex.appendBatch(spark, b2, "vec_id", "embedding", res, 2L)
    val truth = PqOps.l2TopKBatch(emb, "vec_id", "embedding",
      queries, "qid", "qv", 5, excludeSelf = true)
    def recall(a: org.apache.spark.sql.DataFrame): Double =
      SimilarityOps.recallAtK(truth, a.select("qid", "vec_id"),
        "qid", "vec_id").agg(avg("recall")).head().getDouble(0)
    val rawAll = recall(probe(kCells))
    val resAll = recall(probe(kCells, res))
    // measured 0.52 residual vs 0.42 raw at full probe on this fixture —
    // residuals concentrate around the origin, so the same m·k codebook
    // budget quantizes them with less error even on unclustered data
    assert(resAll >= 0.45, s"residual full-probe recall $resAll")
    assert(resAll >= rawAll - 0.05,
      s"residual recall $resAll fell below raw $rawAll")
    // the flag rides in _geometry: ticks and probes picked it up without
    // being told (a mixed-mode read would collapse recall toward noise)
  }

  test("filtered probe is filter-THEN-rank over postings attributes") {
    val dir = graft.operators.StageIO.resolve(spark, None, "annixf")
    AnnIndex.init(spark, emb, "vec_id", "embedding", dir, kCells, m, kcw,
      attrs = Seq("label"))
    val pred = col("label").isin(1, 3)
    val got = AnnIndex.probe(spark, queries, "qid", "qv", dir, "vec_id",
      5, nprobe = kCells, excludeSelf = true, predicate = Some(pred))
    // every result is from the predicate set
    val labels = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = got.select("qid", "vec_id", "adist").orderBy("qid", "vec_id")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set(1, 3)(labels(r.getLong(1)))))
    // filter-then-rank contract at full probe: identical to the flat ADC
    // scan over the label-filtered corpus codes
    val cb = spark.read.parquet(AnnIndex.codebookDir(dir))
    val filteredCodes = PqOps.unpack(
      spark.read.parquet(AnnIndex.postingsDir(dir))
        .filter(pred).select("vec_id", "codes"), "vec_id")
    val want = PqOps.adcTopKBatch(filteredCodes, "vec_id", queries,
      "qid", "qv", cb, m, 5, excludeSelf = true)
      .orderBy("qid", "vec_id").collect()
    assert(rows.toSeq === want.toSeq)
  }

  test("streaming maintenance fills the index; probe matches batch build") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = graft.operators.StageIO.resolve(spark, None, "annixs")
    AnnIndex.init(spark, seed, "vec_id", "embedding", dir, kCells, m, kcw)
    val input = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.AnnIndexStream.startIndexMaintenance(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      dir, graft.operators.StageIO.resolve(spark, None, "annixs-ckpt"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    try {
      input.addData(rows(b1)); q.processAllAvailable()
      input.addData(rows(b2)); q.processAllAvailable()
    } finally q.stop()
    // quantizers are shared (same seed, frozen), so the streamed index
    // must probe identically to the batch-built one
    val a = probe(2, dir).orderBy("qid", "vec_id").collect()
    val b = probe(2).orderBy("qid", "vec_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("compaction folds the batch dirs; probe results unchanged") {
    val before = probe(2).orderBy("qid", "vec_id").collect()
    AnnIndex.compactPostings(spark, base)
    val fs = new org.apache.hadoop.fs.Path(AnnIndex.postingsDir(base))
      .getFileSystem(spark.sessionState.newHadoopConf())
    val batchDirs = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"${AnnIndex.postingsDir(base)}/batch=*"))
    assert(batchDirs.length === 1, "compaction left more than one batch dir")
    val after = probe(2).orderBy("qid", "vec_id").collect()
    assert(after.toSeq === before.toSeq)
  }

  test("deleteBatch: tombstoned vectors never rank — pre-compact via the " +
      "probe's anti-join, post-compact via the physical purge; the " +
      "result equals the exclusion-predicate probe both times") {
    val dir = graft.operators.StageIO.resolve(spark, None, "annix-del")
    AnnIndex.init(spark, seed, "vec_id", "embedding", dir, kCells, m, kcw)
    AnnIndex.appendBatch(spark, b1.unionAll(b2), "vec_id", "embedding",
      dir, 1L)
    // the exclusion-predicate probe over the UN-deleted index is the
    // semantic reference: filter-then-rank on the surviving ids
    val want = AnnIndex.probe(spark, queries, "qid", "qv", dir, "vec_id",
        5, 2, excludeSelf = true,
        predicate = Some(pmod(col("vec_id"), lit(7)) =!= 3))
      .orderBy("qid", "vec_id").collect().toSeq
    AnnIndex.deleteBatch(spark,
      emb.filter(pmod(col("vec_id"), lit(7)) === 3).select("vec_id"),
      "vec_id", dir, 2L)
    val preCompact = probe(2, dir).orderBy("qid", "vec_id").collect().toSeq
    assert(preCompact === want, "read-time anti-join must equal the " +
      "exclusion-predicate probe")
    // replay is a no-op (overwrite-keyed tombstone batch)
    AnnIndex.deleteBatch(spark,
      emb.filter(pmod(col("vec_id"), lit(7)) === 3).select("vec_id"),
      "vec_id", dir, 2L)
    assert(probe(2, dir).orderBy("qid", "vec_id").collect().toSeq === want)
    AnnIndex.compactPostings(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(AnnIndex.delDir(dir))),
      "compact must retire the applied tombstones")
    val purged = spark.read.parquet(AnnIndex.postingsDir(dir))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(purged.nonEmpty && !purged.exists(_ % 7 == 3),
      "fold must purge tombstoned postings physically")
    assert(probe(2, dir).orderBy("qid", "vec_id").collect().toSeq === want)
  }
}
