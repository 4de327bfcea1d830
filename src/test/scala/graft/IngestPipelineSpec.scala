package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DeltaManifest, IngestPipeline, PipelineOps}

/** The one-call ingest tick: pairs → cluster store → delta manifest as a
  * single public operator. What used to be a hand-wired spec recipe
  * (MemoryStream near-dup feed, then a separately-ordered applyBatch) is
  * now IngestPipeline.tick, and these tests prove the composition end to
  * end — near-dup drops against PRIOR corpus state the batch could never
  * compute alone, exact parity with the full near-dedup rebuild, and
  * replay idempotency.
  */
class IngestPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val evalSources = Seq("src9")
  private def body(seed: Int) =
    (1 to 30).map(i => s"tok${(i * seed) % 17}s${seed}w$i").mkString(" ")

  private def mkDocs(rows: Seq[(Long, String, String, String)]): DataFrame =
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))

  private lazy val prior = mkDocs(
    (1L to 20L).map(i => (i, body(i.toInt), if (i % 3 == 0) "zh" else "en",
      "src1")) :+
    (21L, body(2), "en", "src1") :+            // exact dupe of doc 2
    (30L, "held out eval " + body(99), "en", "src9"))

  private lazy val evalDocs = prior.filter(col("source") === "src9")

  private def build(docs: DataFrame, stageDir: String,
      nearDup: Option[Double] = None): DataFrame =
    PipelineOps.trainingManifest(docs, evalSources, minQualityBps = 0L,
      contamThreshold = 0.9, rates = Map.empty, defaultRate = 1.0,
      capacity = 64, shards = 2, stageDir = Some(stageDir),
      nearDupThreshold = nearDup)

  private def initState(base: String): String = {
    val pm = build(prior, s"$base/prior")
    val state = s"$base/state"
    IngestPipeline.init(
      spark.read.parquet(s"$base/prior/gated_deduped"), pm, state)
    state
  }

  private def tick(arrivals: DataFrame, state: String, id: Long) =
    IngestPipeline.tick(arrivals, evalDocs, evalSources, state, id,
      minQualityBps = 0L, contamThreshold = 0.9, rates = Map.empty,
      defaultRate = 1.0, capacity = 64, shards = 2,
      nearDupThreshold = 0.5)

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").distinct().collect().map(_.getLong(0)).toSet

  private def rows(df: DataFrame) =
    df.select("shard", "chunk_id", "doc_id", "tok_in_chunk")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getInt(3))).toSet

  test("one tick drops an arrival near-dupping a PRIOR doc from state alone") {
    // the old end-to-end recipe, now one call: init signs the prior
    // corpus into the log; the tick discovers the (7, 102) pair by
    // band-joining its own signatures against it — no streaming query,
    // no hand-planted pairs, no caller-side ordering to get wrong
    val base = java.nio.file.Files.createTempDirectory("ingest-e2e").toString
    val state = initState(base)
    val d = tick(mkDocs(Seq(
      (101L, body(101), "en", "src1"),
      (102L, body(7) + " tiny edit", "en", "src1"))), state, 1L)
    assert(ids(d) == Set(101L),
      s"the near-dup of prior doc 7 must drop via the signature log")
    // and the pair graph reached the durable store (min-id labeling)
    val labels = graft.streaming.ClusterStream.readLabels(
        spark, IngestPipeline.labelsDir(state))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.get(102L).contains(7L),
      s"the store must label 102 into prior doc 7's cluster: $labels")
  }

  test("prior ∪ tick deltas == the full near-dedup rebuild, two batches") {
    // batch 1: a cross-batch near-dup of prior doc 7 plus originals;
    // batch 2: a near-dup of BATCH 1's doc 103 (cross-batch via the
    // signature log's below-id read) plus an original. The oracle is the
    // full five-stage rebuild with near-dedup enabled over everything —
    // survivors are cluster minima there, so 102 and 104 must vanish
    // from the deltas exactly as they do from the rebuild.
    val base = java.nio.file.Files.createTempDirectory("ingest-par").toString
    val state = initState(base)
    val b1 = mkDocs(Seq(
      (101L, body(101), "en", "src1"),
      (102L, body(7) + " tiny edit", "en", "src1"),
      (103L, body(103), "zh", "src1")))
    val b2 = mkDocs(Seq(
      (104L, body(103) + " tiny edit", "zh", "src1"),
      (105L, body(105), "en", "src1")))
    val d1 = tick(b1, state, 1L)
    val got1 = rows(d1)
    val d2 = tick(b2, state, 2L)
    val got2 = rows(d2)
    assert(ids(d1) == Set(101L, 103L) && ids(d2) == Set(105L))
    val full = build(
      prior.unionByName(b1).unionByName(b2), s"$base/full",
      nearDup = Some(0.5))
    val priorManifest = spark.read.parquet(s"$base/state/manifest/batch=0")
    assert(rows(priorManifest) ++ got1 ++ got2 == rows(full),
      "prior ∪ deltas must equal the full near-dedup rebuild row for row")
  }

  test("eval-index snapshot: built by the first tick, reused untouched after") {
    // the eval split is static (the exactness contract), so its
    // decontamination index persists once — tick 2 must read, not
    // rebuild, the snapshot (r12: the per-tick cost that scaled with
    // the eval corpus instead of the batch)
    val base = java.nio.file.Files.createTempDirectory("ingest-eidx").toString
    val state = initState(base)
    tick(mkDocs(Seq((101L, body(101), "en", "src1"))), state, 1L).count()
    val ok = new org.apache.hadoop.fs.Path(s"$state/eval_index/_SUCCESS")
    val fs = ok.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(ok), "first tick must persist the eval index")
    val t1 = fs.getFileStatus(ok).getModificationTime
    tick(mkDocs(Seq((102L, body(102), "en", "src1"))), state, 2L).count()
    assert(fs.getFileStatus(ok).getModificationTime == t1,
      "second tick must reuse the snapshot, not rewrite it")
  }

  test("signature-log compaction is probe-invisible: identical pairs and deltas after") {
    // two deterministic clones of the same state (init + tick 1); compact
    // one's signature log (batches 0,1 fold into one batch=1 partition,
    // same pfx layout), then run the SAME tick 2 on both. Batch 2's
    // probe reads history `batch < 2` either way, so the cross-batch
    // near-dup discovery (104 vs batch-1's 103) and the delta must come
    // out identical — the compaction changed layout, not state.
    val b1 = mkDocs(Seq(
      (101L, body(101), "en", "src1"),
      (102L, body(7) + " tiny edit", "en", "src1"),
      (103L, body(103), "zh", "src1")))
    val b2 = mkDocs(Seq(
      (104L, body(103) + " tiny edit", "zh", "src1"),
      (105L, body(105), "en", "src1")))
    def seedAndTick1(): String = {
      val base = java.nio.file.Files.createTempDirectory("ingest-cmp").toString
      val state = initState(base)
      tick(b1, state, 1L)
      state
    }
    val plain = seedAndTick1()
    val compacted = seedAndTick1()
    // fold EVERY state log — signatures, hashes, totals, manifest, and
    // the shingle counter log — in the one-call maintenance entry
    IngestPipeline.compactAll(spark, compacted)
    // the folds really happened: one batch= dir remains in each log
    val fs = new org.apache.hadoop.fs.Path(compacted)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def batchDirs(sub: String): Seq[String] = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$compacted/$sub"))
      .map(_.getPath.getName).filter(_.startsWith("batch")).toSeq.sorted
    assert(batchDirs("signatures") == Seq("batch=1"),
      s"signatures not folded: ${batchDirs("signatures")}")
    assert(batchDirs("hashes") == Seq("batch=1"),
      s"hashes not folded: ${batchDirs("hashes")}")
    assert(batchDirs("totals") == Seq("batch=1"),
      s"totals not folded: ${batchDirs("totals")}")
    assert(batchDirs("manifest") == Seq("batch=1"),
      s"manifest not folded: ${batchDirs("manifest")}")
    // the manifest read survives the fold as-is
    assert(ids(DeltaManifest.readManifest(spark, compacted)) ==
      ids(DeltaManifest.readManifest(spark, plain)),
      "compaction must not change the manifest read")
    val dPlain = rows(tick(b2, plain, 2L))
    val dCompacted = rows(tick(b2, compacted, 2L))
    assert(dCompacted == dPlain,
      "tick 2 must produce the identical delta from the compacted log")
    assert(ids(DeltaManifest.readManifest(spark, compacted)) ==
      ids(DeltaManifest.readManifest(spark, plain)),
      "manifests must agree after ticking over the compacted log")
  }

  test("compactIfNeeded triggers on batch count and is a no-op below it") {
    val base = java.nio.file.Files.createTempDirectory("ingest-cin").toString
    val state = initState(base)
    tick(mkDocs(Seq((101L, body(101), "en", "src1"))), state, 1L)
    // 2 batch partitions (seed 0 + tick 1) — above a threshold of 1,
    // below a threshold of 10
    assert(!IngestPipeline.compactIfNeeded(spark, state, maxBatches = 10),
      "must not compact below the threshold")
    assert(IngestPipeline.compactIfNeeded(spark, state, maxBatches = 1),
      "must compact above the threshold")
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val sigBatches = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$state/signatures"))
      .map(_.getPath.getName).filter(_.startsWith("batch=")).toSeq
    assert(sigBatches == Seq("batch=1"), s"got $sigBatches")
    // idempotent afterwards: one folded partition sits at the threshold
    assert(!IngestPipeline.compactIfNeeded(spark, state, maxBatches = 1))
  }

  test("a tick with NO near-dup pairs and a tick gated to EMPTY both complete") {
    // two production-shaped edges: (1) the first tick's batch contains no
    // near-duplicates at all — the pair feed must still initialize the
    // cluster store (the ClusterStream empty-batch regression); (2) a
    // batch whose every arrival fails the quality gate stages an EMPTY
    // frame — every downstream state append must no-op, not crash
    val base = java.nio.file.Files.createTempDirectory("ingest-edge").toString
    val state = initState(base)
    // no pairs: one original doc, nothing near-dups it
    val d1 = tick(mkDocs(Seq((101L, body(101), "en", "src1"))), state, 1L)
    assert(ids(d1) == Set(101L))
    // every survivor dropped: the lone arrival is an exact dup of prior
    // doc 2, so the hash-log anti-join empties the batch and every
    // downstream stage (labels join, sample, packing, delta append) runs
    // over zero rows
    val d2 = tick(mkDocs(Seq((102L, body(2), "en", "src1"))), state, 2L)
    assert(ids(d2).isEmpty, s"an all-deduped tick must yield an empty delta")
    // state stays consistent: a later normal tick still works
    val d3 = tick(mkDocs(Seq((103L, body(103), "zh", "src1"))), state, 3L)
    assert(ids(d3) == Set(103L))
  }

  test("a replayed tick overwrites itself: same delta, same state") {
    val base = java.nio.file.Files.createTempDirectory("ingest-rep").toString
    val state = initState(base)
    val batch = mkDocs(Seq(
      (101L, body(101), "en", "src1"),
      (102L, body(7) + " tiny edit", "en", "src1")))
    val first = rows(tick(batch, state, 1L))
    val again = rows(tick(batch, state, 1L))   // at-least-once delivery
    assert(again == first, "a replay must reproduce its delta exactly")
    assert(rows(DeltaManifest.readManifest(spark, state)
        .filter(col("doc_id") > 100L)) == first,
      "the manifest log must hold ONE copy of the batch after a replay")
  }
}
