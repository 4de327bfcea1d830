package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DeltaManifest, PipelineOps}

/** Incremental manifest refresh: prior ∪ delta must equal the full
  * rebuild ROW FOR ROW on planted arrivals (exact-dedup vs the hash log,
  * decontamination vs the static eval split, packing continued from the
  * totals log), replays must be no-ops, and the cluster-store rule must
  * drop near-dup arrivals the way the full build's survivors would.
  */
class DeltaManifestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val evalSources = Seq("src9")
  private def body(seed: Int) = // seed token keeps distinct seeds distinct
    (1 to 30).map(i => s"tok${(i * seed) % 17}s${seed}w$i").mkString(" ")

  private def mkDocs(rows: Seq[(Long, String, String, String)]): DataFrame =
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))

  // prior corpus: two languages, one eval doc, one pair of exact dupes
  private lazy val prior = mkDocs(
    (1L to 20L).map(i => (i, body(i.toInt), if (i % 3 == 0) "zh" else "en",
      "src1")) :+
    (21L, body(2), "en", "src1") :+            // exact dupe of doc 2
    (30L, "held out eval " + body(99), "en", "src9"))

  private def build(docs: DataFrame, stageDir: String): DataFrame =
    PipelineOps.trainingManifest(docs, evalSources, minQualityBps = 0L,
      contamThreshold = 0.9, rates = Map.empty, defaultRate = 1.0,
      capacity = 64, shards = 2, stageDir = Some(stageDir))

  private def rows(df: DataFrame) = df
    .select("shard", "chunk_id", "doc_id", "tok_in_chunk")

  test("prior ∪ delta == full rebuild across two arrival batches") {
    val base = java.nio.file.Files.createTempDirectory("delta-m").toString
    val priorManifest = build(prior, s"$base/prior")
    val state = s"$base/state"
    DeltaManifest.initFromFull(
      spark.read.parquet(s"$base/prior/gated_deduped"), priorManifest, state)

    // batch 1 plants every drop reason: an exact dupe of prior doc 2, an
    // in-batch dupe pair, an eval-leaking copy, and clean docs
    val batch1 = mkDocs(Seq(
      (101L, body(101), "en", "src1"),
      (102L, body(2), "en", "src1"),              // dupe of prior doc 2
      (103L, body(103), "zh", "src1"),
      (104L, body(103), "zh", "src1"),            // in-batch dupe of 103
      (105L, "held out eval " + body(99), "en", "src1"), // eval leak
      (106L, body(106), "en", "src1")))
    val d1 = DeltaManifest.applyBatch(batch1,
      prior.filter(col("source") === "src9"), evalSources, state, 1L,
      minQualityBps = 0L, contamThreshold = 0.9, rates = Map.empty,
      defaultRate = 1.0, capacity = 64, shards = 2)
    val d1Ids = d1.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(d1Ids == Set(101L, 103L, 106L), s"planted drops failed: $d1Ids")

    val full1 = build(prior.unionByName(batch1), s"$base/full1")
    val got1 = rows(priorManifest).unionByName(rows(d1))
    assert(got1.exceptAll(rows(full1)).isEmpty &&
      rows(full1).exceptAll(got1).isEmpty,
      "prior ∪ delta must equal the full rebuild exactly")

    // batch 2 continues the layout (fills batch 1's partial chunks)
    val batch2 = mkDocs(Seq(
      (201L, body(201), "en", "src1"),
      (202L, body(101), "en", "src1"),            // dupe of batch-1 doc
      (203L, body(203), "zh", "src1")))
    val d2 = DeltaManifest.applyBatch(batch2,
      prior.filter(col("source") === "src9"), evalSources, state, 2L,
      minQualityBps = 0L, contamThreshold = 0.9, rates = Map.empty,
      defaultRate = 1.0, capacity = 64, shards = 2)
    val full2 = build(prior.unionByName(batch1).unionByName(batch2),
      s"$base/full2")
    val got2 = got1.unionByName(rows(d2))
    assert(got2.exceptAll(rows(full2)).isEmpty &&
      rows(full2).exceptAll(got2).isEmpty,
      "a second delta must keep the equality")
    // and the state log's merged view IS that manifest
    val viaState = rows(DeltaManifest.readManifest(spark, state))
    assert(viaState.exceptAll(rows(full2)).isEmpty &&
      rows(full2).exceptAll(viaState).isEmpty)
  }

  test("the hash log is prefix-partitioned and the pruned probe is exact") {
    val base = java.nio.file.Files.createTempDirectory("delta-pfx").toString
    val priorManifest = build(prior, s"$base/prior")
    val state = s"$base/state"
    DeltaManifest.initFromFull(
      spark.read.parquet(s"$base/prior/gated_deduped"), priorManifest, state)
    // layout: every batch dir holds pfx= subdirs (the partition-pruning
    // handle the per-batch read bound rests on — SCALE.md §delta)
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val pfxDirs = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$state/hashes/batch=0"))
      .map(_.getPath.getName).filter(_.startsWith("pfx="))
    assert(pfxDirs.nonEmpty, "batch 0 hashes must be pfx-partitioned")
    // adaptive LSM width: the bucket width must be what this batch's
    // row count earns (a small batch writes 16 coarse buckets instead
    // of paying 256 dirs of commit overhead; a corpus-scale batch keeps
    // the full fan-out) — and uniform within the batch dir
    val batchRows = spark.read.parquet(s"$state/hashes/batch=0").count()
    val expectW = DeltaManifest.pfxWidth(batchRows)
    assert(pfxDirs.forall(_.length == "pfx=".length + expectW),
      s"bucket width must be pfxWidth($batchRows)=$expectW: " +
        pfxDirs.take(3).mkString(","))
    // prune parity: an anti-join against the log restricted to the
    // probe's own prefixes equals the unrestricted one — rows outside
    // the probe's prefixes can never match it
    val probe = mkDocs(Seq(
        (101L, body(101), "en", "src1"),
        (102L, body(2), "en", "src1")))          // dupe of prior doc 2
      .withColumn("text_hash", md5(col("text")))
    val probePfxs = probe
      .select(substring(col("text_hash"), 1, DeltaManifest.pfxLen).as("p"))
      .distinct().collect().map(_.getString(0)).toSeq
    def anti(seen: DataFrame) =
      probe.join(seen, Seq("text_hash"), "left_anti")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val full = anti(DeltaManifest.seenHashes(spark, state))
    val pruned = anti(DeltaManifest.seenHashes(spark, state,
      prefixes = Some(probePfxs)))
    assert(full == Set(101L) && pruned == full,
      s"pruned probe must equal the full read: full=$full pruned=$pruned")
  }

  test("the per-batch gated stage is reclaimed once the batch commits") {
    // the UUID-scratch default leaked one stage per batch until JVM exit
    // in a resident ingest process (advisor r9)
    val base = java.nio.file.Files.createTempDirectory("delta-stage").toString
    val priorManifest = build(prior, s"$base/prior")
    val state = s"$base/state"
    DeltaManifest.initFromFull(
      spark.read.parquet(s"$base/prior/gated_deduped"), priorManifest, state)
    DeltaManifest.applyBatch(
      mkDocs(Seq((101L, body(101), "en", "src1"))),
      prior.filter(col("source") === "src9"), evalSources, state, 1L,
      minQualityBps = 0L, contamThreshold = 0.9, rates = Map.empty,
      defaultRate = 1.0, capacity = 64, shards = 2).count()
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$state/_stage/batch=1")),
      "the committed batch's stage must be deleted, not held to JVM exit")
  }

  test("replaying a batch id overwrites its partitions — no double state") {
    val base = java.nio.file.Files.createTempDirectory("delta-replay").toString
    val priorManifest = build(prior, s"$base/prior")
    val state = s"$base/state"
    DeltaManifest.initFromFull(
      spark.read.parquet(s"$base/prior/gated_deduped"), priorManifest, state)
    val batch = mkDocs(Seq((101L, body(101), "en", "src1"),
      (102L, body(102), "zh", "src1")))
    def run() = DeltaManifest.applyBatch(batch,
      prior.filter(col("source") === "src9"), evalSources, state, 1L,
      minQualityBps = 0L, contamThreshold = 0.9, rates = Map.empty,
      defaultRate = 1.0, capacity = 64, shards = 2)
    val first = rows(run()).collect().toSet
    val again = rows(run()).collect().toSet
    assert(first == again, "at-least-once replay must reproduce the delta")
    val manifest = rows(DeltaManifest.readManifest(spark, state)).collect()
    assert(manifest.length == manifest.distinct.length &&
      manifest.toSet == rows(priorManifest).collect().toSet ++ first,
      "replay must not duplicate manifest or totals state")
  }

  test("the shingle sketch log caps HISTORICAL boilerplate in decontamination") {
    // an arrivals batch cannot see that a shingle is corpus-hot from its
    // own rows; the ingest-maintained counter log can. An arrival whose
    // ONLY overlap with the eval split is historically-hot boilerplate
    // must pass when the sketch dial is on (ratios only drop), and flag
    // when it is off.
    val boilerToks = (1 to 10).map(i => s"nav$i")
    val boiler = boilerToks.mkString(" ")
    val evalDoc = mkDocs(Seq(
      (30L, boiler + " " + (1 to 15).map(i => s"ev$i").mkString(" "),
        "en", "src9")))
    val arrival = mkDocs(Seq(
      (101L, boiler + " " + (1 to 15).map(i => s"own$i").mkString(" "),
        "en", "src1")))
    def freshState(tag: String): String = {
      val base = java.nio.file.Files.createTempDirectory(tag).toString
      val pm = build(prior, s"$base/prior")
      DeltaManifest.initFromFull(
        spark.read.parquet(s"$base/prior/gated_deduped"), pm, s"$base/state")
      s"$base/state"
    }
    // the ingest stream counted the boilerplate's shingles 10 times — at
    // a NON-default geometry, so the delta's probe must read the log's
    // persisted shape back instead of assuming 4x1024 (advisor r9: the
    // default-geometry probe against this log would join arbitrary
    // counters and break the dial silently)
    val sketchDir =
      java.nio.file.Files.createTempDirectory("delta-sketch").toString + "/log"
    val boilerShingles = boilerToks.sliding(3).map(_.mkString(" ")).toSeq
    graft.streaming.SketchStream.applyBatch(
      (1 to 10).flatMap(_ => boilerShingles).toDF("shingle"),
      "shingle", sketchDir, 0L, depth = 3, width = 512)
    def run(state: String, sketch: Option[String]) =
      DeltaManifest.applyBatch(arrival, evalDoc, evalSources, state, 1L,
          minQualityBps = 0L, contamThreshold = 0.3, rates = Map.empty,
          defaultRate = 1.0, capacity = 64, shards = 2,
          shingleSketchDir = sketch, hotShingleDf = 5L)
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(run(freshState("delta-nodial"), None) == Set(),
      "boilerplate overlap must flag without the dial")
    assert(run(freshState("delta-dial"), Some(sketchDir)) == Set(101L),
      "historically-hot shingles must leave the index with the dial on")
  }

  // The end-to-end ingest composition (near-dup pairs feed the cluster
  // store the delta consumes) is now a PUBLIC operator —
  // IngestPipeline.tick — and its end-to-end coverage (incl. the
  // near-dup-of-a-prior-doc drop this file used to prove through a
  // hand-wired MemoryStream recipe) lives in IngestPipelineSpec.

  test("the cluster store drops near-dup arrivals like the full build's survivors") {
    val base = java.nio.file.Files.createTempDirectory("delta-labels").toString
    val priorManifest = build(prior, s"$base/prior")
    val state = s"$base/state"
    DeltaManifest.initFromFull(
      spark.read.parquet(s"$base/prior/gated_deduped"), priorManifest, state)
    // the ingest stream found: 102 near-dups prior doc 5; 103 and 104
    // form a new cluster (103 is its min). ClusterStream maintains the
    // store through the same pairs the full build's CC would see.
    val labelsDir = s"$base/labels"
    graft.streaming.ClusterStream.applyBatch(
      Seq((5L, 102L), (103L, 104L)).toDF("doc_a", "doc_b"), labelsDir)
    val batch = mkDocs(Seq(
      (101L, body(101), "en", "src1"),
      (102L, body(5) + " slightly edited", "en", "src1"),
      (103L, body(103), "zh", "src1"),
      (104L, body(103) + " tweaked", "zh", "src1")))
    val d = DeltaManifest.applyBatch(batch,
      prior.filter(col("source") === "src9"), evalSources, state, 1L,
      minQualityBps = 0L, contamThreshold = 0.9, rates = Map.empty,
      defaultRate = 1.0, capacity = 64, shards = 2,
      labelsDir = Some(labelsDir))
    val ids = d.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids == Set(101L, 103L),
      s"102 (prior cluster) and 104 (non-min) must drop: $ids")
  }
}
