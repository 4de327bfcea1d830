package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DeltaManifest, IngestPipeline, PipelineOps}

/** Resident ingest: IngestPipeline.tick + bounded compaction inside a
  * Structured Streaming foreachBatch driver. The contract under test: N
  * micro-batches through the stream ≡ N manual ticks — manifest row for
  * manifest row — INCLUDING mid-stream compactions (the bounded fold is
  * probe-invisible), and a crashed attempt's partial state is discarded
  * by the fold and rewritten whole by the replay.
  */
class IngestStreamSpec extends AnyFunSuite {
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
    (30L, "held out eval " + body(99), "en", "src9"))

  private lazy val evalDocs = prior.filter(col("source") === "src9")

  private def initState(base: String): String = {
    val pm = PipelineOps.trainingManifest(prior, evalSources,
      minQualityBps = 0L, contamThreshold = 0.9, rates = Map.empty,
      defaultRate = 1.0, capacity = 64, shards = 2,
      stageDir = Some(s"$base/prior"))
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

  private def manifestRows(state: String) =
    DeltaManifest.readManifest(spark, state)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getInt(3))).toSet

  private val waves: Seq[Seq[(Long, String, String, String)]] = Seq(
    Seq((101L, body(101), "en", "src1"),
      (102L, body(7) + " tiny edit", "en", "src1")),   // near-dups prior 7
    Seq((103L, body(103), "zh", "src1")),
    Seq((104L, body(103) + " tiny edit", "zh", "src1"), // near-dups 103
      (105L, body(105), "en", "src1")))

  test("3 micro-batches == 3 manual ticks, with mid-stream compactions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("ingest-stream").toString
    val streamed = initState(s"$base/a")
    val manual = initState(s"$base/b")

    // maxBatches=1 forces the bounded fold at the top of batches 2 and 3
    // — compaction runs MID-STREAM, twice, under live state
    val input = MemoryStream[(Long, String, String, String)]
    val q = graft.streaming.IngestStream.start(
      input.toDF().toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")).cast("long")),
      evalDocs, evalSources, streamed,
      checkpointDir = s"$base/ckpt", minQualityBps = 0L,
      contamThreshold = 0.9, rates = Map.empty, defaultRate = 1.0,
      capacity = 64, shards = 2, nearDupThreshold = 0.5,
      maxBatches = 1)
    try waves.foreach { w => input.addData(w); q.processAllAvailable() }
    finally q.stop()

    waves.zipWithIndex.foreach { case (w, i) =>
      tick(mkDocs(w), manual, i + 1L).count()
    }
    assert(manifestRows(streamed) == manifestRows(manual),
      "streamed manifest must equal the manual-tick manifest row for row")
    // the fold actually happened: the signature log holds fewer batch
    // dirs than ticks ran (seed + 3 ticks = 4 without compaction)
    val fs = new org.apache.hadoop.fs.Path(streamed)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val sigDirs = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$streamed/signatures"))
      .count(_.getPath.getName.startsWith("batch="))
    assert(sigDirs <= 2, s"expected a folded log, found $sigDirs batch dirs")
  }

  test("a crashed attempt's partials are discarded by the fold, rewritten by the replay") {
    val base = java.nio.file.Files.createTempDirectory("ingest-crash").toString
    val replayed = initState(s"$base/a")
    val manual = initState(s"$base/b")
    Seq(replayed, manual).foreach { st =>
      tick(mkDocs(waves(0)), st, 1L).count()
      tick(mkDocs(waves(1)), st, 2L).count()
    }
    // simulate batch 3's CRASHED attempt on the replayed state: the tick
    // ran (all partitions written) but the checkpoint never committed
    tick(mkDocs(waves(2)), replayed, 3L).count()
    // the driver's replay of stream batch 2 (pipeline id 3): bounded
    // compaction first — it must fold ONLY ids < 3, discarding the
    // crashed partials — then the tick rewrites id 3 in full
    graft.streaming.IngestStream.applyBatch(mkDocs(waves(2)), 2L,
      evalDocs, evalSources, replayed, minQualityBps = 0L,
      contamThreshold = 0.9, rates = Map.empty, defaultRate = 1.0,
      capacity = 64, shards = 2, nearDupThreshold = 0.5,
      maxBatches = 1)
    tick(mkDocs(waves(2)), manual, 3L).count()
    assert(manifestRows(replayed) == manifestRows(manual),
      "replay over a crashed attempt + fold must equal the clean run")
  }
}
