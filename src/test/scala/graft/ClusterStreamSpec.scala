package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.ClusterStream

/** Incremental connected-components maintenance: chains planted ACROSS
  * micro-batches must converge to the same labeling the batch kernel
  * would produce over the full pair history.
  */
class ClusterStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def labels(dir: String): Map[Long, Long] =
    spark.read.parquet(dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap

  test("chains planted across micro-batches merge into cumulative clusters") {
    val base = java.nio.file.Files.createTempDirectory("cluster-stream").toString
    val labelsDir = s"$base/labels"
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val pairs = input.toDF().toDF("doc_a", "doc_b")
    val q = ClusterStream.startClusterMaintenance(pairs, labelsDir, s"$base/ckpt")
    try {
      // batch 1: two separate clusters
      input.addData((1L, 2L), (5L, 6L)); q.processAllAvailable()
      assert(labels(labelsDir) == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L))
      // batch 2: extends the first chain — (1,3) never arrives as a pair
      input.addData((2L, 3L)); q.processAllAvailable()
      assert(labels(labelsDir) ==
        Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
      // batch 3: bridges the two clusters; every label collapses to the
      // global min — the answer batch x25 would give over all five pairs
      input.addData((3L, 5L)); q.processAllAvailable()
      assert(labels(labelsDir) ==
        Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 6L -> 1L))
    } finally q.stop()
  }

  test("readLabels resolves a mid-swap store (missing dir, complete .next)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("cluster-read").toString
    val labelsDir = s"$base/labels"
    ClusterStream.applyBatch(Seq((1L, 2L)).toDF("doc_a", "doc_b"), labelsDir)
    // simulate a crash between applyBatch's delete and rename: the store
    // vanishes, a COMPLETE .next holds the labeling
    val fs = new org.apache.hadoop.fs.Path(labelsDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.rename(new org.apache.hadoop.fs.Path(labelsDir),
      new org.apache.hadoop.fs.Path(labelsDir + ".next"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(labelsDir)))
    val got = ClusterStream.readLabels(spark, labelsDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L))
    // the roll-forward is durable: the store is back in place for writers
    assert(fs.exists(new org.apache.hadoop.fs.Path(labelsDir)))
    // nothing to resolve -> loud failure, not an empty frame
    intercept[IllegalArgumentException] {
      ClusterStream.readLabels(spark, s"$base/nowhere", maxAttempts = 1)
    }
  }

  test("an empty micro-batch leaves the store untouched") {
    val base = java.nio.file.Files.createTempDirectory("cluster-stream2").toString
    val labelsDir = s"$base/labels"
    ClusterStream.applyBatch(Seq((7L, 8L)).toDF("doc_a", "doc_b"), labelsDir)
    val before = labels(labelsDir)
    ClusterStream.applyBatch(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"), labelsDir)
    assert(labels(labelsDir) == before)
    // idempotent replay: re-applying the same pairs changes nothing
    ClusterStream.applyBatch(Seq((7L, 8L)).toDF("doc_a", "doc_b"), labelsDir)
    assert(labels(labelsDir) == before)
  }

  test("a pair-less FIRST batch initializes an empty store (no-near-dup ingest)") {
    // regression: a corpus whose first tick finds no near-dup pairs used
    // to leave the store absent, and DeltaManifest.applyBatch's
    // readLabels crashed the whole ingest — the labeling of an empty
    // pair graph is the EMPTY labeling, and it must exist on disk
    val base = java.nio.file.Files.createTempDirectory("cluster-stream3").toString
    val labelsDir = s"$base/labels"
    ClusterStream.applyBatch(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"), labelsDir)
    assert(ClusterStream.readLabels(spark, labelsDir).count() == 0)
    // later pairs build on the empty store normally
    ClusterStream.applyBatch(Seq((7L, 8L)).toDF("doc_a", "doc_b"), labelsDir)
    assert(labels(labelsDir) == Map(7L -> 7L, 8L -> 7L))
  }
}
