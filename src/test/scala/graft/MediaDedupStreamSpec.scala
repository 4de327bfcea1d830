package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaCodec, MultimodalOps}
import graft.operators.MediaCodec.BmpImage
import graft.streaming.MediaDedupStream

/** Ingest-time perceptual dedup: an arriving image whose dHash was
  * already admitted — in an earlier batch or by a lower-id arrival in
  * the same batch — is diverted, INCLUDING re-encodes and brightness
  * shifts of the original (the thing a byte-hash gate cannot catch).
  * Replay must re-derive identical decisions from the below-id store
  * read.
  */
class MediaDedupStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def png(id: Long, px: (Int, Int) => Int): graft.operators.MediaAsset = {
    val (w, h) = (24, 16)
    val pixels = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      pixels((y * w + x) * 3 + c) = px(x, y).toByte
    val bytes = MediaCodec.encodeImageIO(BmpImage(w, h, pixels), "png")
    graft.operators.MediaAsset(id, "png", bytes, bytes.length)
  }

  private val gradA = (x: Int, y: Int) => x * 4
  private val gradB = (x: Int, y: Int) => y * 5
  private val gradC = (x: Int, y: Int) => (x + y) * 3

  private def ids(dir: String): Set[Long] =
    spark.read.parquet(dir).select("asset_id").collect()
      .map(_.getLong(0)).toSet

  test("cross-batch + in-batch perceptual dups divert; replay is a no-op") {
    val base = java.nio.file.Files.createTempDirectory("media-dedup").toString
    val (store, clean, dropped) =
      (s"$base/store", s"$base/clean", s"$base/dropped")
    MediaDedupStream.applyBatch(
      Seq(png(1L, gradA), png(2L, gradB)).toDS().toDF(),
      0L, store, clean, dropped)
    assert(ids(clean) == Set(1L, 2L))
    // wave 2: 10 = brightness-shifted re-render of 1 (perceptual dup,
    // different bytes); 11 = new pattern; 12 = exact copy of 11
    // arriving in the same batch (in-batch dup, min id 11 wins)
    val wave2 = Seq(
      png(10L, (x, y) => gradA(x, y) + 50),
      png(11L, gradC), png(12L, gradC)).toDS().toDF()
    MediaDedupStream.applyBatch(wave2, 1L, store, clean, dropped)
    assert(ids(clean) == Set(1L, 2L, 11L), ids(clean).toString)
    assert(ids(dropped) == Set(10L, 12L), ids(dropped).toString)
    // at-least-once redelivery of batch 1: the below-id store read plus
    // overwrite-keyed sinks must re-derive the identical split
    MediaDedupStream.applyBatch(wave2, 1L, store, clean, dropped)
    assert(ids(clean) == Set(1L, 2L, 11L))
    assert(ids(dropped) == Set(10L, 12L))
    // the store holds exactly the admitted hashes, pfx-partitioned
    val st = MediaDedupStream.readStore(spark, store).get
    assert(st.select("asset_id").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 11L))
    assert(st.columns.contains("pfx") && st.columns.contains("batch_id"))
  }

  test("empty store and empty batch are clean no-ops") {
    val base = java.nio.file.Files.createTempDirectory("media-empty").toString
    assert(MediaDedupStream.readStore(spark, s"$base/none").isEmpty)
    MediaDedupStream.applyBatch(
      Seq.empty[graft.operators.MediaAsset].toDS().toDF(),
      0L, s"$base/store", s"$base/clean", s"$base/dropped")
    assert(MediaDedupStream.readStore(spark, s"$base/store").isEmpty)
  }
}
