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

  test("non-image assets pass through un-gated instead of killing the batch") {
    import graft.operators.MediaCodec.WavAudio
    val base = java.nio.file.Files.createTempDirectory("media-mixed").toString
    val wavBytes = MediaCodec.encodeWav(
      WavAudio(8000, 1, Array.tabulate(120)(_.toShort)))
    val mixed = Seq(
      png(1L, gradA),
      graft.operators.MediaAsset(2L, "audio", wavBytes, wavBytes.length),
      png(3L, gradA)).toDS().toDF()
    MediaDedupStream.applyBatch(mixed, 0L, s"$base/store",
      s"$base/clean", s"$base/dropped")
    // the audio row rode through; image 3 deduped against image 1
    assert(ids(s"$base/clean") == Set(1L, 2L), ids(s"$base/clean").toString)
    assert(ids(s"$base/dropped") == Set(3L))
    // the store holds only image hashes
    assert(MediaDedupStream.readStore(spark, s"$base/store").get
      .select("asset_id").collect().map(_.getLong(0)).toSet == Set(1L))
    // an all-non-image batch still lands in clean without a store write
    val base2 = java.nio.file.Files.createTempDirectory("media-audio").toString
    MediaDedupStream.applyBatch(
      Seq(graft.operators.MediaAsset(9L, "audio", wavBytes,
        wavBytes.length)).toDS().toDF(),
      0L, s"$base2/store", s"$base2/clean", s"$base2/dropped")
    assert(ids(s"$base2/clean") == Set(9L))
    assert(MediaDedupStream.readStore(spark, s"$base2/store").isEmpty)
  }

  test("NULL media_type rides through to the clean sink, not into the void") {
    // a NULL type makes both `isin` and its negation NULL — the
    // un-coalesced filter pair landed such rows in NEITHER sink
    // (advisor r11); every input row must reach exactly one sink
    val base = java.nio.file.Files.createTempDirectory("media-null").toString
    val mixed = Seq(
      png(1L, gradA),
      graft.operators.MediaAsset(2L, null, Array[Byte](1, 2, 3), 3)
    ).toDS().toDF()
    MediaDedupStream.applyBatch(mixed, 0L, s"$base/store",
      s"$base/clean", s"$base/dropped")
    assert(ids(s"$base/clean") == Set(1L, 2L), ids(s"$base/clean").toString)
    assert(ids(s"$base/dropped") == Set.empty[Long])
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
