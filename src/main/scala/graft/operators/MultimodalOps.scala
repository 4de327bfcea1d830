package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed view of a multimodal asset: an opaque binary payload plus typed
  * metadata — the 100 TB pattern for image/audio/video columns (north star):
  * media stays an opaque `binary` column; only bounded metadata and derived
  * features are ever shuffled.
  */
case class MediaAsset(asset_id: Long, media_type: String,
  payload: Array[Byte], n_bytes: Int)

/** Deterministic per-asset features produced by the (stubbed) decoder. */
case class MediaFeatures(asset_id: Long, media_type: String, n_bytes: Int,
  checksum: Long, width: Int, height: Int, n_frames: Int)

/** One sampled frame of a video-typed asset. */
case class MediaFrame(asset_id: Long, frame_idx: Int, frame_checksum: Long)

/** Multimodal column operators. The real decode (image/audio libraries) is
  * NOT available in this environment, so `decodeStub` below is a
  * clearly-marked deterministic fake — but everything Spark-side is real and
  * load-bearing: the binary column schema, the typed Dataset boundary, the
  * partition-iterator batch shape (the Scala analogue of mapInPandas: one
  * iterator per partition, streaming, never materializing the partition),
  * and the explode shape for frame sampling.
  *
  * Swapping in a real decoder means replacing ONLY `decodeStub`'s body.
  */
object MultimodalOps {

  /** Build an asset table with a deterministic stand-in payload derived from
    * a text column (utf-8 bytes). Cycling media types exercise all branches.
    */
  def toAssets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"),
      octet_length(col(textCol)).as("n_bytes"))

  // ======================== STUB ========================
  // Real implementation would call an image/audio codec here (pixel dims,
  // PCM frames, ...). Deterministic fake: dimensions and checksum are pure
  // functions of the payload bytes.
  private[operators] def decodeStub(a: MediaAsset): MediaFeatures = {
    var sum = 1469598103934665603L // FNV-1a over the payload
    var i = 0
    while (i < a.payload.length) {
      sum ^= a.payload(i); sum *= 1099511628211L; i += 1
    }
    val w = 16 + math.floorMod(sum, 64).toInt
    val h = 16 + math.floorMod(sum >> 8, 64).toInt
    val frames = a.media_type match {
      case "video" => 1 + math.floorMod(sum >> 16, 30).toInt
      case "audio" => 1 + math.floorMod(sum >> 16, 10).toInt
      case _       => 1
    }
    MediaFeatures(a.asset_id, a.media_type, a.n_bytes, sum, w, h, frames)
  }
  // ======================= /STUB ========================

  /** Feature extraction over the asset table: one streaming iterator per
    * partition (constant memory; the decoder is called row-by-row exactly as
    * a batch UDF would be).
    */
  def extractFeatures(assets: DataFrame): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.as[MediaAsset].mapPartitions(_.map(decodeStub))
  }

  /** "Resize": recompute features at a target resolution — metadata-only in
    * the stub (a real impl would re-encode the payload). Keeps the
    * transform-on-Dataset shape.
    */
  def resize(features: Dataset[MediaFeatures], maxDim: Int): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.map { f =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(f.width, f.height))
      f.copy(width = math.max(1, (f.width * scale).toInt),
        height = math.max(1, (f.height * scale).toInt))
    }
  }

  /** Frame sampling for video assets: explode every k-th frame (flatMap
    * shape — output cardinality is data-dependent, exactly like a
    * one-to-many batch UDF).
    */
  def sampleFrames(assets: DataFrame, everyK: Int = 5): Dataset[MediaFrame] = {
    import assets.sparkSession.implicits._
    assets.as[MediaAsset].mapPartitions(_.flatMap { a =>
      val f = decodeStub(a)
      if (a.media_type == "video")
        (0 until f.n_frames by everyK).iterator
          .map(i => MediaFrame(a.asset_id, i, f.checksum + i))
      else Iterator.empty
    })
  }
}
