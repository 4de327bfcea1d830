package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{MediaCodec, MultimodalOps}
import graft.operators.MediaCodec.{BmpImage, WavAudio}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  lazy val assets = MultimodalOps.toAssets(
    Tables.documents(spark, SparkTestSession.sf0001), "doc_id", "text").cache()

  // ---------------------------------------------------------- codec layer

  test("BMP encode produces the exact standard byte layout (golden)") {
    // 2x2 BGR image; hand-computed reference: 54-byte header + 2 rows of
    // 6 pixel bytes + 2 padding bytes each, rows bottom-up
    val img = BmpImage(2, 2, Array[Byte](
      1, 2, 3, 4, 5, 6,    // top row
      7, 8, 9, 10, 11, 12)) // bottom row
    val bytes = MediaCodec.encodeBmp(img)
    assert(bytes.length == 70)
    assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
    assert(bytes(2) == 70 && bytes(10) == 54 && bytes(14) == 40) // sizes/offset
    assert(bytes(18) == 2 && bytes(22) == 2)                     // dims
    assert(bytes(28) == 24 && bytes(30) == 0)                    // bpp, BI_RGB
    // bottom row first, then 2 pad bytes, then top row
    assert(bytes.slice(54, 60).toSeq == Seq[Byte](7, 8, 9, 10, 11, 12))
    assert(bytes.slice(60, 62).toSeq == Seq[Byte](0, 0))
    assert(bytes.slice(62, 68).toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))
  }

  test("BMP decode round-trips pixels byte-exactly (incl. padded widths)") {
    for (w <- Seq(1, 2, 3, 5, 16, 33); h <- Seq(1, 2, 7)) {
      val px = Array.tabulate(w * h * 3)(i => ((i * 37 + w + h) % 251).toByte)
      val back = MediaCodec.decodeBmp(MediaCodec.encodeBmp(BmpImage(w, h, px)))
      assert(back.width == w && back.height == h)
      assert(back.pixels.toSeq == px.toSeq, s"pixel mismatch at ${w}x$h")
    }
  }

  test("WAV encode produces the exact RIFF/PCM byte layout (golden)") {
    val bytes = MediaCodec.encodeWav(WavAudio(8000, 1, Array[Short](258, -2)))
    assert(bytes.length == 48)
    assert(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    assert(new String(bytes.slice(12, 16), "US-ASCII") == "fmt ")
    assert(bytes(20) == 1 && bytes(22) == 1)            // PCM, mono
    assert(bytes(24) == 0x40 && bytes(25) == 0x1F)      // 8000 Hz LE
    assert(bytes(34) == 16)                             // bits per sample
    assert(new String(bytes.slice(36, 40), "US-ASCII") == "data")
    assert(bytes(44) == 2 && bytes(45) == 1)            // 258 = 0x0102 LE
    assert(bytes(46) == -2 && bytes(47) == -1)          // -2 = 0xFFFE LE
  }

  test("WAV decode round-trips samples and skips unknown chunks") {
    val a = WavAudio(44100, 2, Array.tabulate[Short](250)(i => (i * 131 - 16000).toShort))
    val back = MediaCodec.decodeWav(MediaCodec.encodeWav(a))
    assert(back.sampleRate == 44100 && back.numChannels == 2)
    assert(back.numFrames == 125)
    assert(back.samples.toSeq == a.samples.toSeq)
    // splice a LIST chunk between fmt and data — real-world WAVs have these
    val enc = MediaCodec.encodeWav(a)
    val junk = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = enc.slice(0, 36) ++ junk ++ enc.slice(36, enc.length)
    assert(MediaCodec.decodeWav(spliced).samples.toSeq == a.samples.toSeq)
  }

  test("video container round-trips every BMP frame") {
    val frames = (0 until 4).map(f =>
      BmpImage(5, 3, Array.tabulate(45)(i => (i + f * 17).toByte)))
    val back = MediaCodec.decodeVideo(MediaCodec.encodeVideo(frames))
    assert(back.length == 4)
    for (f <- 0 until 4) assert(back(f).pixels.toSeq == frames(f).pixels.toSeq)
  }

  // ---------------------------------------------------------- Spark layer

  test("asset table carries real encoded payloads with typed metadata") {
    assert(assets.schema("payload").dataType.typeName == "binary")
    val rows = assets.orderBy("asset_id").collect()
    for (r <- rows) {
      val payload = r.getAs[Array[Byte]]("payload")
      assert(payload.length == r.getAs[Int]("n_bytes"))
      r.getAs[String]("media_type") match {
        case "image" => assert(payload(0) == 'B'.toByte && payload(1) == 'M'.toByte)
        case "audio" => assert(new String(payload.slice(0, 4), "US-ASCII") == "RIFF")
        case "video" => assert(new String(payload.slice(0, 4), "US-ASCII") == "GVID")
      }
    }
  }

  test("feature extraction truly decodes: dims match the synthesized media") {
    val feats = MultimodalOps.extractFeatures(assets).collect().sortBy(_.asset_id)
    assert(feats.length == assets.count())
    val byId = Tables.documents(spark, SparkTestSession.sf0001)
      .select(col("doc_id"), octet_length(col("text")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (f <- feats) {
      val len = byId(f.asset_id)
      val (w, h) = (16 + (f.asset_id % 48).toInt, 16 + len % 48)
      f.media_type match {
        case "image" =>
          assert((f.width, f.height, f.n_frames) == (w, h, 1))
        case "audio" =>
          assert((f.width, f.height) == (1 + (f.asset_id % 2).toInt, 16))
          assert(f.n_frames == 100 + len % 400)
        case "video" =>
          assert((f.width, f.height) == (w, h))
          assert(f.n_frames == 1 + (f.asset_id % 8).toInt)
      }
    }
    // decode is partitioning-independent
    val feats7 = MultimodalOps.extractFeatures(assets.repartition(7))
      .collect().sortBy(_.asset_id)
    assert(feats.toSeq == feats7.toSeq)
  }

  test("decode checksum covers the decoded content, not the raw payload") {
    // byte-identical pixels through encode→decode ⇒ checksum must equal the
    // FNV of the original pixel buffer even though the BMP bytes add headers
    val px = Array.tabulate(16 * 16 * 3)(i => (i % 113).toByte)
    val asset = graft.operators.MediaAsset(0L, "image",
      MediaCodec.encodeBmp(BmpImage(16, 16, px)), MediaCodec.bmpFileSize(16, 16))
    val decoded = MultimodalOps.extractFeatures(
      spark.createDataFrame(Seq(asset))).head()
    assert(decoded.checksum == MultimodalOps.fnv(px))
  }

  test("resize re-encodes real payloads clamped to the max dimension") {
    val resized = MultimodalOps.resizeAssets(assets, 32)
    val feats = MultimodalOps.extractFeatures(resized).collect()
    assert(feats.length == assets.count())
    assert(feats.filter(_.media_type != "audio")
      .forall(f => f.width <= 32 && f.height <= 32))
    // payloads are still valid BMPs of the NEW size (decode proves it)
    val one = resized.filter(col("media_type") === "image").orderBy("asset_id").head()
    val img = MediaCodec.decodeBmp(one.getAs[Array[Byte]]("payload"))
    assert(img.width <= 32 && img.height <= 32)
    // audio untouched
    assert(feats.filter(_.media_type == "audio").forall(_.height == 16))
  }

  test("frame sampling explodes only video assets at stride k") {
    val frames = MultimodalOps.sampleFrames(assets, everyK = 5).collect()
    val videoIds = assets.filter(col("media_type") === "video")
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(frames.nonEmpty)
    assert(frames.map(_.asset_id).toSet.subsetOf(videoIds))
    assert(frames.forall(_.frame_idx % 5 == 0))
    // frame 0 of a video has the same pixels as the image synthesized with
    // offset 0 — its checksum must match an independent decode
    val v = assets.filter(col("media_type") === "video").orderBy("asset_id").head()
    val f0 = MediaCodec.decodeVideo(v.getAs[Array[Byte]]("payload")).head
    val sampled = frames.filter(f =>
      f.asset_id == v.getAs[Long]("asset_id") && f.frame_idx == 0).head
    assert(sampled.frame_checksum == MultimodalOps.fnv(f0.pixels))
  }

  test("PNG round-trips arbitrary pixels byte-exactly; payload is real PNG") {
    // a non-constant pattern proves the raster path, not just flat fills
    val w = 23; val h = 17 // non-multiple-of-4 width exercises layout
    val pixels = Array.tabulate(w * h * 3)(i => ((i * 31 + 7) % 256).toByte)
    val bytes = MediaCodec.encodeImageIO(BmpImage(w, h, pixels), "png")
    // PNG signature: 0x89 'P' 'N' 'G'
    assert((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P'.toByte &&
      bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte)
    val back = MediaCodec.decodeImageIO(bytes)
    assert(back.width == w && back.height == h)
    assert(back.pixels.sameElements(pixels), "PNG must be lossless")
  }

  test("JPEG decodes to exact dims and near-planted constant channels") {
    val w = 40; val h = 30
    val (b, g, r) = (200.toByte, 100.toByte, 50.toByte)
    val pixels = Array.tabulate(w * h * 3)(i =>
      (i % 3) match { case 0 => b; case 1 => g; case _ => r })
    val bytes = MediaCodec.encodeImageIO(BmpImage(w, h, pixels), "jpg")
    // JPEG SOI marker
    assert((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8)
    val back = MediaCodec.decodeImageIO(bytes)
    assert(back.width == w && back.height == h)
    // lossy: per-channel MEANS stay within a few values of the constants
    val n = (w * h).toDouble
    val sums = new Array[Long](3)
    for (i <- back.pixels.indices) sums(i % 3) += back.pixels(i) & 0xFF
    assert(math.abs(sums(0) / n - 200.0) < 4.0, s"B mean ${sums(0) / n}")
    assert(math.abs(sums(1) / n - 100.0) < 4.0, s"G mean ${sums(1) / n}")
    assert(math.abs(sums(2) / n - 50.0) < 4.0, s"R mean ${sums(2) / n}")
  }

  test("indexed rasters (palette PNG, GIF) redraw color-exactly; gray keeps B=G=R") {
    val w = 21; val h = 13
    val pr = Array[Byte](10, 60, 110, (200 & 0xFF).toByte)
    val pg = Array[Byte](20, 70, 120, (210 & 0xFF).toByte)
    val pb = Array[Byte](30, 80, (130 & 0xFF).toByte, (220 & 0xFF).toByte)
    for (fmt <- Seq("png", "gif")) {
      val bytes = MediaCodec.encodeIndexed(w, h, pr, pg, pb,
        (x, y) => (x + y) % 4, fmt)
      if (fmt == "gif")
        assert(bytes(0) == 'G'.toByte && bytes(1) == 'I'.toByte &&
          bytes(2) == 'F'.toByte)
      val back = MediaCodec.decodeImageIO(bytes)
      assert(back.width == w && back.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val j = (x + y) % 4
        val o = (y * w + x) * 3
        assert((back.pixels(o) & 0xFF) == (pb(j) & 0xFF) &&
          (back.pixels(o + 1) & 0xFF) == (pg(j) & 0xFF) &&
          (back.pixels(o + 2) & 0xFF) == (pr(j) & 0xFF),
          s"$fmt pixel ($x,$y) must carry palette color $j exactly")
      }
    }
    // grayscale: the redraw crosses colorspaces, so VALUES shift — but
    // gray in means gray out: all three channels equal on every pixel
    val gray = MediaCodec.decodeImageIO(MediaCodec.encodeGray(w, h, 77))
    assert(gray.width == w && gray.height == h)
    for (o <- 0 until w * h * 3 by 3)
      assert(gray.pixels(o) == gray.pixels(o + 1) &&
        gray.pixels(o + 1) == gray.pixels(o + 2))
  }

  test("raster asset table decodes with per-variant closed-form sums") {
    val assets = MultimodalOps.toRasterAssets(
      Tables.documents(spark, SparkTestSession.sf0001), "doc_id", "text")
    val feats = MultimodalOps.extractImageFeatures(assets).collect()
    assert(feats.length == 500)
    assert(feats.map(_.getString(1)).toSet ==
      Set("png_grad", "png_palette", "gif", "png_gray"))
    val texts = Tables.documents(spark, SparkTestSession.sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (f <- feats) {
      val id = f.getLong(0)
      val len = texts(id).getBytes("UTF-8").length
      val (w, h) = (16 + (id % 48).toInt, 16 + len % 48)
      assert(f.getInt(2) == w && f.getInt(3) == h, s"dims of asset $id")
      def pal(c: Int => Long, count: Int => Long, scale: Long) =
        scale * (0 until 4).map(j => count(j) * (c(j) % 256)).sum
      f.getString(1) match {
        case "png_grad" =>
          assert(f.getLong(4) == h.toLong * (w * (w - 1) / 2))
          assert(f.getLong(5) == w.toLong * h * (len % 256))
          assert(f.getLong(6) == w.toLong * h * (id % 256))
        case "png_palette" =>
          assert(f.getLong(4) == pal(j => 11 * id + 19 * j, j => (w - j + 3) / 4, h))
          assert(f.getLong(5) == pal(j => len + 37 * j, j => (w - j + 3) / 4, h))
          assert(f.getLong(6) == pal(j => id + 53 * j, j => (w - j + 3) / 4, h))
        case "gif" =>
          assert(f.getLong(4) == pal(j => 11 * id + 19 * j, j => (h - j + 3) / 4, w))
          assert(f.getLong(5) == pal(j => len + 37 * j, j => (h - j + 3) / 4, w))
          assert(f.getLong(6) == pal(j => id + 53 * j, j => (h - j + 3) / 4, w))
        case "png_gray" =>
          assert(f.getLong(4) == f.getLong(5) && f.getLong(5) == f.getLong(6),
            s"gray asset $id must decode with equal channels")
      }
    }
  }

  test("imageio asset table decodes with closed-form dims and exact PNG sums") {
    val imgAssets = MultimodalOps.toImageIOAssets(
      Tables.documents(spark, SparkTestSession.sf0001), "doc_id", "text")
    val feats = MultimodalOps.extractImageFeatures(imgAssets).collect()
    assert(feats.length == 500)
    val texts = Tables.documents(spark, SparkTestSession.sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (f <- feats) {
      val id = f.getLong(0)
      val len = texts(id).getBytes("UTF-8").length
      val (w, h) = (16 + (id % 48).toInt, 16 + len % 48)
      assert(f.getInt(2) == w && f.getInt(3) == h, s"dims of asset $id")
      if (f.getString(1) == "png") {
        assert(f.getLong(4) == w.toLong * h * ((7 * id + 3 * len) % 256))
        assert(f.getLong(5) == w.toLong * h * (len % 256))
        assert(f.getLong(6) == w.toLong * h * (id % 256))
      }
    }
  }

  private def pngAsset(id: Long, w: Int, h: Int,
      px: (Int, Int) => Int): graft.operators.MediaAsset = {
    val pixels = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      pixels((y * w + x) * 3 + c) = px(x, y).toByte
    val bytes = MediaCodec.encodeImageIO(BmpImage(w, h, pixels), "png")
    graft.operators.MediaAsset(id, "png", bytes, bytes.length)
  }

  private def dhash(assets: Seq[graft.operators.MediaAsset])
      : Map[Long, (Long, Long, Long, Long)] = {
    import spark.implicits._
    MultimodalOps.imageDHash(assets.toDS().toDF()).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
  }

  test("imageDHash: gradient rows all-ones, constants all-zero, shift-invariant") {
    val all32 = 0xFFFFFFFFL
    val out = dhash(Seq(
      // brightness rises with x → every row bit 1, every column bit 0
      pngAsset(1L, 36, 20, (x, _) => x),
      // constant image → all 128 bits 0 (the gray-class identity the
      // x70 oracle leans on)
      pngAsset(2L, 36, 20, (_, _) => 77),
      // brightness rises with y → rows 0, columns all 1
      pngAsset(3L, 36, 20, (_, y) => y),
      // global brightness shift of asset 1 (no clipping): same hash —
      // the invariance that makes dHash a NEAR-dup key
      pngAsset(4L, 36, 20, (x, _) => x + 100)))
    assert(out(1L) == ((all32, all32, 0L, 0L)), out(1L).toString)
    assert(out(2L) == ((0L, 0L, 0L, 0L)), out(2L).toString)
    assert(out(3L) == ((0L, 0L, all32, all32)), out(3L).toString)
    assert(out(4L) == out(1L), s"${out(4L)} vs ${out(1L)}")
  }

  test("dhashNearDupPairs equals brute-force Hamming pairs (pigeonhole)") {
    import spark.implicits._
    // 40 assets with planted structure: variants of a base gradient with
    // 0–2 flipped sample comparisons plus unrelated patterns
    val assets = (0L until 40L).map { id =>
      pngAsset(id, 27, 19, (x, y) =>
        (x * 3 + (id % 7).toInt * y + (if (x == id % 9) 50 else 0)) % 200)
    }
    val hs = MultimodalOps.imageDHash(assets.toDS().toDF())
    hs.cache()
    val got = MultimodalOps.dhashNearDupPairs(hs, "asset_id", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over all pairs from the collected hash table
    val table = hs.collect().map(r => r.getLong(0) ->
      Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val want = (for {
      a <- table.keys; b <- table.keys if a < b
      d = table(a).zip(table(b))
        .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    hs.unpersist()
    assert(want.nonEmpty, "fixture must produce at least one close pair")
    assert(got == want, s"band join ${got.size} vs brute ${want.size}")
  }

  private def wavAsset(id: Long, samples: Array[Short])
      : graft.operators.MediaAsset = {
    val bytes = MediaCodec.encodeWav(WavAudio(8000, 1, samples))
    graft.operators.MediaAsset(id, "audio", bytes, bytes.length)
  }

  test("audioFingerprint: monotone energy all-ones, constant zero, gain-invariant") {
    import spark.implicits._
    val n = 256
    val rising = Array.tabulate(n)(i => i.toShort)
    val out = MultimodalOps.audioFingerprint(Seq(
        wavAsset(1L, rising),
        wavAsset(2L, Array.fill(n)(500.toShort)),
        // 3x gain of asset 1: adjacent-window comparison cancels it
        wavAsset(3L, rising.map(s => (s * 3).toShort)),
        // non-audio rows are ignored entirely
        pngAsset(9L, 16, 16, (x, _) => x)).toDS().toDF())
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L), out.keySet.toString)
    assert(out(1L) == ((n.toLong, 0xFFFFFFFFL, 0x7FFFFFFFL)),
      out(1L).toString)
    assert(out(2L) == ((n.toLong, 0L, 0L)), out(2L).toString)
    assert(out(3L)._2 == out(1L)._2 && out(3L)._3 == out(1L)._3,
      s"${out(3L)} vs ${out(1L)}")
  }

  test("sniffMediaType: real signatures, garbage, truncation, null") {
    import spark.implicits._
    val px = Array.fill(16 * 16 * 3)(40.toByte)
    val cases: Seq[(Long, Array[Byte], String)] = Seq(
      (1L, MediaCodec.encodeImageIO(BmpImage(16, 16, px), "png"), "png"),
      (2L, MediaCodec.encodeImageIO(BmpImage(16, 16, px), "jpg"), "jpeg"),
      (3L, MediaCodec.encodeImageIO(BmpImage(16, 16, px), "gif"), "gif"),
      (4L, MediaCodec.encodeBmp(BmpImage(16, 16, px)), "bmp"),
      (5L, MediaCodec.encodeWav(
        MediaCodec.WavAudio(8000, 1, Array.fill(64)(7.toShort))), "wav"),
      (6L, MediaCodec.encodeVideo(Seq(BmpImage(16, 16, px))), "gvid"),
      (7L, "just some text".getBytes("UTF-8"), "unknown"),
      // RIFF but not WAVE (an AVI-style container) must not read as wav
      (8L, "RIFF0000AVI LIST".getBytes("US-ASCII"), "unknown"),
      (9L, Array[Byte](0x89.toByte), "unknown"), // truncated PNG magic
      (10L, Array.empty[Byte], "unknown"))
    val got = cases.map { case (id, b, _) => (id, b) }.toDF("id", "payload")
      .select(col("id"), MultimodalOps.sniffMediaType(col("payload")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (id, _, want) =>
      assert(got(id) == want, s"id $id: got ${got(id)}, want $want")
    }
    val n = Seq((1, null: Array[Byte])).toDF("i", "payload")
      .select(MultimodalOps.sniffMediaType(col("payload"))).head.getString(0)
    assert(n == "unknown")
  }

  test("videoFrameDHash: one row per frame; repeated frames hash alike") {
    import spark.implicits._
    def grad(shift: Int) = {
      val px = new Array[Byte](24 * 16 * 3)
      for (y <- 0 until 16; x <- 0 until 24; c <- 0 until 3)
        px((y * 24 + x) * 3 + c) = (x + shift).toByte
      BmpImage(24, 16, px)
    }
    // frames 0 and 2 identical; frame 1 is a pure brightness shift (same
    // hash by invariance); frame 3 reversed gradient (different hash)
    val rev = {
      val px = new Array[Byte](24 * 16 * 3)
      for (y <- 0 until 16; x <- 0 until 24; c <- 0 until 3)
        px((y * 24 + x) * 3 + c) = (23 - x).toByte
      BmpImage(24, 16, px)
    }
    val bytes = MediaCodec.encodeVideo(Seq(grad(0), grad(40), grad(0), rev))
    val asset = graft.operators.MediaAsset(7L, "video", bytes, bytes.length)
    val rows = MultimodalOps.videoFrameDHash(Seq(asset).toDS().toDF())
      .orderBy("frame_idx").collect()
      .map(r => (r.getLong(1), (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(rows(0)._2 == rows(2)._2, "identical frames must hash alike")
    assert(rows(0)._2 == rows(1)._2, "brightness shift must not change it")
    assert(rows(0)._2 != rows(3)._2, "reversed gradient must differ")
    val all32 = 0xFFFFFFFFL
    assert(rows(0)._2 == ((all32, all32, 0L, 0L)), rows(0)._2.toString)
  }
}
