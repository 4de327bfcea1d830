package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs — no external libraries. Four REAL formats:
  *
  *  - BMP: 24-bit uncompressed (BITMAPFILEHEADER + BITMAPINFOHEADER,
  *    BI_RGB, bottom-up rows, 4-byte row padding) — the standard Windows
  *    bitmap layout, byte-compatible with any image viewer.
  *  - WAV: RIFF/WAVE PCM 16-bit (fmt + data chunks; the decoder walks the
  *    chunk list, so files with extra chunks — LIST, fact — parse too).
  *  - PNG / JPEG via `javax.imageio` (public JDK API — the two formats
  *    real corpora carry; see the imageio section for the
  *    lossless-vs-lossy oracle contract).
  *
  * Video has no library-free standard container, so assets use a trivial
  * length-delimited sequence of real BMP frames behind a 12-byte header
  * (magic, frame count, reserved) — the container is synthetic and
  * documented as such; every frame inside it is a real BMP that this
  * decoder (or any image tool) can read.
  */
object MediaCodec {

  /** Decoded image: BGR24, row-major, top-down, no padding. */
  case class BmpImage(width: Int, height: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * 3,
      s"pixel buffer ${pixels.length} != $width x $height x 3")
  }

  /** Decoded PCM audio: interleaved 16-bit samples. */
  case class WavAudio(sampleRate: Int, numChannels: Int, samples: Array[Short]) {
    def numFrames: Int = samples.length / numChannels
  }

  /** BMP rows pad to 4-byte boundaries. */
  def bmpRowSize(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Exact encoded size — kept as a closed form so metadata queries can be
    * oracle-checked without running the codec (ExtQueries x12b).
    */
  def bmpFileSize(width: Int, height: Int): Int = 54 + height * bmpRowSize(width)
  def wavFileSize(numChannels: Int, numFrames: Int): Int = 44 + 2 * numChannels * numFrames
  def videoFileSize(width: Int, height: Int, numFrames: Int): Int =
    12 + numFrames * bmpFileSize(width, height)

  // ---------------------------------------------------------------- BMP

  def encodeBmp(img: BmpImage): Array[Byte] = {
    val rs = bmpRowSize(img.width)
    val dataSize = rs * img.height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize)                 // file size
    buf.putShort(0).putShort(0)               // reserved
    buf.putInt(54)                            // pixel-array offset
    buf.putInt(40)                            // BITMAPINFOHEADER size
    buf.putInt(img.width)
    buf.putInt(img.height)                    // positive height = bottom-up
    buf.putShort(1)                           // color planes
    buf.putShort(24)                          // bits per pixel
    buf.putInt(0)                             // BI_RGB (uncompressed)
    buf.putInt(dataSize)
    buf.putInt(2835).putInt(2835)             // 72 dpi in px/metre
    buf.putInt(0).putInt(0)                   // palette: none
    var y = img.height - 1
    while (y >= 0) {                          // rows stored bottom-up
      buf.put(img.pixels, y * img.width * 3, img.width * 3)
      var p = 3 * img.width
      while (p < rs) { buf.put(0: Byte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  def decodeBmp(bytes: Array[Byte]): BmpImage = decodeBmpAt(bytes, 0)._1

  /** Decode a BMP starting at `off`; returns (image, bytesConsumed) so the
    * video container can walk concatenated frames.
    */
  def decodeBmpAt(bytes: Array[Byte], off: Int): (BmpImage, Int) = {
    val buf = ByteBuffer.wrap(bytes, off, bytes.length - off)
      .order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'B'.toByte && buf.get() == 'M'.toByte, "not a BMP")
    val fileSize = buf.getInt()
    buf.getShort(); buf.getShort()
    val pixOff = buf.getInt()
    val dibSize = buf.getInt()
    require(dibSize >= 40, s"unsupported DIB header size $dibSize")
    val w = buf.getInt()
    val h = buf.getInt()
    require(w > 0 && h > 0, "top-down or degenerate BMP unsupported")
    require(buf.getShort() == 1, "bad color-plane count")
    require(buf.getShort() == 24, "only 24-bit BMP supported")
    require(buf.getInt() == 0, "only uncompressed (BI_RGB) supported")
    val rs = bmpRowSize(w)
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      System.arraycopy(bytes, off + pixOff + (h - 1 - y) * rs, out, y * w * 3, w * 3)
      y += 1
    }
    (BmpImage(w, h, out), fileSize)
  }

  /** Nearest-neighbour downscale so max(width,height) <= maxDim; identity if
    * already within bounds (never upscales).
    */
  def scaleBmp(img: BmpImage, maxDim: Int): BmpImage = {
    val s = maxDim.toDouble / math.max(img.width, img.height)
    if (s >= 1.0) img
    else {
      val nw = math.max(1, (img.width * s).toInt)
      val nh = math.max(1, (img.height * s).toInt)
      val out = new Array[Byte](nw * nh * 3)
      var y = 0
      while (y < nh) {
        val sy = math.min(img.height - 1, (y / s).toInt)
        var x = 0
        while (x < nw) {
          val sx = math.min(img.width - 1, (x / s).toInt)
          System.arraycopy(img.pixels, (sy * img.width + sx) * 3, out, (y * nw + x) * 3, 3)
          x += 1
        }
        y += 1
      }
      BmpImage(nw, nh, out)
    }
  }

  // ---------------------------------------------------------------- WAV

  def encodeWav(a: WavAudio): Array[Byte] = {
    val dataSize = a.samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)                            // PCM fmt chunk size
    buf.putShort(1)                           // audio format: PCM
    buf.putShort(a.numChannels.toShort)
    buf.putInt(a.sampleRate)
    buf.putInt(a.sampleRate * a.numChannels * 2) // byte rate
    buf.putShort((a.numChannels * 2).toShort)    // block align
    buf.putShort(16)                          // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataSize)
    var i = 0
    while (i < a.samples.length) { buf.putShort(a.samples(i)); i += 1 }
    buf.array()
  }

  def decodeWav(bytes: Array[Byte]): WavAudio = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF file")
    buf.getInt()                              // riff size (trust chunk walk)
    require(tag() == "WAVE", "not a WAVE file")
    var sampleRate = -1
    var channels = -1
    var samples: Array[Short] = null
    // chunk walk: fmt /data in any order, unknown chunks (LIST, fact) skipped
    while (buf.remaining() >= 8 && (samples == null || sampleRate < 0)) {
      val id = tag()
      val sz = buf.getInt()
      id match {
        case "fmt " =>
          val start = buf.position()
          require(buf.getShort() == 1, "only PCM WAV supported")
          channels = buf.getShort()
          sampleRate = buf.getInt()
          buf.getInt(); buf.getShort()
          require(buf.getShort() == 16, "only 16-bit WAV supported")
          buf.position(start + sz)
        case "data" =>
          samples = new Array[Short](sz / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort(); i += 1 }
        case _ =>
          buf.position(buf.position() + sz + (sz & 1)) // chunks pad to even
      }
    }
    require(sampleRate > 0 && samples != null, "missing fmt /data chunk")
    WavAudio(sampleRate, channels, samples)
  }

  // ------------------------------------------------------- PNG / JPEG
  //
  // The two formats real multimodal corpora actually carry, via
  // `javax.imageio` — public JDK API, so the pure-JVM no-new-dependency
  // contract holds. PNG is lossless: decoded pixels are byte-identical
  // to the planted ones, so channel statistics stay oracle-checkable as
  // closed forms. JPEG is lossy by design: dims and parse success are
  // exact; pixel values are only near the planted ones (asserted with a
  // tolerance in MultimodalSpec, never hashed across the oracle).

  /** Encode BGR24 pixels as PNG or JPEG (`format`: "png" | "jpg"). */
  def encodeImageIO(img: BmpImage, format: String): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(img.width, img.height,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    // fill the raster's raw byte buffer, whose layout for TYPE_3BYTE_BGR
    // is exactly BmpImage's B,G,R interleave — setDataElements would
    // instead expect BAND order (R first) and silently swap channels
    val data = bi.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    System.arraycopy(img.pixels, 0, data, 0, img.pixels.length)
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(bi, format, out),
      s"no ImageIO writer for format $format")
    out.toByteArray
  }

  /** Encode an INDEXED raster (palette PNG, GIF — any ≤256-color format)
    * from a 3×n palette and a per-pixel index function. Unlike the
    * grayscale path, indexed decode is EXACT through [[decodeImageIO]]'s
    * redraw: an IndexColorModel is sRGB, so drawImage copies palette
    * colors verbatim — no colorspace conversion, channel sums stay
    * closed-form across the oracle.
    */
  def encodeIndexed(width: Int, height: Int, palR: Array[Byte],
      palG: Array[Byte], palB: Array[Byte], index: (Int, Int) => Int,
      format: String): Array[Byte] = {
    val icm = new java.awt.image.IndexColorModel(8, palR.length,
      palR, palG, palB)
    val bi = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    val raster = bi.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, index(x, y)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(bi, format, out),
      s"no ImageIO writer for format $format")
    out.toByteArray
  }

  /** Encode a constant-value GRAYSCALE PNG (TYPE_BYTE_GRAY). NOTE the
    * decode side is NOT value-exact: [[decodeImageIO]]'s redraw converts
    * the linear-gray colorspace to sRGB (a gamma-like mapping), so only
    * INVARIANTS survive — dims, and B == G == R on every pixel (gray in,
    * gray out). Callers must not oracle absolute grayscale sums.
    */
  def encodeGray(width: Int, height: Int, value: Int): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val data = bi.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    java.util.Arrays.fill(data, value.toByte)
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(bi, "png", out),
      "no ImageIO writer for format png")
    out.toByteArray
  }

  /** Decode any ImageIO-readable payload (PNG, JPEG, ...) to BGR24.
    * Non-BGR source types (palette PNG, grayscale JPEG) are redrawn into
    * a BGR raster so the output layout is always [[BmpImage]]'s.
    */
  def decodeImageIO(bytes: Array[Byte]): BmpImage = {
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(src != null, "not an ImageIO-readable image")
    val bgr =
      if (src.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR) src
      else {
        val conv = new java.awt.image.BufferedImage(src.getWidth,
          src.getHeight, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val g = conv.createGraphics()
        try g.drawImage(src, 0, 0, null) finally g.dispose()
        conv
      }
    val data = bgr.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    BmpImage(bgr.getWidth, bgr.getHeight, data.clone())
  }

  // -------------------------------------------------------------- video

  private val VideoMagic = 0x44495647 // "GVID" little-endian

  def encodeVideo(frames: Seq[BmpImage]): Array[Byte] = {
    require(frames.nonEmpty, "video needs at least one frame")
    val encoded = frames.map(encodeBmp)
    val buf = ByteBuffer.allocate(12 + encoded.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(VideoMagic)
    buf.putInt(frames.length)
    buf.putInt(0)                             // reserved
    encoded.foreach(buf.put)
    buf.array()
  }

  def decodeVideo(bytes: Array[Byte]): Seq[BmpImage] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt() == VideoMagic, "not a GVID container")
    val n = buf.getInt()
    buf.getInt()
    var off = 12
    (0 until n).map { _ =>
      val (img, consumed) = decodeBmpAt(bytes, off)
      off += consumed
      img
    }
  }
}
