package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.MultimodalOps
import graft.operators.MediaCodec.BmpImage

/** Driver-side properties for the perceptual-key kernels (x70–x72
  * dHash, x71 audio fingerprint) — pure functions, no Spark jobs, so
  * the generators run at full ScalaCheck defaults.
  *
  * The invariances here are the DESIGN of the keys, not incidental
  * behavior: a gradient hash must ignore global brightness/gain, and
  * the 4-word band decomposition must be pigeonhole-complete at
  * Hamming ≤ 3 — both hold for EVERY input, which is what makes them
  * properties rather than fixture tests.
  */
object PerceptualProps extends Properties("perceptual-keys") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(150)

  private val genDims: Gen[(Int, Int)] =
    for { w <- Gen.choose(9, 40); h <- Gen.choose(9, 40) } yield (w, h)

  // headroom-bounded pixels so a +shift can never clip
  private def genRaster: Gen[(BmpImage, Int)] = for {
    (w, h) <- genDims
    seed <- Gen.choose(0L, Long.MaxValue)
    shift <- Gen.choose(1, 100)
  } yield {
    val rnd = new scala.util.Random(seed)
    val px = Array.fill(w * h * 3)(rnd.nextInt(150).toByte)
    (BmpImage(w, h, px), shift)
  }

  property("dHash ignores global brightness shifts") = forAll(genRaster) {
    case (img, shift) =>
      val shifted = BmpImage(img.width, img.height,
        img.pixels.map(b => ((b & 0xFF) + shift).toByte))
      MultimodalOps.dhashWords(shifted) == MultimodalOps.dhashWords(img)
  }

  property("dHash of any constant raster is zero") =
    forAll(genDims, Gen.choose(0, 255)) { case ((w, h), v) =>
      MultimodalOps.dhashWords(
        BmpImage(w, h, Array.fill(w * h * 3)(v.toByte))) ==
        ((0L, 0L, 0L, 0L))
    }

  property("4-word split is pigeonhole-complete at Hamming <= 3") =
    forAll(genRaster, genRaster) { case ((a, _), (b0, _)) =>
      // resize b to a's dims so both hash over the same grid
      val b = BmpImage(a.width, a.height,
        Array.tabulate(a.width * a.height * 3)(i =>
          b0.pixels(i % b0.pixels.length)))
      val wa = MultimodalOps.dhashWords(a).productIterator
        .map(_.asInstanceOf[Long]).toSeq
      val wb = MultimodalOps.dhashWords(b).productIterator
        .map(_.asInstanceOf[Long]).toSeq
      val dist = wa.zip(wb)
        .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      dist > 3 || wa.zip(wb).exists { case (x, y) => x == y }
    }

  private val genPcm: Gen[(Array[Short], Int)] = for {
    n <- Gen.choose(64, 800)
    seed <- Gen.choose(0L, Long.MaxValue)
    gain <- Gen.choose(2, 8)
  } yield {
    val rnd = new scala.util.Random(seed)
    // |sample| ≤ 4000 so gain ≤ 8 cannot overflow a Short
    (Array.fill(n)((rnd.nextInt(8001) - 4000).toShort), gain)
  }

  property("audio fingerprint ignores positive gain") = forAll(genPcm) {
    case (samples, gain) =>
      MultimodalOps.audioWords(samples.map(s => (s * gain).toShort)) ==
        MultimodalOps.audioWords(samples)
  }

  property("audio fingerprint of a constant stream is zero (64 | n)") =
    // n a multiple of 64: otherwise window SIZES differ by ±1 and a
    // constant stream legitimately fingerprints the size pattern —
    // energies are sums, not samples, unlike the image kernel
    forAll(Gen.choose(1, 8), Gen.choose(-4000, 4000)) { (m, v) =>
      MultimodalOps.audioWords(Array.fill(64 * m)(v.toShort)) == ((0L, 0L))
    }
}
