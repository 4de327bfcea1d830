package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextNormExprs
import graft.operators.LayoutOps

/** Driver-side properties for the round-11 primitives: Unicode NFC
  * (idempotency, ASCII identity, Normalizer agreement) and the Morton
  * interleave (round-trip de-interleave, order preservation on shared
  * prefixes). Pure functions — no Spark jobs, so the generators can run
  * at full ScalaCheck defaults.
  */
object TextNormProps extends Properties("textnorm-zorder") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  private def nfc(s: String): String =
    TextNormExprs.nfc(UTF8String.fromString(s)).toString

  // strings mixing ASCII with the combining/precomposed characters NFC
  // actually rewrites, plus arbitrary unicode from the generator
  private val genText: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(
      Gen.asciiPrintableChar.map(_.toString),
      Gen.oneOf("e\u0301", "\u00e9", "o\u0308", "\u00f6", "n\u0303",
        "\u00f1", " ", "\t"))).map(_.mkString),
    // arbitrary BMP characters (valid code points only \u2014 surrogate halves
    // would make the String\u2192UTF8String\u2192String comparison ill-defined)
    Gen.listOf(Gen.choose(0x20, 0xD7FF).map(_.toChar.toString))
      .map(_.mkString))

  property("nfc is idempotent") = forAll(genText) { s =>
    val once = nfc(s)
    nfc(once) == once
  }

  property("nfc is the identity on pure ASCII") =
    forAll(Gen.asciiPrintableStr) { s => nfc(s) == s }

  property("nfc agrees with java.text.Normalizer") = forAll(genText) { s =>
    nfc(s) == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
  }

  private val genBucket: Gen[Int] = Gen.choose(0, 0xFFFF)

  /** Inverse of the even-bit spread: collect bits 0,2,4,… */
  private def unspread(z: Long): Int = {
    var out = 0
    var j = 0
    while (j < 16) {
      if (((z >>> (2 * j)) & 1L) == 1L) out |= (1 << j)
      j += 1
    }
    out
  }

  property("zorder interleave round-trips both 16-bit inputs") =
    forAll(genBucket, genBucket) { (a, b) =>
      val z = LayoutOps.zorderKeyRef(a, b)
      unspread(z) == a && unspread(z >>> 1) == b
    }

  property("zorder key is monotone in either coordinate at fixed other") =
    forAll(Gen.choose(0, 0xFFFE), genBucket) { (a, b) =>
      LayoutOps.zorderKeyRef(a, b) < LayoutOps.zorderKeyRef(a + 1, b) &&
      LayoutOps.zorderKeyRef(b, a) < LayoutOps.zorderKeyRef(b, a + 1)
    }
}
