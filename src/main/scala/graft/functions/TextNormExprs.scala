package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization for text dedup pipelines. Exact dedup keys on
  * BYTES, and Unicode lets one visible string have many byte encodings
  * (precomposed é vs e + COMBINING ACUTE, compatibility ligatures, …) —
  * NFC first, or "identical" documents hash apart. The reference corpus
  * tooling this engine re-expresses canonicalizes before hashing for
  * exactly this reason; here it is a native codegen'd Expression so the
  * canonicalize → md5 → groupBy path stays inside whole-stage codegen
  * (the hot pre-dedup pass at corpus scale).
  *
  * NFC (not NFKC): canonical composition only — byte-normalizing without
  * changing CONTENT. NFKC folds compatibility characters (ﬁ → fi, ² → 2),
  * a lossy editorial choice a caller can still make upstream.
  */
object TextNormExprs {

  /** NFC-normalize; identity fast path for pure-ASCII input (NFC is the
    * identity on ASCII, and corpus text is overwhelmingly ASCII — the
    * fast path skips the Normalizer's per-string allocation). Static so
    * generated code calls it directly (one static call per row, no
    * interpreter).
    */
  def nfc(s: UTF8String): UTF8String = {
    var i = 0
    val n = s.numBytes
    var ascii = true
    while (ascii && i < n) {
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) s
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))
  }
}

/** Column-API wrapper (the Scala-side twin of the SQL registration). */
object TextNormCol {
  def nfcNormalize(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      NfcNormalize(org.apache.spark.sql.graftbridge.Bridge.expression(text)))
}

/** `nfc_normalize(string)` — see [[TextNormExprs.nfc]]. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(v: Any): Any =
    TextNormExprs.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormExprs.nfc($c)")

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(c)
}
