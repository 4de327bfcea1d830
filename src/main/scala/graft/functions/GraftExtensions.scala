package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions registration (the public extension point — SURVEY
  * §7.2's path (c)) exposing the native kernels to the SQL surface:
  *
  *   spark.sql("SELECT cosine_sim(a.embedding, b.embedding) ...")
  *
  * Wire with:
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  * or config: spark.sql.extensions=graft.functions.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  /** Static int argument of a SQL registration (advisor r15): a bare
    * `args(n).eval().asInstanceOf[Int]` throws ClassCastException on a
    * BIGINT literal (SQL integer literals can parse either way) and an
    * opaque registration-time error on a non-foldable argument — this
    * resolves foldable integrals (Long only when it fits) and raises a
    * proper AnalysisException otherwise.
    */
  private def intArg(fname: String, pos: Int, e: Expression): Int = {
    def fail(why: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION", Map("errorMessage" ->
          s"$fname: argument ${pos + 1} must be a foldable integer literal, $why"))
    if (!e.foldable) fail(s"got non-foldable expression ${e.sql}")
    e.eval() match {
      case i: Int => i
      case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case null => fail("got NULL")
      case other => fail(s"got $other of ${e.dataType.sql}")
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: native as-of join (logical node + physical
    // merge scan; see graft.plans.AsOfJoin), plus the optimizer rule that
    // lets built-in pushdown/pruning continue through the custom node
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinOptimizations)

    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(array<float>, array<float>) - fused cosine similarity"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))

    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash of a token array"),
      (args: Seq[Expression]) => SimHash64(args.head)))

    ext.injectFunction((FunctionIdentifier("md5_simhash60"),
      info("md5_simhash60", "md5_simhash60(array<string>) - engine-portable 60-bit md5 SimHash"),
      (args: Seq[Expression]) => Md5SimHash60(args.head)))

    ext.injectFunction((FunctionIdentifier("minhash_hex_sig"),
      info("minhash_hex_sig", "minhash_hex_sig(array<string>, k) - md5 MinHash signature"),
      (args: Seq[Expression]) => MinHashHexSig(args(0),
        intArg("minhash_hex_sig", 1, args(1)))))

    ext.injectFunction((FunctionIdentifier("distinct_shingles"),
      info("distinct_shingles", "distinct_shingles(array<string>, n) - distinct word n-grams"),
      (args: Seq[Expression]) => DistinctShingles(args(0),
        intArg("distinct_shingles", 1, args(1)))))

    ext.injectFunction((FunctionIdentifier("topk_by_score"),
      info("topk_by_score",
        "topk_by_score(score double, id bigint, k) - per-group top-k aggregate with map-side partial pruning"),
      (args: Seq[Expression]) => TopKByScore(args(0), args(1),
        intArg("topk_by_score", 2, args(2)))))

    ext.injectFunction((FunctionIdentifier("top_bigram_count"),
      info("top_bigram_count",
        "top_bigram_count(array<string>) - count of the most frequent consecutive bigram (one pass)"),
      (args: Seq[Expression]) => TopBigramCount(args.head)))

    ext.injectFunction((FunctionIdentifier("double_sort_key"),
      info("double_sort_key",
        "double_sort_key(x double) - order-preserving 64-bit integer key of a double (quantile-sketch bucketing)"),
      (args: Seq[Expression]) => DoubleSortKey(args.head)))

    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize",
        "nfc_normalize(string) - Unicode NFC canonicalization (byte-normalize before exact dedup)"),
      (args: Seq[Expression]) => NfcNormalize(args.head)))

    ext.injectFunction((FunctionIdentifier("window_keys60"),
      info("window_keys60",
        "window_keys60(array<string>, n) - positional 60-bit md5 window keys (the span/LM gram key)"),
      (args: Seq[Expression]) => WindowKeys60(args(0),
        intArg("window_keys60", 1, args(1)))))

    ext.injectFunction((FunctionIdentifier("dist2"),
      info("dist2",
        "dist2(array<double>, array<double>) - exact squared L2, left-to-right"),
      (args: Seq[Expression]) => Dist2(args(0), args(1))))

    ext.injectFunction((FunctionIdentifier("dot_prod"),
      info("dot_prod",
        "dot_prod(array<double>, array<double>) - dot product in double, left-to-right"),
      (args: Seq[Expression]) => DotProd(args(0), args(1))))
  }
}
