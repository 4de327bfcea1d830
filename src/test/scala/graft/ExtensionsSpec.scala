package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The native kernels registered through SparkSessionExtensions must be
  * callable from plain SQL in a session built with GraftExtensions.
  */
class ExtensionsSpec extends AnyFunSuite {

  // the shared session is built with GraftExtensions (as GraftSession is)
  lazy val spark: SparkSession = SparkTestSession.spark

  test("cosine_sim / simhash64 / minhash_hex_sig / distinct_shingles in SQL") {
    val r = spark.sql(
      """SELECT
           cosine_sim(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
                      array(CAST(2.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS cos,
           simhash64(array('a', 'b', 'a')) AS sh,
           minhash_hex_sig(array('a b c', 'b c d'), 2) AS sig,
           distinct_shingles(array('w1', 'w2', 'w3', 'w1', 'w2', 'w3'), 3) AS shg
      """).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-15)
    assert(r.getAs[scala.collection.Seq[String]]("sig").length == 2)
    val shg = r.getAs[scala.collection.Seq[String]]("shg")
    assert(shg.contains("w1 w2 w3") && shg.contains("w3 w1 w2"))
    assert(shg.length == 3) // 4 windows, 3 distinct (w1w2w3 repeats)
  }

  test("top_bigram_count / double_sort_key in SQL") {
    val r = spark.sql(
      """SELECT
           top_bigram_count(array('a', 'b', 'a', 'b', 'a')) AS rep,
           top_bigram_count(CAST(NULL AS ARRAY<STRING>)) AS rep_null,
           double_sort_key(CAST(1.5 AS DOUBLE)) AS kp,
           double_sort_key(CAST(-1.5 AS DOUBLE)) AS kn,
           double_sort_key(CAST(0.0 AS DOUBLE)) AS kz
      """).head()
    assert(r.getInt(0) == 2)
    assert(r.getInt(1) == 0) // NULL array -> 0, the compositional parity
    assert(r.getLong(3) < r.getLong(4) && r.getLong(4) < r.getLong(2),
      "key order must follow numeric order: -1.5 < 0 < 1.5")
    // a mistyped array dies in the analyzer, not in executors
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT top_bigram_count(array(1, 2, 3))").collect()
    }
  }

  test("window_keys60 / dist2 / dot_prod in SQL equal the expression API") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaSql = spark.sql(
      "SELECT window_keys60(array('a','b','c'), 2) AS w").head().getSeq[Long](0)
    val viaApi = Seq(Seq("a", "b", "c")).toDF("t")
      .select(graft.functions.HashExprs.windowKeys60(col("t"), 2))
      .head().getSeq[Long](0)
    assert(viaSql == viaApi)
    val r = spark.sql(
      """SELECT dist2(array(1.0D, 2.0D), array(3.0D, 0.0D)) AS d,
                dot_prod(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS p""").head()
    assert(r.getDouble(0) == 8.0) // (1-3)^2 + (2-0)^2
    assert(r.getDouble(1) == 11.0) // 3 + 8
  }

  test("dist2/dot_prod SQL coerce natural literals; static int args accept"
      + " BIGINT and reject junk with AnalysisException (advisor r15)") {
    // array(1.0, 2.0) parses as array<decimal> — ImplicitCastInputTypes
    // must coerce it to array<double> instead of letting getDouble
    // reinterpret decimal bytes
    val r = spark.sql(
      """SELECT dist2(array(1.0, 2.0), array(3.0, 5.0)) AS d,
                dot_prod(array(1, 2), array(3, 4)) AS p""").head()
    assert(r.getDouble(0) == 13.0)
    assert(r.getDouble(1) == 11.0)
    // malformed vectors: the spec's NULL, not a silent truncation
    val n = spark.sql(
      "SELECT dist2(array(1.0D), array(1.0D, 2.0D)) AS d").head()
    assert(n.isNullAt(0))
    // SQL integer literals may parse as BIGINT; a Long-valued n must work
    val w = spark.sql(
      "SELECT window_keys60(array('a','b','c'), CAST(2 AS BIGINT)) AS w")
      .head().getSeq[Long](0)
    assert(w.length == 2)
    // junk static args die as AnalysisException with the function named,
    // not as ClassCastException at registration-eval time
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT window_keys60(array('a'), 'x')").collect()
    }
    assert(e1.getMessage.contains("window_keys60"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_hex_sig(array('a'), rand())").collect()
    }
    assert(e2.getMessage.contains("minhash_hex_sig"))
  }

  test("Bridge.physicalNodeNames sees through AQE into the finalized plan") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (1 to 1000).toDF("v").groupBy(pmod(col("v"), lit(7)).as("k"))
      .agg(sum("v").as("s"))
    df.collect() // finalize the adaptive plan
    val names = org.apache.spark.sql.graftbridge.Bridge
      .physicalNodeNames(df.queryExecution.executedPlan)
    // the walk must reach inside AdaptiveSparkPlanExec (a field, not a
    // child): a shuffle exchange and codegen spans only exist there
    assert(names.contains("AdaptiveSparkPlan"), names.take(5))
    assert(names.contains("Exchange"), s"no shuffle seen: $names")
    assert(names.exists(_.startsWith("WholeStageCodegen")),
      s"no codegen span seen: $names")
    assert(names.count(_ == "HashAggregate") >= 2,
      s"partial+final aggregate expected: $names")
  }

  test("md5_simhash60 in SQL equals the expression API") {
    import org.apache.spark.sql.functions._
    val viaSql = spark.sql("SELECT md5_simhash60(array('hello')) AS s").head().getLong(0)
    import spark.implicits._
    val viaApi = Seq(Seq("hello")).toDF("t")
      .select(graft.functions.HashExprs.md5Simhash60(col("t"))).head().getLong(0)
    assert(viaSql == viaApi)
    // single token => the hash IS the token's 60-bit md5 prefix
    val expect = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex("hello").substring(0, 15), 16)
    assert(viaSql == expect)
  }
}
