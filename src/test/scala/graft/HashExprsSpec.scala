package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HashExprs
import graft.operators.{DedupOps, TextOps}

class HashExprsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val docs = Tables.documents(spark, SparkTestSession.sf0001)

  test("fused SimHash64 equals the compositional simhash on real docs") {
    val both = docs.select(
      DedupOps.simhash(TextOps.tokens(col("text"))).as("spec"),
      HashExprs.simhash64(TextOps.tokens(col("text"))).as("fast"))
    assert(both.filter(col("spec") =!= col("fast")).count() == 0L)
  }

  test("Md5SimHash60 matches a hand-computed value and the SQL bit recipe") {
    import org.apache.commons.codec.digest.DigestUtils
    // hand-computed: one token → sim is exactly that token's 60-bit hash
    val one = Seq("hello").toDF("text")
      .select(HashExprs.md5Simhash60(TextOps.tokens(col("text"))).as("sim"))
    val expect = java.lang.Long.parseLong(
      DigestUtils.md5Hex("hello").substring(0, 15), 16)
    assert(one.head().getLong(0) == expect)
    // compositional recipe (the DuckDB oracle's formula) on real docs
    val hashed = transform(TextOps.tokens(col("text")),
      t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
    val bits = (0 until 60).map { j =>
      val set = size(filter(hashed,
        h => shiftright(h, j).bitwiseAND(1L) === 1L))
      when(set * 2 > size(hashed), lit(1L << j)).otherwise(lit(0L))
    }
    val spec = docs.select(col("doc_id"),
      bits.reduce(_ + _).as("sim"))
    val fast = docs.select(col("doc_id"),
      HashExprs.md5Simhash60(TextOps.tokens(col("text"))).as("sim"))
    assert(spec.exceptAll(fast).count() == 0L)
    assert(fast.exceptAll(spec).count() == 0L)
  }

  test("fused WindowKeys60 equals shingles->md5Key60 on real docs + edges") {
    // real docs at the x29 window length
    val spec = docs.select(col("doc_id"),
      posexplode(TextOps.shingles(TextOps.tokens(col("text")), 8))
        .as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos"), TextOps.md5Key60(col("w")).as("h"))
    val fast = docs.select(col("doc_id"),
      posexplode(HashExprs.windowKeys60(TextOps.tokens(col("text")), 8))
        .as(Seq("pos", "h")))
    assert(spec.exceptAll(fast).count() == 0L)
    assert(fast.exceptAll(spec).count() == 0L)
    // edges: exactly-n tokens (one window), under-n (empty), n=1, and a
    // null element (concat_ws skip: value AND separator vanish)
    val edges = Seq(
      (1L, Seq[String]("a", "b", "c")),
      (2L, Seq[String]("a", "b")),
      (3L, Seq[String]("a", null, "c"))).toDF("doc_id", "toks")
    val especs = edges.select(col("doc_id"),
      posexplode(TextOps.shingles(col("toks"), 3)).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos"), TextOps.md5Key60(col("w")).as("h"))
    val efast = edges.select(col("doc_id"),
      posexplode(HashExprs.windowKeys60(col("toks"), 3)).as(Seq("pos", "h")))
    assert(especs.exceptAll(efast).count() == 0L)
    assert(efast.exceptAll(especs).count() == 0L)
    val n1 = edges.select(col("doc_id"),
      posexplode(HashExprs.windowKeys60(col("toks"), 1)).as(Seq("pos", "h")))
    val n1spec = edges.select(col("doc_id"),
      posexplode(TextOps.shingles(col("toks"), 1)).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos"), TextOps.md5Key60(col("w")).as("h"))
    assert(n1spec.exceptAll(n1).count() == 0L)
    assert(n1.exceptAll(n1spec).count() == 0L)
  }

  test("fused DistinctShingles equals array_distinct(shingles) on real docs") {
    val spec = docs.select(col("doc_id"),
      array_distinct(TextOps.shingles(TextOps.tokens(col("text")))).as("sh"))
    val fast = docs.select(col("doc_id"),
      HashExprs.distinctShingles(TextOps.tokens(col("text"))).as("sh"))
    assert(spec.exceptAll(fast).count() == 0L)
    assert(fast.exceptAll(spec).count() == 0L)
  }

  test("null array elements are skipped, not NPE (SQL-registered surface)") {
    // md5_simhash60 is callable from SQL, so it can see arrays with NULLs:
    // a null element must contribute no votes — result equals the array
    // with the null removed (and an all-null array hashes like empty)
    val withNull = spark.sql(
      "SELECT md5_simhash60(array('a', CAST(NULL AS STRING), 'b')) AS sim")
      .head().getLong(0)
    val without = spark.sql("SELECT md5_simhash60(array('a', 'b')) AS sim")
      .head().getLong(0)
    assert(withNull == without)
    val simWithNull = Seq(Seq[String]("a", null, "b")).toDF("t")
      .select(HashExprs.simhash64(col("t")).as("s"),
        HashExprs.minhashHexSig(col("t"), 4).as("sig"))
      .head()
    val simWithout = Seq(Seq("a", "b")).toDF("t")
      .select(HashExprs.simhash64(col("t")).as("s"),
        HashExprs.minhashHexSig(col("t"), 4).as("sig"))
      .head()
    assert(simWithNull.getLong(0) == simWithout.getLong(0))
    assert(simWithNull.getAs[scala.collection.Seq[String]]("sig")
      == simWithout.getAs[scala.collection.Seq[String]]("sig"))
  }

  test("fused MinHashHexSig equals the compositional signature on real docs") {
    val sh = array_distinct(TextOps.shingles(TextOps.tokens(col("text"))))
    val spec = docs.select(Seq(col("doc_id")) ++
      DedupOps.minhashSignature(sh, 12): _*)
    val fast = docs.select(col("doc_id"),
      HashExprs.minhashHexSig(sh, 12).as("sig"))
      .select(Seq(col("doc_id")) ++
        (0 until 12).map(i => element_at(col("sig"), i + 1).as(s"mh$i")): _*)
    assert(spec.exceptAll(fast).count() == 0L)
    assert(fast.exceptAll(spec).count() == 0L)
  }

  test("fused TopBigramCount equals the compositional form on real docs") {
    val docs = Tables.documents(spark, SparkTestSession.sf0001)
    val toks = graft.operators.TextOps.tokens(col("text"))
    val spec = docs.select(col("doc_id"),
      graft.operators.TextOps.topBigramCount(toks).as("c"))
    val fast = docs.select(col("doc_id"),
      HashExprs.topBigramCount(toks).as("c"))
    assert(spec.exceptAll(fast).count() == 0L)
    assert(fast.exceptAll(spec).count() == 0L)
    // edge cases the lambda form's null/short semantics pin down
    import spark.implicits._
    val edge = Seq(
      (1L, Seq("a")),                                  // under 2 tokens -> 0
      (2L, Seq("a", "b", "a", "b", "a")),              // "a b" x2
      (3L, Seq[String](null, "a", null, "a", "b")),    // null pairs skip
      (4L, Seq("x", "x", "x", "x")),                   // "x x" x3
      (5L, null.asInstanceOf[Seq[String]]))            // NULL array -> 0,
      .toDF("id", "toks")                              // like the coalesce
    val both = edge.select(col("id"),
        graft.operators.TextOps.topBigramCount(col("toks")).as("spec"),
        HashExprs.topBigramCount(col("toks")).as("fast"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    for ((id, s, f) <- both) assert(s == f, s"doc $id: $s != $f")
    assert(both.map(t => t._1 -> t._2).toMap ==
      Map(1L -> 0, 2L -> 2, 3L -> 1, 4L -> 3, 5L -> 0))
  }
}
