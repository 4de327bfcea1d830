package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimilarityOps

class VectorExprsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("fused codegen cosine is bitwise-identical to the compositional form") {
    val emb = Tables.embeddings(spark, SparkTestSession.sf0001)
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val pairs = a.join(b, col("id_a") < col("id_b")).limit(5000)
      .select(
        SimilarityOps.cosine(col("va"), col("vb")).as("slow"),
        SimilarityOps.cosineFast(col("va"), col("vb")).as("fast"))
    val mismatches = pairs.filter(
      col("slow") =!= col("fast")
        && !(isnan(col("slow")) && isnan(col("fast")))).count()
    assert(mismatches == 0L)
  }

  test("native dot is bitwise-identical to the compositional spec") {
    val emb = Tables.embeddings(spark, SparkTestSession.sf0001)
    val q = emb.limit(5).select(col("vec_id").as("qid"),
      col("embedding").as("qv"))
    val pairs = emb.crossJoin(q)
      .select(SimilarityOps.dot(col("embedding"), col("qv")).as("n"),
        SimilarityOps.dotSpec(col("embedding"), col("qv")).as("c"))
    assert(pairs.filter(col("n") =!= col("c")).count() === 0)
  }

  test("fused cosine: known values and null propagation") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 0.0f)), Some(Seq(0.0f, 2.0f))),
      (Some(Seq(1.0f, 2.0f)), Some(Seq(2.0f, 4.0f))),
      (None, Some(Seq(1.0f, 1.0f))))
      .toDF("a", "b")
      .select(SimilarityOps.cosineFast(col("a"), col("b")).as("c"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 0.0)
    assert(math.abs(rows(1).getDouble(0) - 1.0) < 1e-15)
    assert(rows(2).isNullAt(0))
  }
}
