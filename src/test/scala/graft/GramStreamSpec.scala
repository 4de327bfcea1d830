package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PcaOps
import graft.streaming.GramStream

/** Incremental second-moment maintenance: the merged counter log must
  * equal one batch aggregation EXACTLY (integer addition), replay must
  * be a no-op, and the refreshed model must match a full rebuild bit
  * for bit.
  */
class GramStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("merged log == batch gram/sums exactly; replay is a no-op; model matches rebuild") {
    val store = java.nio.file.Files.createTempDirectory("gram-log").toString
    (0L to 2L).foreach { w =>
      GramStream.applyBatch(
        emb.filter(pmod(col("vec_id"), lit(3)) === w), "embedding",
        store, w)
    }
    def gramRows = GramStream.readGram(spark, store)
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        r.getDecimal(2).toBigInteger)).toMap
    val batch = PcaOps.gramUpper(emb, "embedding")
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        r.getDecimal(2).toBigInteger)).toMap
    assert(gramRows == batch)
    val sums = GramStream.readSums(spark, store)
      .collect()
      .map(r => (r.getInt(0), (r.getDecimal(1).toBigInteger, r.getLong(2))))
      .toMap
    val batchSums = PcaOps.dimSums(emb, "embedding")
      .collect()
      .map(r => (r.getInt(0), (r.getDecimal(1).toBigInteger, r.getLong(2))))
      .toMap
    assert(sums == batchSums)
    // at-least-once redelivery of the middle wave: overwrite-keyed
    GramStream.applyBatch(
      emb.filter(pmod(col("vec_id"), lit(3)) === 1L), "embedding",
      store, 1L)
    assert(gramRows == batch)
    // model refresh from state == full rebuild, bit for bit
    val fromState = GramStream.componentsFrom(spark, store, 64, 4)
      .orderBy("comp", "pos").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    val rebuild = PcaOps.principalComponents(
        PcaOps.gramUpper(emb, "embedding"),
        PcaOps.dimSums(emb, "embedding"), 64, 4)
      .orderBy("comp", "pos").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    assert(fromState.toSeq == rebuild.toSeq)
  }

  test("empty log fails loudly; empty batch writes nothing") {
    val store = java.nio.file.Files.createTempDirectory("gram-empty").toString
    GramStream.applyBatch(emb.filter(lit(false)), "embedding", store, 0L)
    val e = intercept[IllegalArgumentException] {
      GramStream.readGram(spark, store)
    }
    assert(e.getMessage.contains("no committed batches"))
  }
}
