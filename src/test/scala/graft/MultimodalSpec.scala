package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultimodalOps

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  lazy val assets = MultimodalOps.toAssets(
    Tables.documents(spark, SparkTestSession.sf0001), "doc_id", "text").cache()

  test("asset table carries binary payload + typed metadata") {
    val schema = assets.schema
    assert(schema("payload").dataType.typeName == "binary")
    val r = assets.orderBy("asset_id").head()
    assert(r.getAs[Array[Byte]]("payload").length == r.getAs[Int]("n_bytes"))
  }

  test("feature extraction is deterministic and total") {
    val f1 = MultimodalOps.extractFeatures(assets).collect().sortBy(_.asset_id)
    val f2 = MultimodalOps.extractFeatures(assets.repartition(7))
      .collect().sortBy(_.asset_id)
    assert(f1.length == assets.count())
    assert(f1.toSeq == f2.toSeq) // partitioning-independent
    assert(f1.forall(f => f.width >= 16 && f.height >= 16 && f.n_frames >= 1))
  }

  test("resize clamps the max dimension, preserving count") {
    val resized = MultimodalOps.resize(MultimodalOps.extractFeatures(assets), 32)
      .collect()
    assert(resized.forall(f => f.width <= 32 && f.height <= 32))
    assert(resized.length == assets.count())
  }

  test("frame sampling explodes only video assets at stride k") {
    val frames = MultimodalOps.sampleFrames(assets, everyK = 5).collect()
    val videoIds = assets.filter(col("media_type") === "video")
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(frames.nonEmpty)
    assert(frames.map(_.asset_id).toSet.subsetOf(videoIds))
    assert(frames.forall(_.frame_idx % 5 == 0))
  }
}
