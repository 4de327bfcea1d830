package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DecontaminationStream

/** Ingest-time decontamination: a planted eval leak arriving on the
  * train stream is diverted to the leaked sink; clean docs pass.
  */
class DecontaminationStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("planted leak is diverted at ingest; clean docs pass through") {
    val base = java.nio.file.Files.createTempDirectory("decontam").toString
    val (cleanDir, leakedDir) = (s"$base/clean", s"$base/leaked")
    val leak = "held out benchmark question text that must never be trained on"
    val evalDocs = Seq((100L, leak)).toDF("doc_id", "text")

    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = DecontaminationStream.startGate(
      input.toDF().toDF("doc_id", "text"), evalDocs, "text", "doc_id",
      minOverlap = 0.5, cleanDir, leakedDir, s"$base/ckpt")
    try {
      input.addData(
        (1L, leak + " with a little extra trailing context appended"),
        (2L, "an ordinary training document about something unrelated entirely"))
      q.processAllAvailable()
      // second batch: all clean — appends to the same sinks
      input.addData((3L, "another clean document with fresh words and nothing shared"))
      q.processAllAvailable()
      val clean = spark.read.parquet(cleanDir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val leaked = spark.read.parquet(leakedDir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(leaked == Set(1L), s"only the planted leak flags: $leaked")
      assert(clean == Set(2L, 3L), s"clean docs pass: $clean")
    } finally q.stop()
  }
}
