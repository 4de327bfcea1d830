package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Integer PageRank: BigInt replay of the exact iteration arithmetic,
  * structural sanity (hubs outrank leaves, sinks keep teleport mass),
  * and the argument guards.
  */
class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(String, String, Long)], iters: Int)
      : Map[String, (Long, Long)] =
    GraphOps.pageRankMicro(edges.toDF("src", "dst", "w"), iters)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  /** Driver-side replay of the documented arithmetic. */
  private def ref(edges: Seq[(String, String, Long)], iters: Int,
      dampBps: Long = 8500L, scale: Long = 1000000L)
      : Map[String, Long] = {
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val v = nodes.size.toLong
    val teleport = (10000L - dampBps) * scale / (10000L * v)
    var r = nodes.map(_ -> scale / v).toMap
    (1 to iters).foreach { _ =>
      val in = scala.collection.mutable.Map.empty[String, Long]
      edges.foreach { case (s, d, w) =>
        in(d) = in.getOrElse(d, 0L) + (r(s) * w) / outW(s)
      }
      r = nodes.map(n =>
        n -> (teleport + dampBps * in.getOrElse(n, 0L) / 10000L)).toMap
    }
    r
  }

  test("pageRankMicro matches the BigInt-free integer replay exactly, " +
      "hub outranks leaves, sink keeps only received+teleport mass") {
    // a -> b, c -> b, b -> d (d is a sink), plus a weighted back edge
    val edges = Seq[(String, String, Long)](
      ("a", "b", 1L), ("c", "b", 3L), ("b", "d", 1L), ("d2", "a", 2L))
    val got = run(edges, 5)
    val want = ref(edges, 5)
    assert(got.view.mapValues(_._1).toMap == want,
      s"got $got\nwant $want")
    assert(got("b")._1 > got("c")._1, "the hub must outrank a leaf")
    assert(got("d")._2 == 0L, "sink out_w must be 0")
    assert(got("b")._2 == 1L && got("c")._2 == 3L)
  }

  test("iteration depth changes ranks (the loop really iterates) and " +
      "total mass never exceeds the scale") {
    val edges = Seq[(String, String, Long)](
      ("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L), ("a", "c", 1L))
    val r1 = run(edges, 1).view.mapValues(_._1).toMap
    val r5 = run(edges, 5).view.mapValues(_._1).toMap
    assert(r1 != r5, "5 iterations must differ from 1 on a cycle")
    assert(r5.values.sum <= 1000000L, "floor losses only — never gains")
    assert(r1 == ref(edges, 1) && r5 == ref(edges, 5))
  }

  test("argument guards reject bad damping and iteration counts") {
    val edges = Seq(("a", "b", 1L)).toDF("src", "dst", "w")
    intercept[IllegalArgumentException] {
      GraphOps.pageRankMicro(edges, 0)
    }
    intercept[IllegalArgumentException] {
      GraphOps.pageRankMicro(edges, 1, dampBps = 10001L)
    }
  }
}
