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

  test("pageRankDeltas reports the exact per-iteration L1 movement of " +
      "the rank vector (replayed from the reference iterates)") {
    val edges = Seq[(String, String, Long)](
      ("a", "b", 1L), ("c", "b", 3L), ("b", "d", 1L), ("d2", "a", 2L))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val iterates = (0 to 5).map {
      case 0 => nodes.map(_ -> 1000000L / nodes.size).toMap
      case i => ref(edges, i)
    }
    val want = (1 to 5).map(i => i.toLong ->
      nodes.map(n => (iterates(i)(n) - iterates(i - 1)(n)).abs).sum).toMap
    val got = GraphOps.pageRankDeltas(edges.toDF("src", "dst", "w"), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"got $got\nwant $want")
    assert(got(5L) < got(1L), "damped iteration must mix toward a fixpoint")
  }

  test("floor division stays exact past the 2^53 double envelope " +
      "(rank·weight products beyond what double division can floor)") {
    // r0 = 250000 (4 nodes); r·w ≈ 2.3·10^18 >> 2^53 — a long/long
    // divide lowered to double can floor off-by-one here (advisor r16);
    // odd near-max weights make the quotients non-round
    val big = 9000000000001L // ~9·10^12, odd
    val edges = Seq[(String, String, Long)](
      ("a", "b", big), ("a", "c", big / 3), ("a", "d", 7L),
      ("b", "a", big - 2), ("b", "d", 11L))
    val got = run(edges, 3).view.mapValues(_._1).toMap
    // BigInt replay of the documented arithmetic (the spec's long replay
    // would itself overflow on r·w)
    val outW = edges.groupBy(_._1).map { case (s, es) =>
      s -> BigInt(es.map(_._3).sum) }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val v = nodes.size.toLong
    val teleport = BigInt(1500) * 1000000L / (BigInt(10000) * v)
    var r = nodes.map(_ -> BigInt(1000000L / v)).toMap
    (1 to 3).foreach { _ =>
      val in = scala.collection.mutable.Map.empty[String, BigInt]
      edges.foreach { case (s, d, w) =>
        in(d) = in.getOrElse(d, BigInt(0)) + (r(s) * w) / outW(s)
      }
      r = nodes.map(n =>
        n -> (teleport + BigInt(8500) * in.getOrElse(n, BigInt(0)) / 10000))
        .toMap
    }
    val want = r.view.mapValues(_.toLong).toMap
    assert(got == want, s"got $got\nwant $want")
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

  test("rank arithmetic past the decimal envelope fails LOUDLY instead " +
      "of letting sum() skip NULL contributions (advisor r17)") {
    import org.apache.spark.sql.functions._
    // decimal edge weights beyond the long range push the kernel out of
    // its documented envelope. Under the session default (ANSI on,
    // Spark 4) the arithmetic itself must error; under a non-ANSI
    // deployment the NULL-contribution raise_error guard fires instead.
    // Either way: LOUD, never a silently underreported rank mass.
    val w38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
      .withColumn("w", lit(new java.math.BigDecimal("1e30")).cast(w38))
    val ex = intercept[Throwable] {
      GraphOps.pageRankMicro(edges, 1).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(m =>
        m.contains("envelope") || m.contains("OVERFLOW")),
      s"expected a loud overflow failure, got: ${messages(ex)}")
  }
}
