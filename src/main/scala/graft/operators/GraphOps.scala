package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Link-graph analysis for crawl curation: damped PageRank over a
  * weighted edge list — the domain-authority signal a crawler uses to
  * prioritize its frontier and a curation pipeline uses to weight
  * sources (the harmonic-centrality role in CommonCrawl's host
  * rankings).
  *
  * Everything is INTEGER-exact so ranks compare identically on any
  * engine: mass lives in micro-units (`scale`, default 10⁶), damping is
  * basis points, and every division is floor division on non-negative
  * longs — `x DIV y` here, `//` in the DuckDB twin. Per iteration:
  *
  *   contrib(edge s→d) = r_s · w DIV outW_s
  *   r'_d = teleport + dampBps · Σ contrib(·→d) DIV 10⁴
  *   teleport = (10⁴ − dampBps) · scale DIV (10⁴ · |V|)
  *
  * Floor losses and dangling-node mass (nodes with no out-edges keep
  * receiving but distribute nothing) are deliberately dropped rather
  * than redistributed — the standard simplification when the rank is a
  * PRIORITY, not a probability; total mass stays ≤ scale and the
  * ordering is what consumers read.
  *
  * Scale shape: the edge list (with out-weights attached) stages to
  * parquet ONCE; each iteration is one edges⋈ranks equi-join on `src`
  * plus one `dst` aggregation — the canonical distributed PageRank
  * step, a shuffle pair per iteration, nothing driver-sized but the
  * iteration counter. Ranks re-stage per round so plan depth stays
  * O(1) across iterations (the x25 label-propagation discipline;
  * lineage never grows with `iters`).
  *
  * Overflow envelope: `r ≤ scale` and `contrib` sums to ≤ scale, so
  * the only product is `r·w ≤ scale·maxW` — fine in a long while the
  * heaviest edge weight stays under ~9·10¹² at the default scale
  * (hosts with more parallel links than that should pre-aggregate at
  * a coarser unit).
  */
object GraphOps {

  /** Floor division on non-negative longs — DuckDB `//`. */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast(LongType)

  /** Damped PageRank in exact micro-units over `edges(src, dst, w)`.
    * Returns `(node, rank_micro, out_w)` — `out_w` 0 for sinks.
    */
  def pageRankMicro(edges: DataFrame, iters: Int, dampBps: Long = 8500L,
      scale: Long = 1000000L, stageDir: Option[String] = None): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampBps >= 0 && dampBps <= 10000,
      s"dampBps must be in [0, 10000], got $dampBps")
    val s = edges.sparkSession
    val estage = StageIO.resolve(s, stageDir, "pagerank-edges")
    val outW = edges.groupBy("src").agg(sum(col("w")).cast("long").as("out_w"))
    edges.join(outW, "src").write.mode("overwrite").parquet(estage)
    val e = s.read.parquet(estage)
    val nstage = StageIO.resolve(s, stageDir.map(_ + "-nodes"), "pagerank-nodes")
    e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
      .distinct()
      .join(outW.withColumnRenamed("src", "node"), Seq("node"), "left")
      .select(col("node"), coalesce(col("out_w"), lit(0L)).as("out_w"))
      .write.mode("overwrite").parquet(nstage)
    val nodes = s.read.parquet(nstage)
    val nV = nodes.count()
    require(nV > 0, "empty graph")
    val teleport = (10000L - dampBps) * scale / (10000L * nV)

    var r = nodes.select(col("node"), lit(scale / nV).as("r"))
    var rStage = ""
    (1 to iters).foreach { i =>
      val contrib = e.join(r, e("src") === r("node"))
        .select(col("dst"), idiv(col("r") * col("w"), col("out_w")).as("c"))
        .groupBy("dst").agg(sum(col("c")).cast("long").as("cs"))
      val next = nodes.select("node")
        .join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(teleport) +
            idiv(lit(dampBps) * coalesce(col("cs"), lit(0L)), lit(10000L)))
            .as("r"))
      rStage = StageIO.resolve(s, None, s"pagerank-r$i")
      next.write.mode("overwrite").parquet(rStage)
      r = s.read.parquet(rStage)
    }
    r.join(nodes, Seq("node"))
      .select(col("node"), col("r").as("rank_micro"), col("out_w"))
  }
}
