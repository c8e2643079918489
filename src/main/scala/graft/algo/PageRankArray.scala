package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.exec.IterConfig
import graft.model.IterationMetrics

/** PageRank over a grouped in-adjacency with a broadcast primitive-array
  * state — the reference's K6 broadcast-gather kernel
  * (`/root/reference/include/graphCSR.hpp:215-249`: per row, gather
  * `weights[colInd[j]]` and multiply-accumulate) expressed as a typed
  * per-partition loop.
  *
  * WHY this exists (SURVEY.md §4.1 committed to "primitive-map gather in
  * typed mapPartitions ONLY if the codegen aggregate proves slow"): the
  * DataFrame join+aggregate iteration measures ~0.3 µs/edge at best — row
  * serialization, hash-table inserts, and cache decompression dominate. This
  * kernel iterates deserialized primitive arrays (RDD MEMORY_ONLY cache: no
  * per-iteration decode at all) against an Array[Double] state indexed by
  * the dense vertex id; the inner loop is multiply-add at ~ns/edge.
  *
  * Scope: the BROADCAST REGIME ONLY — V must fit in executor+driver memory
  * (~8 B/vertex, fine to ~10^8 locally). Beyond that, the DataFrame
  * ShuffleJoin path in [[PageRank]] is the 10^12-vertex design; this is the
  * small-V accelerator, selected explicitly (`bucketed`/strategy knobs in
  * the bench harness).
  */
object PageRankArray {

  /** (dst, srcs, ps): in-neighbors and normalized contribution weights. */
  final case class InAdj(dst: Long, srcs: Array[Long], ps: Array[Double])

  def run(
      spark: SparkSession,
      edges: DataFrame,
      nVertices: Long,
      damping: Double = 0.85,
      cfg: IterConfig = IterConfig(),
      weighted: Boolean = true): PageRank.Result = {
    require(nVertices <= Int.MaxValue, "broadcast-array kernel needs V <= 2^31")
    val n = nVertices.toInt
    import spark.implicits._

    // one-time CSR build (in-neighbor orientation), cached DESERIALIZED:
    // iterations touch primitive arrays directly, no columnar decode.
    // wtot <= 0 -> dangling (same guard as PageRank.run: NaN/Inf p would
    // silently poison the whole state through the gather sums)
    val outW = edges.groupBy("src").agg(
      (if (weighted) sum("w") else count(lit(1)).cast("double")).as("wtot"))
      .filter(col("wtot") > 0)
    val normBase = edges.join(outW, "src")
      .select(col("src"), col("dst"),
        ((if (weighted) col("w") else lit(1.0)) / col("wtot")).as("p"))
    val inAdj = normBase
      .groupBy("dst")
      .agg(collect_list(struct(col("src"), col("p"))).as("nbrs"))
      .select(col("dst"), col("nbrs.src").as("srcs"), col("nbrs.p").as("ps"))
      .as[InAdj]
      .rdd.persist(StorageLevel.MEMORY_ONLY)
    val nEdges = edges.count()

    // dangling vertices: no out-edges
    val hasOut = new java.util.BitSet(n)
    normBase.select("src").distinct().as[Long].collect().foreach(s => hasOut.set(s.toInt))

    val sc = spark.sparkContext
    var x = Array.fill(n)(1.0 / nVertices)
    val metrics = scala.collection.mutable.ArrayBuffer.empty[IterationMetrics]
    var iter = 0
    var delta = Double.MaxValue
    while (iter < cfg.maxIter && delta >= cfg.tol) {
      val t0 = System.nanoTime()
      val bc = sc.broadcast(x)
      // executor side: pure gather, one packed result block per partition
      val blocks = inAdj.mapPartitions { it =>
        val xs = bc.value
        val ids = new scala.collection.mutable.ArrayBuffer[Long](1 << 16)
        val gs = new scala.collection.mutable.ArrayBuffer[Double](1 << 16)
        it.foreach { a =>
          var s = 0.0
          var i = 0
          val m = a.srcs.length
          while (i < m) { s += a.ps(i) * xs(a.srcs(i).toInt); i += 1 }
          ids += a.dst; gs += s
        }
        Iterator.single((ids.toArray, gs.toArray))
      }.collect()
      // driver side: dangling mass, damping, delta — array math
      var dm = 0.0
      var v = 0
      while (v < n) { if (!hasOut.get(v)) dm += x(v); v += 1 }
      val base = (1.0 - damping) / nVertices + damping * dm / nVertices
      val next = Array.fill(n)(base)
      blocks.foreach { case (ids, gs) =>
        var i = 0
        while (i < ids.length) {
          next(ids(i).toInt) += damping * gs(i); i += 1
        }
      }
      delta = 0.0
      val l1 = cfg.norm == "l1" // scale-free convergence (see IterConfig)
      v = 0
      while (v < n) {
        val d = math.abs(next(v) - x(v))
        if (l1) delta += d else if (d > delta) delta = d
        v += 1
      }
      x = next
      bc.destroy()
      val secs = (System.nanoTime() - t0) / 1e9
      metrics += IterationMetrics(iter + 1, nEdges, secs,
        if (secs > 0) nEdges / secs else 0.0, delta, "BroadcastArray")
      iter += 1
      cfg.snapshotDir.foreach { dir =>
        if (iter % cfg.snapshotEvery == 0 || delta < cfg.tol)
          graft.exec.Iterate.snapshot(dir,
            stateDf(spark, x), iter, delta)
      }
    }
    inAdj.unpersist()
    PageRank.Result(stateDf(spark, x), metrics.toSeq,
      graft.exec.GatherStrategy.BroadcastState)
  }

  private def stateDf(spark: SparkSession, x: Array[Double]): DataFrame = {
    import spark.implicits._
    spark.sparkContext.parallelize(x.toIndexedSeq.zipWithIndex
      .map { case (v, i) => (i.toLong, v) })
      .toDF("id", "x")
  }
}
