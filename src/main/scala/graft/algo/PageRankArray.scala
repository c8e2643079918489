package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.exec.IterConfig
import graft.model.IterationMetrics

/** PageRank over per-partition FLAT CSR blocks with a broadcast primitive-
  * array state — the reference's K6 broadcast-gather kernel
  * (`/root/reference/include/graphCSR.hpp:215-249`: per row, gather
  * `weights[colInd[j]]` and multiply-accumulate) expressed as a typed
  * per-partition loop over exactly the reference's CSR layout
  * (rowPtr/colInd/val, `include/graphCSR.hpp:382-384`).
  *
  * WHY this exists (SURVEY.md §4.1 committed to "primitive-map gather in
  * typed mapPartitions ONLY if the codegen aggregate proves slow"): the
  * DataFrame join+aggregate iteration pays row serialization, hash-table
  * inserts, and cache decompression per edge. This kernel iterates flat
  * primitive arrays (one CSR block per partition, RDD MEMORY_ONLY cache —
  * no per-iteration decode, no per-row object headers) against an
  * Array[Double] state indexed by the dense vertex id; the inner loop is a
  * multiply-add stream at ~ns/edge.
  *
  * `floatPrecision = true` switches colVal/state to Float — the REFERENCE'S
  * OWN precision (`graphCOO.hpp:20-21` uses float) — halving kernel memory
  * traffic; use it for baseline-parity lanes, keep doubles (default) for
  * engine results (north rule compares allclose 1e-6 in double).
  *
  * Scope: the BROADCAST REGIME ONLY — V must fit in executor+driver memory
  * (~8 B/vertex, fine to ~10^8 locally). Beyond that, the DataFrame
  * ShuffleJoin path in [[PageRank]] is the 10^12-vertex design; this is the
  * small-V accelerator, selected explicitly (`bucketed`/strategy knobs in
  * the bench harness).
  */
object PageRankArray {

  /** One partition's in-adjacency as flat CSR: row r gathers from
    * colInd[rowPtr(r) until rowPtr(r+1)] with weights colVal (double) or
    * colValF (float) — exactly one of the two is populated. */
  final case class CsrBlock(
      dsts: Array[Long],
      rowPtr: Array[Int],
      colInd: Array[Int],
      colVal: Array[Double],
      colValF: Array[Float])

  def run(
      spark: SparkSession,
      edges: DataFrame,
      nVertices: Long,
      damping: Double = 0.85,
      cfg: IterConfig = IterConfig(),
      weighted: Boolean = true,
      floatPrecision: Boolean = false): PageRank.Result = {
    require(nVertices <= Int.MaxValue, "broadcast-array kernel needs V <= 2^31")
    val n = nVertices.toInt
    import spark.implicits._

    // one-time CSR build (in-neighbor orientation; reference C1+C2), cached
    // DESERIALIZED as one flat block per partition: iterations touch
    // primitive arrays directly — no columnar decode, no object-per-vertex.
    val outW = edges.groupBy("src").agg(
      (if (weighted) sum("w") else count(lit(1)).cast("double")).as("wtot"))
      .filter(col("wtot") > 0) // wtot<=0 -> dangling, not NaN (see PageRank)
    val normBase = edges.join(outW, "src")
      .select(col("src"), col("dst"),
        ((if (weighted) col("w") else lit(1.0)) / col("wtot")).as("p"))
    // range-partitioned + dst-sorted blocks: the driver-side merge then
    // writes near-sequentially, and the per-partition dst-id arrays are
    // STATIC — collected once below, never re-shipped per iteration (halves
    // the per-iteration collect volume, the measured serial bottleneck).
    val nParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val grouped = normBase
      .groupBy("dst")
      .agg(collect_list(struct(col("src"), col("p"))).as("nbrs"))
      .select(col("dst"), col("nbrs.src").as("srcs"), col("nbrs.p").as("ps"))
      .repartitionByRange(nParts, col("dst"))
      .sortWithinPartitions("dst")
      .as[(Long, Array[Long], Array[Double])]
    val useFloat = floatPrecision
    val blocks = grouped.rdd.mapPartitions { it =>
      val dsts = new scala.collection.mutable.ArrayBuffer[Long](1 << 16)
      val rowPtr = new scala.collection.mutable.ArrayBuffer[Int](1 << 16)
      var colInd = new Array[Int](1 << 16)
      var colVal = new Array[Double](if (useFloat) 0 else 1 << 16)
      var colValF = new Array[Float](if (useFloat) 1 << 16 else 0)
      var m = 0
      rowPtr += 0
      it.foreach { case (dst, srcs, ps) =>
        val k = srcs.length
        if (m + k > colInd.length) {
          val cap = math.max(colInd.length * 2, m + k)
          colInd = java.util.Arrays.copyOf(colInd, cap)
          if (useFloat) colValF = java.util.Arrays.copyOf(colValF, cap)
          else colVal = java.util.Arrays.copyOf(colVal, cap)
        }
        var i = 0
        while (i < k) {
          colInd(m) = srcs(i).toInt
          if (useFloat) colValF(m) = ps(i).toFloat else colVal(m) = ps(i)
          m += 1; i += 1
        }
        dsts += dst
        rowPtr += m
      }
      Iterator.single(CsrBlock(dsts.toArray, rowPtr.toArray,
        java.util.Arrays.copyOf(colInd, m),
        if (useFloat) Array.emptyDoubleArray else java.util.Arrays.copyOf(colVal, m),
        if (useFloat) java.util.Arrays.copyOf(colValF, m) else Array.emptyFloatArray))
    }.persist(StorageLevel.MEMORY_ONLY)
    // static per-partition dst ids, collected ONCE (collect preserves
    // partition order, so index i here pairs with result i per iteration)
    val dstsByPart: Array[Array[Long]] = blocks.map(_.dsts).collect()
    val nEdges = edges.count()

    // dangling vertices: no (positive-weight) out-edges
    val hasOut = new java.util.BitSet(n)
    normBase.select("src").distinct().as[Long].collect().foreach(s => hasOut.set(s.toInt))

    val sc = spark.sparkContext
    var x = Array.fill(n)(1.0 / nVertices)
    val metrics = scala.collection.mutable.ArrayBuffer.empty[IterationMetrics]
    var iter = 0
    var delta = Double.MaxValue
    while (iter < cfg.maxIter && delta >= cfg.tol) {
      val t0 = System.nanoTime()
      // executor side: pure CSR gather, one packed result block per partition
      val gathered =
        if (useFloat) {
          val xf = new Array[Float](n)
          var i = 0
          while (i < n) { xf(i) = x(i).toFloat; i += 1 }
          val bc = sc.broadcast(xf)
          val r = blocks.map { b =>
            val xs = bc.value
            val out = new Array[Double](b.dsts.length)
            var r0 = 0
            while (r0 < b.dsts.length) {
              var s = 0.0f
              var i = b.rowPtr(r0); val end = b.rowPtr(r0 + 1)
              while (i < end) { s += b.colValF(i) * xs(b.colInd(i)); i += 1 }
              out(r0) = s.toDouble; r0 += 1
            }
            out
          }.collect()
          bc.destroy()
          r
        } else {
          val bc = sc.broadcast(x)
          val r = blocks.map { b =>
            val xs = bc.value
            val out = new Array[Double](b.dsts.length)
            var r0 = 0
            while (r0 < b.dsts.length) {
              var s = 0.0
              var i = b.rowPtr(r0); val end = b.rowPtr(r0 + 1)
              while (i < end) { s += b.colVal(i) * xs(b.colInd(i)); i += 1 }
              out(r0) = s; r0 += 1
            }
            out
          }.collect()
          bc.destroy()
          r
        }
      // driver side: dangling mass, damping, delta — array math
      var dm = 0.0
      var v = 0
      while (v < n) { if (!hasOut.get(v)) dm += x(v); v += 1 }
      val base = (1.0 - damping) / nVertices + damping * dm / nVertices
      val next = Array.fill(n)(base)
      var pi = 0
      while (pi < gathered.length) {
        val ids = dstsByPart(pi); val gs = gathered(pi)
        var i = 0
        while (i < ids.length) {
          next(ids(i).toInt) += damping * gs(i); i += 1
        }
        pi += 1
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
      val secs = (System.nanoTime() - t0) / 1e9
      metrics += IterationMetrics(iter + 1, nEdges, secs,
        if (secs > 0) nEdges / secs else 0.0, delta,
        if (useFloat) "BroadcastArrayF32" else "BroadcastArray")
      iter += 1
      cfg.snapshotDir.foreach { dir =>
        if (iter % cfg.snapshotEvery == 0 || delta < cfg.tol)
          graft.exec.Iterate.snapshot(dir,
            stateDf(spark, x), iter, delta)
      }
    }
    blocks.unpersist()
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
