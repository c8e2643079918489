package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import java.nio.{ByteBuffer, ByteOrder}
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
  * no per-iteration decode, no per-row object headers) against a state
  * array indexed by the dense vertex id; the inner loop is a multiply-add
  * stream at ~ns/edge.
  *
  * PER-ITERATION PROTOCOL (round 3: the measured bound was O(V) driver
  * serde, not the kernel — VERDICT r02 "What's wrong #1"):
  *   1. driver computes the dangling mass and the additive `base` term from
  *      the CURRENT state (an O(#dangling) loop, zero for link graphs with
  *      full out-degree), packs the state into a native-order byte[] (a
  *      bulk memcpy — serializer-independent, so no Kryo/JavaSerializer
  *      float-by-float loop), and torrent-broadcasts the bytes;
  *   2. each task unpacks the state ONCE PER EXECUTOR per iteration (a
  *      keyed cache — 32 local tasks share one 16 MB unpack), runs the CSR
  *      gather, applies base + damping INSIDE the task, computes its
  *      partial convergence delta against the old state, and returns a
  *      byte-packed slice of the NEXT state (≤ V/P values, under the 1 MB
  *      direct-task-result fast path at bench shapes);
  *   3. the driver scatters the slices (disjoint dst SETS: dsts are hash-
  *      partitioned across Spark partitions and each partition builds ONE
  *      block, so every dst lives in exactly one
  *      block — the scatter runs in parallel) and folds in the delta
  *      contributions of in-degree-0 vertices.
  * Driver work per iteration is two O(V) memcpys + an O(V/P)-parallel
  * scatter; everything O(E) and every reduction is executor-side.
  *
  * `floatPrecision = true` switches the whole pipeline (CSR values, state,
  * broadcast, slices) to Float — the REFERENCE'S OWN precision
  * (`graphCOO.hpp:20-21` uses float) — halving serde and kernel memory
  * traffic; use it for baseline-parity lanes, keep doubles (default) for
  * engine results (north rule compares allclose 1e-6 in double).
  *
  * Scope: the BROADCAST REGIME ONLY — V must fit in executor+driver memory
  * (~8 B/vertex, fine to ~10^8 locally). Beyond that, the DataFrame
  * ShuffleJoin path in [[PageRank]] is the 10^12-vertex design; this is the
  * small-V accelerator, selected explicitly (`bucketed`/strategy knobs in
  * the bench harness). Measured crossover context on this box (r02): DF
  * broadcast rebuilds the hashed relation per iteration (N→4N efficiency
  * 0.28 but 4.45 s/iter at 2^21) vs ShuffleJoin (0.84 efficiency, 16.9
  * s/iter) — hence [[graft.exec.GatherStrategy.Auto]]'s 4M-vertex switch.
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

  // ---- byte packing (bulk copies, serializer-independent). Pinned
  // LITTLE_ENDIAN, not nativeOrder: the packed state crosses JVM boundaries
  // (driver <-> executors), so the wire format must not depend on the
  // architecture either end happens to run on. On x86/ARM64 LE == native,
  // so the pin costs nothing on the hot path. ----

  private[graft] def packD(x: Array[Double]): Array[Byte] = {
    val b = new Array[Byte](x.length * 8)
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).asDoubleBuffer().put(x)
    b
  }
  private[graft] def unpackD(b: Array[Byte]): Array[Double] = {
    val x = new Array[Double](b.length / 8)
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).asDoubleBuffer().get(x)
    x
  }
  private[graft] def packF(x: Array[Float]): Array[Byte] = {
    val b = new Array[Byte](x.length * 4)
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).asFloatBuffer().put(x)
    b
  }
  private[graft] def unpackF(b: Array[Byte]): Array[Float] = {
    val x = new Array[Float](b.length / 4)
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).asFloatBuffer().get(x)
    x
  }

  /** Once-per-executor-per-iteration unpack of the broadcast state: all
    * tasks of one iteration share a single unpacked array (keyed by the
    * broadcast id, which is unique per iteration). A stale or foreign key
    * just re-unpacks — correctness never depends on a hit. */
  private object StateCache {
    private var key = -1L
    private var f: Array[Float] = _
    private var d: Array[Double] = _
    def floats(id: Long, bytes: Array[Byte]): Array[Float] = synchronized {
      if (key != id || f == null) { f = unpackF(bytes); d = null; key = id }
      f
    }
    def doubles(id: Long, bytes: Array[Byte]): Array[Double] = synchronized {
      if (key != id || d == null) { d = unpackD(bytes); f = null; key = id }
      d
    }
  }

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
    // Normalize join, smallest-shuffle physical shape by V:
    //   - V <= 8M (always true in this kernel's broadcast regime at bench
    //     shapes): BROADCAST the O(V) weight side — the O(E) edge stream
    //     never shuffles for the join at all (one O(E) shuffle remains in
    //     the whole build: the repartition-by-dst below);
    //   - larger V: shuffle_hash — the weight side builds the hash table;
    //     default SMJ would SORT the O(E) edge side just to normalize it
    //     (measured in the 403M-edge build wall).
    // persisted at its O(V) aggregate output: outW is consumed TWICE (the
    // normalize-join build side and the dangling-set collect below) — without
    // the persist each consumer re-runs the O(E) aggregation scan, two of
    // the four full edge passes in the r03 157 s build wall.
    val outW = edges.groupBy("src").agg(
      (if (weighted) sum("w") else count(lit(1)).cast("double")).as("wtot"))
      .filter(col("wtot") > 0) // wtot<=0 -> dangling, not NaN (see PageRank)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outWSide =
      if (nVertices <= (8L << 20)) broadcast(outW) else outW.hint("shuffle_hash")
    val normBase = edges.join(outWSide, "src")
      .select(col("src"), col("dst"),
        ((if (weighted) col("w") else lit(1.0)) / col("wtot")).as("p"))
    // hash-partitioned ROW STREAM -> CSR blocks, grouped WITHOUT a sort:
    // each dst lives in exactly ONE partition (hash repartition), so the
    // slice scatter stays a plain parallel assign, and within the partition
    // a two-pass histogram+scatter groups each dst's edges contiguously —
    // sortWithinPartitions was 85-90% of the whole 403M-edge build wall
    // (graft.bench.BuildProbe: repartition+drain 15.7 s vs +sort 148 s; a
    // comparison sort + spill-merge does O(E log E) disk-touching work the
    // CSR layout never needed, only GROUPING). Hash, not range:
    // repartitionByRange adds a whole sampling pass over the normalize join.
    // Per-task transients are primitive column buffers (~12-16 B/edge,
    // doubling growth) + the final CSR arrays — no per-edge objects, no
    // sort scratch, no spill files; partition sizing (nParts /
    // maxPartitionBytes) bounds them the same way it bounds the old sort.
    val nParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val parted = normBase
      .repartition(nParts, col("dst"))
      .select(col("dst"), col("src"), col("p"))
    val useFloat = floatPrecision
    // expected distinct dsts per partition (map sizing hint; grows if skewed)
    val expectRows = math.max(16, (nVertices / nParts).toInt)
    // queryExecution.toRdd (InternalRow), not .as[tuple].rdd: the typed path
    // allocates a Tuple3 + boxed fields PER EDGE — pure GC churn at 10^8+
    // edges; UnsafeRow field reads are allocation-free.
    val blocks = parted.queryExecution.toRdd.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        // --- pass 1: drain into compact primitive columns; open-addressing
        // dst -> dense row index (linear probing, fmix32, grow at 0.7 load).
        // rowIdxA stores the ROW INDEX per edge so pass 2 never re-hashes.
        var cap = Integer.highestOneBit(math.max(16, expectRows * 2) - 1) << 1
        var keys = new Array[Int](cap); java.util.Arrays.fill(keys, -1)
        var vals = new Array[Int](cap)
        var nRows = 0
        var dstsA = new Array[Int](math.max(16, expectRows))
        var counts = new Array[Int](math.max(16, expectRows))
        def fmix(h0: Int): Int = {
          var h = h0
          h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35
          h ^ (h >>> 16)
        }
        def grow(): Unit = {
          val nc = cap << 1
          val nk = new Array[Int](nc); java.util.Arrays.fill(nk, -1)
          val nv = new Array[Int](nc)
          var i = 0
          while (i < cap) {
            val k = keys(i)
            if (k >= 0) {
              var j = fmix(k) & (nc - 1)
              while (nk(j) >= 0) j = (j + 1) & (nc - 1)
              nk(j) = k; nv(j) = vals(i)
            }
            i += 1
          }
          keys = nk; vals = nv; cap = nc
        }
        def rowIdx(dst: Int): Int = {
          var j = fmix(dst) & (cap - 1)
          while (true) {
            val k = keys(j)
            if (k == dst) return vals(j)
            if (k < 0) {
              if ((nRows + 1) * 10 > cap * 7) { grow(); return rowIdx(dst) }
              keys(j) = dst; vals(j) = nRows
              if (nRows == dstsA.length) {
                dstsA = java.util.Arrays.copyOf(dstsA, nRows * 2)
                counts = java.util.Arrays.copyOf(counts, nRows * 2)
              }
              dstsA(nRows) = dst; counts(nRows) = 0
              nRows += 1
              return nRows - 1
            }
            j = (j + 1) & (cap - 1)
          }
          -1 // unreachable
        }
        var bufCap = 1 << 20
        var rowIdxA = new Array[Int](bufCap)
        var srcA = new Array[Int](bufCap)
        var pD = if (useFloat) Array.emptyDoubleArray else new Array[Double](bufCap)
        var pF = if (useFloat) new Array[Float](bufCap) else Array.emptyFloatArray
        var m = 0
        while (rows.hasNext) {
          val r = rows.next() // InternalRows are REUSED: copy fields now
          if (m == bufCap) {
            bufCap <<= 1
            rowIdxA = java.util.Arrays.copyOf(rowIdxA, bufCap)
            srcA = java.util.Arrays.copyOf(srcA, bufCap)
            if (useFloat) pF = java.util.Arrays.copyOf(pF, bufCap)
            else pD = java.util.Arrays.copyOf(pD, bufCap)
          }
          val ri = rowIdx(r.getLong(0).toInt)
          rowIdxA(m) = ri
          counts(ri) += 1
          srcA(m) = r.getLong(1).toInt
          if (useFloat) pF(m) = r.getDouble(2).toFloat else pD(m) = r.getDouble(2)
          m += 1
        }
        keys = null; vals = null // map done; free before allocating CSR
        // --- rowPtr = prefix sum; cursors advance as pass 2 scatters
        val rowPtr = new Array[Int](nRows + 1)
        var i = 0
        while (i < nRows) { rowPtr(i + 1) = rowPtr(i) + counts(i); i += 1 }
        val cur = java.util.Arrays.copyOf(rowPtr, nRows)
        val colInd = new Array[Int](m)
        val colVal = if (useFloat) Array.emptyDoubleArray else new Array[Double](m)
        val colValF = if (useFloat) new Array[Float](m) else Array.emptyFloatArray
        i = 0
        while (i < m) {
          val ri = rowIdxA(i); val pos = cur(ri); cur(ri) = pos + 1
          colInd(pos) = srcA(i)
          if (useFloat) colValF(pos) = pF(i) else colVal(pos) = pD(i)
          i += 1
        }
        val dsts = new Array[Long](nRows)
        i = 0
        while (i < nRows) { dsts(i) = dstsA(i).toLong; i += 1 }
        Iterator.single(CsrBlock(dsts, rowPtr, colInd, colVal, colValF))
      }
    }.persist(StorageLevel.MEMORY_ONLY)
    // truncate lineage: without this every per-iteration job re-serializes
    // the whole upstream Catalyst/RDD graph into its task binary (measured
    // ~200 ms/iteration at 403M edges — 3x the kernel+scheduling floor)
    blocks.localCheckpoint()
    // static per-partition dst ids, collected ONCE (collect preserves
    // partition order, so slice i below always pairs with dstsByPart(i))
    val dstsByPart: Array[Array[Long]] = blocks.map(_.dsts).collect()
    // edge count off the CACHED blocks (an O(P) job), not edges.count():
    // that was a third full pass over the un-materialized edge source.
    // Counts normalized edges (out-edges of wtot>0 srcs) — exactly the
    // edges each iteration processes, which is what the metric divides by.
    val nEdges = blocks.map(_.colInd.length.toLong).fold(0L)(_ + _)

    // dangling vertices (no positive-weight out-edge): their mass re-enters
    // uniformly each iteration. Precomputed as a flat id array so the
    // per-iteration driver loop is O(#dangling), not O(V).
    val hasOut = new java.util.BitSet(n)
    // outW IS the non-dangling set (positive out-weight per src): O(V) rows
    // from a map-side-combined aggregate — not an O(E) distinct shuffle
    outW.select("src").as[Long].collect().foreach(s => hasOut.set(s.toInt))
    outW.unpersist()
    val danglingIds: Array[Int] = {
      val b = scala.collection.mutable.ArrayBuffer.empty[Int]
      var v = 0
      while (v < n) { if (!hasOut.get(v)) b += v; v += 1 }
      b.toArray
    }
    // in-degree-0 vertices never appear in any slice: next(v) = base always;
    // their delta contribution is folded in driver-side (O(#uncovered)).
    val uncoveredIds: Array[Int] = {
      val covered = new java.util.BitSet(n)
      dstsByPart.foreach(_.foreach(d => covered.set(d.toInt)))
      val b = scala.collection.mutable.ArrayBuffer.empty[Int]
      var v = 0
      while (v < n) { if (!covered.get(v)) b += v; v += 1 }
      b.toArray
    }

    val metrics = scala.collection.mutable.ArrayBuffer.empty[IterationMetrics]
    val x: Array[Double] =
      if (useFloat) {
        val xf = iterateF(spark, blocks, dstsByPart, danglingIds, uncoveredIds,
          n, nVertices, damping, cfg, metrics, nEdges)
        val xd = new Array[Double](n)
        var i = 0
        while (i < n) { xd(i) = xf(i).toDouble; i += 1 }
        xd
      } else {
        iterateD(spark, blocks, dstsByPart, danglingIds, uncoveredIds,
          n, nVertices, damping, cfg, metrics, nEdges)
      }
    blocks.unpersist()
    PageRank.Result(stateDf(spark, x), metrics.toSeq,
      graft.exec.GatherStrategy.BroadcastState)
  }

  /** Double-precision iteration loop (engine default). */
  private def iterateD(
      spark: SparkSession,
      blocks: org.apache.spark.rdd.RDD[CsrBlock],
      dstsByPart: Array[Array[Long]],
      danglingIds: Array[Int],
      uncoveredIds: Array[Int],
      n: Int, nVertices: Long, damping: Double, cfg: IterConfig,
      metrics: scala.collection.mutable.ArrayBuffer[IterationMetrics],
      nEdges: Long): Array[Double] = {
    val sc = spark.sparkContext
    val l1 = cfg.norm == "l1" // scale-free convergence (see IterConfig)
    var x = Array.fill(n)(1.0 / nVertices)
    var next = new Array[Double](n)
    var iter = 0
    var delta = Double.MaxValue
    while (iter < cfg.maxIter && delta >= cfg.tol) {
      val t0 = System.nanoTime()
      var dm = 0.0
      var di = 0
      while (di < danglingIds.length) { dm += x(danglingIds(di)); di += 1 }
      val base = (1.0 - damping) / nVertices + damping * dm / nVertices
      val bc = sc.broadcast(packD(x))
      val bcId = bc.id
      val d = damping
      val slices = blocks.map { b =>
        val xs = StateCache.doubles(bcId, bc.value)
        val out = new Array[Double](b.dsts.length)
        var pd = 0.0
        var r0 = 0
        while (r0 < b.dsts.length) {
          var s = 0.0
          var i = b.rowPtr(r0); val end = b.rowPtr(r0 + 1)
          while (i < end) { s += b.colVal(i) * xs(b.colInd(i)); i += 1 }
          val nv = base + d * s
          out(r0) = nv
          val dd = math.abs(nv - xs(b.dsts(r0).toInt))
          if (l1) pd += dd else if (dd > pd) pd = dd
          r0 += 1
        }
        (packD(out), pd)
      }.collect()
      bc.destroy()
      java.util.Arrays.fill(next, base)
      val nx = next
      // every dst lives in exactly ONE block (hash repartition on dst,
      // one block per partition) -> blocks write disjoint index
      // sets and the scatter is a racefree parallel plain assign
      java.util.stream.IntStream.range(0, slices.length).parallel().forEach { pi =>
        val ids = dstsByPart(pi); val vs = unpackD(slices(pi)._1)
        var i = 0
        while (i < ids.length) { nx(ids(i).toInt) = vs(i); i += 1 }
      }
      delta = if (l1) slices.map(_._2).sum else slices.foldLeft(0.0)((a, s) => math.max(a, s._2))
      var ui = 0
      while (ui < uncoveredIds.length) {
        val dd = math.abs(base - x(uncoveredIds(ui)))
        if (l1) delta += dd else if (dd > delta) delta = dd
        ui += 1
      }
      val tmp = x; x = next; next = tmp
      val secs = (System.nanoTime() - t0) / 1e9
      metrics += IterationMetrics(iter + 1, nEdges, secs,
        if (secs > 0) nEdges / secs else 0.0, delta, "BroadcastArray")
      iter += 1
      cfg.snapshotDir.foreach { dir =>
        if (iter % cfg.snapshotEvery == 0 || delta < cfg.tol)
          graft.exec.Iterate.snapshot(dir, stateDf(spark, x), iter, delta)
      }
    }
    x
  }

  /** Float iteration loop — the reference's own precision; halves the
    * broadcast/slice serde and the kernel's value+state memory traffic. */
  private def iterateF(
      spark: SparkSession,
      blocks: org.apache.spark.rdd.RDD[CsrBlock],
      dstsByPart: Array[Array[Long]],
      danglingIds: Array[Int],
      uncoveredIds: Array[Int],
      n: Int, nVertices: Long, damping: Double, cfg: IterConfig,
      metrics: scala.collection.mutable.ArrayBuffer[IterationMetrics],
      nEdges: Long): Array[Float] = {
    val sc = spark.sparkContext
    val l1 = cfg.norm == "l1"
    var x = Array.fill(n)((1.0 / nVertices).toFloat)
    var next = new Array[Float](n)
    var iter = 0
    var delta = Double.MaxValue
    while (iter < cfg.maxIter && delta >= cfg.tol) {
      val t0 = System.nanoTime()
      var dm = 0.0
      var di = 0
      while (di < danglingIds.length) { dm += x(danglingIds(di)); di += 1 }
      val base = ((1.0 - damping) / nVertices + damping * dm / nVertices).toFloat
      val bc = sc.broadcast(packF(x))
      val bcId = bc.id
      val d = damping.toFloat
      val slices = blocks.map { b =>
        val xs = StateCache.floats(bcId, bc.value)
        val out = new Array[Float](b.dsts.length)
        var pd = 0.0
        var r0 = 0
        while (r0 < b.dsts.length) {
          var s = 0.0f
          var i = b.rowPtr(r0); val end = b.rowPtr(r0 + 1)
          while (i < end) { s += b.colValF(i) * xs(b.colInd(i)); i += 1 }
          val nv = base + d * s
          out(r0) = nv
          val dd = math.abs((nv - xs(b.dsts(r0).toInt)).toDouble)
          if (l1) pd += dd else if (dd > pd) pd = dd
          r0 += 1
        }
        (packF(out), pd)
      }.collect()
      bc.destroy()
      java.util.Arrays.fill(next, base)
      val nx = next
      // disjoint per-block dst sets (see iterateD) -> parallel plain assign
      java.util.stream.IntStream.range(0, slices.length).parallel().forEach { pi =>
        val ids = dstsByPart(pi); val vs = unpackF(slices(pi)._1)
        var i = 0
        while (i < ids.length) { nx(ids(i).toInt) = vs(i); i += 1 }
      }
      delta = if (l1) slices.map(_._2).sum else slices.foldLeft(0.0)((a, s) => math.max(a, s._2))
      var ui = 0
      while (ui < uncoveredIds.length) {
        val dd = math.abs((base - x(uncoveredIds(ui))).toDouble)
        if (l1) delta += dd else if (dd > delta) delta = dd
        ui += 1
      }
      val tmp = x; x = next; next = tmp
      val secs = (System.nanoTime() - t0) / 1e9
      metrics += IterationMetrics(iter + 1, nEdges, secs,
        if (secs > 0) nEdges / secs else 0.0, delta, "BroadcastArrayF32")
      iter += 1
      cfg.snapshotDir.foreach { dir =>
        if (iter % cfg.snapshotEvery == 0 || delta < cfg.tol) {
          val xd = new Array[Double](n)
          var i = 0
          while (i < n) { xd(i) = x(i).toDouble; i += 1 }
          graft.exec.Iterate.snapshot(dir, stateDf(spark, xd), iter, delta)
        }
      }
    }
    x
  }

  /** Result handoff WITHOUT driver-side boxing: the old
    * `parallelize(x.zipWithIndex)` allocated O(V) Tuple2 + boxed Double on
    * the driver heap — a memory spike at the kernel's ~10^8-vertex ceiling
    * (VERDICT r03 "What's wrong #3"). Here the state ships once as the
    * already-packed byte[] (torrent broadcast), and each `range` partition
    * reads its values straight out of the buffer — O(V/P) rows per task,
    * zero driver-side per-vertex allocation. */
  private def stateDf(spark: SparkSession, x: Array[Double]): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(packD(x))
    spark.range(x.length.toLong).as[Long].mapPartitions { it =>
      val bb = ByteBuffer.wrap(bc.value).order(ByteOrder.LITTLE_ENDIAN)
      it.map(i => (i, bb.getDouble(8 * i.toInt)))
    }.toDF("id", "x")
  }
}
