package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Synth
import graft.algo.{ConnectedComponents, PageRank, SpMV, SpmvLayouts, TriangleCount}
import graft.exec.{GatherStrategy, IterConfig}
import graft.model.IterationMetrics
import graft.operators.{Ann, Dedup, TextAnalysis}

/** Benchmark main (driver contract): ONE JSON line on stdout (also written
  * to SPARK_GRAFT_BENCH_OUT, default bench_latest.json).
  *
  * Methodology (reference `include/abstractGraph.hpp:46-111` adapted to a
  * shared noisy box): every lane runs SPARK_GRAFT_BENCH_RUNS times
  * (default 3) in the same JVM with cache-evict + GC between runs;
  * `queries` reports the MIN wall (robust to outside-JVM load spikes,
  * measured 5x here), `stats` reports mean and the Student-t 95% CI
  * half-width over the runs (graft.bench.Measure.t95). `throughput` carries
  * per-iteration edges/sec, build/iterate splits, per-iteration
  * shuffle-bytes and task-skew for the iterative lanes (north-rule metrics).
  *
  * Headline lanes mirror the reference's measurement targets (SURVEY.md §6):
  * SpMV / PageRank throughput on the deterministic banded graph at V=2^17
  * (the reference's own scaling sweep tops out at V=2^17,
  * `/root/reference/src/main.cpp:124-162`), the 10^12-design ShuffleJoin
  * iteration as its own lane, plus the training-data operators on the
  * sf-dir document/embedding tables.
  */
object Bench {
  val BENCH_N: Long = 1L << 17
  val BENCH_L: Int = 16

  /** Steady-state per-iteration extras for an iterative lane. */
  private def iterExtras(name: String, all: Seq[IterationMetrics],
      warmDrop: Int = 2): Map[String, Double] = {
    val steady = if (all.length > warmDrop) all.drop(warmDrop) else all
    if (steady.isEmpty) return Map.empty
    val t = steady.map(_.seconds).sum
    val skews = steady.map(_.taskSkew).filterNot(_.isNaN)
    Map(
      s"${name}_edges_per_sec" ->
        (if (t > 0) steady.map(_.edges).sum / t else 0.0),
      s"${name}_iter_sec" -> t / steady.size,
      s"${name}_min_iter_sec" -> steady.map(_.seconds).min,
      s"${name}_shuffle_rw_mb_per_iter" ->
        steady.map(m => math.max(m.shuffleReadBytes, 0L) +
          math.max(m.shuffleWriteBytes, 0L)).sum / 1e6 / steady.size,
      s"${name}_task_skew" ->
        (if (skews.nonEmpty) skews.max else Double.NaN))
  }

  def benches(sfDir: String): Seq[(String, SparkSession => Map[String, Double])] = Seq(
    // THE baseline lane runs FIRST (VERDICT r04 #3): the box heats and
    // accumulates external load as a bench session ages, and the 403M-edge
    // one-time build is the number that must be reproducible in the
    // driver's own artifact. JIT/codegen is prepaid by the untimed warmup
    // in main() (a small PageRankArray run), so position one is not taxed.
    "pagerank_222_arrayf32_25it" -> { s =>
      // like-for-like vs the reference: float kernel (the reference's own
      // precision), V=2^22 x deg 96 (403M edges — the r02-comparable shape;
      // the reference headline is V=2^17 x deg ~131: same degree regime, V
      // scaled so the per-job scheduling floor amortizes the way the
      // reference amortizes 10 in-process calls per sample). Per-iteration
      // edges/sec here is the BASELINE.md comparison number; one-time CSR
      // build split out. Float CSR = 8 B/edge = 3.2 GB cached: fits the
      // bench JVM with the chunked block build.
      // 25 measured iterations (the lane name carries the count): this box
      // sees multi-minute external interference waves; min-iteration over a
      // longer steady sequence reliably samples a quiet window (measured
      // spread: 62-194 ms for the same code across waves).
      val t0 = System.nanoTime()
      val r = graft.algo.PageRankArray.run(s, Synth.band(s, 1L << 22, 96),
        1L << 22, cfg = IterConfig(tol = 0.0, maxIter = 25),
        floatPrecision = true)
      val wall = (System.nanoTime() - t0) / 1e9
      val iterSec = r.metrics.map(_.seconds).sum
      iterExtras("pagerank_222_arrayf32_25it", r.metrics) +
        ("pagerank_222_arrayf32_build_sec" -> (wall - iterSec)) +
        ("pagerank_222_arrayf32_iterate_sec" -> iterSec)
    },
    "spmv_217" -> { s =>
      SpMV(Synth.band(s, BENCH_N, BENCH_L), Synth.state(s, BENCH_N),
        None, GatherStrategy.ShuffleJoin).agg(sum("x")).head()
      Map.empty
    },
    "spmv_217_broadcast" -> { s =>
      SpMV(Synth.band(s, BENCH_N, BENCH_L), Synth.state(s, BENCH_N),
        None, GatherStrategy.BroadcastState).agg(sum("x")).head()
      Map.empty
    },
    "pagerank_217_10it" -> { s =>
      val r = PageRank.run(s, Synth.band(s, BENCH_N, BENCH_L), BENCH_N,
        cfg = IterConfig(tol = 0.0, maxIter = 10),
        strategy = GatherStrategy.Auto())
      iterExtras("pagerank_217_10it", r.metrics)
    },
    "pagerank_220_shuffle_5it" -> { s =>
      // the 10^12-vertex design path: state too big to broadcast, O(V)
      // state shuffle + O(E->V) partial-agg shuffle per iteration
      val r = PageRank.run(s, Synth.band(s, 1L << 20, 16), 1L << 20,
        cfg = IterConfig(tol = 0.0, maxIter = 5),
        strategy = GatherStrategy.ShuffleJoin)
      iterExtras("pagerank_220_shuffle_5it", r.metrics, warmDrop = 1)
    },
    "pagerank_220_array_10it" -> { s =>
      // the broadcast-array kernel (K6 mapping) at 2^20 x 16, with the
      // one-time CSR build split out of the per-iteration numbers
      val t0 = System.nanoTime()
      val r = graft.algo.PageRankArray.run(s, Synth.band(s, 1L << 20, 16),
        1L << 20, cfg = IterConfig(tol = 0.0, maxIter = 10))
      val wall = (System.nanoTime() - t0) / 1e9
      val iterSec = r.metrics.map(_.seconds).sum
      iterExtras("pagerank_220_array_10it", r.metrics) +
        ("pagerank_220_array_build_sec" -> (wall - iterSec)) +
        ("pagerank_220_array_iterate_sec" -> iterSec)
    },
    "spmv_scatter_220" -> { s =>
      // gather-locality lane: the scatter graph (reference S4/S5 exact
      // semantics) reads x at l RANDOM positions per row — the cache-hostile
      // regime the banded graph understresses. Same shape as spmv_217 but
      // bigger V so locality effects dominate the job floor.
      SpMV(Synth.scatter(s, 1L << 20, 16), Synth.state(s, 1L << 20),
        None, GatherStrategy.BroadcastState).agg(sum("x")).head()
      Map.empty
    },
    "graphx_pagerank_220_10it" -> { s =>
      // LIVE vendor-baseline lane (reference A3/K13: the harness calls MKL
      // in-process as the independent baseline, graphCSR.hpp:397-409; GraphX
      // is the vendor graph engine shipped on this classpath). Identical
      // graph, iteration count, JVM and cores as pagerank_220_array_10it —
      // the engine-vs-vendor delta is the lane's entire point, so the edge
      // list is handed to GraphX in its native RDD form.
      import org.apache.spark.graphx.{Edge => GXEdge, Graph => GXGraph}
      import s.implicits._
      val gxEdges = Synth.band(s, 1L << 20, 16)
        .select("src", "dst").as[(Long, Long)].rdd
        .map { case (a, b) => GXEdge(a, b, 1.0) }
      GXGraph.fromEdges(gxEdges, 0.0).staticPageRank(10).vertices.count()
      Map.empty
    },
    "mtx_spmv_skew" -> { s =>
      // reference-compat format lane: a deterministic SuiteSparse-shaped
      // SKEWED matrix (64 dense rows of 1024 nnz + uniform deg-8 tail)
      // written as .mtx, read back DISTRIBUTED (Mtx.read), one SpMV pass
      val path = skewMtxPath(s)
      val (h, edges) = graft.sources.Mtx.read(s, path)
      SpMV(edges, Synth.state(s, h.rows), None, GatherStrategy.ShuffleJoin)
        .agg(sum("x")).head()
      Map.empty
    },
    "mtx_real_lfat5" -> { s =>
      // REAL SuiteSparse fixture lane (VERDICT r04 missing #1): scan +
      // symmetric expansion + one SpMV over the committed Oberwolfach/LFAT5
      // Matrix Market text. 14x14 — a correctness/latency smoke lane, not a
      // throughput lane (the sandbox has no network for the reference's
      // multi-GB bench set; mtx_spmv_skew keeps the format's perf coverage).
      val (h, edges) = graft.sources.Mtx.fromLines(
        s, graft.SparkEntry.fixtureLines("LFAT5.mtx"))
      SpMV(edges, Synth.state(s, h.rows), None, GatherStrategy.BroadcastState)
        .agg(sum("x")).head()
      Map.empty
    },
    "spmv_ellpack_220" -> { s =>
      // C3+K14 on the const-degree band — the padded layout's DESIGN case
      // (width == degree == 96, pad_ratio exactly 1.0, the reference's
      // const-row-length synth family). Build split out; x10 pass
      // amortization over the SAME built layout (reference A2), state
      // packed once so per-pass walls time the kernel alone.
      ellpackLane(s, "spmv_ellpack_220", Synth.band(s, 1L << 20, 96),
        1L << 20, SpmvLayouts.Ellpack, passes = 10)
    },
    "spmv_ellpack_t_220" -> { s =>
      // C4 + the K5/K12 column-major sweep on the same input: the
      // transposed layout's sequential-stream claim, measured against
      // spmv_ellpack_220's row kernel.
      ellpackLane(s, "spmv_ellpack_t_220", Synth.band(s, 1L << 20, 96),
        1L << 20, SpmvLayouts.EllpackT, passes = 10)
    },
    "spmv_ellpack_skew" -> { s =>
      // the reference's OWN anti-pattern measurement (crankseg_2 pads
      // 13.4x, matricesWithELPACK.csv:4) reproduced in-engine: the same
      // 200k hub-skewed matrix mtx_spmv_skew runs on the CSR path pads to
      // width 1024 here (~122x slots/nnz) — pad_ratio and edges/s land in
      // the artifact next to the CSR lane's.
      val (h, edges) = graft.sources.Mtx.read(s, skewMtxPath(s))
      ellpackLane(s, "spmv_ellpack_skew", edges, h.rows,
        SpmvLayouts.Ellpack, passes = 5)
    },
    "spmv_dense_212" -> { s =>
      // C5+K15: V^2 dense tier at the largest sane V (2^12: 134 MB) — the
      // lane exists to measure the storage blow-up, not to recommend it.
      ellpackLane(s, "spmv_dense_212", Synth.band(s, 1L << 12, 96),
        1L << 12, SpmvLayouts.Dense, passes = 10)
    },
    "pagerank_220_convergence" -> { s =>
      // full convergence to 1e-6 — the BASELINE.json headline metric.
      // L1 (total-variation) norm: per-vertex scores scale as 1/V, so an
      // absolute linf 1e-6 is met after 2 steps at V=2^20 and instantly at
      // 10^12 pages; the L1 delta is scale-free and actually iterates.
      val r = graft.algo.PageRankArray.run(s, Synth.band(s, 1L << 20, 16),
        1L << 20, cfg = IterConfig(tol = 1e-6, maxIter = 100, norm = "l1"))
      val t = r.metrics.map(_.seconds).sum
      Map("pagerank_220_convergence_edges_per_sec" ->
        (if (t > 0) r.metrics.map(_.edges).sum / t else 0.0),
        "pagerank_220_convergence_iters" -> r.metrics.length.toDouble)
    },
    "cc_blocks_1m" -> { s =>
      // 16k components of 64 vertices: web-like component structure; the
      // pointer-jumping CC converges in ~4 rounds
      val r = ConnectedComponents.run(s, Synth.blocks(s, 1L << 20, 64),
        1L << 20, cfg = IterConfig(tol = 0.5, maxIter = 40))
      r.labels.count()
      iterExtras("cc_blocks_1m", r.metrics, warmDrop = 0) +
        ("cc_blocks_1m_rounds" -> r.metrics.length.toDouble) +
        // phase-1 union-find contraction: the one O(E) pass (its own row,
        // strategy "local-contract"; the remaining rounds see only the
        // contracted root graph)
        ("cc_blocks_1m_contract_sec" -> r.metrics.head.seconds)
    },
    "cc_array_1m" -> { s =>
      // SAME graph and semantics as cc_blocks_1m on the broadcast-array
      // (min-semiring) kernel: one zero-shuffle gather job per round +
      // driver-side pointer compression — the engine-vs-shuffle-path delta
      // is the lane's point (broadcast regime, V <= ~10^8)
      val r = graft.algo.ConnectedComponentsArray.run(
        s, Synth.blocks(s, 1L << 20, 64), 1L << 20, maxIter = 40)
      r.labels.count()
      iterExtras("cc_array_1m", r.metrics, warmDrop = 0) +
        ("cc_array_1m_rounds" -> r.metrics.length.toDouble)
    },
    "triangles_216" -> { s =>
      TriangleCount.countTriangles(s, Synth.band(s, 1L << 16, 8)); Map.empty
    },
    "lp_blocks_1m" -> { s =>
      // the fourth north-star algorithm on the same web-like component
      // structure as the CC lanes. NOTE (ADVICE r04): sync LP on chain
      // blocks does NOT converge by 10 rounds (labels shift one hop per
      // round and can 2-cycle — see LabelPropagation's scaladoc); the lane
      // measures 10 CAPPED rounds, i.e. fixed per-iteration cost, which is
      // exactly what the r04->r05 LP rework targets.
      val r = graft.algo.LabelPropagation.run(
        s, Synth.blocks(s, 1L << 20, 64), 1L << 20, maxIter = 10)
      r.labels.count()
      iterExtras("lp_blocks_1m", r.metrics, warmDrop = 0) +
        ("lp_blocks_1m_rounds" -> r.metrics.length.toDouble)
    },
    "lp_array_1m" -> { s =>
      // SAME graph, semantics, and 10-round cap on the broadcast-array
      // (mode-semiring) kernel — the r05 LP kernel tier (VERDICT r04 #2):
      // one zero-shuffle gather job per round, per-row sorted-scan modes
      val r = graft.algo.LabelPropagationArray.run(
        s, Synth.blocks(s, 1L << 20, 64), 1L << 20, maxIter = 10)
      r.labels.count()
      iterExtras("lp_array_1m", r.metrics, warmDrop = 0) +
        ("lp_array_1m_rounds" -> r.metrics.length.toDouble)
    },
    "dedup_minhash_sf" -> { s =>
      Dedup.minhashPairs(s.read.parquet(s"$sfDir/documents.parquet"),
        "doc_id", "text", k = 32, bands = 8, threshold = 0.5).count()
      Map.empty
    },
    "text_analyze_sf" -> { s =>
      TextAnalysis.analyze(s.read.parquet(s"$sfDir/documents.parquet"),
        "doc_id", "text").agg(sum("n_tokens")).head()
      Map.empty
    },
    "ann_brute_sf" -> { s =>
      val emb = s.read.parquet(s"$sfDir/embeddings.parquet")
      val q = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Ann.bruteForceTopK(emb, q, 10).count()
      Map.empty
    })

  /** Deterministic skewed .mtx fixture for the mtx lane, written once per
    * JVM (64 hub rows x 1024 nnz + deg-8 tail over 200k rows, ~1.7M nnz —
    * the head/tail skew shape of the reference's SuiteSparse set). */
  /** Shared shape of the padded/dense-layout lanes: build once (timed,
    * reported), pack the state once, run `passes` kernel passes, report the
    * min pass wall + layout accounting. */
  private def ellpackLane(
      s: SparkSession,
      name: String,
      edges: DataFrame,
      n: Long,
      layout: SpmvLayouts.Layout,
      passes: Int): Map[String, Double] = {
    val t0 = System.nanoTime()
    val built = SpmvLayouts.build(s, edges, n, layout)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val packed = {
      import s.implicits._
      val xs = new Array[Double](n.toInt)
      Synth.state(s, n).as[(Long, Double)].collect()
        .foreach { case (i, v) => xs(i.toInt) = v }
      graft.algo.PageRankArray.packD(xs)
    }
    var minPass = Double.MaxValue
    var i = 0
    while (i < passes) {
      val p0 = System.nanoTime()
      SpmvLayouts.spmvPacked(s, built, packed).agg(sum("x")).head()
      val dt = (System.nanoTime() - p0) / 1e9
      if (dt < minPass) minPass = dt
      i += 1
    }
    built.unpersist()
    Map(s"${name}_build_sec" -> buildSec,
      s"${name}_pad_ratio" -> built.padRatio,
      s"${name}_min_pass_sec" -> minPass,
      s"${name}_edges_per_sec" -> built.nnz / minPass)
  }

  private lazy val skewMtxFile: String = {
    val dir = if (java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get("/dev/shm"))) "/dev/shm" else sys.props("java.io.tmpdir")
    val p = java.nio.file.Paths.get(dir, "graft_skew_200k.mtx")
    val n = 200000
    val hubs = 64
    val hubDeg = 1024
    val tailDeg = 8
    val nnz = hubs.toLong * hubDeg + (n - hubs).toLong * tailDeg
    val w = java.nio.file.Files.newBufferedWriter(p)
    try {
      w.write("%%MatrixMarket matrix coordinate real general\n")
      w.write(s"$n $n $nnz\n")
      def mix(z0: Long): Long = { // splitmix64-style, deterministic
        var z = z0 + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^ (z >>> 31)
      }
      val sb = new java.lang.StringBuilder(64)
      var r = 1
      while (r <= n) {
        val deg = if (r <= hubs) hubDeg else tailDeg
        var j = 0
        while (j < deg) {
          val c = (java.lang.Long.remainderUnsigned(mix(r.toLong * 131071 + j), n) + 1).toInt
          sb.setLength(0)
          sb.append(r).append(' ').append(c).append(' ')
            .append(((r + j) % 97 + 1) / 97.0).append('\n')
          w.write(sb.toString)
          j += 1
        }
        r += 1
      }
    } finally w.close()
    p.toString
  }

  private def skewMtxPath(s: SparkSession): String = skewMtxFile

  def session(cpus: String): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // in-JVM local mode: AQE re-planning in iteration loops is pure
      // driver latency (see Iterate.loop) — measured 1.4-1.5x on the
      // iterative lanes; separate-JVM clusters keep AQE (default)
      .config("spark.graft.loop.aqe", "off")
      .config("spark.sql.session.timeZone", "UTC")
      // the array-kernel lanes broadcast a 16-33 MB incompressible packed
      // state per iteration: lz4 would add ~40 ms/iter for a ~0% ratio
      .config("spark.broadcast.compress", "false")
      // packed next-state slices return on the direct task-result fast path
      .config("spark.task.maxDirectResultSize", "64m")
      // the 3.2 GB MEMORY_ONLY CSR cache must survive build-time execution
      // pressure: a dropped block silently recomputes EVERY iteration
      .config("spark.memory.storageFraction", "0.65")
      .config("spark.ui.enabled", "false")
    // shuffle/spill on tmpfs when present: the shared disk on this box
    // throttles shuffle-heavy stages (a cluster's executors own their disks)
    if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm"))) {
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get("/dev/shm/graft-spark"))
      b.config("spark.local.dir", "/dev/shm/graft-spark")
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.bench.StageProf.attachIfEnabled(s.sparkContext)
    s
  }

  /** Lanes whose dominant cost is a one-time build amortized across many
    * measured iterations INSIDE the run (per-iteration stats come from
    * within-run iteration samples): whole-lane repeats add build time, not
    * statistical power, so they are capped below the adaptive ceiling. */
  private val laneCap: Map[String, Int] = Map(
    // two runs so one external burst cannot own the single committed
    // build/iterate numbers (extras come from the min-wall run)
    "pagerank_222_arrayf32_25it" -> 2,
    // noisy lanes EARN repeats: r03's mtx_spmv_skew (CI ±66 on mean 12.5)
    // and dedup_minhash_sf (±21) were capped before the adaptive t-criterion
    // could converge — caps raised so relCi < 0.15 can actually stop the
    // loop on a quiet box (VERDICT r03 #8)
    "mtx_spmv_skew" -> 5,
    "graphx_pagerank_220_10it" -> 6, // vendor lane: context, not a target
    "pagerank_220_shuffle_5it" -> 8,
    "pagerank_220_convergence" -> 5,
    "cc_blocks_1m" -> 5,
    "lp_blocks_1m" -> 5,
    "lp_array_1m" -> 5,
    "mtx_real_lfat5" -> 3,
    // the padded/dense layout lanes already amortize x10 passes per run
    "spmv_ellpack_220" -> 3,
    "spmv_ellpack_t_220" -> 3,
    "spmv_ellpack_skew" -> 3,
    "spmv_dense_212" -> 3,
    "dedup_minhash_sf" -> 5)

  /** Shared-box load gate (VERDICT r03 #8): one external load spike during
    * a lane run inflates that sample 3-5x, and a single such sample keeps
    * the t-CI above the stop criterion no matter how many repeats follow.
    * Field 4 of /proc/loadavg (running/total) is INSTANTANEOUS — unlike the
    * 1-min average, it is not polluted by our own just-finished lane — so
    * gate each run on (runnable - ourselves) being small. The total wait is
    * bounded by a whole-bench budget: on a busy box the bench still
    * completes, it just stops earning calm windows. */
  private var gateBudgetMs: Long = 600000L
  private def waitForQuietBox(maxRunnable: Int = 4): Unit = {
    while (gateBudgetMs > 0) {
      try {
        val f = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").split("\\s+")
        if (f(3).split("/")(0).toInt - 1 <= maxRunnable) return
      } catch { case _: Throwable => return }
      Thread.sleep(2000)
      gateBudgetMs -= 2000
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val maxRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXRUNS", "10").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_latest.json")
    val spark = session(cpus)
    // cache-warm discard (VERDICT r03 #8): pay the one-time fixture write
    // (mtx lane) and the parquet footer/OS-page-cache fill for the sf tables
    // OUTSIDE any timed lane, so run 1 of the first lanes isn't charged for
    // them and the adaptive CI criterion converges faster.
    locally {
      val _ = skewMtxFile
      Seq("documents", "embeddings").foreach { t =>
        try spark.read.parquet(s"$sfDir/$t.parquet").foreach(_ => ())
        catch { case _: Throwable => () }
      }
      // JIT/codegen warmup for the array kernels: the headline 403M-edge
      // lane now runs FIRST (its build number must be reproducible in this
      // artifact, VERDICT r04 #3), so the JIT tax is paid here, untimed,
      // on a small instance of the same code paths.
      try graft.algo.PageRankArray.run(spark, Synth.band(spark, 1L << 16, 16),
        1L << 16, cfg = IterConfig(tol = 0.0, maxIter = 3),
        floatPrecision = true)
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val stats = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double)]
    val extra = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val laneRuns = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val disturbed = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val allWalls = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val selected = // optional lane filter: `runMain graft.Bench cc_blocks_1m ...`
      if (args.isEmpty) benches(sfDir)
      else benches(sfDir).filter { case (n, _) => args.contains(n) }
    selected.foreach { case (name, fn) =>
      // a lane run that THROWS never enters walls (a short time-to-exception
      // must not masquerade as the lane's fastest run); failures surface in
      // the JSON `errors` map instead.
      val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
      var attempts = 0
      var failures = 0
      // per-run aux metrics: the lane's reported extras come from the
      // MIN-WALL run, not the last one — a load burst in the final repeat
      // must not overwrite a clean run's build/iteration numbers
      val auxByRun = scala.collection.mutable.ArrayBuffer.empty[Map[String, Double]]
      def once(): Unit = {
        // lane isolation within the shared JVM: evict stray cached relations
        // and let the heap settle, or earlier lanes' GC debt taxes later
        // ones (measured: 18 s lane ballooning to 240 s late in a run)
        spark.catalog.clearCache()
        System.gc()
        waitForQuietBox()
        attempts += 1
        val t0 = System.nanoTime()
        try {
          val aux = fn(spark)
          walls += (System.nanoTime() - t0) / 1e9
          auxByRun += aux
        } catch { case e: Throwable =>
          failures += 1
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          errors(name) = msg.replaceAll("[\"\\\\\n\r\t]", " ").take(300)
          System.err.println(s"[bench] $name failed: $msg")
        }
      }
      val cap = math.max(1, math.min(maxRuns, laneCap.getOrElse(name, maxRuns)))
      // Stats samples: drop run 1 (JIT/codegen/cache-fill — the reference
      // discards it too, abstractGraph.hpp:52-56), then CENSOR load-spiked
      // samples: on this shared box an external burst mid-run inflates one
      // sample 5-40x, and a single such sample keeps the t-CI above any
      // stop criterion forever (r03/r04 measured: one 190 s sample in a
      // 5 s lane). A sample > 2x the lane minimum is interference, not
      // engine variance (clean repeats cluster within ~1.5x of min on a
      // quiet box) — excluded from mean/CI, COUNTED in `disturbed` (full
      // transparency; raw walls are in the JSON), never affects the min.
      def cleanWarm: Seq[Double] = {
        val warm = if (walls.length >= 2) walls.drop(1).toSeq else walls.toSeq
        if (walls.isEmpty) Nil else warm.filter(_ <= 2 * walls.min)
      }
      // relative 95% CI of the clean warm runs (Measure's t-criterion):
      // noisy lanes EARN extra repeats up to `cap` instead of a fixed count
      def relCi: Double = {
        val w = cleanWarm
        if (w.length < 2) Double.MaxValue
        else {
          val (mean, _, variance) = graft.bench.Measure.stats(w)
          if (mean <= 0) 0.0
          else graft.bench.Measure.t95(w.length - 1) *
            math.sqrt(variance / w.length) / mean
        }
      }
      while (attempts < math.min(runs, cap)) once()
      while (attempts < cap && failures < 3 && relCi > 0.15) once()
      laneRuns(name) = walls.length
      if (walls.nonEmpty) {
        results(name) = walls.min
        allWalls(name) = walls.toSeq
        // extras from the min-wall (cleanest) run
        auxByRun(walls.indexOf(walls.min))
          .foreach { case (k, v) => if (!v.isNaN) extra(k) = v }
        // ...except one-time build times, which take the MIN across runs: a
        // load burst in the min-wall run's build phase must not mask a
        // clean build measured in another repeat (VERDICT r04 #3 — the
        // committed artifact's build_sec has to survive a loaded box)
        auxByRun.flatMap(_.toSeq).groupBy(_._1).foreach { case (k, vs) =>
          if (k.endsWith("_build_sec")) extra(k) = vs.map(_._2).min
        }
        val w = cleanWarm
        val warmAll = if (walls.length >= 2) walls.drop(1) else walls
        disturbed(name) = warmAll.length - w.length
        if (w.length >= 2) {
          val (mean, _, variance) = graft.bench.Measure.stats(w)
          val ci = graft.bench.Measure.t95(w.length - 1) *
            math.sqrt(variance / w.length)
          stats(name) = (mean, ci)
        }
      }
    }
    val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val th = extra.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val st = stats.map { case (k, (m, ci)) =>
      s""""$k":{"mean":$m,"ci95":$ci}""" }.mkString("{", ",", "}")
    val lr = laneRuns.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val db = disturbed.filter(_._2 > 0)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val ws = allWalls.map { case (k, v) =>
      s""""$k":[${v.map(x => f"$x%.3f").mkString(",")}]""" }.mkString("{", ",", "}")
    val er = errors.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val total = results.values.sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""throughput":$th,"stats":$st,"lane_runs":$lr,"disturbed":$db,""" +
      s""""walls":$ws,"errors":$er,"runs":$runs,"sf":"$sfDir","cores":$cpus}"""
    println(json)
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
    // repeat as the FINAL stdout line, after Spark's shutdown chatter: a
    // line-oriented parser can take either the first or the last '{' line;
    // the canonical artifact remains the file above (see README).
    println(json)
  }
}
