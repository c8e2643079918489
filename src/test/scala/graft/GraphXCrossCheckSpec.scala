package graft

import org.apache.spark.graphx.{Edge => GXEdge, Graph => GXGraph}
import org.apache.spark.graphx.lib.{LabelPropagation => GXLabelPropagation}
import graft.sources.Synth
import graft.algo.{ConnectedComponents, LabelPropagation, PageRank}
import graft.exec.IterConfig

/** Vendor cross-check (reference K13: MKL as the independent oracle,
  * `/root/reference/include/graphCSR.hpp:397-409`): GraphX — shipped on the
  * classpath — computes the same quantities by entirely different code
  * (RDD/Pregel). Test-only; the engine itself stays Dataset-native. */
class GraphXCrossCheckSpec extends SparkSuite {
  import spark.implicits._

  test("PageRank matches GraphX staticPageRank (unweighted, no dangling)") {
    val n = 512; val l = 8; val iters = 30
    val edges = Synth.band(spark, n, l)
    // ours: probability-normalized; GraphX static: x = 0.15 + 0.85*sum,
    // which is n * ours when the graph has no dangling vertices.
    val ours = PageRank.run(spark, edges, n, weighted = false,
      cfg = IterConfig(tol = 0.0, maxIter = iters))
      .state.as[(Long, Double)].collect().toMap
    val gxEdges = spark.sparkContext.parallelize(
      edges.select("src", "dst").as[(Long, Long)].collect().toSeq
        .map { case (s, d) => GXEdge(s, d, 1.0) })
    val gx = GXGraph.fromEdges(gxEdges, 0.0)
      .staticPageRank(iters).vertices.collect().toMap
    (0L until n).foreach { v =>
      assert(math.abs(ours(v) * n - gx(v)) < 1e-6 * math.max(1.0, gx(v)),
        s"vertex $v: ours=${ours(v) * n} graphx=${gx(v)}")
    }
  }

  test("label propagation matches GraphX on a tie-free graph") {
    // Synchronous LP's tie-break is IMPLEMENTATION-DEFINED: at step 1 every
    // neighbor label is distinct, so any vertex of degree >= 2 sees an
    // all-ones histogram and the winner depends on the tie rule (ours:
    // smallest label — deterministic; GraphX: maxBy over map iteration
    // order — arbitrary under ties). The maximal graph class where the
    // cross-check is well-defined is therefore degree-1 everywhere: a
    // PERFECT MATCHING, where every histogram is a singleton at every step
    // and both engines must produce the identical label trajectory
    // (pairs swap labels each step; odd maxIter ends on the swapped state,
    // catching off-by-one-step bugs). Pairs (i, n-1-i) span the id space,
    // so label values genuinely move. The community-structure semantics on
    // tied graphs stay covered by the deterministic DuckDB unrolled-SQL
    // oracle (lp_blocks), where OUR tie rule is replicated in SQL.
    val n = 200L
    val steps = 7
    val pairs = spark.range(n / 2)
      .selectExpr("id AS src", s"${n - 1} - id AS dst", "1.0 AS w")
    val ours = LabelPropagation.run(spark, pairs, n, maxIter = steps)
      .labels.as[(Long, Long)].collect().toMap
    val gxEdges = spark.sparkContext.parallelize(
      pairs.select("src", "dst").as[(Long, Long)].collect().toSeq
        .map { case (s, d) => GXEdge(s, d, 1) })
    // GraphX LP already sends messages in BOTH directions per edge
    // (undirected semantics), matching our internal symmetrization.
    val gx = GXLabelPropagation
      .run(GXGraph.fromEdges(gxEdges, 0L), steps).vertices.collect().toMap
    assert(ours.size == n)
    gx.foreach { case (v, label) =>
      assert(ours(v) == label, s"vertex $v: ours=${ours(v)} graphx=$label")
    }
    // sanity: the matching actually swapped labels (odd step count)
    assert(ours(0L) == n - 1 && ours(n - 1) == 0L)
  }

  test("connected components match GraphX") {
    val n = 300
    val edges = Synth.skew(spark, n)
    val ours = ConnectedComponents.run(spark, edges, n)
      .labels.as[(Long, Long)].collect().toMap
    val gxEdges = spark.sparkContext.parallelize(
      edges.select("src", "dst").as[(Long, Long)].collect().toSeq
        .map { case (s, d) => GXEdge(s, d, 1) })
    val gx = GXGraph.fromEdges(gxEdges, 0)
      .connectedComponents().vertices.collect().toMap
    // GraphX labels = min vertex id in component, same convention
    gx.foreach { case (v, label) =>
      assert(ours(v) == label, s"vertex $v: ours=${ours(v)} graphx=$label")
    }
  }
}
