package graft

import org.apache.spark.graphx.{Edge => GXEdge, Graph => GXGraph}
import graft.sources.Synth
import graft.algo.{ConnectedComponents, PageRank}
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
