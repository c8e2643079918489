package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.exec.{IterConfig, Iterate}
import graft.graph.AdjacencyBuilder

/** Connected components by min-label propagation WITH pointer jumping over
  * the symmetrized link set (undirected semantics — the reference's symmetric
  * .mtx expansion, `/root/reference/lib/MMIO/mmio_cpp.h:40-48`, is the same
  * move). Component label = smallest vertex id in the component; exact-match
  * requirement per the north rule.
  *
  * Each round:
  *   propagate: label'[v] = min(label[v], min over neighbors u of label[u])
  *   shortcut : label''[v] = label'[label'[v]]   (twice)
  * Plain propagation needs diameter rounds — fatal on high-diameter graphs
  * (a 10^4-long chain = 10^4 shuffles). The Shiloach-Vishkin-style shortcut
  * join (labels are vertex ids, so the label table can be joined with
  * itself) collapses chains geometrically: O(log d) rounds, each costing one
  * O(E) edge join plus two O(V) self-joins. Labels are monotone
  * non-increasing, so the fixpoint is exactly the min-id labeling.
  */
object ConnectedComponents {

  final case class Result(
      labels: DataFrame, // (id, label) both Long
      metrics: Seq[graft.model.IterationMetrics])

  def run(
      spark: SparkSession,
      edges: DataFrame,
      nVertices: Long,
      cfg: IterConfig = IterConfig(tol = 0.5, maxIter = 200)): Result = {
    // one-time build, pinned on the per-round join key: ONLY an explicit
    // repartition(n, col) survives as a cached partitioning guarantee
    // (groupBy/join-derived exchanges get AQE-coalesced and every round
    // silently re-shuffles all O(E) links — the measured PageRank finding,
    // PageRank.scala:61-64; at web scale that is the difference between an
    // O(V) and an O(E) per-round shuffle).
    val nParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val links = AdjacencyBuilder.symmetrize(edges)
      .repartition(nParts, col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nLinks = links.count()

    val vertices = spark.range(nVertices).toDF("id")
    // labels carried as double in the loop ("x") for the generic delta;
    // exact for ids < 2^53.
    val init = vertices.select(col("id"), col("id").cast("double").as("x"))

    // one pointer-jump: label[v] <- label[label[v]] (labels ARE vertex ids)
    def shortcut(labels: DataFrame): DataFrame =
      labels
        .join(labels.select(col("id").cast("double").as("x"),
          col("x").as("x2")), Seq("x"))
        .select(col("id"), col("x2").as("x"))

    // a self-join evaluates its input subtree on BOTH sides: persist each
    // stage inside the round or the propagate join runs 4x per round.
    var stale: Seq[DataFrame] = Nil
    val loop = Iterate.loop(init, cfg, nLinks, "min-prop+shortcut") {
      (state, _) =>
        stale.foreach(_.unpersist()); stale = Nil
        // neighbor minimum gathered at src: links (src,dst) x state(dst)
        val nbrMin = links
          .join(state.withColumnRenamed("id", "dst"), "dst")
          .groupBy("src").agg(min("x").as("nbr_min"))
          .withColumnRenamed("src", "id")
        val propagated = state.join(nbrMin, Seq("id"), "left")
          .select(col("id"),
            least(col("x"), coalesce(col("nbr_min"), col("x"))).as("x"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val jumped = shortcut(propagated).persist(StorageLevel.MEMORY_AND_DISK)
        stale = Seq(propagated, jumped)
        shortcut(jumped)
    }
    stale.foreach(_.unpersist())
    links.unpersist()
    Result(
      loop.state.select(col("id"), col("x").cast("long").as("label")),
      loop.metrics)
  }
}
