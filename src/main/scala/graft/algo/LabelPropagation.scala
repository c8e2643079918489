package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.exec.{IterConfig, Iterate}
import graft.graph.AdjacencyBuilder

/** Synchronous label propagation (community detection) over the symmetrized
  * link set. Every vertex starts with its own id as label; each iteration it
  * adopts the most frequent label among its neighbors, ties broken by the
  * SMALLEST label — fully deterministic (no randomized tie-break), so results
  * are exactly reproducible and exact-comparable (north rule "label
  * propagation assignments exact").
  *
  * Synchronous LP can 2-cycle on bipartite structures; the loop therefore
  * stops on no-change OR maxIter, and determinism guarantees the same final
  * assignment for the same (graph, maxIter).
  */
object LabelPropagation {

  final case class Result(
      labels: DataFrame, // (id, label)
      metrics: Seq[graft.model.IterationMetrics])

  def run(
      spark: SparkSession,
      edges: DataFrame,
      nVertices: Long,
      maxIter: Int = 20): Result = {
    // pinned on the per-round join key (see ConnectedComponents.run: only an
    // explicit repartition survives as a cached partitioning guarantee)
    val nParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val links = AdjacencyBuilder.symmetrize(edges)
      .repartition(nParts, col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nLinks = links.count()

    // labels as LONG end to end (no double-typed join keys — the CC r03
    // finding applies here identically)
    val vertices = spark.range(nVertices).toDF("id")
    val init = vertices.select(col("id"), col("id").as("x"))
    val cfg = IterConfig(tol = 0.5, maxIter = maxIter)

    val loop = Iterate.loop(init, cfg, nLinks, "sync-lp") { (state, _) =>
      // histogram of neighbor labels per vertex, gathered at src. SHJ hint:
      // links are cached pinned on dst; hash-build the O(V) state side
      // instead of sort-merging (re-sorting) the O(E) links every round.
      val hist = links
        .join(state.withColumnRenamed("id", "dst").hint("shuffle_hash"), "dst")
        .groupBy(col("src"), col("x").as("nbr_label"))
        .agg(count(lit(1)).as("cnt"))
      // argmax by (count desc, label asc): max of struct(cnt, -label)
      val winner = hist
        .groupBy("src")
        .agg(max(struct(col("cnt"), (-col("nbr_label")).as("neg"))).as("m"))
        .select(col("src").as("id"), (-col("m.neg")).as("new_label"))
      // left join (NOT a self-loop in links: a self-loop would add v's own
      // label to the neighbor histogram and change LP semantics)
      state.join(winner.hint("shuffle_hash"), Seq("id"), "left")
        .select(col("id"), coalesce(col("new_label"), col("x")).as("x"))
    }
    links.unpersist()
    Result(
      loop.state.select(col("id"), col("x").as("label")),
      loop.metrics)
  }
}
