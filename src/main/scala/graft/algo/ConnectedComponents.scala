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
  *   propagate: label'[v] = min over {v} ∪ neighbors(v) of label[·]
  *   shortcut : label''[v] = label'[label'[v]]   (twice)
  * Plain propagation needs diameter rounds — fatal on high-diameter graphs
  * (a 10^4-long chain = 10^4 shuffles). The Shiloach-Vishkin-style shortcut
  * join (labels are vertex ids, so the label table can be joined with
  * itself) collapses chains geometrically: O(log d) rounds, each costing one
  * O(E) edge join plus two O(V) self-joins. Labels are monotone
  * non-increasing, so the fixpoint is exactly the min-id labeling.
  *
  * Per-round physical plan (VERDICT r03 "What's wrong #2" rework):
  *   - labels are LongType end to end — the join/aggregate keys are longs,
  *     never a double-typed column;
  *   - a self-loop per vertex is appended to the cached link set, so the
  *     propagate aggregation covers EVERY vertex and min(own, neighbors)
  *     falls out of one groupBy — the old per-round O(V) completion
  *     left-join is gone (same move as PageRank.run's zero self-edges);
  *   - every per-round join is `shuffle_hash`-hinted: sort-merge would
  *     re-SORT the O(E) cached links every round (the measured Gather
  *     finding); SHJ streams the cached links against an O(V) hash build,
  *     and with links pinned repartition(n, dst) only the state moves.
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
    val selfLoops = spark.range(nVertices)
      .select(col("id").as("src"), col("id").as("dst"))
    val links = AdjacencyBuilder.symmetrize(edges).union(selfLoops)
      .repartition(nParts, col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // real links only for the throughput metric (self-loops are plumbing)
    val nLinks = links.count() - nVertices

    val init = spark.range(nVertices).select(col("id"), col("id").as("x"))

    // one pointer-jump: label[v] <- label[label[v]] (labels ARE vertex ids).
    // Inner join is total: every label value is a vertex id present on the
    // right side. Both sides O(V); hash-build the renamed mapping side.
    def shortcut(labels: DataFrame): DataFrame =
      labels
        .join(labels.select(col("id").as("x"), col("x").as("x2"))
          .hint("shuffle_hash"), Seq("x"))
        .select(col("id"), col("x2").as("x"))

    // labels are componentwise MONOTONE non-increasing, so convergence
    // ("no label changed") is exactly "sum(labels) unchanged": the loop's
    // join-free "msum" delta replaces the old per-round old-vs-new O(V)
    // convergence join. (NOT valid for LP, whose labels can swap.)
    val ccCfg = if (cfg.tol > 0) cfg.copy(norm = "msum") else cfg

    // a self-join evaluates its input subtree on BOTH sides: persist each
    // stage inside the round or the propagate join runs 4x per round.
    var stale: Seq[DataFrame] = Nil
    val loop = Iterate.loop(init, ccCfg, nLinks, "min-prop+shortcut") {
      (state, _) =>
        stale.foreach(_.unpersist()); stale = Nil
        // min label over {v} ∪ neighbors, gathered at src in ONE aggregate
        // (the self-loop contributes v's own label to its group)
        val propagated = links
          .join(state.withColumnRenamed("id", "dst").hint("shuffle_hash"), "dst")
          .groupBy("src").agg(min("x").as("x"))
          .withColumnRenamed("src", "id")
          .persist(StorageLevel.MEMORY_AND_DISK)
        val jumped = shortcut(propagated).persist(StorageLevel.MEMORY_AND_DISK)
        stale = Seq(propagated, jumped)
        shortcut(jumped)
    }
    stale.foreach(_.unpersist())
    links.unpersist()
    Result(loop.state.select(col("id"), col("x").as("label")), loop.metrics)
  }
}
