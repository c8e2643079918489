package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.exec.{IterConfig, Iterate}
import graft.graph.AdjacencyBuilder

/** Connected components by iterated min-label propagation over the
  * symmetrized link set (undirected semantics — the reference's symmetric
  * .mtx expansion, `/root/reference/lib/MMIO/mmio_cpp.h:40-48`, is the same
  * move). Component label = smallest vertex id in the component; exact-match
  * requirement per the north rule.
  *
  * label'[v] = min(label[v], min over neighbors u of label[u])
  * Monotone non-increasing -> converges in diameter iterations; web graphs
  * have small effective diameter, and each iteration moves only O(V) label
  * state against the persisted, src-partitioned link table.
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
    val links = AdjacencyBuilder.symmetrize(edges)
      .repartition(col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nLinks = links.count()

    val vertices = spark.range(nVertices).toDF("id")
    // labels carried as double in the loop ("x") for the generic delta;
    // exact for ids < 2^53.
    val init = vertices.select(col("id"), col("id").cast("double").as("x"))

    val loop = Iterate.loop(init, cfg, nLinks, "min-propagation") {
      (state, _) =>
        // neighbor minimum gathered at src: links (src,dst) x state(dst)
        val nbrMin = links
          .join(state.withColumnRenamed("id", "dst"), "dst")
          .groupBy("src").agg(min("x").as("nbr_min"))
          .withColumnRenamed("src", "id")
        state.join(nbrMin, Seq("id"), "left")
          .select(col("id"),
            least(col("x"), coalesce(col("nbr_min"), col("x"))).as("x"))
    }
    links.unpersist()
    Result(
      loop.state.select(col("id"), col("x").cast("long").as("label")),
      loop.metrics)
  }
}
