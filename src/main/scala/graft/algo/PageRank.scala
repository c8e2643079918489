package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.exec.{Gather, GatherStrategy, IterConfig, Iterate, LoopResult}

/** PageRank as iterated gather-scatter over a persisted, pre-normalized,
  * src-partitioned contribution table.
  *
  * One iteration IS the reference's SpMV (its kernel is "the gather-scatter
  * kernel of one PageRank iteration", SURVEY.md TL;DR) in the transposed
  * orientation (reference C2): contributions flow src -> dst, aggregated per
  * dst. The reference stops at a single application; the north rule requires
  * full damped, dangling-aware power iteration to 1e-6 convergence.
  *
  * Scale design (per SURVEY.md §4.2):
  *   - edges are normalized ONCE (p = w / Σ_out w, or 1/outdeg unweighted) and
  *     persisted hash-partitioned by src: iterations never move edges, only
  *     the O(V) state (shuffle strategy) or nothing (broadcast strategy);
  *   - dangling mass is recovered from mass conservation (1 - Σ contributions)
  *     — no per-iteration dangling join;
  *   - contribution aggregation partial-aggregates map-side before the O(V)
  *     final shuffle;
  *   - lineage checkpointed, state persisted/unpersisted per generation.
  *
  * Scores sum to 1.0 (probability form):
  *   x'[v] = (1-d)/n + d * (Σ_{u->v} p(u,v)·x[u] + danglingMass/n)
  */
object PageRank {

  final case class Result(
      state: DataFrame,
      metrics: Seq[graft.model.IterationMetrics],
      strategy: GatherStrategy)

  def run(
      spark: SparkSession,
      edges: DataFrame,
      nVertices: Long,
      damping: Double = 0.85,
      cfg: IterConfig = IterConfig(),
      weighted: Boolean = true,
      strategy: GatherStrategy = GatherStrategy.Auto(),
      resumeFrom: Option[(DataFrame, Int)] = None): Result = {
    val resolved = GatherStrategy.resolve(strategy, nVertices)
    val stratName = resolved.toString

    // One-time "CSR build": normalize + co-partition by src, persist.
    val outW = edges.groupBy("src").agg(
      (if (weighted) sum("w") else count(lit(1)).cast("double")).as("wtot"))
    val norm = edges.join(outW, "src")
      .select(col("src"), col("dst"),
        ((if (weighted) col("w") else lit(1.0)) / col("wtot")).as("p"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = norm.count()

    // The vertex universe is minted FRESH on every use: localCheckpoint
    // preserves attribute ids, so reusing one Range plan across state
    // generations creates "conflicting references" in the convergence join.
    def vertices = spark.range(nVertices).toDF("id")
    val init = resumeFrom.map(_._1.select(col("id"), col("x")))
      .getOrElse(vertices.select(col("id"), lit(1.0 / nVertices).as("x")))
    val startIter = resumeFrom.map(_._2).getOrElse(0)

    var prevGathered: Option[DataFrame] = None
    val loop: LoopResult = Iterate.loop(init, cfg, nEdges, stratName, startIter) {
      (state, _) =>
        prevGathered.foreach(_.unpersist())
        val gathered = Gather
          .gather(norm, state, keyCol = "dst", lookupCol = "src", pCol = "p",
            resolved)
          .persist(StorageLevel.MEMORY_AND_DISK)
        prevGathered = Some(gathered)
        // mass conservation: non-dangling vertices emit all their mass, so
        // dangling mass = 1 - Σ gathered (state always sums to 1).
        val s = gathered.agg(sum("x")).head().getDouble(0)
        val danglingMass = math.max(0.0, 1.0 - s)
        vertices.join(gathered.withColumnRenamed("dst", "id"), Seq("id"), "left")
          .select(col("id"),
            (lit((1.0 - damping) / nVertices) +
              lit(damping) * (coalesce(col("x"), lit(0.0)) +
                lit(danglingMass / nVertices))).as("x"))
    }
    prevGathered.foreach(_.unpersist())
    norm.unpersist()
    Result(loop.state, loop.metrics, resolved)
  }
}
