package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.exec.{Gather, GatherStrategy}

/** The ported operator: one sparse-matrix × dense-vector application.
  *
  * Canonical semantics = the reference's naive CSR kernel
  * (`/root/reference/include/graphCSR.hpp:84-94`):
  *   flow[i] = Σ_{out-edges (i -> j, w)} w * x[j]
  * i.e. gather over out-neighbors, keyed by src, looking up state at dst.
  * Duplicate edges accumulate (reference `+=` semantics); vertices without
  * out-edges get flow 0 when a vertex universe is supplied (the reference has
  * a latent OOB here — trailing isolated vertices,
  * `/root/reference/include/graphCSR.hpp:455-476` — which we fix explicitly).
  * Accumulation is in double; the reference's float kernels agree only to
  * ~1e-6, hence tolerance-based comparison (SURVEY.md §1.3.5).
  */
object SpMV {

  /** @param edges    (src, dst, w)
    * @param state    (id, x) — the dense input vector
    * @param vertices optional (id) universe; when given, result is dense with
    *                 flow 0 for vertices without out-edges
    * @return (id, x) — the flow vector keyed by src vertex */
  def apply(
      edges: DataFrame,
      state: DataFrame,
      vertices: Option[DataFrame] = None,
      strategy: GatherStrategy = GatherStrategy.ShuffleJoin): DataFrame = {
    val flow = Gather
      .gather(edges, state, keyCol = "src", lookupCol = "dst", pCol = "w", strategy)
      .withColumnRenamed("src", "id")
    vertices match {
      case Some(v) =>
        v.select("id").join(flow, Seq("id"), "left")
          .select(col("id"), coalesce(col("x"), lit(0.0)).as("x"))
      case None => flow
    }
  }
}
