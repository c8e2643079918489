package graft

/** Driver-side reference oracles (SURVEY.md §5.2.2): tiny, obviously-correct
  * implementations used to verify the distributed engine on small graphs.
  * The SpMV oracle is a Scala port of the reference's NAIVE CSR kernel
  * semantics (`/root/reference/include/graphCSR.hpp:84-94`), accumulated in
  * double. */
object Oracles {

  /** flow[src] = Σ w * x[dst] over edges; vertices without out-edges -> 0. */
  def spmv(n: Int, edges: Seq[(Long, Long, Double)], x: Array[Double]): Array[Double] = {
    val flow = Array.fill(n)(0.0)
    edges.foreach { case (s, d, w) => flow(s.toInt) += w * x(d.toInt) }
    flow
  }

  /** Damped, dangling-aware PageRank power iteration; probability form. */
  def pagerank(
      n: Int,
      edges: Seq[(Long, Long, Double)],
      damping: Double = 0.85,
      tol: Double = 1e-6,
      maxIter: Int = 100,
      weighted: Boolean = true): Array[Double] = {
    val outW = Array.fill(n)(0.0)
    edges.foreach { case (s, _, w) => outW(s.toInt) += (if (weighted) w else 1.0) }
    var x = Array.fill(n)(1.0 / n)
    var delta = Double.MaxValue
    var it = 0
    while (it < maxIter && delta >= tol) {
      val nxt = Array.fill(n)(0.0)
      edges.foreach { case (s, d, w) =>
        val p = (if (weighted) w else 1.0) / outW(s.toInt)
        nxt(d.toInt) += p * x(s.toInt)
      }
      val danglingMass = (0 until n).filter(outW(_) == 0.0).map(x(_)).sum
      val out = Array.tabulate(n) { i =>
        (1.0 - damping) / n + damping * (nxt(i) + danglingMass / n)
      }
      delta = (0 until n).map(i => math.abs(out(i) - x(i))).max
      x = out
      it += 1
    }
    x
  }

  /** Connected components via union-find; label = min id in component. */
  def cc(n: Int, edges: Seq[(Long, Long)]): Array[Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(a: Int): Int = { var r = a; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (s, d) =>
      val (rs, rd) = (find(s.toInt), find(d.toInt))
      if (rs != rd) parent(math.max(rs, rd)) = math.min(rs, rd)
    }
    // path-compress to the min representative
    Array.tabulate(n)(i => find(i).toLong)
  }

  /** Synchronous label propagation; most-frequent neighbor label, ties ->
    * smallest label; vertices without neighbors keep their label. Must match
    * algo.LabelPropagation exactly. */
  def lp(n: Int, undirected: Seq[(Long, Long)], maxIter: Int): Array[Long] = {
    val nbrs = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Int])
    undirected.foreach { case (s, d) =>
      if (s != d) { nbrs(s.toInt) += d.toInt; nbrs(d.toInt) += s.toInt }
    }
    // dedup neighbor lists (symmetrize() emits distinct pairs)
    val adj = nbrs.map(_.distinct.toArray)
    var labels = Array.tabulate(n)(_.toLong)
    var it = 0
    var changed = true
    while (it < maxIter && changed) {
      val nxt = Array.tabulate(n) { i =>
        if (adj(i).isEmpty) labels(i)
        else {
          val hist = adj(i).map(labels(_)).groupBy(identity)
            .map { case (l, xs) => (l, xs.length) }
          val maxCnt = hist.values.max
          hist.filter(_._2 == maxCnt).keys.min
        }
      }
      changed = !java.util.Arrays.equals(nxt, labels)
      labels = nxt
      it += 1
    }
    labels
  }

  /** Exact triangle count, brute force over unique undirected edges. */
  def triangles(n: Int, edges: Seq[(Long, Long)]): Long = {
    val adj = Array.fill(n)(scala.collection.mutable.Set.empty[Int])
    edges.foreach { case (s, d) =>
      if (s != d) { adj(s.toInt) += d.toInt; adj(d.toInt) += s.toInt }
    }
    var count = 0L
    for (a <- 0 until n; b <- adj(a) if b > a; c <- adj(b) if c > b)
      if (adj(a).contains(c)) count += 1
    count
  }

  /** Deterministic band edge list — mirror of sources.Synth.band. */
  def bandEdges(n: Int, l: Int): Seq[(Long, Long, Double)] =
    for (i <- 0L until n; j <- 0 until l) yield {
      val base = math.max(0L, i - l)
      val d = base + j
      (i, d, ((i * 31 + d * 17) % 1000 + 1) / 1000.0)
    }

  def bandState(n: Int): Array[Double] =
    Array.tabulate(n)(i => ((i * 13) % 1000 + 1) / 1000.0)
}
