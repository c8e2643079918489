package graft.bench

/** Port of the reference's statistically rigorous measurement harness
  * (`/root/reference/include/abstractGraph.hpp:46-111` `measure_func`):
  *
  *   1. one cold run, discarded (`:52-56`)
  *   2. a pilot of `pilotRuns` timed runs (reference: 100)
  *   3. Student-t sample-size estimate for a 95% confidence interval of
  *      half-width `relErr`·mean (reference: 5%)
  *   4. additional runs up to that estimate; report mean / median /
  *      variance / CI half-width
  *
  * The reference amortizes each sample over 10 kernel calls
  * (`abstractGraph.hpp:119-129`); callers here amortize over iterations the
  * same way by timing a multi-iteration body. Pure Scala (no Boost): the
  * t-quantile uses the standard series approximation, exact enough for
  * n >= 2 at 95%.
  */
object Measure {

  final case class Result(
      samples: Int,
      mean: Double,
      median: Double,
      variance: Double,
      ciHalfWidth: Double) {
    override def toString: String =
      f"mean=$mean%.6f s median=$median%.6f s ci95=±$ciHalfWidth%.6f s n=$samples"
  }

  /** Two-sided 95% Student-t quantile for df degrees of freedom
    * (Cornish-Fisher-style approximation; < 0.1% error for df >= 3,
    * matching the reference's boost::math::students_t usage). */
  def t95(df: Int): Double = {
    require(df >= 1)
    if (df == 1) 12.706
    else if (df == 2) 4.303
    else {
      val z = 1.959964 // N(0,1) 97.5%
      val g1 = (math.pow(z, 3) + z) / 4.0
      val g2 = (5 * math.pow(z, 5) + 16 * math.pow(z, 3) + 3 * z) / 96.0
      val g3 = (3 * math.pow(z, 7) + 19 * math.pow(z, 5) + 17 * math.pow(z, 3) - 15 * z) / 384.0
      z + g1 / df + g2 / (df * df) + g3 / (df * df * df)
    }
  }

  def stats(xs: Seq[Double]): (Double, Double, Double) = {
    val n = xs.length
    val mean = xs.sum / n
    val variance =
      if (n < 2) 0.0 else xs.map(x => (x - mean) * (x - mean)).sum / (n - 1)
    val sorted = xs.sorted
    val median =
      if (n % 2 == 1) sorted(n / 2)
      else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
    (mean, median, variance)
  }

  /** Adaptive measurement of `body` (reference semantics; bounded by
    * `maxRuns` to keep wall-clock sane for Spark-sized bodies — the
    * reference measures µs-scale kernels and can afford hundreds). */
  def adaptive(
      pilotRuns: Int = 5,
      relErr: Double = 0.05,
      maxRuns: Int = 30)(body: => Unit): Result = {
    body // cold run, discarded
    def timed(): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    var samples = Vector.fill(pilotRuns)(timed())
    val (m0, _, v0) = stats(samples)
    // reference formula: n = (t * s / (relErr * mean))^2
    val needed = math.min(maxRuns,
      math.ceil(math.pow(
        t95(pilotRuns - 1) * math.sqrt(v0) / (relErr * m0), 2)).toInt)
    while (samples.length < needed) samples :+= timed()
    val (mean, median, variance) = stats(samples)
    val ci = t95(samples.length - 1) *
      math.sqrt(variance / samples.length)
    Result(samples.length, mean, median, variance, ci)
  }
}
