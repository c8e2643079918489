package graft.bench

import org.apache.spark.sql.SparkSession
import graft.sources.Synth
import graft.algo.PageRank
import graft.exec.{GatherStrategy, IterConfig}

/** Two-parallelism scaling evidence (north rule: >= 0.8 throughput-scaling
  * efficiency from N to 4N executors; evidenced in this sandbox by running
  * the identical job at local[8] and local[32] on the same input —
  * see the driver instruction and SURVEY.md §6).
  *
  * Mirrors the reference's thread-pinned scaling scripts
  * (`/root/reference/scripts/measure.sh:13` pins OMP_NUM_THREADS=32) but
  * across Spark task parallelism. Emits one JSON line:
  *   {"n":..,"l":..,"iters":..,"runs":[{"cores":8,"edges_per_sec":..},...],
  *    "scaling_efficiency":..}
  * where efficiency = (T_8 / T_32) / 4.
  */
object Scaling {

  def run(cores: Int, n: Long, l: Int, iters: Int,
      strategy: GatherStrategy): (Double, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // warm-up (JIT + codegen caches), then measured run — the reference's
      // cold-run discard (`/root/reference/include/abstractGraph.hpp:52-56`)
      PageRank.run(spark, Synth.band(spark, n / 8, l), n / 8,
        cfg = IterConfig(tol = 0.0, maxIter = 2), strategy = strategy)
      val r = PageRank.run(spark, Synth.band(spark, n, l), n,
        cfg = IterConfig(tol = 0.0, maxIter = iters), strategy = strategy)
      val secs = r.metrics.map(_.seconds).sum
      val eps = r.metrics.map(_.edges).sum / secs
      (secs, eps)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else (1L << 17)
    val l = if (args.length > 1) args(1).toInt else 16
    val iters = if (args.length > 2) args(2).toInt else 10
    val strat: GatherStrategy =
      if (args.contains("--shuffle")) GatherStrategy.ShuffleJoin
      else GatherStrategy.BroadcastState
    val results = Seq(8, 32).map { c =>
      val (secs, eps) = run(c, n, l, iters, strat)
      (c, secs, eps)
    }
    val t8 = results.find(_._1 == 8).get._2
    val t32 = results.find(_._1 == 32).get._2
    val eff = (t8 / t32) / 4.0
    val runs = results.map { case (c, s, e) =>
      s"""{"cores":$c,"seconds":$s,"edges_per_sec":$e}"""
    }.mkString("[", ",", "]")
    println(s"""{"n":$n,"l":$l,"iters":$iters,"strategy":"$strat","runs":$runs,"scaling_efficiency":$eff}""")
  }
}
