package graft.bench

import org.apache.spark.sql.functions._
import graft.sources.Synth

/** Decomposes the one-time flat-CSR build cost of the broadcast-array
  * kernel (VERDICT r03: 157 s at 403M edges — 60% of the headline lane's
  * wall). Times each constituent stage separately so the optimization
  * target is measured, not guessed:
  *
  *   gen        — one pass over the banded generator (count)
  *   outw       — the out-weight aggregation (count of O(V) output)
  *   nosort     — normalize join + repartition(dst) + raw InternalRow drain
  *                (the shuffle WITHOUT the per-partition sort)
  *   sortdrain  — same + sortWithinPartitions(dst) (isolates the sort)
  *   full       — PageRankArray.run with maxIter=1 (the real build + 1 iter)
  *
  * Usage: spark-submit --class graft.bench.BuildProbe <jar> [n] [l]
  */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else (1L << 22)
    val l = if (args.length > 1) args(1).toInt else 96
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[buildprobe] $name%-10s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val edges = Synth.band(spark, n, l)
    time("gen") { edges.count() }
    val outW = edges.groupBy("src").agg(sum("w").as("wtot"))
      .filter(col("wtot") > 0)
    time("outw") { outW.count() }
    val normBase = edges.join(broadcast(outW), "src")
      .select(col("dst"), col("src"), (col("w") / col("wtot")).as("p"))
    val nParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    time("nosort") {
      normBase.repartition(nParts, col("dst"))
        .queryExecution.toRdd.mapPartitions { it =>
          var c = 0L; var s = 0.0
          while (it.hasNext) { val r = it.next(); c += 1; s += r.getDouble(2) }
          Iterator.single(c)
        }.fold(0L)(_ + _)
    }
    time("sortdrain") {
      normBase.repartition(nParts, col("dst")).sortWithinPartitions("dst")
        .queryExecution.toRdd.mapPartitions { it =>
          var c = 0L; var s = 0.0
          while (it.hasNext) { val r = it.next(); c += 1; s += r.getDouble(2) }
          Iterator.single(c)
        }.fold(0L)(_ + _)
    }
    time("full") {
      graft.algo.PageRankArray.run(spark, Synth.band(spark, n, l), n,
        cfg = graft.exec.IterConfig(tol = 0.0, maxIter = 1),
        floatPrecision = true)
    }
    spark.stop()
  }
}
