package graft.bench

import org.apache.spark.sql.SparkSession

/** Decomposes the per-iteration fixed cost of the broadcast-array kernel
  * (graft.algo.PageRankArray) into its Spark-machinery terms, measured on
  * THIS box: empty-job scheduling floor, torrent-broadcast of a packed
  * state, task-result collect of packed slices, and the full
  * broadcast+gather+collect round-trip. Run:
  *
  *   sbt "runMain graft.bench.IterProbe [stateMB] [reps]"
  *
  * Prints one JSON line (min/mean seconds per op). This is the evidence
  * artifact behind BENCH.md's "JVM iteration floor" table.
  */
object IterProbe {

  private def time(reps: Int)(body: => Unit): (Double, Double) = {
    body // warm
    var best = Double.MaxValue
    var sum = 0.0
    (1 to reps).foreach { _ =>
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      if (dt < best) best = dt
      sum += dt
    }
    (best, sum / reps)
  }

  def main(args: Array[String]): Unit = {
    val stateMB = if (args.nonEmpty) args(0).toInt else 16
    val reps = if (args.length > 1) args(1).toInt else 20
    // SPARK_GRAFT_BARE=1 -> default-config session (A/B for per-job floor)
    val spark =
      if (sys.env.get("SPARK_GRAFT_BARE").contains("1"))
        SparkSession.builder().master("local[32]").appName("probe-bare")
          .config("spark.ui.enabled", "false").getOrCreate()
      else graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sc = spark.sparkContext
    val nParts = if (args.length > 2) args(2).toInt else 32
    val rdd = sc.parallelize(0 until nParts, nParts)
      .map(i => i).persist()
    rdd.count()
    val stateBytes = stateMB << 20
    val sliceBytes = stateBytes / nParts

    // job timeline: submit -> jobStart -> firstTask -> lastTaskEnd -> jobEnd
    @volatile var tJobStart = 0L
    @volatile var tFirstTask = 0L
    @volatile var tLastTaskEnd = 0L
    @volatile var tJobEnd = 0L
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        tJobStart = System.nanoTime()
      override def onTaskStart(e: org.apache.spark.scheduler.SparkListenerTaskStart): Unit =
        if (tFirstTask == 0) tFirstTask = System.nanoTime()
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        tLastTaskEnd = System.nanoTime()
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        tJobEnd = System.nanoTime()
    })
    val results = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double)]
    results("empty_job") = time(reps) { rdd.map(_ + 1).collect(); () }
    // one traced empty job (listener events are async; sleep to drain)
    tFirstTask = 0
    val tSubmit = System.nanoTime()
    rdd.map(_ + 2).collect()
    val tReturn = System.nanoTime()
    Thread.sleep(300)
    System.err.println(
      f"[probe] submit->jobStart ${(tJobStart - tSubmit) / 1e6}%.2fms " +
      f"jobStart->firstTask ${(tFirstTask - tJobStart) / 1e6}%.2fms " +
      f"firstTask->lastTaskEnd ${(tLastTaskEnd - tFirstTask) / 1e6}%.2fms " +
      f"lastTaskEnd->return ${(tReturn - tLastTaskEnd) / 1e6}%.2fms")
    results("bcast_only") = time(reps) {
      val bc = sc.broadcast(new Array[Byte](stateBytes))
      rdd.map(_ => bc.value.length).collect()
      bc.destroy()
    }
    results("collect_slices") = time(reps) {
      rdd.map(_ => new Array[Byte](sliceBytes)).collect(); ()
    }
    results("bcast_and_collect") = time(reps) {
      val bc = sc.broadcast(new Array[Byte](stateBytes))
      rdd.map(_ => { val n = bc.value.length; new Array[Byte](sliceBytes) }).collect()
      bc.destroy()
    }
    val json = results.map { case (k, (mn, mean)) =>
      s""""$k":{"min_sec":$mn,"mean_sec":$mean}""" }
      .mkString(s"""{"state_mb":$stateMB,"reps":$reps,"parts":$nParts,""", ",", "}")
    println(json)
    spark.stop()
  }
}
