package graft.bench

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Opt-in stage profiler (SPARK_GRAFT_STAGELOG=1): prints per-stage wall
  * time, task count, and shuffle volumes — the evidence for the shuffle /
  * partitioning decisions SURVEY.md §4.2 commits to. */
object StageLog {
  def attach(spark: SparkSession): Unit =
    if (sys.env.get("SPARK_GRAFT_STAGELOG").contains("1"))
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val dur = for {
            s <- si.submissionTime; e <- si.completionTime
          } yield (e - s) / 1000.0
          val m = si.taskMetrics
          println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
            f"wall=${dur.getOrElse(-1.0)}%7.2fs cpu=${m.executorCpuTime / 1e9}%7.2fs " +
            f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
            f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
            f"spill=${m.diskBytesSpilled / 1e6}%6.1fMB  ${si.name.take(60)}")
        }
      })
}
