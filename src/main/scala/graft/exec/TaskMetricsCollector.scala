package graft.exec

import java.util.concurrent.atomic.{AtomicLong, DoubleAdder}
import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-iteration shuffle/skew accounting (north rule: "per-iteration
  * throughput, shuffle-bytes, and skew metrics emitted").
  *
  * A SparkListener accumulates task-level totals; the iteration driver
  * snapshots the counters at iteration boundaries and reports deltas.
  * Listener events are delivered asynchronously — deltas are exact once the
  * bus drains, which on task-end events effectively happens while the NEXT
  * iteration runs; `stabilize()` (polled at loop end) bounds the tail.
  * Reference analog: the bandwidth model's per-run byte accounting
  * (`/root/reference/include/graphCSR.hpp:519-524`), extended to shuffle
  * traffic, which the reference (single-process) never has.
  */
final class TaskMetricsCollector extends SparkListener {
  private val shuffleRead = new AtomicLong(0)
  private val shuffleWrite = new AtomicLong(0)
  private val taskCount = new AtomicLong(0)
  private val taskTime = new DoubleAdder
  private val taskMax = new AtomicLong(0) // ms

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      taskCount.incrementAndGet()
      val ms = te.taskInfo.duration
      taskTime.add(ms.toDouble)
      taskMax.updateAndGet(cur => math.max(cur, ms))
    }
  }

  final case class Snap(
      shuffleRead: Long, shuffleWrite: Long,
      tasks: Long, taskTimeMs: Double, taskMaxMs: Long) {
    def -(prev: Snap): Snap = Snap(
      shuffleRead - prev.shuffleRead, shuffleWrite - prev.shuffleWrite,
      tasks - prev.tasks, taskTimeMs - prev.taskTimeMs,
      taskMaxMs) // max is window-local only via reset; report latest max
    /** max-task / mean-task time — the straggler/skew signal. */
    def skew: Double =
      if (tasks <= 0 || taskTimeMs <= 0) Double.NaN
      else taskMaxMs / (taskTimeMs / tasks)
  }

  def snapshot(): Snap =
    Snap(shuffleRead.get, shuffleWrite.get, taskCount.get, taskTime.sum,
      taskMax.get)

  /** Reset the window-local max (call at each iteration boundary). */
  def resetMax(): Unit = taskMax.set(0)

  /** Poll until the async listener counters go quiet (bounded). */
  def stabilize(maxWaitMs: Long = 500): Unit = {
    var prev = snapshot()
    var waited = 0L
    while (waited < maxWaitMs) {
      Thread.sleep(25); waited += 25
      val cur = snapshot()
      if (cur == prev) return
      prev = cur
    }
  }
}

object TaskMetricsCollector {
  def attach(sc: SparkContext): TaskMetricsCollector = {
    val c = new TaskMetricsCollector
    sc.addSparkListener(c)
    c
  }
  def detach(sc: SparkContext, c: TaskMetricsCollector): Unit =
    sc.removeSparkListener(c)
}
