package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Minimal snapshot-versioned table catalog with Iceberg-like semantics.
  *
  * The north rule speaks of Iceberg page tables; no Iceberg jars ship in
  * this environment (SURVEY.md §7.1), so this thin catalog provides the two
  * properties the engine actually relies on, over plain parquet:
  *
  *   - ATOMIC COMMITS: data is written to an immutable snapshot directory,
  *     then a single `current` pointer file is moved into place atomically
  *     (temp + ATOMIC_MOVE). Readers never observe a half-written table.
  *   - TIME TRAVEL: every snapshot id remains readable; `readAt` pins one.
  *
  * An Iceberg catalog can be dropped in behind the same four methods where
  * its jars exist; nothing else in the engine would change.
  *
  * Layout: `<root>/<table>/snap_<id>/part-*.parquet` + `<root>/<table>/current`
  * (text file holding the committed snapshot id) + per-snapshot manifest
  * JSON (row count, schema, parent id) for lineage.
  */
object SnapshotCatalog {
  // JVM-global per-table lock objects keyed by absolute table dir; needed
  // because OS file locks are held per-process, not per-thread.
  private val monitors = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[sources] def tableMonitor(key: String): Object =
    monitors.computeIfAbsent(key, _ => new Object)
}

final class SnapshotCatalog(root: String) {

  private def tableDir(table: String) = Paths.get(root, table)
  private def currentFile(table: String) = tableDir(table).resolve("current")

  /** Commit `df` as the next snapshot of `table`; returns the snapshot id.
    *
    * Concurrent-writer safe: the snapshot id is CLAIMED by an atomic
    * `Files.createDirectory` (fails if it exists -> retry with the next id),
    * so two committers can never write the same snap_<id> directory; the
    * parquet write then goes INTO the claimed directory in append mode
    * (overwrite would delete + recreate it, reopening the race). The pointer
    * swap advances monotonically — a concurrent commit that claimed a higher
    * id and already swapped is never overwritten backwards. */
  def commit(table: String, df: DataFrame): Long = {
    val dir = tableDir(table)
    Files.createDirectories(dir)
    // lineage = the committed tip THIS writer derived from, read at claim
    // time (id - 1 would fabricate a parent: the id-1 directory may be a
    // concurrent writer's still-uncommitted claim)
    val parent = currentSnapshot(table)
    var id = parent.getOrElse(-1L) + 1
    var claimed = false
    while (!claimed) {
      try { Files.createDirectory(dir.resolve(s"snap_$id")); claimed = true }
      catch { case _: java.nio.file.FileAlreadyExistsException => id += 1 }
    }
    val snapPath = dir.resolve(s"snap_$id")
    df.write.mode("append").parquet(snapPath.toString)
    val rows = df.sparkSession.read.parquet(snapPath.toString).count()
    val manifest =
      s"""{"snapshot_id":$id,"parent_id":${parent.getOrElse(-1L)},"rows":$rows,
         |"schema":"${df.schema.catalogString.replace("\"", "'")}"}""".stripMargin
    // manifest lives BESIDE the snapshot dir: a stray .json inside it would
    // break the parquet directory scan
    Files.write(dir.resolve(s"manifest_$id.json"),
      manifest.getBytes(StandardCharsets.UTF_8))
    // atomic pointer swap — the Iceberg-equivalent commit point. Monotonic,
    // and the monotonicity CHECK and the move are one atomic unit under an
    // exclusive cross-process file lock: a bare check-then-move lets a
    // concurrent higher commit swap between the two and then be rolled
    // backwards by this writer. FileChannel.lock is PER-PROCESS (a second
    // thread of the same JVM gets OverlappingFileLockException, not a wait),
    // so in-process writers first serialize on a JVM-global per-table
    // monitor, then the survivor takes the OS lock against other processes.
    SnapshotCatalog.tableMonitor(dir.toAbsolutePath.toString).synchronized {
      val lockCh = java.nio.channels.FileChannel.open(dir.resolve(".current.lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = lockCh.lock()
        try {
          if (!currentSnapshot(table).exists(_ > id)) {
            val tmp = dir.resolve(s".current.tmp.$id")
            Files.write(tmp, id.toString.getBytes(StandardCharsets.UTF_8))
            Files.move(tmp, currentFile(table),
              StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
          }
        } finally lock.release()
      } finally lockCh.close()
    }
    id
  }

  def currentSnapshot(table: String): Option[Long] = {
    val f = currentFile(table)
    if (Files.exists(f))
      Some(new String(Files.readAllBytes(f), StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  /** Read the current committed snapshot. */
  def read(spark: SparkSession, table: String): DataFrame = {
    val id = currentSnapshot(table).getOrElse(
      sys.error(s"no committed snapshot for table $table"))
    readAt(spark, table, id)
  }

  /** Time travel: read a specific snapshot id. */
  def readAt(spark: SparkSession, table: String, snapshotId: Long): DataFrame =
    spark.read.parquet(tableDir(table).resolve(s"snap_$snapshotId").toString)

  def snapshots(table: String): Seq[Long] = {
    val dir = tableDir(table)
    if (!Files.exists(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try {
        scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala
          .map(_.getFileName.toString)
          .filter(_.startsWith("snap_"))
          .map(_.stripPrefix("snap_").toLong)
          .toSeq.sorted
      } finally s.close()
    }
  }
}
