package graft.graph

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import java.nio.{ByteBuffer, ByteOrder}

import graft.algo.PageRankArray.CsrBlock

/** Shared value-less CSR-block machinery for the broadcast-array kernels on
  * label semirings (CC's (min, ·), LP's (argmax-count, ·)): the
  * [[graft.algo.PageRankArray]] K6 layout
  * (`/root/reference/include/graphCSR.hpp:382-384`) minus the normalize join
  * and the values array — label kernels only ever read neighbor IDS, so a
  * block is 4 B/edge colInd + rowPtr.
  *
  * Wire format for the per-iteration label exchange is packed little-endian
  * longs (architecture-independent), with a once-per-executor-per-iteration
  * unpack cache keyed by broadcast id.
  */
object CsrBlocks {

  def packL(x: Array[Long]): Array[Byte] = {
    val b = new Array[Byte](x.length * 8)
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().put(x)
    b
  }
  def unpackL(b: Array[Byte]): Array[Long] = {
    val x = new Array[Long](b.length / 8)
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(x)
    x
  }

  /** Once-per-executor-per-iteration unpack of the broadcast labels (the
    * [[graft.algo.PageRankArray.StateCache]] pattern; keyed by broadcast id,
    * a miss just re-unpacks — correctness never depends on a hit). */
  object LabelCache {
    private var key = -1L
    private var l: Array[Long] = _
    def longs(id: Long, bytes: Array[Byte]): Array[Long] = synchronized {
      if (key != id || l == null) { l = unpackL(bytes); key = id }
      l
    }
  }

  /** One-time value-less CSR build: symmetric link set (both orientations,
    * self-loops dropped, per-row neighbor sets deduplicated — identical
    * sets to the old `symmetrize(...).distinct()` Catalyst plan), ranged
    * flat blocks via the packed-binary shuffle (r06 fast path — see
    * [[RangedCsr]]: no distinct exchange, no sortWithinPartitions, 8 B/edge
    * on the wire, histogram grouping instead of a sorted drain).
    * Returns (persisted+materialized blocks, per-partition dst arrays for
    * the driver-side slice scatter, deduplicated directed link count).
    * Caller unpersists. */
  def build(edges: DataFrame, nVertices: Long, nParts: Int)
      : (RDD[CsrBlock], Array[Array[Long]], Long) = {
    require(nVertices <= Int.MaxValue, "flat-block builds need V <= 2^31")
    val n = nVertices.toInt
    val blocks = RangedCsr.buildSymmetric(
      edges.select(col("src").cast("long"), col("dst").cast("long")),
      n, nParts)
      .persist(StorageLevel.MEMORY_ONLY)
    blocks.localCheckpoint() // truncate task-binary lineage (PageRankArray)
    val dstsByPart: Array[Array[Long]] = RangedCsr.rangeIds(n, nParts)
    val nEdges = blocks.map(_.colInd.length.toLong).fold(0L)(_ + _)
    (blocks, dstsByPart, nEdges)
  }
}
