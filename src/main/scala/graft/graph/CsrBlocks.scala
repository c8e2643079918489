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

  /** One-time value-less CSR build: symmetrized neighbors keyed by dst,
    * hash-partitioned + dst-sorted row stream -> chunked flat blocks.
    * Returns (persisted+materialized blocks, per-partition dst arrays for
    * the driver-side slice scatter, edge count). Caller unpersists. */
  def build(edges: DataFrame, nParts: Int)
      : (RDD[CsrBlock], Array[Array[Long]], Long) = {
    val sorted = AdjacencyBuilder.symmetrize(edges)
      .repartition(nParts, col("dst"))
      .sortWithinPartitions("dst")
      .select(col("dst"), col("src"))
    val chunkEdges = 4 << 20
    val blocks = sorted.queryExecution.toRdd.mapPartitions { rows =>
      // one-row lookahead over REUSED InternalRows (copy fields first)
      var pDst = 0L; var pSrc = 0L
      var pending = false
      def fetch(): Unit =
        if (rows.hasNext) {
          val r = rows.next()
          pDst = r.getLong(0); pSrc = r.getLong(1)
          pending = true
        } else pending = false
      fetch()
      new Iterator[CsrBlock] {
        def hasNext: Boolean = pending
        def next(): CsrBlock = {
          val dsts = new scala.collection.mutable.ArrayBuffer[Long](1 << 16)
          val rowPtr = new scala.collection.mutable.ArrayBuffer[Int](1 << 16)
          var colInd = new Array[Int](chunkEdges)
          var m = 0
          var curDst = Long.MinValue
          var open = false
          rowPtr += 0
          while (pending && (m < chunkEdges || pDst == curDst)) {
            val dst = pDst; val src = pSrc
            fetch()
            if (!open || dst != curDst) {
              if (open) rowPtr += m
              dsts += dst
              curDst = dst
              open = true
            }
            if (m == colInd.length)
              colInd = java.util.Arrays.copyOf(colInd, colInd.length * 2)
            colInd(m) = src.toInt
            m += 1
          }
          if (open) rowPtr += m
          CsrBlock(dsts.toArray, rowPtr.toArray,
            java.util.Arrays.copyOf(colInd, m),
            Array.emptyDoubleArray, Array.emptyFloatArray)
        }
      }
    }.persist(StorageLevel.MEMORY_ONLY)
    blocks.localCheckpoint() // truncate task-binary lineage (PageRankArray)
    val dstsByPart: Array[Array[Long]] = blocks.map(_.dsts).collect()
    val nEdges = blocks.map(_.colInd.length.toLong).fold(0L)(_ + _)
    (blocks, dstsByPart, nEdges)
  }
}
