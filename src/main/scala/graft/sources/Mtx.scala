package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MatrixMarket coordinate ingest (reference S1/S2:
  * `/root/reference/lib/MMIO/mmio_cpp.h:12-53`, normalize at
  * `/root/reference/src/main.cpp:14-28`).
  *
  * Supports `matrix coordinate real|pattern general|symmetric`:
  *   - 1-based indices shifted to 0-based,
  *   - `pattern` entries get weight 1.0 (`mmio_cpp.h:37-38`),
  *   - `symmetric` emits both (i,j) and (j,i) for off-diagonal entries
  *     (`mmio_cpp.h:40-48`).
  *
  * The header needs file-order semantics, so the bounded prefix (banner +
  * comments + size line) is parsed driver-side; the O(nnz) entry body is a
  * distributed textFile scan with codegen'd per-line parsing — `read` scales
  * to any nnz. The production source at 10^12 scale remains the parquet
  * page table (Extract + VertexDict); .mtx is the reference-compat format.
  */
object Mtx {

  final case class Header(rows: Long, cols: Long, nnz: Long,
      pattern: Boolean, symmetric: Boolean)

  def parseHeader(lines: Seq[String]): Header = {
    val banner = lines.headOption.getOrElse("")
    require(banner.startsWith("%%MatrixMarket matrix coordinate"),
      s"unsupported MatrixMarket banner: $banner")
    val toks = banner.toLowerCase.split("\\s+")
    val pattern = toks.contains("pattern")
    require(pattern || toks.contains("real"),
      s"only real/pattern supported: $banner")
    val symmetric = toks.contains("symmetric")
    require(symmetric || toks.contains("general"),
      s"only general/symmetric supported: $banner")
    val size = lines.find(l => !l.startsWith("%") && l.trim.nonEmpty)
      .getOrElse(sys.error("missing size line"))
    val Array(m, n, nnz) = size.trim.split("\\s+").map(_.toLong)
    require(m == n, s"square matrices only (reference asserts the same " +
      s"at /root/reference/src/main.cpp:94): ${m}x$n")
    Header(m, n, nnz, pattern, symmetric)
  }

  /** Entry-body transform: "i j [w]" lines -> (src, dst, w) with 0-based
    * normalize, pattern weights, symmetric expansion — all DataFrame ops. */
  private def parseBody(body: DataFrame, h: Header): DataFrame = {
    val raw = body
      .select(split(trim(col("line")), "\\s+").as("t"))
      .select(
        (element_at(col("t"), 1).cast("long") - 1).as("src"),
        (element_at(col("t"), 2).cast("long") - 1).as("dst"),
        (if (h.pattern) lit(1.0)
         else element_at(col("t"), 3).cast("double")).as("w"))
    if (!h.symmetric) raw
    else raw.select(explode(when(col("src") === col("dst"),
        array(struct(col("src"), col("dst"), col("w"))))
      .otherwise(array(
        struct(col("src"), col("dst"), col("w")),
        struct(col("dst").as("src"), col("src").as("dst"), col("w")))))
      .as("e"))
      .select(col("e.src"), col("e.dst"), col("e.w"))
  }

  /** Parse mtx content given as lines; returns (header, edges(src,dst,w)). */
  def fromLines(spark: SparkSession, lines: Seq[String]): (Header, DataFrame) = {
    val h = parseHeader(lines)
    val body = lines.drop(1).filter(l => !l.startsWith("%") && l.trim.nonEmpty)
      .drop(1) // size line
    import spark.implicits._
    (h, parseBody(spark.createDataset(body).toDF("line"), h))
  }

  /** Read a .mtx file DISTRIBUTED: only the banner/comments/size-line prefix
    * is read driver-side (bounded, a BufferedReader over the first lines);
    * the entry body — the O(nnz) part — is a parallel textFile scan whose
    * per-line parse is codegen'd DataFrame ops. zipWithIndex preserves
    * file order, so body lines are exactly those after the size line (a body
    * entry may STRING-equal the size line, so prefix-count, not content,
    * decides). Works on any Hadoop-visible path at any nnz. */
  def read(spark: SparkSession, path: String): (Header, DataFrame) = {
    // header prefix via the Hadoop FileSystem API — works on file:/hdfs:/s3a:
    // alike (scala.io.Source would be local-FS only). A directory/glob is
    // rejected: prefixLen is a single-file line offset and would silently
    // mis-scope across concatenated parts.
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.getFileStatus(hPath).isFile,
      s"Mtx.read takes a single .mtx file (got a directory/glob): $path")
    val head = scala.collection.mutable.ArrayBuffer.empty[String]
    val src = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(hPath),
        java.nio.charset.StandardCharsets.UTF_8))
    try {
      var done = false
      var l = src.readLine()
      while (!done && l != null) {
        head += l
        if (!l.startsWith("%") && l.trim.nonEmpty && head.length > 1)
          done = true // the size line: first non-comment after the banner
        else l = src.readLine()
      }
    } finally src.close()
    val h = parseHeader(head.toSeq)
    val prefixLen = head.length // lines consumed incl. size line
    import spark.implicits._
    // r06: for large files, drop the header lines in partition 0 directly
    // instead of zipWithIndex — zipWithIndex runs a WHOLE extra pass over
    // the file just to count lines per split (guide §1.2: don't compute
    // what you throw away). Sound only when the whole header provably fits
    // in split 0: Hadoop's line reader assigns a line to the split holding
    // its first byte, and text splits are >= min(fileLen/2, 32 MB), so a
    // >= 1 MB file with a <= 64 KB header keeps every header line (and
    // therefore the first prefixLen lines) in split 0. Small files — where
    // a split can start mid-header — keep the index-exact zipWithIndex
    // path; its extra pass is noise there.
    val fileLen = fs.getFileStatus(hPath).getLen
    val headerBytes = head.map(_.length + 2L).sum // upper bound incl. \r\n
    val body =
      (if (fileLen >= (1L << 20) && headerBytes <= (64L << 10)) {
        spark.sparkContext.textFile(path)
          .mapPartitionsWithIndex { (pi, it) =>
            val afterHeader = if (pi == 0) it.drop(prefixLen) else it
            afterHeader.filter(l => !l.startsWith("%") && l.trim.nonEmpty)
          }
      } else {
        spark.sparkContext.textFile(path).zipWithIndex()
          .filter { case (l, i) =>
            i >= prefixLen && !l.startsWith("%") && l.trim.nonEmpty }
          .map(_._1)
      }).toDF("line")
    (h, parseBody(body, h))
  }
}
