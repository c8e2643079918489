package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vertex dictionary: mint dense 0-based Long ids for a url universe.
  *
  * Replaces the reference's square-matrix assumption (vertex ids are array
  * indices, `/root/reference/src/main.cpp:94`) with an explicit url -> id
  * dictionary. Scalable dense-rank: a naive `row_number() OVER (ORDER BY url)`
  * collapses to ONE partition — instead we range-partition by url, number
  * within partitions in parallel, and add broadcast per-partition offsets
  * (the classic two-pass zipWithIndex, kept in DataFrame land).
  *
  * Ids are contiguous `0..V-1`, ordered by url (deterministic given the
  * computed range partitioning; the dictionary is persisted alongside
  * checkpoints so resumed runs reuse identical ids — see exec.Checkpoints).
  */
object VertexDict {

  /** urls: any DataFrame with a `url` string column (duplicates ok). */
  def fromUrls(urls: DataFrame, partitions: Int = 0): DataFrame = {
    val spark = urls.sparkSession
    val p =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = urls.select("url").distinct()
      .repartitionByRange(p, col("url"))
      .withColumn("pid", spark_partition_id())
      .persist()
    try {
      val counts = sorted.groupBy("pid").count().collect()
        .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) =>
        (pid, acc + c)
      }.tail // offset of pid = rows in all earlier pids
      val offsetsDf = spark.createDataFrame(
        offsets.zip(counts).map { case ((pid, end), (_, c)) => (pid, end - c) }
          .toSeq).toDF("pid", "offset")
      val w = Window.partitionBy("pid").orderBy("url")
      val out = sorted
        .withColumn("rn", row_number().over(w))
        .join(broadcast(offsetsDf), "pid")
        .select(col("url"), (col("offset") + col("rn") - 1).as("id"))
      // materialize before unpersisting the partitioned intermediate
      out.persist().count()
      out
    } finally sorted.unpersist()
  }

  /** (src_url, dst_url) pairs -> Edge table (src, dst, w=1.0) using `dict`.
    * Inner join on dst drops links that point outside the crawled universe
    * (standard link-graph practice; at 10^12 scale most hrefs resolve). */
  def resolve(pairs: DataFrame, dict: DataFrame): DataFrame = {
    val d1 = dict.withColumnRenamed("url", "src_url").withColumnRenamed("id", "src")
    val d2 = dict.withColumnRenamed("url", "dst_url").withColumnRenamed("id", "dst")
    pairs.join(d1, "src_url").join(d2, "dst_url")
      .select(col("src"), col("dst"), lit(1.0).as("w"))
  }
}
