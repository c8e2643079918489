package graft.bench

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Ad-hoc profiling probe for operator stages (not part of the contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val n = time("docs.count")(docs.count())
    println(s"[probe] docs=$n")
    val sigs = time("signatures(k=32)") {
      val s = Dedup.minhashSignatures(docs, "doc_id", "text", 32, 3).persist()
      s.count(); s
    }
    val buckets = time("buckets(bands=8)") {
      val b = Dedup.lshBuckets(sigs, 8).persist(); b.count(); b
    }
    time("bucket histogram") {
      buckets.groupBy("band", "bucket").count()
        .agg(max("count"), avg("count"), sum(col("count") * col("count")))
        .show(truncate = false)
    }
    val cands = time("candidate pairs") {
      val c = buckets.as("l").join(buckets.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket")
          && col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
        .distinct().persist()
      println(s"[probe] candidates=${c.count()}"); c
    }
    val sets = time("shingle sets") {
      val s = docs.select(col("doc_id"),
        Dedup.shinglesCol(col("text"), 3).as("sh")).persist()
      s.count(); s
    }
    time("verify joins") {
      cands
        .join(sets.select(col("doc_id").as("a"), col("sh").as("sha")), "a")
        .join(sets.select(col("doc_id").as("b"), col("sh").as("shb")), "b")
        .select(col("a"), col("b"),
          (size(array_intersect(col("sha"), col("shb"))).cast("double") /
            size(array_union(col("sha"), col("shb")))).as("jaccard"))
        .filter(col("jaccard") >= 0.5).count()
    }
    time("full minhashPairs") {
      Dedup.minhashPairs(docs, "doc_id", "text", 32, 8, 3, 0.5).count()
    }
    spark.stop()
  }
}
