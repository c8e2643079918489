package graft

import java.nio.file.Files
import graft.sources.Synth
import graft.algo.PageRank
import graft.exec.{IterConfig, Iterate}

/** Checkpoint/resume (north rule: "resumable from checkpoint with
  * per-partition lineage + metrics"; SURVEY.md §5.2 resume ≡ uninterrupted). */
class ResumeSpec extends SparkSuite {
  import spark.implicits._

  test("PageRank resumed from a mid-run snapshot equals the uninterrupted run") {
    val n = 128L; val l = 6
    val edges = Synth.band(spark, n, l)
    val dir = Files.createTempDirectory("graft-resume").toString

    // uninterrupted: 8 fixed iterations
    val full = PageRank.run(spark, edges, n,
      cfg = IterConfig(tol = 0.0, maxIter = 8))
      .state.orderBy("id").as[(Long, Double)].collect()

    // interrupted: 3 iterations with snapshots, then a FRESH load + 5 more
    PageRank.run(spark, edges, n,
      cfg = IterConfig(tol = 0.0, maxIter = 3,
        snapshotDir = Some(dir), snapshotEvery = 1))
    val Some((state, iter, _)) = Iterate.resume(spark, dir)
    assert(iter == 3)
    val resumed = PageRank.run(spark, edges, n,
      cfg = IterConfig(tol = 0.0, maxIter = 8),
      resumeFrom = Some((state, iter)))
      .state.orderBy("id").as[(Long, Double)].collect()

    full.zip(resumed).foreach { case ((idF, xF), (idR, xR)) =>
      assert(idF == idR)
      assert(math.abs(xF - xR) < 1e-12, s"vertex $idF")
    }
  }

  test("snapshot manifest is written atomically and parses back") {
    val dir = Files.createTempDirectory("graft-manifest").toString
    val st = Seq((0L, 0.5), (1L, 0.5)).toDF("id", "x")
    Iterate.snapshot(dir, st, iteration = 7, delta = 0.123)
    val Some((loaded, iter, delta)) = Iterate.resume(spark, dir)
    assert(iter == 7 && math.abs(delta - 0.123) < 1e-12)
    assert(loaded.as[(Long, Double)].collect().toSet == Set((0L, 0.5), (1L, 0.5)))
  }

  test("resume on an empty dir returns None") {
    val dir = Files.createTempDirectory("graft-empty").toString
    assert(Iterate.resume(spark, dir).isEmpty)
  }
}
