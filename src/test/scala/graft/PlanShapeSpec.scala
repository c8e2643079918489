package graft

import org.apache.spark.sql.functions._
import graft.sources.Synth
import graft.exec.{Gather, GatherStrategy}

/** Physical-plan shape assertions (SURVEY.md §7.3.6): the properties that
  * matter at 100 TB — filters/projections reach the parquet scan, persisted
  * edges are never re-shuffled inside an iteration, whole-stage codegen
  * covers the hot path. */
class PlanShapeSpec extends SparkSuite {

  val sfDir = "/root/testdata/sf0.001"

  test("parquet scan: filter and projection are pushed down") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_quantity") > 30.0)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      s"missing pushed filter in:\n$scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"projection not pruned to 2 columns in:\n$scan")
  }

  test("iteration gather over persisted edges: edges read from cache, not re-shuffled") {
    val edges = Synth.band(spark, 1024, 8).persist()
    edges.count()
    try {
      val state = Synth.state(spark, 1024)
      val step = Gather.gather(edges, state, "dst", "src", "w",
        GatherStrategy.ShuffleJoin)
      val plan = step.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"),
        s"edges not read from cache:\n$plan")
      // exchanges allowed: state-side for the join + the aggregation
      // exchange; the cached edge relation itself must NOT sit under a
      // fresh Exchange (its scan lines must not be preceded by one).
      val nExchanges = "Exchange hashpartitioning".r
        .findAllIn(plan).length
      assert(nExchanges <= 3, s"too many shuffles ($nExchanges):\n$plan")
    } finally { edges.unpersist(); () }
  }

  test("whole-stage codegen covers the SpMV aggregation path") {
    val edges = Synth.band(spark, 1024, 8)
    val state = Synth.state(spark, 1024)
    val step = Gather.gather(edges, state, "dst", "src", "w",
      GatherStrategy.ShuffleJoin)
    val plan = step.queryExecution.executedPlan.toString
    // codegen'd operators are starred "*(n) Op" in the compact plan string
    assert(plan.contains("*(") && plan.contains("*(1)"),
      s"no whole-stage-codegen spans:\n$plan")
    assert(plan.contains("HashAggregate"),
      s"expected hash aggregation (partial+final):\n$plan")
  }

  test("salted aggregation plans two hash-aggregate phases") {
    val plan = Gather.sumSalted(Synth.skew(spark, 500), "dst", col("w"),
      col("src"), 8).queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).length >= 4, // partial+final x2
      s"expected two-phase salted aggregation:\n$plan")
  }
}
