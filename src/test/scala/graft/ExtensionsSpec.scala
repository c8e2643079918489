package graft

import org.apache.spark.sql.functions._

/** SQL surface of the custom Catalyst functions: `bounded_top_k` through
  * the function registry (GraftExtensions.register for a live session;
  * spark.sql.extensions=graft.GraftExtensions at build time). Runs on an
  * isolated newSession so the shared suite session's registry is
  * untouched. */
class ExtensionsSpec extends SparkSuite {

  test("bounded_top_k from SQL: per-group top-k, no window in the plan") {
    val s = spark.newSession()
    GraftExtensions.register(s)
    import s.implicits._
    val rows = for (g <- 0 until 3; i <- 0 until 50)
      yield (g.toLong, (i * 7919 % 100).toDouble, (g * 50 + i).toLong)
    rows.toDF("grp", "score", "id").createOrReplaceTempView("scores")
    val res = s.sql(
      """SELECT grp, t.id, t.score, t.rank
        |FROM (SELECT grp, explode(bounded_top_k(score, id, 3)) AS t
        |      FROM scores GROUP BY grp)
        |ORDER BY grp, rank""".stripMargin)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && !plan.contains("Window"))
    val got = res.as[(Long, Long, Double, Int)].collect()
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(r => (-r._2, r._3)).take(3).zipWithIndex
        .map { case ((_, sc, id), r) => (g, id, sc, r + 1) }
    }.sortBy(t => (t._1, t._4))
    assert(got.toSeq == expect, s"got=${got.toSeq}\nexpect=$expect")
  }

  test("bounded_top_k rejects non-literal k") {
    val s = spark.newSession()
    GraftExtensions.register(s)
    import s.implicits._
    Seq((1L, 1.0, 1L)).toDF("grp", "score", "id").createOrReplaceTempView("s2")
    val ex = intercept[Exception] {
      s.sql("SELECT bounded_top_k(score, id, id) FROM s2 GROUP BY grp").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("literal"))
  }
}
