package graft

/** Driver-contract smoke: `entry` returns rows; every `queries` entry runs at
  * sf0.001; every oracleSql key exists in queries. */
class EntrySpec extends SparkSuite {

  test("entry: flagship pipeline returns ranked pages") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq == Seq("url", "pagerank"))
    assert(rows.forall(_.getDouble(1) > 0))
  }

  test("oracleSql keys are a subset of queries keys") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os.diff(qs)}")
  }

  test("all queries execute at sf0.001 with nonzero schema") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try {
        val df = fn(spark, "/root/testdata/sf0.001")
        df.take(1) // force execution
        if (df.columns.isEmpty) Some(s"$name: empty schema") else None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
