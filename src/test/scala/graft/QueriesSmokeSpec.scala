package graft

/** Every declared query runs at sf0.001, has a deterministic schema, and
  * returns rows. Value-level correctness is the DuckDB oracle gate
  * (tools/check.py); this guards against runtime regressions in between. */
class QueriesSmokeSpec extends SparkSpec {
  SparkEntry.all.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle name matches a declared query") {
    val names = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
  }
}
