package graft

/** Driver-contract smoke: `SparkEntry.entry` must return rows on the
  * sf0.001 fixture with a vanilla session (the driver calls it with
  * its own SparkSession, not one of the graft mains').
  */
class EntrySpec extends SparkSpec {
  test("SparkEntry.entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name has a DuckDB oracle (no rows-only listings left)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q))
    assert((q -- o).isEmpty, s"oracle-less queries: ${q -- o}")
  }
}
