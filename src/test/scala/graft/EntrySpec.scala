package graft

/** Driver-contract smoke: the flagship query returns rows at sf0.001. */
class EntrySpec extends SparkSpecBase {
  test("entry() spatial join yields rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSet === Set("point_id", "polygon_id", "lon", "lat", "tag_brand"))
    assert(df.count() > 0)
  }

  test("every query has a DuckDB oracle") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle === Set.empty[String])
    // and no oracle is orphaned either
    assert(SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet === Set.empty[String])
  }
}
