package graft

/** Driver-contract smoke: the flagship query returns rows at sf0.001. */
class EntrySpec extends SparkSpecBase {
  test("entry() spatial join yields rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSet === Set("point_id", "polygon_id", "lon", "lat", "tag_brand"))
    assert(df.count() > 0)
  }

  test("every query has either an oracle or a documented omission") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // q28 (LSH ANN) and q29 (GeoJSON strings) are rows-only by design
    assert(noOracle === Set("q28_ann_lsh", "q29_geojson"))
  }
}
