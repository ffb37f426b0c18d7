package graft

class FlagshipSpec extends SparkSpec {
  test("entry returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("flagship groups are the expected flag/status pairs") {
    val rows = queries.AggCore.flagship(spark, sf).collect()
    val keys = rows.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys == keys.sorted)
    assert(keys.forall { case (f, st) => Set("A", "N", "R")(f) && Set("F", "O")(st) })
    // counts must sum to the filtered lineitem count
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = engine.Tables(spark, sf, "lineitem")
      .filter("l_shipdate <= timestamp'1998-09-02'").count()
    assert(total == expected)
  }

  test("every declared query has a distinct name and every oracle key exists") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.nonEmpty)
  }
}
