package graft

/** Bench runs `query.count()`: the optimizer must strip the determinism
  * orderBy (needed only for the oracle diff) under the count aggregate,
  * so the bench measures the operator, not a wasted global sort. */
class BenchPlanSpec extends SparkSpec {
  test("count() over an ordered query plans no sort") {
    val df = SparkEntry.queries("filter_simple")(spark, sf)
    val p = df.groupBy().count().queryExecution.executedPlan.toString
    assert(!p.contains("Sort"), s"orderBy survived under count():\n$p")
  }
}
