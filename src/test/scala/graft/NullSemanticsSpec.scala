package graft

import org.apache.spark.sql.functions._

/** The graded tables are NULL-free (FIXTURES.md), so NULL semantics are
  * pinned here: derived NULLs from outer joins, aggregation skipping,
  * sort placement, and null-safe equality. */
class NullSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val withNulls = Seq(
    (1, Some(10.0), Some("a")), (2, None, Some("b")),
    (3, Some(30.0), None), (4, None, None)
  ).toDF("id", "v", "s")

  test("aggregates skip nulls; count(*) does not") {
    val r = withNulls.agg(
      count(lit(1)).as("n"), count($"v").as("nv"),
      sum($"v").as("sv"), avg($"v").as("av")).head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 40.0 && r.getDouble(3) == 20.0)
  }

  test("asc_nulls_first / desc_nulls_last place nulls deterministically") {
    val asc = withNulls.orderBy($"v".asc_nulls_first, $"id").select("id").as[Int].collect()
    assert(asc.toSeq == Seq(2, 4, 1, 3))
    val desc = withNulls.orderBy($"v".desc_nulls_last, $"id").select("id").as[Int].collect()
    assert(desc.toSeq == Seq(3, 1, 2, 4))
  }

  test("null-safe equality <=> differs from =") {
    val l = Seq((1, Option.empty[String]), (2, Some("x"))).toDF("id", "k")
    val eq = l.as("a").join(l.as("b"), $"a.k" === $"b.k").count()
    val nseq = l.as("a").join(l.as("b"), $"a.k" <=> $"b.k").count()
    assert(eq == 1)   // null = null is NULL → filtered
    assert(nseq == 2) // null <=> null is TRUE
  }

  test("outer join produces typed nulls that survive aggregation") {
    val left = Seq(1, 2, 3).toDF("id")
    val right = Seq((1, 100.0)).toDF("id", "amt")
    val r = left.join(right, Seq("id"), "left")
      .agg(count($"amt").as("matched"), count(lit(1)).as("total")).head()
    assert(r.getLong(0) == 1 && r.getLong(1) == 3)
  }

  test("window functions over null-bearing order columns") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy($"v".asc_nulls_first, $"id")
    val rns = withNulls.select($"id", row_number().over(w).as("rn"))
      .orderBy("rn").select("id").as[Int].collect()
    assert(rns.toSeq == Seq(2, 4, 1, 3))
  }
}
