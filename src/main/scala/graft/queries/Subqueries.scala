package graft.queries

import graft.engine.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Subquery shapes through the engine's SQL surface (Spark's parser IS the
  * engine's parser — SURVEY §7 non-goals). Catalyst decorrelates the
  * correlated forms into joins (RewriteCorrelatedScalarSubquery /
  * PullupCorrelatedPredicates, §4), so these plan as ordinary shuffles at
  * scale, not per-row lookups.
  */
object Subqueries extends QueryPack {

  /** Register the graded tables as temp views once per session+dir. */
  private def withViews(s: SparkSession, dir: String)(sql: String): DataFrame = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
    Tables(s, dir, "events").createOrReplaceTempView("events")
    s.sql(sql)
  }

  q("sub_scalar_correlated",
    """SELECT c_custkey,
      |  (SELECT max(o_totalprice) FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_price
      |FROM customer c
      |ORDER BY c_custkey""") { (s, dir) =>
    withViews(s, dir)(
      """SELECT c_custkey,
        |  (SELECT max(o_totalprice) FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_price
        |FROM customer c
        |ORDER BY c_custkey""".stripMargin)
  }

  q("sub_in",
    """SELECT o_orderkey, o_custkey FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      |ORDER BY o_orderkey""") { (s, dir) =>
    withViews(s, dir)(
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
        |ORDER BY o_orderkey""".stripMargin)
  }

  q("sub_not_in",
    """SELECT s_suppkey FROM supplier
      |WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem WHERE l_quantity > 49)
      |ORDER BY s_suppkey""") { (s, dir) =>
    withViews(s, dir)(
      """SELECT s_suppkey FROM supplier
        |WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem WHERE l_quantity > 49)
        |ORDER BY s_suppkey""".stripMargin)
  }

  q("sql_cte",
    """WITH big AS (
      |  SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey HAVING count(*) >= 12
      |)
      |SELECT c.c_custkey, c.c_mktsegment, b.n
      |FROM big b JOIN customer c ON c.c_custkey = b.o_custkey
      |ORDER BY c.c_custkey""") { (s, dir) =>
    withViews(s, dir)(
      """WITH big AS (
        |  SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey HAVING count(*) >= 12
        |)
        |SELECT c.c_custkey, c.c_mktsegment, b.n
        |FROM big b JOIN customer c ON c.c_custkey = b.o_custkey
        |ORDER BY c.c_custkey""".stripMargin)
  }
}
