package graft.queries

import graft.engine.{QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorts / limits / top-k (SURVEY §2.6).
  *
  * Scale note: `topk_global` deliberately stays `orderBy(...).limit(k)` —
  * Spark plans TakeOrderedAndProject (per-partition heap + driver merge),
  * never a full sort; verified in the physical plan. `topk_per_group` is
  * the window-rank form, one shuffle on the group key.
  */
object SortLimit extends QueryPack {

  q("sort_multi",
    """SELECT o_orderkey, o_orderstatus, o_totalprice
      |FROM orders
      |ORDER BY o_orderstatus DESC NULLS LAST, o_totalprice ASC NULLS FIRST, o_orderkey""") { (s, dir) =>
    Tables(s, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .orderBy(col("o_orderstatus").desc_nulls_last,
        col("o_totalprice").asc_nulls_first, col("o_orderkey"))
  }

  q("limit_offset",
    """SELECT o_orderkey, o_custkey FROM orders
      |ORDER BY o_orderkey
      |LIMIT 10 OFFSET 5""") { (s, dir) =>
    Tables(s, dir, "orders")
      .select("o_orderkey", "o_custkey")
      .orderBy("o_orderkey")
      .offset(5)
      .limit(10)
  }

  q("topk_global",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey
      |LIMIT 100""") { (s, dir) =>
    Tables(s, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey"))
      .limit(100)
  }

  q("topk_per_group",
    """SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |         row_number() OVER (PARTITION BY c_nationkey
      |                            ORDER BY c_acctbal DESC NULLS LAST, c_custkey) AS rn
      |  FROM customer
      |) WHERE rn <= 3
      |ORDER BY c_nationkey, rn""") { (s, dir) =>
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc_nulls_last, col("c_custkey"))
    Tables(s, dir, "customer")
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("c_nationkey", "rn")
  }
}
