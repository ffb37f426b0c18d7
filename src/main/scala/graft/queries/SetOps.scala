package graft.queries

import graft.engine.{QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Set operations (SURVEY §2.7). All built-in; `unionByName` is the
  * engine's append primitive (name-resolved — positional union is a
  * silent-corruption hazard in a builder API). */
object SetOps extends QueryPack {

  q("set_union_all",
    """SELECT c_custkey AS id, c_name AS name, 'customer' AS src FROM customer
      |UNION ALL
      |SELECT s_suppkey AS id, s_name AS name, 'supplier' AS src FROM supplier
      |ORDER BY src, id""") { (s, dir) =>
    val c = Tables(s, dir, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name"), lit("customer").as("src"))
    val su = Tables(s, dir, "supplier")
      .select(col("s_suppkey").as("id"), col("s_name").as("name"), lit("supplier").as("src"))
    c.unionByName(su).orderBy("src", "id")
  }

  q("set_union_distinct",
    """SELECT c_nationkey AS nationkey FROM customer
      |UNION
      |SELECT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""") { (s, dir) =>
    Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .union(Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .distinct()
      .orderBy("nationkey")
  }

  q("set_intersect",
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""") { (s, dir) =>
    Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .intersect(Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")
  }

  q("set_intersect_all",
    """SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
      |INTERSECT ALL
      |SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
      |ORDER BY l_orderkey""") { (s, dir) =>
    val l = Tables(s, dir, "lineitem")
    l.filter(col("l_returnflag") === "A").select("l_orderkey")
      .intersectAll(l.filter(col("l_returnflag") === "R").select("l_orderkey"))
      .orderBy("l_orderkey")
  }

  q("set_except",
    """SELECT o_custkey FROM orders
      |EXCEPT
      |SELECT c_custkey AS o_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |ORDER BY o_custkey""") { (s, dir) =>
    Tables(s, dir, "orders").select("o_custkey")
      .except(Tables(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("o_custkey")))
      .orderBy("o_custkey")
  }

  q("set_except_all",
    """SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F'
      |EXCEPT ALL
      |SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'O'
      |ORDER BY l_suppkey""") { (s, dir) =>
    val l = Tables(s, dir, "lineitem")
    l.filter(col("l_linestatus") === "F").select("l_suppkey")
      .exceptAll(l.filter(col("l_linestatus") === "O").select("l_suppkey"))
      .orderBy("l_suppkey")
  }

  q("set_distinct",
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""") { (s, dir) =>
    Tables(s, dir, "lineitem")
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")
  }

  // Symmetric difference — customers appearing in exactly one of two
  // order-status populations, composed from the same except/intersect
  // primitives a user would reach for: (A ∪ B) − (A ∩ B).
  q("set_symmetric_diff",
    """WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
      |b AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |SELECT o_custkey FROM (
      |  (SELECT o_custkey FROM a UNION SELECT o_custkey FROM b)
      |  EXCEPT
      |  (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
      |)
      |ORDER BY o_custkey""") { (s, dir) =>
    val o = Tables(s, dir, "orders")
    val a = o.filter(col("o_orderstatus") === "F").select("o_custkey").distinct()
    val b = o.filter(col("o_orderstatus") === "O").select("o_custkey").distinct()
    a.union(b).distinct()
      .except(a.intersect(b))
      .orderBy("o_custkey")
  }
}
