package graft.queries

import graft.engine.{Det, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Core aggregation queries (SURVEY §2.4) — flagship first.
  *
  * Scale note: these are all single hash-aggregates over lineitem; Spark
  * plans partial (map-side) + final aggregation automatically, so at 100 TB
  * the shuffle carries only one row per (group × partition).
  */
object AggCore extends QueryPack {
  import Det._

  /** TPC-H Q1-shaped pricing summary — the flagship. */
  val flagship: Q = (s, dir) => {
    val l = Tables(s, dir, "lineitem")
    val disc   = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val charge = disc * (lit(1.0) + col("l_tax"))
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        money(sum(cents(col("l_quantity")))).as("sum_qty"),
        money(sum(cents(col("l_extendedprice")))).as("sum_base_price"),
        money(sum(cents(disc))).as("sum_disc_price"),
        money(sum(cents(charge))).as("sum_charge"),
        avg4(sum(cents(col("l_quantity"))), count(lit(1))).as("avg_qty"),
        avg4(sum(cents(col("l_extendedprice"))), count(lit(1))).as("avg_price"),
        avgFix(sum(fix(col("l_discount"), 4)), 4, count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  q("agg_group_sum",
    s"""SELECT l_returnflag, l_linestatus,
      |  ${oMoney("l_quantity")} AS sum_qty,
      |  ${oMoney("l_extendedprice")} AS sum_base_price,
      |  ${oMoney("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
      |  ${oMoney("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
      |  ${oAvg4("l_quantity")} AS avg_qty,
      |  ${oAvg4("l_extendedprice")} AS avg_price,
      |  ${oAvgFix("l_discount", 4)} AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""")(flagship)
}
