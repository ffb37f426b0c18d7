package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.functions._

/** Direct exercise of ops.SkewJoin.saltedEquiJoin (r11 verdict ask #6):
  * AQE off so nothing re-splits behind the salt's back, a pathological
  * planted hot key (90% of the left on ONE key), and three pins —
  * (1) row-identical output vs the plain unsalted join, (2) the physical
  * join actually keys on (key, salt) [2 equi-pairs], (3) the hot key's
  * rows measurably SPREAD across output partitions where the unsalted
  * join floods one. The graded join_skew_salted query stays the
  * end-to-end oracle check; this spec pins the mechanism. */
class SkewJoinSpec extends SparkSpec {

  test("salted join spreads a pathological hot key, output row-identical") {
    val conf = spark.conf
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    val oldBc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // planted skew: 36k of 40k left rows carry key 1; right is 100 keys
      val left = spark.range(40000).select(
        when(col("id") % 10 < 9, lit(1L))
          .otherwise(col("id") % 97 + 2).as("k"),
        col("id").as("row_id"))
      val right = spark.range(100).select((col("id") + 1).as("rk"),
        concat(lit("v"), col("id")).as("payload"))
      val salted = ops.SkewJoin.saltedEquiJoin(left, right, "k", "rk",
        saltSource = Seq("row_id"), buckets = 8)
      val plain = left.join(right, col("k") === col("rk"))

      // (1) row-identical: same count and same per-key (count, row_id
      // checksum) — payload is determined by the key, so this pins rows
      def agg(df: DataFrame) = df.groupBy("k")
        .agg(count(lit(1)).as("n"), sum("row_id").as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(salted.count() == plain.count())
      assert(agg(salted) == agg(plain), "salted join changed the result")

      // (2) the physical join keys on (key, __salt): two equi-pairs, and
      // it is a SHUFFLED join (the salt exists to shape a shuffle)
      val j = salted.queryExecution.executedPlan.collectFirst {
        case b: BaseJoinExec => b
      }.getOrElse(fail("no join exec in the salted plan"))
      assert(j.leftKeys.size == 2,
        s"salted join should key on (k, __salt): ${j.leftKeys}")
      assert(!j.nodeName.toLowerCase.contains("broadcast"),
        s"salt is pointless under a broadcast join: ${j.nodeName}")

      // (3) partition spread (deterministic: hash partitioning over fixed
      // keys and a fixed partition count): the unsalted join puts the hot
      // key's 90% in ONE task; the salted join spreads it 8 ways
      def maxShare(df: DataFrame): Double = {
        val sizes = df.select("k").rdd
          .mapPartitions(it => Iterator(it.size.toLong)).collect()
        sizes.max.toDouble / sizes.sum
      }
      val (plainShare, saltedShare) = (maxShare(plain), maxShare(salted))
      info(f"max partition share: plain=$plainShare%.2f salted=$saltedShare%.2f")
      assert(plainShare >= 0.7,
        f"skew fixture lost its hot key: $plainShare%.2f")
      assert(saltedShare <= 0.5,
        f"salt failed to spread the hot key: $saltedShare%.2f")
    } finally {
      conf.set("spark.sql.adaptive.enabled", oldAqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
    }
  }
}
