package graft

import org.apache.spark.sql.functions._

/** Property pins for the 12 queries added in round 12, beyond their
  * cell-exact DuckDB oracles: each test asserts the mathematical or
  * structural invariant the oracle's value-compare cannot articulate.
  */
class Round12NewOpsSpec extends SparkSpec {

  test("llm_grpo_advantage: per-group advantages are standardized " +
    "(mean ~ 0, sample std ~ 1) for non-degenerate groups") {
    val adv = SparkEntry.queries("llm_grpo_advantage")(spark, sf)
    val byGroup = adv.filter(col("n_group") >= 10)
      .groupBy("group_id")
      .agg(avg("advantage").as("m"), stddev("advantage").as("sd"))
      .collect()
    assert(byGroup.nonEmpty)
    byGroup.foreach { r =>
      assert(math.abs(r.getAs[Double]("m")) < 1e-3,
        s"group ${r.get(0)}: advantage mean ${r.getAs[Double]("m")}")
      assert(math.abs(r.getAs[Double]("sd") - 1.0) < 1e-2,
        s"group ${r.get(0)}: advantage std ${r.getAs[Double]("sd")}")
    }
  }

  test("text_cdc_chunks: chunk lengths add back to the document length") {
    val got = SparkEntry.queries("text_cdc_chunks")(spark, sf)
      .select(col("doc_id"),
        (col("avg_len") * col("n_chunks")).as("total"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = engine.Tables(spark, sf, "documents")
      .select(col("doc_id"), length(col("text")).cast("double").as("len"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    // avg_len is quantized at 1e-4, so total reconstructs within
    // n_chunks × 0.5e-4
    got.foreach { case (d, t) =>
      assert(math.abs(t - want(d)) < 0.1, s"doc $d: $t vs ${want(d)}")
    }
  }

  test("llm_dedup_cdc_chunks: shared-chunk accounting is internally " +
    "consistent and a doc never shares more chunks than it has") {
    val rows = SparkEntry.queries("llm_dedup_cdc_chunks")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s, f) = (r.getAs[Long]("n_chunks"),
        r.getAs[Long]("n_shared_chunks"), r.getAs[Double]("dup_char_frac"))
      assert(s <= n)
      assert(f >= 0.0 && f <= 1.0)
      if (s == 0) assert(f == 0.0)
      if (s == n && n > 0) assert(f == 1.0)
    }
  }

  test("scan_metadata_cols: row_index is a contiguous 0..n-1 ramp") {
    val idx = SparkEntry.queries("scan_metadata_cols")(spark, sf)
      .select("row_idx").collect().map(_.getLong(0)).sorted
    assert(idx.head == 0L && idx.last == idx.length - 1L)
    assert(idx.zipWithIndex.forall { case (v, i) => v == i.toLong })
  }

  test("sql_pipe_ops: the pipe spelling optimizes to the SAME plan as " +
    "the classic spelling (sugar, not semantics)") {
    val pipe = SparkEntry.queries("sql_pipe_ops")(spark, sf)
    engine.Tables(spark, sf, "orders").createOrReplaceTempView("orders")
    val classic = spark.sql(
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |    AS DOUBLE) / 100 AS total_usd
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
    assert(pipe.queryExecution.optimizedPlan.canonicalized ==
      classic.queryExecution.optimizedPlan.canonicalized,
      "pipe SQL produced a different optimized plan than the classic form")
  }

  test("fn_collation_lcase: every collated group merged exactly the two " +
    "case variants") {
    val rows = SparkEntry.queries("fn_collation_lcase")(spark, sf).collect()
    assert(rows.length == 5) // the 5 market segments
    rows.foreach { r =>
      assert(r.getAs[Long]("n_case_variants") == 2L,
        s"${r.getString(0)}: expected both case variants in one group")
    }
  }

  test("fn_variant_nested: wrong-type try extraction is NULL on every " +
    "row; JSON-null and absent-path behave differently") {
    val rows = SparkEntry.queries("fn_variant_nested")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("vt_try_bad")))
      val isNullFlag = r.getAs[Boolean]("vt_opt_isnull")
      val optNull = r.isNullAt(r.fieldIndex("vt_opt"))
      // JSON null <=> typed extraction NULL on the SAME path
      assert(isNullFlag == optNull)
    }
  }

  test("emb_random_projection: JL ratios concentrate around 1 at k=16") {
    // this spec CAUGHT a degenerate sign function: the low bit of
    // (odd·d + odd·j) is parity(d + j) — a stripe pattern whose "core"
    // mass was 43%; the shipped high-bit mixer measures ~74% here
    // (k=16 sign projections on 1 770 correlated pairs have fat
    // empirical tails; the asserted floor is deliberately below the
    // measurement, far above the stripe failure)
    val rows = SparkEntry.queries("emb_random_projection")(spark, sf)
      .collect()
    val total = rows.map(_.getAs[Long]("n_pairs")).sum
    val buckets = rows.map(_.getAs[Long]("bucket"))
    assert(buckets.forall(b => b >= 1 && b <= 24),
      s"JL ratio bucket out of [0.1, 2.5): ${buckets.mkString(",")}")
    val core = rows.filter(r => r.getAs[Long]("bucket") >= 6
      && r.getAs[Long]("bucket") <= 14).map(_.getAs[Long]("n_pairs")).sum
    assert(core.toDouble / total >= 0.6,
      f"only ${core.toDouble / total}%.2f of pairs within |ratio-1|<=0.4")
    // weighted mean ratio (bucket midpoints) centers near 1
    val mean = rows.map(r => (r.getAs[Long]("bucket") / 10.0 + 0.05)
      * r.getAs[Long]("n_pairs")).sum / total
    assert(mean > 0.75 && mean < 1.25, f"mean JL ratio $mean%.3f")
  }

  test("ml_gbt_stumps: boosting monotonically reduces training RSS") {
    val r = SparkEntry.queries("ml_gbt_stumps")(spark, sf).head
    val (r0, r1, r2) = (r.getAs[Double]("rss0_usd2"),
      r.getAs[Double]("rss1_usd2"), r.getAs[Double]("rss2_usd2"))
    assert(r1 <= r0 && r2 <= r1, s"RSS not monotone: $r0 -> $r1 -> $r2")
    assert(r2 < r0, "two boosting rounds changed nothing")
  }

  test("emb_pq_train_kmeans: per-subspace distortion non-increasing " +
    "across Lloyd rounds, occupancy never above k") {
    val rows = SparkEntry.queries("emb_pq_train_kmeans")(spark, sf).collect()
    val byIter = rows.groupBy(_.getAs[Int]("iter"))
    assert(byIter.keySet == Set(1, 2))
    val m1 = byIter(1).map(r => r.getAs[Int]("subq") -> r.getAs[Double]("mse")).toMap
    val m2 = byIter(2).map(r => r.getAs[Int]("subq") -> r.getAs[Double]("mse")).toMap
    m1.foreach { case (sq, v1) =>
      assert(m2(sq) <= v1 + 1e-9, s"subspace $sq: mse rose $v1 -> ${m2(sq)}")
    }
    rows.foreach(r => assert(r.getAs[Long]("n_codes") <= 16L))
  }

  test("stats_bh_fdr: BH rejections are a prefix of the p-value ranking " +
    "and m is derived from the live test count") {
    val rows = SparkEntry.queries("stats_bh_fdr")(spark, sf).collect()
    val m = rows.length
    assert(m > 0)
    // ranks are a permutation of 1..m
    assert(rows.map(_.getAs[Long]("p_rank")).sorted.toSeq ==
      (1L to m.toLong).toSeq)
    // rejected set = ranks 1..k for some k (BH is a step-up PREFIX rule)
    val rejRanks = rows.filter(_.getAs[Boolean]("rejected"))
      .map(_.getAs[Long]("p_rank")).sorted.toSeq
    assert(rejRanks == (1L to rejRanks.length.toLong).toSeq,
      s"rejections not a rank prefix: $rejRanks")
    // every rejected p satisfies its own BH bound; the first accepted
    // rank's p exceeds ALL bounds at or above it (step-up definition)
    val byRank = rows.map(r => r.getAs[Long]("p_rank") ->
      r.getAs[Double]("p_value")).toMap
    rejRanks.lastOption.foreach { k =>
      assert(byRank(k) <= k.toDouble / m * 0.05 + 1e-12)
    }
  }

  test("llm_dedup_cdc_apply: retention accounting bounded and consistent " +
    "with the dedup report") {
    val apply = SparkEntry.queries("llm_dedup_cdc_apply")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("kept_chunks"),
          r.getAs[Double]("kept_frac"))).toMap
    val report = SparkEntry.queries("llm_dedup_cdc_chunks")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_shared_chunks"))).toMap
    assert(apply.keySet == report.keySet)
    apply.foreach { case (d, (n, kept, frac)) =>
      // kept == 0 is legitimate: an exact-duplicate document loses every
      // chunk to earlier first instances (doc 487 at sf0.001 does)
      assert(kept >= 0 && kept <= n, s"doc $d kept $kept of $n")
      assert(frac >= 0.0 && frac <= 1.0)
      assert((kept == 0) == (frac == 0.0), s"doc $d kept/frac disagree")
      val (rn, shared) = report(d)
      assert(rn == n)
      // chunks can only be LOST to sharing: no cross-doc-shared chunks →
      // nothing dropped; everything dropped → every chunk is shared
      if (shared == 0) assert(kept == n, s"doc $d dropped but shares none")
      if (kept == 0) assert(shared == n, s"doc $d lost unshared chunks")
    }
  }

  test("graph_ppr: teleport locality — seed nations carry more rank mass " +
    "than non-seeds, and non-seed rank is pure propagation") {
    val rows = SparkEntry.queries("graph_ppr")(spark, sf).collect()
    val (seeds, rest) = rows.partition(_.getAs[Boolean]("is_seed"))
    assert(seeds.nonEmpty && rest.nonEmpty)
    def mean(xs: Array[Double]) = xs.sum / xs.length
    val ms = mean(seeds.map(_.getAs[Double]("ppr")))
    val mr = mean(rest.map(_.getAs[Double]("ppr")))
    assert(ms > mr,
      f"seed mean ppr $ms%.4f not above non-seed mean $mr%.4f")
    // every rank is non-negative; the global top-1 is a seed on the
    // trade graph (teleport mass re-enters only there)
    assert(rows.forall(_.getAs[Double]("ppr") >= 0.0))
    assert(rows.maxBy(_.getAs[Double]("ppr")).getAs[Boolean]("is_seed"))
  }

  test("luhn_check agrees with known checksum vectors") {
    import spark.implicits._
    // classic test numbers: valid Visa/Mastercard/Amex vectors, then the
    // same with one digit perturbed (any single-digit error must flip it)
    val cases = Seq(
      ("4532015112830366", true), ("5425233430109903", true),
      ("374245455400126", true), ("79927398713", true),
      ("4532015112830367", false), ("5425233430109904", false),
      ("374245455400127", false), ("79927398710", false))
    val got = cases.map(_._1).toDF("acct")
      .select(col("acct"), expr("luhn_check(acct)").as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (acct, want) =>
      assert(got(acct) == want, s"luhn_check($acct) = ${got(acct)}")
    }
  }

  test("bitmap aggregates merge associatively: shard-split OR equals the " +
    "single-pass count") {
    val o = engine.Tables(spark, sf, "orders")
    def bitmaps(df: org.apache.spark.sql.DataFrame) = df
      .select(expr("bitmap_bucket_number(o_custkey)").as("bkt"),
        expr("bitmap_bit_position(o_custkey)").as("pos"))
      .groupBy("bkt").agg(expr("bitmap_construct_agg(pos)").as("bm"))
    val whole = bitmaps(o)
      .agg(sum(expr("bitmap_count(bm)"))).head.getLong(0)
    // split into 3 arbitrary shards, build per-shard bitmaps, OR-merge
    val shards = (0 until 3).map(i => bitmaps(o.filter(col("o_orderkey") % 3 === i)))
    val merged = shards.reduce(_ unionByName _)
      .groupBy("bkt").agg(expr("bitmap_or_agg(bm)").as("bm"))
      .agg(sum(expr("bitmap_count(bm)"))).head.getLong(0)
    val exact = o.select(countDistinct("o_custkey")).head.getLong(0)
    assert(whole == exact && merged == exact,
      s"bitmap counts $whole / merged $merged != exact $exact")
  }

  test("stream_dedup_within_wm: graded key set equals batch DISTINCT " +
    "on the single-batch fixture") {
    val streamed = SparkEntry.queries("stream_dedup_within_wm")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = engine.Tables(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(date_trunc("minute", col("ts"))).as("m"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }
}
