package graft

import org.apache.spark.sql.functions._

/** Invariant checks for the round-10 operators: Lorenz-curve geometry,
  * path-distribution vs closeness cross-query conservation, span-cluster
  * membership, and retention-fit internal consistency.
  */
class Round10Spec extends SparkSpec {

  test("agg_lorenz_deciles: monotone, convex, below the equality line, ends at 1") {
    val rows = SparkEntry.queries("agg_lorenz_deciles")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("o_orderstatus")).foreach { case (st, rs) =>
      val byPct = rs.sortBy(_.getAs[Long]("pct"))
      val shares = byPct.map(_.getAs[Double]("bottom_share"))
      assert(math.abs(shares.last - 1.0) < 1e-6, s"$st does not end at 1")
      shares.zip(shares.tail).foreach { case (a, b) =>
        assert(b >= a - 1e-9, s"$st share not monotone")
      }
      // bottom d% of orders hold at most d% of revenue (Lorenz ≤ equality)
      byPct.foreach { r =>
        assert(r.getAs[Double]("bottom_share") <=
          r.getAs[Long]("pct") / 100.0 + 1e-6, s"$st above equality line")
      }
      // convexity: increments non-decreasing (values sorted ascending)
      val inc = shares.head +: shares.zip(shares.tail).map { case (a, b) => b - a }
      inc.zip(inc.tail).foreach { case (a, b) =>
        assert(b >= a - 1e-4, s"$st Lorenz increments decrease")
      }
    }
  }

  test("graph_path_length_dist: pair count conserves against closeness reachability") {
    val dist = SparkEntry.queries("graph_path_length_dist")(spark, sf).collect()
    assert(dist.nonEmpty)
    assert(math.abs(dist.map(_.getAs[Double]("cum_share")).max - 1.0) < 1e-6)
    val totalPairs = dist.map(_.getAs[Long]("n_pairs")).sum
    // every (s, v) reachable unordered pair counted once: Σ (r − 1) = 2·pairs
    val reach = SparkEntry.queries("graph_closeness")(spark, sf).collect()
      .map(_.getAs[Long]("n_reachable") - 1).sum
    assert(reach == 2 * totalPairs,
      s"closeness says ${reach / 2.0} pairs, distribution says $totalPairs")
  }

  test("llm_span_dedup_cluster: members come from spans, id is the min, sizes add up") {
    val cl = SparkEntry.queries("llm_span_dedup_cluster")(spark, sf).collect()
    assert(cl.nonEmpty)
    val spanDocs = SparkEntry.queries("llm_substring_dedup")(spark, sf).collect()
      .flatMap(r => Seq(r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(cl.map(_.getAs[Long]("doc_id")).toSet == spanDocs)
    cl.groupBy(_.getAs[Long]("cluster_id")).foreach { case (cid, members) =>
      val ids = members.map(_.getAs[Long]("doc_id"))
      assert(ids.min == cid, s"cluster $cid is not its min member")
      assert(ids.length >= 2, s"singleton cluster $cid from a pair list")
      members.foreach(m => assert(m.getAs[Long]("cluster_size") == ids.length))
    }
  }

  test("agg_quantile_summary_merge: error bands bracket the exact quantiles") {
    val bands = SparkEntry.queries("agg_quantile_summary_merge")(spark, sf)
      .collect().map(r => r.getAs[Long]("pct") ->
        (r.getAs[Double]("est_lo"), r.getAs[Double]("est_hi"))).toMap
    val cents = spark.read.parquet(s"$sf/orders.parquet")
      .select(graft.engine.Det.cents(col("o_totalprice")).cast("long"))
      .collect().map(_.getLong(0)).sorted
    bands.foreach { case (pct, (lo, hi)) =>
      // exact rank-based quantile: the ceil(p·n/100)-th smallest value
      val exact = cents((pct * cents.length + 99).toInt / 100 - 1) / 100.0
      assert(lo <= exact && exact <= hi,
        s"p$pct exact $exact outside sketch band [$lo, $hi]")
      // the band is one log-bucket wide: ≤ ~7.3% relative
      assert(hi / lo <= 1.075, s"p$pct band wider than one bucket")
    }
  }

  test("events_retention_decay_fit: half-life consistent with the decay rate") {
    val r = SparkEntry.queries("events_retention_decay_fit")(spark, sf)
      .collect().head
    assert(r.getAs[Long]("n_points") >= 1)
    val d = r.getAs[Double]("decay_per_week")
    val hl = Option(r.getAs[java.lang.Double]("half_life_weeks")).map(_.doubleValue)
    if (d >= 0) assert(hl.isEmpty)
    else {
      assert(hl.isDefined)
      assert(math.abs(hl.get - math.log(2) / -d) < math.abs(hl.get) * 1e-2 + 1e-3)
    }
  }
}
