package graft

import org.apache.spark.sql.functions._

/** Invariant checks for the round-9 operators — properties the cell-exact
  * DuckDB rehearsal can't explain on its own (bounds, conservation laws,
  * cross-query consistency, and the "the reported span really IS a
  * duplicate" ground-truth check for substring dedup).
  */
class Round9Spec extends SparkSpec {

  test("llm_substring_dedup: reported spans are real token-for-token duplicates") {
    val spans = SparkEntry.queries("llm_substring_dedup")(spark, sf).collect()
    assert(spans.nonEmpty, "fixture plants near-duplicate prefixes; spans expected")
    val text = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    spans.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val (sa, sb) = (r.getAs[Long]("start_a").toInt, r.getAs[Long]("start_b").toInt)
      val len = r.getAs[Long]("span_tokens").toInt
      assert(a < b && len >= 10)
      // positions are 1-based; the span must match token-for-token
      val ta = text(a).slice(sa - 1, sa - 1 + len)
      val tb = text(b).slice(sb - 1, sb - 1 + len)
      assert(ta.sameElements(tb),
        s"span ($a,$b,$sa,$sb,$len) is not an exact duplicate")
    }
  }

  test("llm_substring_dedup: spans are maximal along their diagonal (no adjacent extension)") {
    val spans = SparkEntry.queries("llm_substring_dedup")(spark, sf).collect()
    val text = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    spans.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val (sa, sb) = (r.getAs[Long]("start_a").toInt, r.getAs[Long]("start_b").toInt)
      val len = r.getAs[Long]("span_tokens").toInt
      val (ta, tb) = (text(a), text(b))
      // one token before the span start must differ (or be out of range)
      if (sa >= 2 && sb >= 2)
        assert(ta(sa - 2) != tb(sb - 2), s"span ($a,$b) extends left")
      // one token past the span end must differ (or be out of range)
      val (ea, eb) = (sa - 1 + len, sb - 1 + len)
      if (ea < ta.length && eb < tb.length)
        assert(ta(ea) != tb(eb), s"span ($a,$b) extends right")
    }
  }

  test("sample_weighted_reservoir: exactly 64 distinct docs, dense ranks, length-biased") {
    val rows = SparkEntry.queries("sample_weighted_reservoir")(spark, sf).collect()
    assert(rows.length == 64)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to 64L))
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 64)
    // weighting by n_chars must bias the sample toward long documents:
    // the sample mean length should exceed the corpus mean
    val sampleMean = rows.map(_.getAs[Long]("n_chars")).sum.toDouble / 64
    val corpusMean = spark.read.parquet(s"$sf/documents.parquet")
      .agg(avg("n_chars")).collect().head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean <= corpus mean $corpusMean")
  }

  test("graph_community_lpa: labels are member nodes and refine into >= 2 communities") {
    val rows = SparkEntry.queries("graph_community_lpa")(spark, sf).collect()
    assert(rows.nonEmpty)
    val communities = rows.map(_.getAs[Long]("community")).distinct
    // the strong-trade graph is sparse by construction (threshold at 2x
    // median weight), so 3 LPA rounds must not collapse it to one bloc
    assert(communities.length >= 2, s"collapsed to ${communities.length} communities")
    // every label is a real node id (labels originate as node ids)
    val nodeIds = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey").cast("long")).collect().map(_.getLong(0)).toSet
    communities.foreach(c => assert(nodeIds.contains(c)))
  }

  test("multimodal_audio_vad: segment arithmetic and threshold consistency with audio_energy") {
    val segs = SparkEntry.queries("multimodal_audio_vad")(spark, sf).collect()
    assert(segs.nonEmpty)
    segs.foreach { r =>
      val (s0, s1) = (r.getAs[Int]("seg_start"), r.getAs[Int]("seg_end"))
      val n = r.getAs[Long]("n_wins")
      assert(s0 >= 0 && s1 >= s0)
      assert(n == s1 - s0 + 1, "segment must cover consecutive windows")
      assert(n >= 2)
    }
    // every window inside a reported segment is active under the same
    // integer threshold the query uses (ssq >= 2000 * n_samples)
    val energy = SparkEntry.queries("multimodal_audio_energy")(spark, sf)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("win")) ->
        (r.getAs[Long]("ssq"), r.getAs[Int]("n_samples"))).toMap
    segs.foreach { r =>
      val id = r.getAs[Long]("id")
      (r.getAs[Int]("seg_start") to r.getAs[Int]("seg_end")).foreach { w =>
        val (ssq, n) = energy((id, w))
        assert(ssq >= 2000L * n, s"inactive window $w inside segment of doc $id")
      }
    }
  }

  test("stats_cohens_d: sign of d matches the direction of the mean difference") {
    val rows = SparkEntry.queries("stats_cohens_d")(spark, sf).collect()
    assert(rows.nonEmpty)
    val means = SparkEntry.queries("events_ab_welch")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("t")).toMap
    rows.foreach { r =>
      val (d, g) = (r.getAs[Double]("d"), r.getAs[Double]("g"))
      // Hedges' g is a shrinkage of d: same sign, |g| <= |d|
      assert(math.signum(g) == math.signum(d) || g == 0.0)
      assert(math.abs(g) <= math.abs(d) + 1e-9)
      // d and the welch t statistic must agree in sign (same numerator)
      means.get(r.getAs[String]("event_type")).foreach { t =>
        if (math.abs(t) > 0.01 && math.abs(d) > 0.0001)
          assert(math.signum(d) == math.signum(t), "d and t disagree in sign")
      }
    }
  }

  test("dq_drift_jsd: bounded by ln 2 and totals account for the smoothed stream") {
    val rows = SparkEntry.queries("dq_drift_jsd")(spark, sf).collect()
    assert(rows.nonEmpty)
    val evCount = spark.read.parquet(s"$sf/events.parquet").count()
    rows.foreach { r =>
      val j = r.getAs[Double]("jsd_nats")
      assert(j >= -1e-6 && j <= math.log(2) + 1e-4,
        s"JSD $j outside [0, ln 2]")
      // smoothed totals: n1 + n2 = raw rows of this type + 2 * n_bins
      val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
      val bins = r.getAs[Long]("n_bins")
      assert(n1 + n2 - 2 * bins > 0 && n1 + n2 - 2 * bins <= evCount)
    }
  }

  test("llm_substring_dedup_apply: removal accounting against the raw span list") {
    val apply = SparkEntry.queries("llm_substring_dedup_apply")(spark, sf).collect()
    assert(apply.nonEmpty)
    val spans = SparkEntry.queries("llm_substring_dedup")(spark, sf).collect()
    val rawByDoc = spans.groupBy(_.getAs[Long]("doc_b"))
      .view.mapValues(_.map(_.getAs[Long]("span_tokens")).sum).toMap
    apply.foreach { r =>
      val doc = r.getAs[Long]("doc_id")
      val (n, rm) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("removed_tokens"))
      assert(rm > 0 && rm <= n, s"doc $doc removes $rm of $n")
      // merged-union length never exceeds the raw (possibly overlapping) sum
      assert(rm <= rawByDoc(doc))
      val kept = r.getAs[Double]("kept_ratio")
      assert(math.abs(kept - (n - rm).toDouble / n) < 1e-5)
    }
    // every doc_b with a span appears exactly once in the apply report
    assert(apply.map(_.getAs[Long]("doc_id")).toSet == rawByDoc.keySet)
  }

  test("multimodal_scene_cuts: every cut's delta agrees with the frame energies") {
    val cuts = SparkEntry.queries("multimodal_scene_cuts")(spark, sf).collect()
    assert(cuts.nonEmpty)
    import org.apache.spark.sql.functions.{col => c}
    val media = graft.ops.Multimodal.mediaFromDocuments(spark,
      spark.read.parquet(s"$sf/documents.parquet"), kinds = Seq("video"))
    val energy = graft.ops.Multimodal.frameEnergy(media)
      .toDF("id", "win", "n", "ssq").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Int]("win")) -> r.getAs[Long]("ssq"))
      .toMap
    cuts.foreach { r =>
      val (id, f) = (r.getAs[Long]("id"), r.getAs[Int]("cut_frame"))
      val delta = r.getAs[Long]("delta")
      assert(f >= 1, "frame 0 has no predecessor and cannot be a cut")
      assert(math.abs(delta) >= 25000)
      assert(energy((id, f)) - energy((id, f - 1)) == delta)
    }
  }

  test("text_lm_crossent_loso: all sources scored, held-out NLL positive and bounded") {
    val rows = SparkEntry.queries("text_lm_crossent_loso")(spark, sf).collect()
    val nSources = spark.read.parquet(s"$sf/documents.parquet")
      .select("source").distinct().count()
    assert(rows.length == nSources)
    rows.foreach { r =>
      val nll = r.getAs[Double]("heldout_nll")
      assert(nll > 0.0 && nll < 20.0, s"NLL $nll out of range")
      assert(r.getAs[Long]("n_bigrams") > 0)
    }
  }

  test("ml_linreg_ols: coefficients satisfy the intercept normal equation") {
    // mean(y) = a·mean(x1) + b·mean(x2) + c for ANY least-squares fit with
    // an intercept — an oracle-blind invariant (the oracle runs the same
    // expression tree, so a formula slip passes the hash yet fails this;
    // the round-9 detc transposition did exactly that)
    import org.apache.spark.sql.functions.{col => c, _}
    val r = SparkEntry.queries("ml_linreg_ols")(spark, sf).collect().head
    val daily = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(to_date(date_trunc("day", c("ts"))).as("day"))
      .agg(
        sum(when(c("event_type") === "click", 1L).otherwise(0L)).as("x1"),
        countDistinct(c("user_id")).as("x2"),
        sum(when(c("event_type") === "purchase",
          graft.engine.Det.cents(c("value")).cast("long")).otherwise(0L)).as("y"))
      .agg(avg("x1"), avg("x2"), avg("y")).collect().head
    val (mx1, mx2, my) = (daily.getDouble(0), daily.getDouble(1), daily.getDouble(2))
    val fit = r.getAs[Double]("coef_clicks") * mx1 +
      r.getAs[Double]("coef_users") * mx2 + r.getAs[Double]("intercept")
    assert(math.abs(fit - my) / math.abs(my) < 1e-3,
      s"normal equation violated: fit of means $fit vs mean y $my")
  }

  test("ts_granger_lite: F >= 0 (nested models) and coefficients finite") {
    val r = SparkEntry.queries("ts_granger_lite")(spark, sf).collect().head
    assert(r.getAs[Long]("n_days") >= 10)
    // RSS_restricted >= RSS_unrestricted for nested OLS; the integer SSE
    // rounding can only move the ratio by a hair
    assert(r.getAs[Double]("f_stat") >= -0.01)
    assert(!r.getAs[Double]("coef_ylag").isNaN && !r.getAs[Double]("coef_xlag").isNaN)
  }

  test("round-9 operators are shuffle-partition-count invariant") {
    // the determinism contract says parallelism must not change results;
    // run the ops-level pipelines (not the memoized graded wrappers, which
    // would short-circuit the second run) at 3 and 32 shuffle partitions
    import org.apache.spark.sql.functions.{col => c}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val ops = graft.engine.Tables(spark, sf, "events")
      .select(c("user_id"), expr("unix_micros(ts)").as("ts_us"), c("event_id"),
        graft.engine.Det.cents(c("value")).cast("long").as("cents"),
        (c("event_type") === "error").as("del"))
    def runAll(): Seq[Seq[String]] = {
      import spark.implicits._
      Seq(
        graft.ops.Dedup.substringSpans(docs)
          .orderBy("doc_a", "doc_b", "start_a")
          .collect().map(_.mkString("|")).toSeq,
        graft.streaming.CdcUpsert.upserts(ops.as[graft.streaming.CdcUpsert.Op])
          .toDF().orderBy("user_id")
          .collect().map(_.mkString("|")).toSeq,
        SparkEntry.queries("dq_drift_jsd")(spark, sf)
          .collect().map(_.mkString("|")).toSeq,
        SparkEntry.queries("sample_weighted_reservoir")(spark, sf)
          .collect().map(_.mkString("|")).toSeq)
    }
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val at3 = runAll()
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val at32 = runAll()
      at3.zip(at32).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a == b, s"pipeline $i differs across partition counts")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("sql_pivot / sql_unpivot: pivot cells reconcile with unpivot rows") {
    val pivot = SparkEntry.queries("sql_pivot")(spark, sf).collect()
      .map(r => r.getAs[String]("flag") ->
        (Option(r.getAs[java.lang.Long]("qty_o")).map(_.longValue).getOrElse(0L)
          + Option(r.getAs[java.lang.Long]("qty_f")).map(_.longValue).getOrElse(0L)))
      .toMap
    val unpivot = SparkEntry.queries("sql_unpivot")(spark, sf).collect()
      .filter(_.getAs[String]("metric") == "qty")
      .map(r => r.getAs[String]("flag") -> r.getAs[Long]("val")).toMap
    assert(pivot.nonEmpty && unpivot.keySet == pivot.keySet)
    // every flag's O+F pivot quantity equals the unpivot qty metric
    // (statuses O and F partition the fixture's lineitem rows)
    pivot.foreach { case (flag, total) =>
      assert(unpivot(flag) == total, s"flag $flag: pivot $total != unpivot ${unpivot(flag)}")
    }
  }
}
