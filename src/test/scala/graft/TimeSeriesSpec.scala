package graft

import org.apache.spark.sql.functions._

/** Structural + reference checks for the TimeSeriesOps pack. The DuckDB
  * rehearsal is the cell-exact gate; these pin the properties a hash can't
  * explain on its own (fill completeness, interpolation bounds, the EWMA
  * recurrence against an in-JVM reference fold, chunk coverage, quintile
  * balance).
  */
class TimeSeriesSpec extends SparkSpec {

  test("ts_resample_ffill: grid is contiguous per user, no null values, obs rows preserved") {
    val out = SparkEntry.queries("ts_resample_ffill")(spark, sf).cache()
    assert(out.filter(col("v").isNull).count() == 0, "forward fill left a hole")
    // per-user day count == span length (contiguous daily grid)
    val bad = out.groupBy("user_id")
      .agg(count(lit(1)).as("rows"),
        (datediff(max(to_date(col("day"))), min(to_date(col("day")))) + 1).as("span"))
      .filter(col("rows") =!= col("span")).count()
    assert(bad == 0, "grid has missing or duplicate days")
    assert(out.filter(col("src") === "obs").count() > 0)
  }

  test("ts_gap_fill_interp: interpolated values stay within neighbor bounds") {
    val out = SparkEntry.queries("ts_gap_fill_interp")(spark, sf).cache()
    assert(out.filter(col("v").isNull).count() == 0)
    // every interpolated day sits strictly inside an observed span, so its
    // value must lie within [min, max] of that user's observed values
    val obs = out.filter(col("src") === "obs")
      .groupBy("user_id").agg(min("v").as("lo"), max("v").as("hi"))
    val oob = out.filter(col("src") === "interp").join(obs, "user_id")
      .filter(col("v") < col("lo") - 1e-9 || col("v") > col("hi") + 1e-9)
      .count()
    assert(oob == 0, "linear interpolation escaped the observed envelope")
  }

  test("ts_ewma matches an in-JVM reference fold of its own daily inputs") {
    val out = SparkEntry.queries("ts_ewma")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getDouble(2), r.getDouble(3)))
    val byUser = out.groupBy(_._1)
    byUser.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      var ew = 0.0
      sorted.zipWithIndex.foreach { case ((_, _, x, got), i) =>
        ew = if (i == 0) x else 0.3 * x + 0.7 * ew
        val want = math.floor(ew * 10000 + 0.5) / 10000
        assert(got == want, s"EWMA fold diverged at step $i: $got != $want")
      }
    }
  }

  test("win_rolling_corr: r bounded, frame never exceeds 11 rows") {
    val out = SparkEntry.queries("win_rolling_corr")(spark, sf).cache()
    assert(out.filter(col("n") > 11).count() == 0)
    assert(out.filter(abs(col("r")) > 1.0 + 1e-9).count() == 0,
      "correlation left [-1, 1]")
    assert(out.filter(col("r").isNotNull).count() > 0)
  }

  test("events_ab_welch: one row per non-baseline type with finite stats") {
    val rows = SparkEntry.queries("events_ab_welch")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == Set("click", "error", "purchase", "signup"))
    rows.foreach { r =>
      assert(!r.isNullAt(3) && !r.getDouble(3).isNaN, "t-statistic not finite")
      assert(r.getDouble(4) > 0, "Welch df must be positive")
    }
  }

  test("the RFM ntile closed form equals SQL ntile semantics for every n up to 500") {
    // pure-JVM pin of the formula events_rfm spells out on both engines:
    // ntile(5) gives the first (n mod 5) buckets ⌈n/5⌉ rows, the rest ⌊n/5⌋
    for (n <- 1 to 500) {
      val big = n / 5 + 1
      val cut = big.toLong * (n % 5)
      var expect = Vector.empty[Int]
      val sizes = (1 to 5).map(b => n / 5 + (if (b <= n % 5) 1 else 0))
      sizes.zipWithIndex.foreach { case (sz, i) =>
        expect = expect ++ Vector.fill(sz)(i + 1)
      }
      for (rn <- 1 to n) {
        val got =
          if (rn <= cut) (rn - 1) / big + 1
          else (n % 5) + (rn - 1 - cut).toInt / (n / 5) + 1
        assert(got == expect(rn - 1), s"n=$n rn=$rn: formula $got != ntile ${expect(rn - 1)}")
      }
    }
  }

  test("events_rfm: quintile scores in 1..5 with balanced buckets") {
    val out = SparkEntry.queries("events_rfm")(spark, sf).cache()
    val n = out.count()
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val sizes = out.groupBy(c).count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(sizes.keySet.subsetOf((1 to 5).toSet), s"$c outside 1..5")
      // ntile semantics: bucket sizes differ by at most 1
      assert(sizes.values.max - sizes.values.min <= 1, s"$c buckets unbalanced")
      assert(sizes.values.sum == n)
    }
  }

  test("llm_chunk_overlap: chunks tile each document with stride 24") {
    val docs = engine.Tables(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val chunks = SparkEntry.queries("llm_chunk_overlap")(spark, sf)
      .collect().groupBy(_.getLong(0))
    chunks.foreach { case (docId, rows) =>
      val tk = docs(docId)
      val sorted = rows.sortBy(_.getInt(1))
      sorted.foreach { r =>
        val k = r.getInt(1)
        val expect = tk.slice(k * 24, k * 24 + 32)
        assert(r.getString(3) == expect.mkString(" "),
          s"chunk $k of doc $docId mismatched")
        assert(r.getInt(2) == expect.size)
      }
      // full coverage: last chunk reaches the document's end
      val last = sorted.last
      assert(last.getInt(1) * 24 + last.getInt(2) == tk.size,
        s"doc $docId tail not covered")
    }
  }

  test("llm_url_dedup: canonical urls carry no noise and keep the lowest doc") {
    val out = SparkEntry.queries("llm_url_dedup")(spark, sf).collect()
    out.foreach { r =>
      val u = r.getString(0)
      assert(u == u.toLowerCase, "canonical url not lowercased")
      assert(!u.contains("utm") && !u.contains("ref=") && !u.contains("#")
        && !u.contains(":443") && !u.contains("www."), s"noise survived: $u")
    }
    assert(out.map(_.getLong(1)).sum ==
      engine.Tables(spark, sf, "documents").count(),
      "every source url must land in exactly one canonical group")
  }

  test("dq_benford: nine digits, observed mass sums to ~1") {
    val rows = SparkEntry.queries("dq_benford")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet.subsetOf(('1' to '9').map(_.toString).toSet))
    val mass = rows.map(_.getDouble(2)).sum
    assert(math.abs(mass - 1.0) < 1e-2, s"observed fractions sum to $mass")
  }

  test("ts_cusum: statistic non-negative, alarm agrees with threshold, fold matches reference") {
    val rows = SparkEntry.queries("ts_cusum")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getInt(4)))
    rows.foreach { case (_, _, _, c, a) =>
      assert(c >= 0.0, "CUSUM went negative")
      assert((a == 1) == (c > 10.0), "alarm flag disagrees with threshold")
    }
    rows.groupBy(_._1).foreach { case (_, userRows) =>
      val sorted = userRows.sortBy(_._2)
      val xs = sorted.map(_._3)
      // reference: mu = 4-dp mean of the daily xs, same fixed-point form
      val mu = math.floor(xs.map(x => math.floor(x * 10000 + 0.5)).sum
        / xs.length + 0.5) / 10000
      var sAcc = 0.0
      sorted.zipWithIndex.foreach { case ((_, _, x, got, _), i) =>
        sAcc = math.max(0.0, sAcc + (x - mu - 1.0))
        assert(got == math.floor(sAcc * 10000 + 0.5) / 10000,
          s"CUSUM fold diverged at step $i")
      }
    }
  }

  test("ts_holt: level/trend recurrence matches an in-JVM reference fold") {
    val rows = SparkEntry.queries("ts_holt")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    rows.groupBy(_._1).foreach { case (_, userRows) =>
      val sorted = userRows.sortBy(_._2)
      var l = 0.0; var b = 0.0
      sorted.zipWithIndex.foreach { case ((_, _, x, gl, gb, gf), i) =>
        if (i == 0) { l = x; b = 0.0 }
        else {
          val nl = 0.5 * x + 0.5 * (l + b)
          val nb = 0.3 * ((0.5 * x + 0.5 * (l + b)) - l) + 0.7 * b
          l = nl; b = nb
        }
        def q4(v: Double) = math.floor(v * 10000 + 0.5) / 10000
        assert(gl == q4(l) && gb == q4(b) && gf == q4(l + b),
          s"Holt fold diverged at step $i")
      }
    }
  }

  test("ts_autocorr: correlation bounded, pair counts below day count") {
    val out = SparkEntry.queries("ts_autocorr")(spark, sf).cache()
    assert(out.filter(abs(col("r")) > 1.0 + 1e-9).count() == 0)
    assert(out.filter(col("n_pairs") < 1).count() == 0)
  }

  test("ts_dow_seasonality: weekdays 0..6, count-weighted index centers on 1") {
    val rows = SparkEntry.queries("ts_dow_seasonality")(spark, sf).collect()
    assert(rows.map(_.getInt(1)).forall(d => d >= 0 && d <= 6))
    rows.groupBy(_.getString(0)).foreach { case (et, grp) =>
      val n = grp.map(_.getLong(2)).sum.toDouble
      val centered = grp.map(r => r.getDouble(4) * r.getLong(2)).sum / n
      assert(math.abs(centered - 1.0) < 0.01,
        s"$et seasonal indices don't average to 1: $centered")
    }
  }

  test("events_chi2_independence: margins reconstruct, expectations sum to row totals") {
    val rows = SparkEntry.queries("events_chi2_independence")(spark, sf).collect()
    val total = rows.map(_.getLong(2)).sum.toDouble
    rows.groupBy(_.getString(0)).foreach { case (et, grp) =>
      val obs = grp.map(_.getLong(2)).sum.toDouble
      val exp = grp.map(_.getDouble(3)).sum
      assert(math.abs(obs - exp) < 0.01 * total,
        s"$et expected counts don't reconstruct the row margin: $obs vs $exp")
    }
    rows.foreach(r => assert(r.getDouble(4) >= 0.0, "negative chi2 term"))
  }

  test("emb_pca_power: unit-norm loading, positive eigenvalue, Rayleigh consistency") {
    val rows = SparkEntry.queries("emb_pca_power")(spark, sf).collect()
    assert(rows.length == 64)
    val v = rows.sortBy(_.getInt(0)).map(_.getDouble(1))
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"loading norm $norm not ~1")
    val lambda = rows.head.getDouble(2)
    assert(rows.forall(_.getDouble(2) == lambda), "eigenvalue differs across rows")
    assert(lambda > 0, "eigenvalue must be positive")
    // Rayleigh check against the raw data: v'Cv should be close to λ
    val vecs = engine.Tables(spark, sf, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val proj = vecs.map(e => e.zip(v).map { case (a, b) => a * b }.sum)
    // λ is |C·v₂| (the pre-normalization norm of round 3) while the
    // Rayleigh quotient uses v₃ — after only 3 rounds they still differ
    // by a few percent on this spectrum; the check guards order-of-
    // magnitude sanity, not convergence
    val rayleigh = proj.map(p => p * p).sum / vecs.length
    assert(math.abs(rayleigh - lambda) < 0.15 * lambda,
      s"v'Cv = $rayleigh far from eigenvalue $lambda")
  }

  test("ts_anomaly_seasonal: flags only |z| > 3 and stays a small subset") {
    val out = SparkEntry.queries("ts_anomaly_seasonal")(spark, sf).cache()
    assert(out.filter(abs(col("z")) <= 3.0).count() == 0, "unflagged row emitted")
    val total = engine.Tables(spark, sf, "events").count()
    assert(out.count() < total / 20, "more than 5% flagged — threshold broken")
  }

  test("ts_mann_kendall: S bounded by pair count, z sign follows S") {
    val mk = SparkEntry.queries("ts_mann_kendall")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    mk.foreach { case (u, n, s, z) =>
      assert(math.abs(s) <= n * (n - 1) / 2, s"user $u: |S| exceeds pair count")
      z.foreach { zz =>
        assert(math.signum(zz) == math.signum(s.toDouble) || zz == 0.0,
          s"user $u: z sign disagrees with S")
        assert(math.abs(zz) < 10, s"user $u: implausible z $zz")
      }
    }
  }

  test("ts_theil_sen: pair counts match the day count, slope within daily deltas") {
    val mk = SparkEntry.queries("ts_mann_kendall")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ts = SparkEntry.queries("ts_theil_sen")(spark, sf).collect()
    ts.foreach { r =>
      val (u, np, slope) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val n = mk(u)
      assert(np == n * (n - 1) / 2, s"user $u: pair count $np != C($n,2)")
      // daily averages live in ~[0, 200]; a median per-day slope outside
      // ±200 would mean a broken delta somewhere
      assert(math.abs(slope) <= 200, s"user $u: slope $slope out of range")
    }
  }

  test("dq_checksum_table: checksum is partitioning-invariant and flips on any row change") {
    val base = SparkEntry.queries("dq_checksum_table")(spark, sf).collect()(0)
    // recompute over a deliberately re-partitioned copy — the sums must
    // not care how rows are distributed
    val shuffled = engine.Tables(spark, sf, "orders").repartition(13)
    val ck = shuffled.agg(
      count(lit(1)).cast("long"),
      sum(conv(substring(md5(col("o_orderkey").cast("string").cast("binary")),
        1, 8), 16, 10).cast("long"))).collect()(0)
    assert(base.getLong(0) == ck.getLong(0) && base.getLong(1) == ck.getLong(1),
      "checksum changed under repartitioning")
  }

  test("dq_referential_integrity: all seven edges audited, fixture is orphan-free") {
    val rows = SparkEntry.queries("dq_referential_integrity")(spark, sf).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"${r.getString(0)}: empty child table")
      // the generated fixture is referentially intact — any orphan here
      // means the audit itself (or a loader) broke
      assert(r.getLong(3) == 0, s"${r.getString(0)}: unexpected orphans")
    }
  }

  test("events_funnel_latency: conversions bounded by signups, percentiles ordered") {
    val rows = SparkEntry.queries("events_funnel_latency")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ns, nc) = (r.getLong(1), r.getLong(2))
      assert(nc <= ns, "more conversions than signups")
      if (!r.isNullAt(4) && !r.isNullAt(5))
        assert(r.getDouble(4) <= r.getLong(5) + 1e-9, "median above p90")
    }
  }

  test("emb_whiten: residual norms shrink and satisfy Pythagoras against the projection") {
    val rows = SparkEntry.queries("emb_whiten")(spark, sf).collect()
    rows.foreach { r =>
      val (p, nb, na) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(na <= nb + 1e-9, "removing a component cannot grow the norm")
      // v is unit norm, so nb² ≈ na² + p² up to the 4-dp quantization
      assert(math.abs(nb * nb - (na * na + p * p)) < 1e-2,
        s"Pythagoras violated: nb=$nb na=$na p=$p")
    }
  }

  test("emb_kmeans matches an in-JVM Lloyd reference with identical fixed-point math") {
    val vecs = engine.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val k = 8
    // seeds: k lowest vec_ids, raw (unquantized) coordinates
    var cents: Map[Long, Array[Double]] =
      vecs.take(k).map { case (id, v) => id -> v }.toMap
    def d2(v: Array[Double], m: Array[Double]): Long =
      v.zip(m).map { case (e, c) =>
        math.floor((e - c) * (e - c) * 100000000L + 0.5).toLong }.sum
    var assign: Array[(Long, Long, Long)] = null // (vec, cid, d2)
    for (_ <- 1 to 3) {
      assign = vecs.map { case (id, v) =>
        val (cid, dd) = cents.toSeq.map { case (c, m) => (c, d2(v, m)) }
          .minBy { case (c, dd) => (dd, c) }
        (id, cid, dd)
      }
      val vmap = vecs.toMap
      cents = assign.groupBy(_._2).map { case (cid, members) =>
        val vs = members.map(m => vmap(m._1))
        val m = Array.tabulate(vs.head.length) { d =>
          val sumFix = vs.map(v => math.floor(v(d) * 1000000 + 0.5).toLong).sum
          math.floor(sumFix.toDouble / vs.length + 0.5) / 1000000
        }
        cid -> m
      }
    }
    val want = assign.groupBy(_._2).map { case (cid, ms) =>
      cid -> (ms.length.toLong, ms.map(_._3).sum.toDouble / 100000000L)
    }
    val got = SparkEntry.queries("emb_kmeans")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == want, s"kmeans clusters diverged: got $got want $want")
  }

  test("ts_ewm_crossover: signals only fire on actual fast/slow order " +
    "flips and each type's first day is silent") {
    val rows = SparkEntry.queries("ts_ewm_crossover")(spark, sf)
      .orderBy("event_type", "day").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      assert(rs.head.getAs[Long]("signal") === 0L, "first day must be silent")
      rs.sliding(2).filter(_.length == 2).foreach { w =>
        val (prev, cur) = (w(0), w(1))
        def up(r: org.apache.spark.sql.Row) =
          r.getAs[Double]("ewma_fast") > r.getAs[Double]("ewma_slow")
        val sig = cur.getAs[Long]("signal")
        assert(sig >= -1L && sig <= 1L)
        // 4-dp quantization can only blur exact ties; a ±1 signal must
        // agree with the quantized order unless the two averages tie
        if (sig == 1L && cur.getAs[Double]("ewma_fast") != cur.getAs[Double]("ewma_slow"))
          assert(up(cur), "golden cross but fast below slow")
        if (sig == -1L && cur.getAs[Double]("ewma_fast") != cur.getAs[Double]("ewma_slow"))
          assert(!up(cur), "death cross but fast above slow")
      }
    }
  }

  test("ts_ar2_yule_walker: correlations bounded, innovation ratio in (0, 1]") {
    val r = SparkEntry.queries("ts_ar2_yule_walker")(spark, sf).head
    assert(math.abs(r.getAs[Double]("r1")) <= 1.0)
    assert(math.abs(r.getAs[Double]("r2")) <= 1.0)
    val nr = r.getAs[Double]("noise_ratio")
    // a valid ACF keeps the AR(2) innovation variance positive and the
    // fit can only ever EXPLAIN variance, never add it
    assert(nr > 0.0 && nr <= 1.0, s"noise_ratio $nr")
  }
}
