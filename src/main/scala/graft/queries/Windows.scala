package graft.queries

import graft.engine.{Det, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY §2.5).
  *
  * Every window ORDER BY carries a unique tiebreaker (P10): row_number /
  * ntile / lag / first / running frames are only deterministic under a
  * total order. rank/dense_rank/percent_rank/cume_dist are value-based and
  * tie-stable by definition.
  *
  * Scale note: one shuffle per distinct partitioning; queries reuse a
  * single partitioning so Spark plans exactly one exchange + sort.
  */
object Windows extends QueryPack {
  import Det._

  private def byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))

  q("win_row_number",
    """SELECT event_id, user_id,
      |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |FROM events
      |ORDER BY user_id, rn""") { (s, dir) =>
    Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"), row_number().over(byUser).as("rn"))
      .orderBy("user_id", "rn")
  }

  q("win_rank_dense",
    """SELECT p_brand, p_partkey, p_size,
      |  rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS rk,
      |  dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS drk
      |FROM part
      |ORDER BY p_brand, p_size, p_partkey""") { (s, dir) =>
    val w = Window.partitionBy("p_brand").orderBy("p_size")
    Tables(s, dir, "part")
      .select(col("p_brand"), col("p_partkey"), col("p_size"),
        rank().over(w).as("rk"), dense_rank().over(w).as("drk"))
      .orderBy("p_brand", "p_size", "p_partkey")
  }

  q("win_ntile",
    """SELECT event_id, user_id,
      |  ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS quartile
      |FROM events
      |ORDER BY user_id, event_id""") { (s, dir) =>
    Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"), ntile(4).over(byUser).as("quartile"))
      .orderBy("user_id", "event_id")
  }

  q("win_lag_lead",
    """SELECT event_id, user_id, value,
      |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
      |  lead(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
      |FROM events
      |ORDER BY user_id, event_id""") { (s, dir) =>
    Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(byUser).as("prev_value"),
        lead(col("value"), 1).over(byUser).as("next_value"))
      .orderBy("user_id", "event_id")
  }

  q("win_first_last",
    """SELECT c_custkey, c_nationkey,
      |  first_value(c_custkey) OVER w AS first_cust,
      |  last_value(c_custkey)  OVER w AS last_cust
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC NULLS LAST, c_custkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY c_nationkey, c_custkey""") { (s, dir) =>
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc_nulls_last, col("c_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        first(col("c_custkey")).over(w).as("first_cust"),
        last(col("c_custkey")).over(w).as("last_cust"))
      .orderBy("c_nationkey", "c_custkey")
  }

  q("win_running_sum",
    s"""SELECT event_id, user_id,
      |  CAST(SUM(${oFix("value", 2)}) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
      |       AS running_value
      |FROM events
      |ORDER BY user_id, event_id""") { (s, dir) =>
    val w = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        (sum(fix(col("value"), 2)).over(w).cast("double") / 100).as("running_value"))
      .orderBy("user_id", "event_id")
  }

  q("win_sliding_avg",
    s"""SELECT event_id, user_id,
      |  round(CAST(SUM(${oFix("value", 2)}) OVER w AS DOUBLE) / 100
      |        / COUNT(*) OVER w, 4) AS avg_7
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""") { (s, dir) =>
    val w = byUser.rowsBetween(-6, Window.currentRow)
    Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        round(sum(fix(col("value"), 2)).over(w).cast("double") / 100
          / count(lit(1)).over(w), 4).as("avg_7"))
      .orderBy("user_id", "event_id")
  }

  q("win_range_frame",
    """SELECT o_orderkey, o_custkey, CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch,
      |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
      |                 RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS n_last_30d
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""") { (s, dir) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(unix_timestamp(col("o_orderdate")))
      .rangeBetween(-2592000L, Window.currentRow)
    Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        unix_timestamp(col("o_orderdate")).as("order_epoch"),
        count(lit(1)).over(w).as("n_last_30d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  // ratio-to-report: each row's share of its group total — the classic
  // reporting window (no frame: the whole partition is the denominator).
  // Integer-cents numerator/denominator → one IEEE division → round(6).
  q("win_ratio_to_report",
    s"""SELECT o_orderkey, o_custkey,
      |  round(CAST(${Det.oCents("o_totalprice")} AS DOUBLE)
      |        / SUM(${Det.oCents("o_totalprice")})
      |            OVER (PARTITION BY o_custkey), 6) AS share
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""") { (s, dir) =>
    val cents = Det.fix(col("o_totalprice"), 2).cast("long")
    val w = Window.partitionBy("o_custkey")
    Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        round(cents.cast("double") / sum(cents).over(w), 6).as("share"))
      .orderBy("o_custkey", "o_orderkey")
  }

  // moving median over a bounded ROWS frame — the robust rolling statistic
  // (outlier-resistant, unlike the moving average). Spark refuses ordered-
  // set aggregates over frames, so the frame is materialized with
  // collect_list + sort_array and the median read out positionally —
  // ≤7 longs per row, codegen'd. Values ride integer cents; a median of
  // integers interpolates at worst to .5, exact in double (P2).
  q("win_median_frame",
    """SELECT user_id, event_id, v_cents,
      |  median(v_cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
      |FROM (
      |  SELECT user_id, event_id, ts,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_cents
      |  FROM events
      |)
      |ORDER BY user_id, event_id""") { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-6, Window.currentRow)
    val lst = sort_array(collect_list(col("v_cents")).over(w))
    val n = size(lst)
    val med = when(n % 2 === 1,
        element_at(lst, ((n + 1) / 2).cast("int")).cast("double"))
      .otherwise(
        (element_at(lst, (n / 2).cast("int"))
          + element_at(lst, (n / 2).cast("int") + 1)).cast("double") / 2)
    Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        Det.fix(col("value"), 2).cast("long").as("v_cents"))
      .select(col("user_id"), col("event_id"), col("v_cents"),
        med.as("med7"))
      .orderBy("user_id", "event_id")
  }

  // IGNORE NULLS offsets: carry the last observed value across gaps — the
  // sensor-fill / last-known-good idiom. Nulls are derived (error events),
  // since the graded tables are NULL-free; values go through per-row
  // fixed-point so the carried numbers are integers (P2).
  q("win_ignore_nulls",
    """SELECT user_id, event_id, v,
      |  lag(v IGNORE NULLS) OVER w AS prev_v,
      |  last_value(v IGNORE NULLS) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
      |                                   AND CURRENT ROW) AS last_good_v
      |FROM (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN event_type = 'error' THEN NULL
      |         ELSE CAST(floor(value * 100 + 0.5) AS BIGINT) END AS v
      |  FROM events
      |)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""") { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("event_type") === "error", lit(null))
          .otherwise(Det.fix(col("value"), 2).cast("long")).as("v"))
      .select(col("user_id"), col("event_id"), col("v"),
        lag(col("v"), 1, null, ignoreNulls = true).over(w).as("prev_v"),
        last(col("v"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("last_good_v"))
      .orderBy("user_id", "event_id")
  }

  q("win_percent_cume",
    """SELECT p_brand, p_partkey, p_size,
      |  round(percent_rank() OVER (PARTITION BY p_brand ORDER BY p_size), 6) AS pr,
      |  round(cume_dist()    OVER (PARTITION BY p_brand ORDER BY p_size), 6) AS cd
      |FROM part
      |ORDER BY p_brand, p_size, p_partkey""") { (s, dir) =>
    val w = Window.partitionBy("p_brand").orderBy("p_size")
    Tables(s, dir, "part")
      .select(col("p_brand"), col("p_partkey"), col("p_size"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy("p_brand", "p_size", "p_partkey")
  }

  // Hampel filter — the robust sliding-window outlier detector for time
  // series (win_median_frame's median plus a windowed MAD): a point is an
  // outlier when it sits > 3·1.4826·MAD from its trailing-7 median. Both
  // medians interpolate on the exact cents grid (.0/.5 and .0/.25/.75
  // deviations), so the per-row robust z is engine-identical double math.
  // One window shuffle on the high-cardinality user key.
  q("win_hampel",
    """WITH e AS (
      |  SELECT user_id, event_id, ts,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      |  FROM events
      |), l AS (
      |  SELECT user_id, event_id, vc,
      |    list_sort(list(vc) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS lst
      |  FROM e
      |), m AS (
      |  SELECT *, CASE WHEN len(lst) % 2 = 1
      |      THEN CAST(lst[(len(lst)+1)//2] AS DOUBLE)
      |      ELSE CAST(lst[len(lst)//2] + lst[len(lst)//2 + 1] AS DOUBLE) / 2
      |    END AS med
      |  FROM l
      |), d AS (
      |  SELECT *, list_sort(list_transform(lst, x -> abs(CAST(x AS DOUBLE) - med))) AS devs
      |  FROM m
      |), z AS (
      |  SELECT user_id, event_id, vc, med,
      |    CASE WHEN len(devs) % 2 = 1 THEN devs[(len(devs)+1)//2]
      |         ELSE (devs[len(devs)//2] + devs[len(devs)//2 + 1]) / 2
      |    END AS mad
      |  FROM d
      |)
      |SELECT user_id, event_id, vc,
      |  round(abs(vc - med) / (1.4826 * mad), 4) AS robust_z
      |FROM z
      |WHERE mad > 0 AND abs(vc - med) > 3 * 1.4826 * mad
      |ORDER BY user_id, event_id""") { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-6, Window.currentRow)
    val lst = sort_array(collect_list(col("vc")).over(w))
    def medOf(a: org.apache.spark.sql.Column) = {
      val n = size(a)
      when(n % 2 === 1, element_at(a, ((n + 1) / 2).cast("int")).cast("double"))
        .otherwise((element_at(a, (n / 2).cast("int"))
          + element_at(a, (n / 2).cast("int") + 1)).cast("double") / 2)
    }
    def medOfD(a: org.apache.spark.sql.Column) = {
      val n = size(a)
      when(n % 2 === 1, element_at(a, ((n + 1) / 2).cast("int")))
        .otherwise((element_at(a, (n / 2).cast("int"))
          + element_at(a, (n / 2).cast("int") + 1)) / 2)
    }
    Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        Det.fix(col("value"), 2).cast("long").as("vc"))
      .withColumn("lst", lst)
      .withColumn("med", medOf(col("lst")))
      .withColumn("devs", sort_array(
        transform(col("lst"), x => abs(x.cast("double") - col("med")))))
      .withColumn("mad", medOfD(col("devs")))
      .filter(col("mad") > 0 &&
        abs(col("vc") - col("med")) > lit(3) * lit(1.4826) * col("mad"))
      .select(col("user_id"), col("event_id"), col("vc"),
        round(abs(col("vc") - col("med")) / (lit(1.4826) * col("mad")), 4)
          .as("robust_z"))
      .orderBy("user_id", "event_id")
  }

  // Gaps-and-islands: per-user runs of CONSECUTIVE active days (the streak
  // metric every engagement dashboard carries). The classic trick: within
  // a user, (day - row_number over day) is constant exactly along a run of
  // consecutive days, so streaks fall out of one groupBy on that derived
  // key. Day = integer epoch-day offset (no DATE columns in output — P11);
  // all counts exact integers. Two shuffles total (distinct + the window's
  // user partition), both on user_id — scale is per-user state, the same
  // horizontal story as sessionization.
  q("win_gap_islands",
    """WITH d AS (
      |  SELECT DISTINCT user_id,
      |    date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)) AS day
      |  FROM events
      |), r AS (
      |  SELECT user_id, day,
      |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      |  FROM d
      |), st AS (
      |  SELECT user_id, grp, COUNT(*) AS len FROM r GROUP BY user_id, grp
      |)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_streaks,
      |  CAST(MAX(len) AS BIGINT) AS longest,
      |  CAST(SUM(len) AS BIGINT) AS active_days
      |FROM st GROUP BY user_id ORDER BY user_id""") { (s, dir) =>
    val d = Tables(s, dir, "events")
      .select(col("user_id"),
        datediff(to_date(date_trunc("day", col("ts"))),
          lit("2024-01-01").cast("date")).as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    d.withColumn("grp", col("day") - row_number().over(w))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n_streaks"),
        max("len").cast("long").as("longest"),
        sum("len").cast("long").as("active_days"))
      .orderBy("user_id")
  }

  // Running COUNT(DISTINCT) over a window — neither engine supports
  // DISTINCT inside a window frame, and a naive collect_set-per-row frame
  // is O(frame²) memory. The standard scalable form: flag each row that is
  // the FIRST occurrence of its (user, type) pair (one row_number window),
  // then a running SUM of flags (second window, same user partitioning —
  // Spark plans one exchange, two sorts). Exact, deterministic under the
  // (ts, event_id) total order, linear state per user.
  q("win_count_distinct_running",
    """WITH f AS (
      |  SELECT event_id, user_id, ts,
      |    CASE WHEN row_number() OVER (
      |      PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
      |      THEN 1 ELSE 0 END AS first_seen
      |  FROM events
      |)
      |SELECT event_id, user_id,
      |  CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS n_types_so_far
      |FROM f ORDER BY user_id, event_id""") { (s, dir) =>
    val wf = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    val wr = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "events")
      .withColumn("first_seen",
        when(row_number().over(wf) === 1, 1).otherwise(0))
      .select(col("event_id"), col("user_id"),
        sum("first_seen").over(wr).cast("long").as("n_types_so_far"))
      .orderBy("user_id", "event_id")
  }

  // TIME-interval RANGE frame: per-user trailing-72-hour spend and event
  // count at every purchase — the time-windowed feature a resample can't
  // give (each row gets ITS OWN trailing window, not a calendar bucket).
  // Both engines frame on epoch-MICROsecond numeric range (±0 skew: a
  // RANGE INTERVAL frame over raw timestamps and a numeric frame over
  // epoch_us admit identical peers), so sub-second timestamps can never
  // split the frame differently. Scale: one shuffle on user_id, frames
  // computed in a single pass per partition — never a self-join.
  q("win_time_range",
    """SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
      |  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS DOUBLE) / 100
      |    AS spend_72h,
      |  CAST(COUNT(*) OVER w AS BIGINT) AS n_72h
      |FROM events
      |WHERE event_type = 'purchase'
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(epoch_us(ts) AS BIGINT)
      |  RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, ts_us, event_id""") { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
      .rangeBetween(-259200000000L, 0L)
    Tables(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        (sum(Det.cents(col("value")).cast("long")).over(w).cast("double") / 100)
          .as("spend_72h"),
        count(lit(1)).over(w).cast("long").as("n_72h"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  // Conditional-reset running total — the "basket since last purchase"
  // shape: a per-user running spend that restarts after every purchase
  // event. Two stacked windows, both partitioned by user: a running count
  // of prior purchases numbers the segments, then the cumulative sum runs
  // within (user, segment). No global sort; both windows share the same
  // per-user shuffle at scale. Money rides integer cents end-to-end.
  q("win_cumulative_reset",
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
      |    event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events
      |), seg AS (
      |  SELECT user_id, event_id, ts_us, cents,
      |    COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg
      |  FROM e
      |)
      |SELECT user_id, event_id, ts_us, CAST(seg AS BIGINT) AS seg,
      |  CAST(SUM(cents) OVER (PARTITION BY user_id, seg
      |    ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
      |    AS basket
      |FROM seg ORDER BY user_id, ts_us, event_id""") { (s, dir) =>
    val e = Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"),
        Det.cents(col("value")).cast("long").as("cents"))
    val wPrior = Window.partitionBy("user_id")
      .orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val seg = e.withColumn("seg",
      coalesce(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .over(wPrior), lit(0L)))
    val wRun = Window.partitionBy("user_id", "seg")
      .orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seg.select(col("user_id"), col("event_id"), col("ts_us"),
        col("seg").cast("long").as("seg"),
        (sum("cents").over(wRun).cast("double") / 100).as("basket"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  // Frame-exclusion window: sum of the ±3-row neighborhood EXCLUDING the
  // current row ("how much did my neighbors spend"). Spark's window frames
  // have no EXCLUDE clause, so the engine computes the full ±3 frame sum
  // and subtracts the current row's value — algebraically identical on the
  // exact integer cents. The oracle uses DuckDB's native
  // EXCLUDE CURRENT ROW, making this a cross-engine parity check of the
  // SQL:2016 frame-exclusion semantics. Per-user partitions: fully
  // parallel, no global window.
  q("win_frame_exclude",
    """SELECT user_id, event_id,
      |  CAST(COALESCE(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
      |    EXCLUDE CURRENT ROW), 0) AS DOUBLE) / 100 AS neighbor_sum
      |FROM events
      |ORDER BY user_id, event_id""") { (s, dir) =>
    val e = Tables(s, dir, "events")
      .withColumn("cents", Det.cents(col("value")).cast("long"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-3, 3)
    e.select(col("user_id"), col("event_id"),
        ((sum("cents").over(w) - col("cents")).cast("double") / 100)
          .as("neighbor_sum"))
      .orderBy("user_id", "event_id")
  }
}
