#!/usr/bin/env python3
"""Independent recomputation audit for formula-heavy graded queries.

The DuckDB oracle runs the SAME expression tree as the Spark side, so a
mathematical slip in a closed-form statistic passes the hash-compare in
both engines (round 9 found exactly that: ml_linreg_ols's intercept
cofactor had a transposed index). This tool re-derives each statistic
FROM TEXTBOOK DEFINITIONS in plain Python — sharing only the documented
data-preprocessing conventions (cents/4-dp quantization, daily
aggregation, anchor dates) — and compares against the Verify dump.

Usage: python3 tools/formula_audit.py <sfdir> <verify_outdir> [query ...]
"""
import math
import sys
from fractions import Fraction

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vfull"
ONLY = set(sys.argv[3:])

con = duckdb.connect()
fails = []
checked = []


def rows(sql):
    return con.execute(sql).fetchall()


def dump(name):
    return rows(f"SELECT * FROM '{OUT}/{name}/*.parquet'")


def dump_cols(name):
    con.execute(f"SELECT * FROM '{OUT}/{name}/*.parquet' LIMIT 0")
    return [d[0] for d in con.description]


def close(a, b, tol=5e-3):
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    return abs(a - b) <= tol * max(1.0, abs(a), abs(b))


def report(name, mismatches, n):
    checked.append(name)
    if mismatches:
        fails.append(name)
        print(f"FAIL {name}: {len(mismatches)}/{n} cells disagree")
        for m in mismatches[:5]:
            print(f"  {m}")
    else:
        print(f"PASS {name} ({n} cells)")


def events_q4():
    """Per-row values quantized at 4 dp (the Det.fix convention)."""
    return rows(
        "SELECT event_type, CAST(floor(value * 10000 + 0.5) AS BIGINT) "
        f"FROM '{SF}/events.parquet'")


def groups_q4():
    g = {}
    for t, v in events_q4():
        g.setdefault(t, []).append(v / 10000.0)
    return g


def daily_xi():
    """user_id -> [(day, xi)] with xi = rounded 1e-4-unit daily mean,
    replicating the documented avgFix preprocessing."""
    r = rows(
        "SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, "
        "SUM(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS s1, COUNT(*) AS n "
        f"FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2")
    out = {}
    for u, day, s1, n in r:
        q = math.floor(s1 / 10000.0 / n * 10000 + 0.5)  # avgFix 4-dp
        out.setdefault(u, []).append((day, int(q)))
    return out


def sample_var(xs, mean):
    return sum((x - mean) ** 2 for x in xs) / (len(xs) - 1)


def audit_welch():
    g = groups_q4()
    base = g["view"]
    nb, mb = len(base), sum(base) / len(base)
    vb = sample_var(base, mb)
    exp = {}
    for t, xs in g.items():
        if t == "view":
            continue
        n, m = len(xs), sum(xs) / len(xs)
        v = sample_var(xs, m)
        u = v / n + vb / nb
        tstat = (m - mb) / math.sqrt(u)
        df = u * u / ((v / n) ** 2 / (n - 1) + (vb / nb) ** 2 / (nb - 1))
        exp[t] = (m, tstat, df)
    mis = []
    got = dump("events_ab_welch")
    for r in got:
        t, _, mean, tstat, df = r
        em, et, edf = exp[t]
        if not (close(mean, em) and close(tstat, et) and close(df, edf, 2e-3)):
            mis.append((t, "got", (mean, tstat, df), "exp", (em, et, edf)))
    report("events_ab_welch", mis, len(got) * 3)


def central_moments(xs):
    n = len(xs)
    m = sum(xs) / n
    m2 = sum((x - m) ** 2 for x in xs) / n
    m3 = sum((x - m) ** 3 for x in xs) / n
    m4 = sum((x - m) ** 4 for x in xs) / n
    return n, m2, m3, m4


def groups_cents():
    g = {}
    for t, v in rows(
            "SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) "
            f"FROM '{SF}/events.parquet'"):
        g.setdefault(t, []).append(float(v))
    return g


def audit_jarque_bera():
    mis = []
    got = dump("stats_jarque_bera")
    cols = dump_cols("stats_jarque_bera")
    ji = cols.index("jb")
    g = groups_cents()
    for r in got:
        t = r[0]
        n, m2, m3, m4 = central_moments(g[t])
        s = m3 / m2 ** 1.5
        k = m4 / (m2 * m2) - 3
        jb = n / 6.0 * (s * s + k * k / 4)
        if not close(r[ji], jb, 2e-3):
            mis.append((t, "got", r[ji], "exp", jb))
    report("stats_jarque_bera", mis, len(got))


def audit_skew_kurtosis():
    mis = []
    got = dump("agg_skew_kurtosis")
    cols = dump_cols("agg_skew_kurtosis")
    g = groups_cents()
    for r in got:
        row = dict(zip(cols, r))
        t = row["event_type"]
        n, m2, m3, m4 = central_moments(g[t])
        s = m3 / m2 ** 1.5
        k = m4 / (m2 * m2) - 3
        for cname, exp in (("skewness", s), ("kurtosis_excess", k)):
            if cname in row and not close(row[cname], exp, 2e-3):
                mis.append((t, cname, "got", row[cname], "exp", exp))
    report("agg_skew_kurtosis", mis, len(got) * 2)


def audit_mann_kendall():
    mis = []
    series = daily_xi()
    got = dump("ts_mann_kendall")
    cols = dump_cols("ts_mann_kendall")
    for r in got:
        row = dict(zip(cols, r))
        u = row["user_id"]
        xs = [x for _, x in sorted(series[u])]
        nd = len(xs)
        s = sum(
            (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
            for i in range(nd) for j in range(i + 1, nd))
        ties = {}
        for x in xs:
            ties[x] = ties.get(x, 0) + 1
        tcor = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var = (nd * (nd - 1) * (2 * nd + 5) - tcor) / 18.0
        if nd < 2 or var == 0:
            z = None
        elif s > 0:
            z = (s - 1) / math.sqrt(var)
        elif s < 0:
            z = (s + 1) / math.sqrt(var)
        else:
            z = 0.0
        if row["s"] != s or not close(row["z"], z):
            mis.append((u, "got", (row["s"], row["z"]), "exp", (s, z)))
    report("ts_mann_kendall", mis, len(got) * 2)


def audit_theil_sen():
    mis = []
    series = daily_xi()
    got = dump("ts_theil_sen")
    cols = dump_cols("ts_theil_sen")
    for r in got:
        row = dict(zip(cols, r))
        u = row["user_id"]
        pts = sorted(series[u])
        slopes = sorted(
            (x2 - x1) / (d2 - d1).days
            for i, (d1, x1) in enumerate(pts)
            for (d2, x2) in pts[i + 1:])
        c = len(slopes)
        if c == 0:
            continue
        if c % 2 == 1:
            med = slopes[c // 2]
        else:
            med = (slopes[c // 2 - 1] + slopes[c // 2]) / 2
        exp = med / 10000.0  # xi is in 1e-4 units
        if row["n_pairs"] != c or not close(row["slope_per_day"], exp, 2e-3):
            mis.append((u, "got", (row["n_pairs"], row["slope_per_day"]),
                        "exp", (c, exp)))
    report("ts_theil_sen", mis, len(got) * 2)


def audit_autocorr():
    mis = []
    series = daily_xi()
    got = dump("ts_autocorr")
    cols = dump_cols("ts_autocorr")
    for r in got:
        row = dict(zip(cols, r))
        u = row["user_id"]
        xs = [x for _, x in sorted(series[u])]
        pairs = list(zip(xs[1:], xs[:-1]))  # (today, yesterday)
        n = len(pairs)
        if n == 0:
            continue
        sa = sum(a for a, _ in pairs)
        sb = sum(b for _, b in pairs)
        sab = sum(a * b for a, b in pairs)
        saa = sum(a * a for a, _ in pairs)
        sbb = sum(b * b for _, b in pairs)
        da = n * saa - sa * sa
        db = n * sbb - sb * sb
        exp = None if da == 0 or db == 0 else \
            (n * sab - sa * sb) / math.sqrt(float(da) * float(db))
        if row["n_pairs"] != n or not close(row["r"], exp):
            mis.append((u, "got", (row["n_pairs"], row["r"]), "exp", (n, exp)))
    report("ts_autocorr", mis, len(got) * 2)


def audit_kendall_tau():
    mis = []
    r = rows(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, "
        "SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS s, COUNT(*) AS c "
        f"FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2")
    series = {}
    for t, day, s, c in r:
        series.setdefault(t, []).append((day, Fraction(int(s), int(c))))
    got = dump("stats_kendall_tau")
    cols = dump_cols("stats_kendall_tau")
    for row_ in got:
        row = dict(zip(cols, row_))
        t = row["event_type"]
        ys = [y for _, y in sorted(series[t])]
        n = len(ys)
        cd = tt = 0
        for i in range(n):
            for j in range(i + 1, n):
                if ys[j] > ys[i]:
                    cd += 1
                elif ys[j] < ys[i]:
                    cd -= 1
                else:
                    tt += 1
        n0 = n * (n - 1) // 2
        tau = cd / math.sqrt(float(n0) * float(n0 - tt))
        if row["n0"] != n0 or row["cd"] != cd or not close(row["tau_b"], tau):
            mis.append((t, "got", (row["n0"], row["cd"], row["tau_b"]),
                        "exp", (n0, cd, tau)))
    report("stats_kendall_tau", mis, len(got) * 3)


def audit_cramers_v():
    mis = []
    # dow via the repo's documented sign-safe anchor convention
    r = rows(
        "SELECT ((date_diff('day', DATE '2024-01-01', "
        "CAST(date_trunc('day', ts) AS DATE)) % 7) + 7) % 7 AS dow, "
        f"event_type, COUNT(*) FROM '{SF}/events.parquet' GROUP BY 1, 2")
    cells = {(d, t): c for d, t, c in r}
    dows = sorted({d for d, _ in cells})
    types = sorted({t for _, t in cells})
    n = sum(cells.values())
    rowt = {d: sum(cells.get((d, t), 0) for t in types) for d in dows}
    colt = {t: sum(cells.get((d, t), 0) for d in dows) for d in dows for t in types}
    chi2 = 0.0
    for d in dows:
        for t in types:
            e = rowt[d] * colt[t] / n
            o = cells.get((d, t), 0)
            # the repo contract sums 6-dp-rounded cell terms
            chi2 += math.floor((o - e) ** 2 / e * 1e6 + 0.5) / 1e6
    v = math.sqrt(chi2 / (n * (min(len(dows), len(types)) - 1)))
    got = dump("stats_cramers_v")
    cols = dump_cols("stats_cramers_v")
    row = dict(zip(cols, got[0]))
    if not (close(row["chi2"], chi2, 1e-3) and close(row["cramers_v"], v, 1e-3)):
        mis.append(("got", (row["chi2"], row["cramers_v"]), "exp", (chi2, v)))
    report("stats_cramers_v", mis, 2)


def audit_ks_test():
    mis = []
    g = {}
    for t, v in rows(
            "SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) "
            f"FROM '{SF}/events.parquet' "
            "WHERE event_type IN ('click', 'purchase')"):
        g.setdefault(t, []).append(int(v))
    a, b = sorted(g["click"]), sorted(g["purchase"])
    import bisect
    vals = sorted(set(a) | set(b))
    best = 0.0
    for v in vals:
        f1 = bisect.bisect_right(a, v) / len(a)
        f2 = bisect.bisect_right(b, v) / len(b)
        best = max(best, abs(f1 - f2))
    got = dump("events_ks_test")
    cols = dump_cols("events_ks_test")
    row = dict(zip(cols, got[0]))
    if not close(row["ks_d"], best, 1e-3):
        mis.append(("got", row["ks_d"], "exp", best))
    report("events_ks_test", mis, 1)


def audit_granger():
    mis = []
    r = rows(
        "WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, "
        "SUM(CASE WHEN event_type='purchase' THEN CAST(floor(value*100+0.5) AS BIGINT) ELSE 0 END) AS y, "
        "SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS x "
        f"FROM '{SF}/events.parquet' GROUP BY 1) "
        "SELECT day, y, x FROM daily ORDER BY day")
    ys = [float(y) for _, y, _ in r]
    xs = [float(x) for _, _, x in r]
    y, y1, x1 = ys[1:], ys[:-1], xs[:-1]
    n = len(y)

    def ols(feats, target):
        k = len(feats) + 1
        m = [[Fraction(0)] * (k + 1) for _ in range(k)]
        rows_ = [list(f) + [1.0] for f in zip(*feats)] if feats else [[1.0]] * len(target)
        for ri, t in zip(rows_, target):
            for i in range(k):
                for j in range(k):
                    m[i][j] += Fraction(ri[i]) * Fraction(ri[j])
                m[i][k] += Fraction(ri[i]) * Fraction(t)
        for i in range(k):
            p = m[i][i]
            for j in range(k):
                if j != i:
                    f = m[j][i] / p
                    m[j] = [a - f * c for a, c in zip(m[j], m[i])]
        coef = [float(m[i][k] / m[i][i]) for i in range(k)]
        rss = sum((t - sum(c * f for c, f in zip(coef, ri))) ** 2
                  for ri, t in zip(rows_, target))
        return coef, rss

    _, rss_r = ols([y1], y)
    coef_u, rss_u = ols([y1, x1], y)
    f = (rss_r - rss_u) / (rss_u / (n - 3))
    got = dump("ts_granger_lite")
    cols = dump_cols("ts_granger_lite")
    row = dict(zip(cols, got[0]))
    if not (close(row["coef_ylag"], coef_u[0], 1e-3)
            and close(row["coef_xlag"], coef_u[1], 1e-3)
            and close(row["f_stat"], f, 2e-2)):
        mis.append(("got", (row["coef_ylag"], row["coef_xlag"], row["f_stat"]),
                    "exp", (coef_u[0], coef_u[1], f)))
    report("ts_granger_lite", mis, 3)


def audit_levene():
    mis = []
    g = groups_cents()
    zbar = {}
    zall_sum = 0.0
    nn = 0
    zs = {}
    for t, xs in g.items():
        m = sum(xs) / len(xs)
        z = [abs(x - m) for x in xs]
        zs[t] = z
        zbar[t] = sum(z) / len(z)
        zall_sum += sum(z)
        nn += len(z)
    zall = zall_sum / nn
    k = len(g)
    num = sum(len(z) * (zbar[t] - zall) ** 2 for t, z in zs.items())
    den = sum(sum((zi - zbar[t]) ** 2 for zi in z) for t, z in zs.items())
    w = (nn - k) / (k - 1) * num / den
    row = dict(zip(dump_cols("stats_levene"), dump("stats_levene")[0]))
    if not (row["k"] == k and row["n"] == nn and close(row["w"], w, 2e-3)):
        mis.append(("got", (row["k"], row["n"], row["w"]), "exp", (k, nn, w)))
    report("stats_levene", mis, 3)


def audit_kruskal():
    mis = []
    g = groups_cents()
    allv = sorted(v for xs in g.values() for v in xs)
    nn = len(allv)
    # midranks per distinct value
    rank = {}
    i = 0
    while i < nn:
        j = i
        while j < nn and allv[j] == allv[i]:
            j += 1
        rank[allv[i]] = (i + 1 + j) / 2.0
        i = j
    h = 12.0 / (nn * (nn + 1)) * sum(
        len(xs) * (sum(rank[v] for v in xs) / len(xs) - (nn + 1) / 2.0) ** 2
        for xs in g.values())
    ties = {}
    for v in allv:
        ties[v] = ties.get(v, 0) + 1
    corr = 1 - sum(t ** 3 - t for t in ties.values()) / (nn ** 3 - nn)
    row = dict(zip(dump_cols("stats_kruskal_wallis"),
                   dump("stats_kruskal_wallis")[0]))
    if not (close(row["h"], h, 2e-3)
            and close(row["h_tie_corrected"], h / corr, 2e-3)):
        mis.append(("got", (row["h"], row["h_tie_corrected"]),
                    "exp", (h, h / corr)))
    report("stats_kruskal_wallis", mis, 2)


def audit_overdispersion():
    mis = []
    r = rows(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE), COUNT(*) "
        f"FROM '{SF}/events.parquet' GROUP BY 1, 2")
    g = {}
    for t, _, c in r:
        g.setdefault(t, []).append(c)
    got = dump("events_overdispersion")
    cols = dump_cols("events_overdispersion")
    for row_ in got:
        row = dict(zip(cols, row_))
        cs = g[row["event_type"]]
        k, m = len(cs), sum(cs) / len(cs)
        var = sum((c - m) ** 2 for c in cs) / (k - 1)
        if not (row["k"] == k and close(row["mean_daily"], m)
                and close(row["dispersion"], var / m, 2e-3)):
            mis.append((row["event_type"], "got",
                        (row["k"], row["mean_daily"], row["dispersion"]),
                        "exp", (k, m, var / m)))
    report("events_overdispersion", mis, len(got) * 3)


def audit_mutual_information():
    mis = []
    r = rows(
        "SELECT event_type, ((date_diff('day', DATE '2024-01-01', "
        "CAST(date_trunc('day', ts) AS DATE)) % 7) + 7) % 7, COUNT(*) "
        f"FROM '{SF}/events.parquet' GROUP BY 1, 2")
    cxy = {(x, y): c for x, y, c in r}
    n = sum(cxy.values())
    cx = {}
    cy = {}
    for (x, y), c in cxy.items():
        cx[x] = cx.get(x, 0) + c
        cy[y] = cy.get(y, 0) + c
    mi = sum(c / n * math.log(c * n / (cx[x] * cy[y]))
             for (x, y), c in cxy.items())
    hx = -sum(c / n * math.log(c / n) for c in cx.values())
    hy = -sum(c / n * math.log(c / n) for c in cy.values())
    nmi = mi / math.sqrt(hx * hy)
    row = dict(zip(dump_cols("stats_mutual_information"),
                   dump("stats_mutual_information")[0]))
    if not (close(row["mi"], mi, 2e-3) and close(row["h_x"], hx, 2e-3)
            and close(row["h_y"], hy, 2e-3) and close(row["nmi"], nmi, 2e-3)):
        mis.append(("got", (row["mi"], row["h_x"], row["h_y"], row["nmi"]),
                    "exp", (mi, hx, hy, nmi)))
    report("stats_mutual_information", mis, 4)


def audit_ljung_box():
    mis = []
    r = rows(
        "SELECT CAST(date_trunc('day', ts) AS DATE) AS day, "
        "SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) "
        f"FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1")
    xs = [x for _, x in r]
    n = len(xs)
    m = sum(xs) // n  # the documented integer-mean convention
    dv = [x - m for x in xs]
    c0 = sum(d * d for d in dv)
    q = 0.0
    rks = []
    for k in range(1, 6):
        ck = sum(dv[i] * dv[i - k] for i in range(k, n))
        rk = ck / c0
        rks.append(rk)
        q += rk * rk / (n - k)
    q *= n * (n + 2)
    row = dict(zip(dump_cols("ts_ljung_box"), dump("ts_ljung_box")[0]))
    ok = row["n_days"] == n and close(row["q_stat"], q, 2e-3) and all(
        close(row[f"r{k}"], rks[k - 1], 2e-3) for k in range(1, 6))
    if not ok:
        mis.append(("got", tuple(row.values()), "exp", (n, *rks, q)))
    report("ts_ljung_box", mis, 7)


def audit_cohens_d():
    mis = []
    g = groups_q4()
    base = g["view"]
    nb, mb = len(base), sum(base) / len(base)
    vb = sample_var(base, mb)
    got = dump("stats_cohens_d")
    cols = dump_cols("stats_cohens_d")
    for row_ in got:
        row = dict(zip(cols, row_))
        xs = g[row["event_type"]]
        nx, mx = len(xs), sum(xs) / len(xs)
        vx = sample_var(xs, mx)
        sp = math.sqrt(((nx - 1) * vx + (nb - 1) * vb) / (nx + nb - 2))
        d = (mx - mb) / sp
        gg = d * (1 - 3.0 / (4 * (nx + nb) - 9))
        if not (close(row["d"], d, 2e-3) and close(row["g"], gg, 2e-3)):
            mis.append((row["event_type"], "got", (row["d"], row["g"]),
                        "exp", (d, gg)))
    report("stats_cohens_d", mis, len(got) * 2)


def audit_drift_jsd():
    mis = []
    r = rows(
        "SELECT event_type, "
        "CAST(floor(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS DOUBLE) / 500) AS BIGINT), "
        "CASE WHEN extract(day FROM ts) <= 15 THEN 0 ELSE 1 END, COUNT(*) "
        f"FROM '{SF}/events.parquet' GROUP BY 1, 2, 3")
    bins = {}
    for t, b, h, c in r:
        e = bins.setdefault(t, {}).setdefault(b, [0, 0])
        e[h] += c
    got = dump("dq_drift_jsd")
    cols = dump_cols("dq_drift_jsd")
    for row_ in got:
        row = dict(zip(cols, row_))
        bm = bins[row["event_type"]]
        c1 = {b: v[0] + 1 for b, v in bm.items()}  # add-one smoothing
        c2 = {b: v[1] + 1 for b, v in bm.items()}
        n1, n2 = sum(c1.values()), sum(c2.values())
        jsd = 0.0
        for b in bm:
            p, q = c1[b] / n1, c2[b] / n2
            mmid = (p + q) / 2
            jsd += 0.5 * (p * math.log(p / mmid) + q * math.log(q / mmid))
        if not (row["n1"] == n1 and row["n2"] == n2
                and row["n_bins"] == len(bm)
                and close(row["jsd_nats"], jsd, 2e-3)):
            mis.append((row["event_type"], "got",
                        (row["n1"], row["n2"], row["n_bins"], row["jsd_nats"]),
                        "exp", (n1, n2, len(bm), jsd)))
    report("dq_drift_jsd", mis, len(got) * 4)


def audit_drift_psi():
    mis = []
    r = rows(
        "SELECT n_chars // 64, "
        "SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END), "
        "SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) "
        f"FROM '{SF}/documents.parquet' GROUP BY 1")
    rt = sum(rn for _, rn, _ in r)
    ct = sum(cn for _, _, cn in r)
    exp = {b: (rn / rt - cn / ct) * math.log((rn * ct) / (cn * rt))
           for b, rn, cn in r if rn > 0 and cn > 0}
    got = dump("dq_drift_psi")
    cols = dump_cols("dq_drift_psi")
    for row_ in got:
        row = dict(zip(cols, row_))
        if not close(row["psi_term"], exp[row["bucket"]], 2e-3):
            mis.append((row["bucket"], "got", row["psi_term"],
                        "exp", exp[row["bucket"]]))
    if set(exp) != {dict(zip(cols, r_))["bucket"] for r_ in got}:
        mis.append(("bucket set mismatch",))
    report("dq_drift_psi", mis, len(got))


def audit_benford():
    mis = []
    r = rows(
        "SELECT substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) "
        f"AS VARCHAR), 1, 1), COUNT(*) FROM '{SF}/orders.parquet' GROUP BY 1")
    cnt = dict(r)
    n = sum(cnt.values())
    got = dump("dq_benford")
    cols = dump_cols("dq_benford")
    for row_ in got:
        row = dict(zip(cols, row_))
        d = row["digit"]
        ef = math.log10(1 + 1 / int(d))
        if not (row["n_obs"] == cnt[d] and close(row["obs_frac"], cnt[d] / n)
                and close(row["exp_frac"], ef)):
            mis.append((d, "got", (row["n_obs"], row["obs_frac"], row["exp_frac"]),
                        "exp", (cnt[d], cnt[d] / n, ef)))
    report("dq_benford", mis, len(got) * 3)


def audit_gini():
    mis = []
    r = rows(
        "SELECT o_orderstatus, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) "
        f"FROM '{SF}/orders.parquet'")
    g = {}
    for s, c in r:
        g.setdefault(s, []).append(int(c))
    got = dump("agg_gini")
    cols = dump_cols("agg_gini")
    for row_ in got:
        row = dict(zip(cols, row_))
        xs = sorted(g[row["s"]])
        n = len(xs)
        gini = 2.0 * sum((i + 1) * x for i, x in enumerate(xs)) \
            / (n * float(sum(xs))) - (n + 1.0) / n
        if not (row["n"] == n and close(row["gini"], gini, 1e-3)):
            mis.append((row["s"], "got", (row["n"], row["gini"]),
                        "exp", (n, gini)))
    report("agg_gini", mis, len(got) * 2)


def audit_theil():
    mis = []
    r = rows(
        "SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) "
        f"FROM '{SF}/events.parquet' WHERE value > 0")
    g = {}
    for t, x in r:
        g.setdefault(t, []).append(int(x))
    got = dump("agg_theil_index")
    cols = dump_cols("agg_theil_index")
    for row_ in got:
        row = dict(zip(cols, row_))
        xs = g[row["event_type"]]
        n, s = len(xs), sum(xs)
        # Theil T = (1/S)·Σ x·ln x − ln(S/n), invariant to the cents scale
        t_val = sum(x * math.log(x) for x in xs) / s - math.log(s / n)
        if not close(row["theil_t"], t_val, 2e-3):
            mis.append((row["event_type"], "got", row["theil_t"], "exp", t_val))
    report("agg_theil_index", mis, len(got))


def audit_fdr_bh():
    mis = []
    r = rows(
        "SELECT event_type, ((date_diff('day', DATE '2024-01-01', "
        "CAST(date_trunc('day', ts) AS DATE)) % 7) + 7) % 7 AS dow, "
        "COUNT(*), SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) "
        f"FROM '{SF}/events.parquet' GROUP BY 1, 2")
    allv = rows(
        "SELECT COUNT(*), SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)), "
        "SUM(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS HUGEINT) "
        "* CAST(floor(value * 100 + 0.5) AS BIGINT)) "
        f"FROM '{SF}/events.parquet'")[0]
    ng, sg, sq = int(allv[0]), int(allv[1]), float(allv[2])
    gm = sg / ng
    gv = (sq - sg * gm) / (ng - 1)
    cells = []
    for t, dow, n, s in r:
        z = (s / n - gm) / math.sqrt(gv / n)
        p = min(1.0, 1.0 / (z * z)) if z * z >= 1 else 1.0
        cells.append((t, int(dow), n, z, p))
    m = len(cells)
    ranked = sorted(cells, key=lambda c: (c[4], c[0], c[1]))
    imax = max((i + 1 for i, c in enumerate(ranked)
                if c[4] <= (i + 1) * 0.1 / m), default=0)
    exp = {}
    for i, (t, dow, n, z, p) in enumerate(ranked):
        exp[(t, dow)] = (n, z, p, i + 1, 1 if i + 1 <= imax else 0,
                         1 if p <= 0.1 / m else 0)
    got = dump("stats_fdr_bh")
    cols = dump_cols("stats_fdr_bh")
    for row_ in got:
        row = dict(zip(cols, row_))
        en, ez, ep, er, ebh, ebf = exp[(row["event_type"], row["dow"])]
        if not (row["n"] == en and close(row["z"], ez, 2e-3)
                and close(row["p"], ep, 2e-3) and row["p_rank"] == er
                and row["bh_reject"] == ebh and row["bonf_reject"] == ebf):
            mis.append(((row["event_type"], row["dow"]), "got",
                        (row["n"], row["z"], row["p"], row["p_rank"],
                         row["bh_reject"], row["bonf_reject"]),
                        "exp", (en, ez, ep, er, ebh, ebf)))
    report("stats_fdr_bh", mis, len(got) * 6)


def audit_survival_km():
    mis = []
    r = rows(
        "SELECT user_id, max(date_diff('day', DATE '2024-01-01', "
        f"CAST(date_trunc('day', ts) AS DATE))) FROM '{SF}/events.parquet' "
        "GROUP BY 1")
    last = [int(d) for _, d in r]
    max_day = max(last)
    n_users = len(last)
    churn = {}
    for d in last:
        if d < max_day:
            churn[d] = churn.get(d, 0) + 1
    # Kaplan-Meier product over churn days; the engine's integer-floor
    # 1e8 fixed-point convention is replicated exactly
    s = 100000000
    at_risk = n_users
    exp = {}
    for day in sorted(churn):
        d = churn[day]
        s = s * (at_risk - d) // at_risk
        exp[day] = (at_risk, d, s / 100000000)
        at_risk -= d
    got = dump("events_survival_km")
    cols = dump_cols("events_survival_km")
    for row_ in got:
        row = dict(zip(cols, row_))
        en, ed, es = exp[row["day"]]
        if not (row["n_at_risk"] == en and row["n_churned"] == ed
                and close(row["survival"], es, 1e-6)):
            mis.append((row["day"], "got",
                        (row["n_at_risk"], row["n_churned"], row["survival"]),
                        "exp", (en, ed, es)))
    report("events_survival_km", mis, len(got) * 3)


def audit_ab_cuped():
    mis = []
    r = rows(
        "SELECT user_id, CAST(epoch_us(ts) AS BIGINT), "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) "
        f"FROM '{SF}/events.parquet'")
    mid = (min(u for _, u, _ in r) + max(u for _, u, _ in r)) // 2
    users = {}
    for uid, us, c in r:
        e = users.setdefault(uid, [0, 0])
        e[0 if us < mid else 1] += c
    xs = {u: v[0] for u, v in users.items()}
    ys = {u: v[1] for u, v in users.items()}
    n = len(users)
    sx, sy = sum(xs.values()), sum(ys.values())
    sxy = sum(xs[u] * ys[u] for u in users)
    sxx = sum(x * x for x in xs.values())
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    xbar = sx / n
    got = dump("events_ab_cuped")
    cols = dump_cols("events_ab_cuped")
    for row_ in got:
        row = dict(zip(cols, row_))
        arm = row["arm"]
        uu = [u for u in users if u % 2 == arm]
        na = len(uu)
        ybar = sum(ys[u] for u in uu) / na
        xbara = sum(xs[u] for u in uu) / na
        vy = sum((ys[u] - ybar) ** 2 for u in uu) / (na - 1)
        vx = sum((xs[u] - xbara) ** 2 for u in uu) / (na - 1)
        cxy = sum((xs[u] - xbara) * (ys[u] - ybar) for u in uu) / (na - 1)
        adj = ybar - theta * (xbara - xbar)
        vred = 1 - (vy - 2 * theta * cxy + theta * theta * vx) / vy
        if not (row["n_users"] == na and close(row["mean_y"], ybar / 100)
                and close(row["mean_y_cuped"], adj / 100)
                and close(row["theta"], theta, 2e-3)
                and close(row["var_reduction"], vred, 2e-3)):
            mis.append((arm, "got", tuple(row.values()),
                        "exp", (na, ybar / 100, adj / 100, theta, vred)))
    report("events_ab_cuped", mis, len(got) * 5)


def audit_diff_in_diff():
    mis = []
    r = rows(
        "SELECT user_id % 2 = 1, "
        "CAST(date_trunc('day', ts) AS DATE) >= DATE '2024-01-16', "
        "COUNT(*), SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) "
        f"FROM '{SF}/events.parquet' GROUP BY 1, 2")
    cells = {(t, p): (n, s) for t, p, n, s in r}

    def m(t, p):
        n, s = cells[(t, p)]
        return math.floor(s / 100 / n * 10000 + 0.5) / 10000

    row = dict(zip(dump_cols("events_diff_in_diff"),
                   dump("events_diff_in_diff")[0]))
    exp = {
        "n_tpre": cells[(True, False)][0], "m_tpre": m(True, False),
        "n_tpost": cells[(True, True)][0], "m_tpost": m(True, True),
        "n_cpre": cells[(False, False)][0], "m_cpre": m(False, False),
        "n_cpost": cells[(False, True)][0], "m_cpost": m(False, True),
    }
    exp["did"] = (exp["m_tpost"] - exp["m_tpre"]) \
        - (exp["m_cpost"] - exp["m_cpre"])
    for k, v in exp.items():
        if not close(row[k], v, 1e-6):
            mis.append((k, "got", row[k], "exp", v))
    report("events_diff_in_diff", mis, len(exp))


def audit_chow_break():
    mis = []
    r = rows(
        "SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day, "
        "SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) "
        f"FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1")
    ys = [float(y) for _, y in r]
    n = len(ys)

    def fit(sub, t0):
        ts = list(range(t0, t0 + len(sub)))
        k = len(sub)
        mt, my = sum(ts) / k, sum(sub) / k
        cxy = sum((t - mt) * (y - my) for t, y in zip(ts, sub))
        cxx = sum((t - mt) ** 2 for t in ts)
        cyy = sum((y - my) ** 2 for y in sub)
        return cxy / cxx, cyy - cxy * cxy / cxx

    half = n // 2
    s1, rss1 = fit(ys[:half], 0)
    s2, rss2 = fit(ys[half:], half)
    _, rssp = fit(ys, 0)
    rss12 = rss1 + rss2
    f = (rssp - rss12) / 2 / (rss12 / (n - 4))
    row = dict(zip(dump_cols("ts_chow_break"), dump("ts_chow_break")[0]))
    if not (row["n_days"] == n and close(row["slope_pre"], s1 / 100, 2e-3)
            and close(row["slope_post"], s2 / 100, 2e-3)
            and close(row["f_stat"], f, 2e-2)):
        mis.append(("got", tuple(row.values()), "exp", (n, s1 / 100, s2 / 100, f)))
    report("ts_chow_break", mis, 4)


def audit_ab_power():
    mis = []
    g = groups_q4()
    base = g["view"]
    nb, mb = len(base), sum(base) / len(base)
    vb = sample_var(base, mb)
    got = dump("events_ab_power")
    cols = dump_cols("events_ab_power")
    for row_ in got:
        row = dict(zip(cols, row_))
        xs = g[row["event_type"]]
        nx, mx = len(xs), sum(xs) / len(xs)
        vx = sample_var(xs, mx)
        mde = 2.8 * math.sqrt(vx / nx + vb / nb)
        npa = math.ceil(2.8 * 2.8 * (vx + vb) / ((0.05 * mb) ** 2))
        if not (close(row["mde_abs"], mde, 2e-3)
                and close(row["mde_rel"], mde / mb, 2e-3)
                and abs(row["n_per_arm_5pct"] - npa) <= 1):
            mis.append((row["event_type"], "got",
                        (row["mde_abs"], row["mde_rel"], row["n_per_arm_5pct"]),
                        "exp", (mde, mde / mb, npa)))
    report("events_ab_power", mis, len(got) * 3)


def daily_orders_cents():
    return [(d, int(v)) for d, v in rows(
        "SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day, "
        "SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) "
        f"FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1")]


def audit_rsi():
    mis = []
    daily = daily_orders_cents()
    vs = [v for _, v in daily]
    deltas = [None] + [vs[i] - vs[i - 1] for i in range(1, len(vs))]
    exp = {}
    for i, (day, _) in enumerate(daily):
        win = [d for d in deltas[max(0, i - 13):i + 1] if d is not None]
        if len(win) != 14:
            continue
        sg = sum(d for d in win if d > 0)
        sl = sum(-d for d in win if d < 0)
        exp[day.strftime("%Y-%m-%d")] = 50.0 if sg + sl == 0 \
            else 100.0 * sg / (sg + sl)
    got = dump("ts_rsi")
    cols = dump_cols("ts_rsi")
    for row_ in got:
        row = dict(zip(cols, row_))
        if not close(row["rsi14"], exp[row["day"]], 2e-3):
            mis.append((row["day"], "got", row["rsi14"], "exp", exp[row["day"]]))
    if len(got) != len(exp):
        mis.append(("row count", len(got), "exp", len(exp)))
    report("ts_rsi", mis, len(got))


def audit_drawdown():
    mis = []
    daily = daily_orders_cents()
    pk = 0
    best = None  # (dd6, day, pk, v)
    for day, v in daily:
        pk = max(pk, v)
        dd6 = math.floor((pk - v) / pk * 1e6 + 0.5)
        if best is None or dd6 > best[0]:
            best = (dd6, day, pk, v)
    dd6, trough, peak_v, trough_v = best
    peak_day = min(d for d, v in daily if v == peak_v)
    row = dict(zip(dump_cols("ts_drawdown"), dump("ts_drawdown")[0]))
    exp = {"max_drawdown": dd6 / 1e6,
           "peak_day": peak_day.strftime("%Y-%m-%d"),
           "trough_day": trough.strftime("%Y-%m-%d"),
           "peak_revenue": peak_v / 100, "trough_revenue": trough_v / 100}
    for k, v in exp.items():
        ok = close(row[k], v, 1e-6) if isinstance(v, float) else row[k] == v
        if not ok:
            mis.append((k, "got", row[k], "exp", v))
    report("ts_drawdown", mis, len(exp))


def audit_pareto():
    mis = []
    r = rows(
        "SELECT event_type, user_id, "
        "SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) "
        f"FROM '{SF}/events.parquet' GROUP BY 1, 2")
    g = {}
    for t, u, s in r:
        g.setdefault(t, []).append((int(s), u))
    got = dump("events_pareto_coverage")
    cols = dump_cols("events_pareto_coverage")
    for row_ in got:
        row = dict(zip(cols, row_))
        us = sorted(g[row["event_type"]], key=lambda x: (-x[0], x[1]))
        tot = sum(s for s, _ in us)
        cum = 0
        k80 = None
        for i, (s, _) in enumerate(us):
            cum += s
            if k80 is None and 5 * cum >= 4 * tot:
                k80 = i + 1
        top10 = sum(s for s, _ in us[:10]) / tot
        if not (row["n_users"] == len(us) and row["k80"] == k80
                and close(row["top10_share"], top10, 1e-4)):
            mis.append((row["event_type"], "got",
                        (row["n_users"], row["k80"], row["top10_share"]),
                        "exp", (len(us), k80, top10)))
    report("events_pareto_coverage", mis, len(got) * 3)


def audit_zipf():
    mis = []
    r = rows(
        "SELECT lang, unnest(string_split(lower(text), ' ')) AS t "
        f"FROM '{SF}/documents.parquet'")
    g = {}
    for lang, t in r:
        g.setdefault(lang, {}).setdefault(t, 0)
        g[lang][t] += 1
    got = dump("text_zipf_slope")
    cols = dump_cols("text_zipf_slope")
    for row_ in got:
        row = dict(zip(cols, row_))
        freq = sorted(g[row["lang"]].items(), key=lambda x: (-x[1], x[0]))[:100]
        pts = [(math.log(i + 1), math.log(f)) for i, (_, f) in enumerate(freq)]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        if not (row["n_points"] == n and close(row["zipf_slope"], slope, 2e-3)):
            mis.append((row["lang"], "got", (row["n_points"], row["zipf_slope"]),
                        "exp", (n, slope)))
    report("text_zipf_slope", mis, len(got) * 2)


def audit_variance_ratio():
    mis = []
    daily = daily_orders_cents()
    vs = [v for _, v in daily]
    d1 = [vs[i] - vs[i - 1] for i in range(1, len(vs))]
    d5 = [vs[i] - vs[i - 5] for i in range(5, len(vs))]

    def popvar(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / len(xs)

    q = 5
    vr = (popvar(d5) / q) / popvar(d1)
    n = len(d1)
    z = (vr - 1) * math.sqrt(n * 3 * q / (2 * (2 * q - 1) * (q - 1)))
    row = dict(zip(dump_cols("ts_variance_ratio"),
                   dump("ts_variance_ratio")[0]))
    if not (row["n_increments"] == n and close(row["vr5"], vr, 1e-4)
            and close(row["z"], z, 2e-3)):
        mis.append(("got", tuple(row.values()), "exp", (n, vr, z)))
    report("ts_variance_ratio", mis, 3)


def audit_runs_test():
    mis = []
    daily = daily_orders_cents()
    vs = sorted((v, d) for d, v in daily)
    med = vs[(len(vs) + 1) // 2 - 1][0]  # lower median, rank (n+1)//2
    signs = [1 if v > med else 0 for _, v in daily if v != med]
    n1, n2 = sum(signs), len(signs) - sum(signs)
    r = 1 + sum(1 for i in range(1, len(signs)) if signs[i] != signs[i - 1])
    n = n1 + n2
    er = 2.0 * n1 * n2 / n + 1
    sd = math.sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1)))
    z = (r - er) / sd
    row = dict(zip(dump_cols("stats_runs_test"), dump("stats_runs_test")[0]))
    if not (row["n1"] == n1 and row["n2"] == n2 and row["r"] == r
            and close(row["expected_runs"], er, 1e-4) and close(row["z"], z, 2e-3)):
        mis.append(("got", tuple(row.values()), "exp", (n1, n2, r, er, z)))
    report("stats_runs_test", mis, 5)


def daily_x_series():
    """user_id -> [(day, x)] with x the 4-dp daily mean double (avgFix)."""
    r = rows(
        "SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, "
        "SUM(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS s1, COUNT(*) AS n "
        f"FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2")
    out = {}
    for u, day, s1, n in r:
        x = math.floor(s1 / 10000.0 / n * 10000 + 0.5) / 10000
        out.setdefault(u, []).append((day.strftime("%Y-%m-%d"), x))
    return out


def audit_ewma():
    mis = []
    exp = {}
    for u, pts in daily_x_series().items():
        ew = None
        for day, x in pts:
            ew = x if ew is None else 0.3 * x + 0.7 * ew
            exp[(u, day)] = math.floor(ew * 10000 + 0.5) / 10000
    got = dump("ts_ewma")
    cols = dump_cols("ts_ewma")
    for row_ in got:
        row = dict(zip(cols, row_))
        e = exp[(row["user_id"], row["day"])]
        if not close(row["ewma"], e, 1e-6):
            mis.append(((row["user_id"], row["day"]), "got", row["ewma"], "exp", e))
    report("ts_ewma", mis, len(got))


def audit_cusum():
    mis = []
    exp = {}
    for u, pts in daily_x_series().items():
        s4 = sum(math.floor(x * 10000 + 0.5) for _, x in pts)
        mu = math.floor(s4 / len(pts) + 0.5) / 10000
        s = 0.0
        first = True
        for day, x in pts:
            s = max(0.0, (0.0 if first else s) + (x - mu - 1.0))
            first = False
            exp[(u, day)] = math.floor(s * 10000 + 0.5) / 10000
    got = dump("ts_cusum")
    cols = dump_cols("ts_cusum")
    for row_ in got:
        row = dict(zip(cols, row_))
        e = exp[(row["user_id"], row["day"])]
        if not close(row["cusum"], e, 1e-6):
            mis.append(((row["user_id"], row["day"]), "got", row["cusum"], "exp", e))
    report("ts_cusum", mis, len(got))


def audit_holt():
    mis = []
    exp = {}
    for u, pts in daily_x_series().items():
        lv, b = None, 0.0
        for day, x in pts:
            if lv is None:
                lv = x
            else:
                nl = 0.5 * x + 0.5 * (lv + b)
                b = 0.3 * (nl - lv) + 0.7 * b
                lv = nl
            exp[(u, day)] = (math.floor(lv * 10000 + 0.5) / 10000,
                             math.floor(b * 10000 + 0.5) / 10000,
                             math.floor((lv + b) * 10000 + 0.5) / 10000)
    got = dump("ts_holt")
    cols = dump_cols("ts_holt")
    for row_ in got:
        row = dict(zip(cols, row_))
        el, eb, ef = exp[(row["user_id"], row["day"])]
        if not (close(row["level"], el, 1e-6) and close(row["trend"], eb, 1e-6)
                and close(row["forecast"], ef, 1e-6)):
            mis.append(((row["user_id"], row["day"]), "got",
                        (row["level"], row["trend"], row["forecast"]),
                        "exp", (el, eb, ef)))
    report("ts_holt", mis, len(got) * 3)


def audit_hampel():
    mis = []
    r = rows(
        "SELECT user_id, event_id, ts, "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) "
        f"FROM '{SF}/events.parquet' ORDER BY user_id, ts, event_id")
    series = {}
    for u, e, ts, vc in r:
        series.setdefault(u, []).append((e, int(vc)))
    exp = {}
    for u, pts in series.items():
        for i, (e, vc) in enumerate(pts):
            win = sorted(v for _, v in pts[max(0, i - 6):i + 1])
            k = len(win)
            med = float(win[(k + 1) // 2 - 1]) if k % 2 == 1 \
                else (win[k // 2 - 1] + win[k // 2]) / 2.0
            devs = sorted(abs(v - med) for v in win)
            mad = devs[(k + 1) // 2 - 1] if k % 2 == 1 \
                else (devs[k // 2 - 1] + devs[k // 2]) / 2.0
            if mad > 0 and abs(vc - med) > 3 * 1.4826 * mad:
                exp[(u, e)] = abs(vc - med) / (1.4826 * mad)
    got = dump("win_hampel")
    cols = dump_cols("win_hampel")
    seen = set()
    for row_ in got:
        row = dict(zip(cols, row_))
        key = (row["user_id"], row["event_id"])
        seen.add(key)
        if key not in exp or not close(row["robust_z"], exp[key], 1e-3):
            mis.append((key, "got", row.get("robust_z"), "exp", exp.get(key)))
    if seen != set(exp):
        mis.append(("outlier set mismatch", len(seen), "exp", len(exp)))
    report("win_hampel", mis, len(got))


def audit_decay_score():
    mis = []
    r = rows(
        "SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400, "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) "
        f"FROM '{SF}/events.parquet'")
    ref = max(d for _, d, _ in r)
    acc = {}
    for u, d, c in r:
        # dyadic half-life-1-day decay: weight 2^-(age) with 40-day floor,
        # accumulated exactly as integer cents << (40 - age)
        acc[u] = acc.get(u, 0) + int(c) * (1 << (40 - min(ref - d, 40)))
    got = dump("events_decay_score")
    cols = dump_cols("events_decay_score")
    for row_ in got:
        row = dict(zip(cols, row_))
        e = math.floor(acc[row["user_id"]] / 2 ** 40 / 100 * 10000 + 0.5) / 10000
        if not close(row["decay_score"], e, 1e-6):
            mis.append((row["user_id"], "got", row["decay_score"], "exp", e))
    report("events_decay_score", mis, len(got))


def audit_backtest_snaive():
    mis = []
    r = rows(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, "
        "SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) "
        f"FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2")
    g = {}
    for t, _, x in r:
        g.setdefault(t, []).append(int(x))
    got = dump("ts_backtest_snaive")
    cols = dump_cols("ts_backtest_snaive")
    for row_ in got:
        row = dict(zip(cols, row_))
        xs = g[row["event_type"]]
        errs = [(xs[i] - xs[i - 7]) for i in range(7, len(xs))]
        n = len(errs)
        mae = sum(abs(e) for e in errs) / 100 / n
        bias = sum(errs) / 100 / n
        if not (row["n_eval"] == n and close(row["mae"], mae, 1e-4)
                and close(row["bias"], bias, 1e-4)):
            mis.append((row["event_type"], "got",
                        (row["n_eval"], row["mae"], row["bias"]),
                        "exp", (n, mae, bias)))
    report("ts_backtest_snaive", mis, len(got) * 3)


def audit_corr_matrix():
    mis = []
    r = rows(
        "SELECT CAST(floor(l_quantity + 0.5) AS BIGINT), "
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT), "
        "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) "
        f"FROM '{SF}/lineitem.parquet'")
    cols3 = list(zip(*r))

    def corr(a, b):
        n = len(a)
        ma, mb = sum(a) / n, sum(b) / n
        num = sum((x - ma) * (y - mb) for x, y in zip(a, b))
        return num / math.sqrt(sum((x - ma) ** 2 for x in a)
                               * sum((y - mb) ** 2 for y in b))

    exp = {"quantity~price": corr(cols3[0], cols3[1]),
           "quantity~discount": corr(cols3[0], cols3[2]),
           "price~discount": corr(cols3[1], cols3[2])}
    got = dump("agg_corr_matrix")
    cols = dump_cols("agg_corr_matrix")
    for row_ in got:
        row = dict(zip(cols, row_))
        if not close(row["corr"], exp[row["pair"]], 1e-4):
            mis.append((row["pair"], "got", row["corr"], "exp", exp[row["pair"]]))
    report("agg_corr_matrix", mis, len(got))


def audit_winsorize():
    mis = []
    r = rows(
        "SELECT o_orderstatus, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) "
        f"FROM '{SF}/orders.parquet'")
    g = {}
    for s, v in r:
        g.setdefault(s, []).append(int(v))
    got = dump("agg_winsorize")
    cols = dump_cols("agg_winsorize")
    for row_ in got:
        row = dict(zip(cols, row_))
        xs = sorted(g[row["o_orderstatus"]])
        n = len(xs)
        lo = xs[(n + 9) // 10 - 1]       # ceil(0.1n)-th smallest
        hi = xs[(9 * n + 9) // 10 - 1]   # ceil(0.9n)-th smallest
        wmean = sum(min(max(x, lo), hi) for x in xs) / 100 / n
        if not (row["n"] == n and close(row["p10"], lo / 100, 1e-6)
                and close(row["p90"], hi / 100, 1e-6)
                and close(row["wmean"], wmean, 1e-4)):
            mis.append((row["o_orderstatus"], "got", tuple(row.values())[1:],
                        "exp", (n, lo / 100, hi / 100, wmean)))
    report("agg_winsorize", mis, len(got) * 4)


def audit_exact_deciles():
    mis = []
    r = rows(
        "SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) "
        f"FROM '{SF}/events.parquet'")
    g = {}
    for t, v in r:
        g.setdefault(t, []).append(int(v))
    got = dump("agg_exact_deciles")
    cols = dump_cols("agg_exact_deciles")
    for row_ in got:
        row = dict(zip(cols, row_))
        xs = sorted(g[row["event_type"]])
        n = len(xs)
        q = row["pct"] // 10
        # smallest v with 10*rank >= q*n — the explicit ceil(q·n/10) rank
        v = xs[(q * n + 9) // 10 - 1]
        if not close(row["value"], v / 100, 1e-6):
            mis.append(((row["event_type"], row["pct"]),
                        "got", row["value"], "exp", v / 100))
    report("agg_exact_deciles", mis, len(got))


def audit_pacf():
    mis = []
    r = rows(
        "SELECT date_diff('day', DATE '2024-01-01', "
        "CAST(date_trunc('day', ts) AS DATE)) AS day, "
        "SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) "
        f"FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1")
    vs = [int(v) for _, v in r]
    mu = math.floor(sum(vs) / len(vs) + 0.5)
    dv = [v - mu for v in vs]
    s0 = sum(d * d for d in dv)
    rk = [sum(dv[i] * dv[i + k] for i in range(len(dv) - k)) / s0
          for k in (1, 2, 3)]
    r1, r2, r3 = rk
    phi11 = r1
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    phi21 = r1 - phi22 * r1
    pacf3 = (r3 - phi21 * r2 - phi22 * r1) / (1 - phi21 * r1 - phi22 * r2)
    row = dict(zip(dump_cols("ts_pacf"), dump("ts_pacf")[0]))
    exp = {"r1": r1, "r2": r2, "r3": r3,
           "pacf1": phi11, "pacf2": phi22, "pacf3": pacf3}
    for k, v in exp.items():
        if not close(row[k], v, 2e-3):
            mis.append((k, "got", row[k], "exp", v))
    report("ts_pacf", mis, len(exp))


def audit_naive_bayes():
    mis = []

    def lnfix8(x):
        return math.floor(math.log(x) * 100000000 + 0.5)

    r = rows(
        "SELECT doc_id, lang, lower(text), "
        "substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '7' "
        f"FROM '{SF}/documents.parquet'")
    train_counts = {}
    lang_tokens = {}
    lang_docs = {}
    test_docs = []
    for doc_id, lang, t, is_train in r:
        toks = t.split(" ")
        if is_train:
            lang_docs[lang] = lang_docs.get(lang, 0) + 1
            for tok in toks:
                train_counts[(lang, tok)] = train_counts.get((lang, tok), 0) + 1
                lang_tokens[lang] = lang_tokens.get(lang, 0) + 1
        else:
            test_docs.append((doc_id, lang, toks))
    vocab = len({tok for _, tok in train_counts})
    langs = sorted(lang_docs)
    confusion = {}
    for doc_id, actual, toks in test_docs:
        cdt = {}
        for tok in toks:
            cdt[tok] = cdt.get(tok, 0) + 1
        n_d = sum(cdt.values())
        scored = []
        for lang in langs:
            s = sum(c * lnfix8(train_counts[(lang, tok)] + 1)
                    for tok, c in cdt.items() if (lang, tok) in train_counts)
            s -= n_d * lnfix8(lang_tokens[lang] + vocab)
            s += lnfix8(lang_docs[lang])
            scored.append((-s, lang))
        pred = min(scored)[1]
        confusion[(actual, pred)] = confusion.get((actual, pred), 0) + 1
    got = dump("ml_naive_bayes")
    cols = dump_cols("ml_naive_bayes")
    seen = {}
    for row_ in got:
        row = dict(zip(cols, row_))
        seen[(row["actual_lang"], row["pred_lang"])] = row["n_docs"]
    if seen != confusion:
        mis.append(("confusion matrix mismatch", "got", seen, "exp", confusion))
    report("ml_naive_bayes", mis, len(got))


def audit_srm_check():
    mis = []
    r = rows(
        "SELECT event_type, "
        "CASE WHEN substring(md5(CAST(event_id AS VARCHAR)), 1, 1) "
        "IN ('0','1','2','3','4','5','6','7') THEN 0 ELSE 1 END, COUNT(*) "
        f"FROM '{SF}/events.parquet' GROUP BY 1, 2")
    cells = {(t, a): c for t, a, c in r}
    got = dump("events_srm_check")
    cols = dump_cols("events_srm_check")
    for row_ in got:
        row = dict(zip(cols, row_))
        t = row["event_type"]
        n0, n1 = cells.get((t, 0), 0), cells.get((t, 1), 0)
        chi2 = (n0 - n1) ** 2 / (n0 + n1)
        if not (row["n0"] == n0 and row["n1"] == n1
                and close(row["chi2"], chi2, 1e-4)
                and row["srm_flag"] == (chi2 > 3.841)):
            mis.append((t, "got", tuple(row.values())[1:],
                        "exp", (n0, n1, chi2, chi2 > 3.841)))
    report("events_srm_check", mis, len(got) * 4)


def audit_value_entropy():
    mis = []
    got = dump("dq_value_entropy")
    cols = dump_cols("dq_value_entropy")
    for row_ in got:
        row = dict(zip(cols, row_))
        cn = row["column_name"]
        counts = [c for _, c in rows(
            f"SELECT {cn}, COUNT(*) FROM '{SF}/orders.parquet' GROUP BY 1")]
        n, d = sum(counts), len(counts)
        h = math.log(n) - sum(c * math.log(c) for c in counts) / n
        hn = None if d == 1 else h / math.log(d)
        if not (row["n"] == n and row["n_distinct"] == d
                and close(row["entropy"], h, 2e-3)
                and close(row["entropy_norm"], hn, 2e-3)):
            mis.append((cn, "got", tuple(row.values())[1:],
                        "exp", (n, d, h, hn)))
    report("dq_value_entropy", mis, len(got) * 4)


def audit_funnel_latency():
    mis = []
    r = rows(
        "SELECT user_id, event_type, epoch_us(ts) // 1000000 "
        f"FROM '{SF}/events.parquet' "
        "WHERE event_type IN ('signup', 'purchase')")
    s0 = {}
    for u, t, sec in r:
        if t == "signup":
            s0[u] = min(s0.get(u, sec), sec)
    p0 = {}
    for u, t, sec in r:
        if t == "purchase" and u in s0 and sec >= s0[u]:
            p0[u] = min(p0.get(u, sec), sec)
    weeks = {}
    for u, s in s0.items():
        wk = (s // 86400) // 7
        lat = p0[u] - s if u in p0 else None
        weeks.setdefault(wk, []).append((lat, u))
    got = dump("events_funnel_latency")
    cols = dump_cols("events_funnel_latency")
    for row_ in got:
        row = dict(zip(cols, row_))
        ls = weeks[row["cohort_week"]]
        conv = sorted((l, u) for l, u in ls if l is not None)
        c = len(conv)
        med = (conv[(c + 1) // 2 - 1][0] + conv[(c + 2) // 2 - 1][0]) / 2.0
        p90 = conv[(9 * c + 9) // 10 - 1][0]
        if not (row["n_signups"] == len(ls) and row["n_conv"] == c
                and close(row["conv_rate"], c / len(ls), 1e-4)
                and close(row["med_latency_s"], med, 1e-6)
                and row["p90_latency_s"] == p90):
            mis.append((row["cohort_week"], "got", tuple(row.values())[1:],
                        "exp", (len(ls), c, med, p90)))
    report("events_funnel_latency", mis, len(got) * 4)


def audit_entropy_rate():
    mis = []
    r = rows(
        "SELECT user_id, event_type FROM "
        f"'{SF}/events.parquet' ORDER BY user_id, ts, event_id")
    trans = {}
    prev = {}
    for u, t in r:
        if u in prev:
            key = (prev[u], t)
            trans[key] = trans.get(key, 0) + 1
        prev[u] = t
    out = {}
    for (s, _), c in trans.items():
        out[s] = out.get(s, 0) + c
    n = sum(out.values())
    hrate = sum(c * math.log(out[s] / c) for (s, _), c in trans.items()) / n
    got = dump("events_entropy_rate")
    cols = dump_cols("events_entropy_rate")
    for row_ in got:
        row = dict(zip(cols, row_))
        s = row["src"]
        hc = sum(c * math.log(out[s] / c)
                 for (s2, _), c in trans.items() if s2 == s) / out[s]
        if not (row["n_out"] == out[s] and close(row["h_cond"], hc, 2e-3)
                and close(row["entropy_rate"], hrate, 2e-3)):
            mis.append((s, "got", tuple(row.values())[1:],
                        "exp", (out[s], hc, hrate)))
    report("events_entropy_rate", mis, len(got) * 3)


def audit_inter_arrival():
    mis = []
    r = rows(
        "SELECT user_id, epoch_us(ts) // 1000000 FROM "
        f"'{SF}/events.parquet' ORDER BY user_id, ts, event_id")
    gaps = {}
    prev = {}
    for u, sec in r:
        if u in prev:
            gaps.setdefault(u, []).append(sec - prev[u])
        prev[u] = sec
    got = dump("events_inter_arrival")
    cols = dump_cols("events_inter_arrival")
    for row_ in got:
        row = dict(zip(cols, row_))
        gs = sorted(gaps[row["user_id"]])
        c = len(gs)
        med = (gs[(c + 1) // 2 - 1] + gs[(c + 2) // 2 - 1]) / 2.0
        p90 = gs[(9 * c + 9) // 10 - 1]
        if not (row["n_gaps"] == c and row["min_gap"] == gs[0]
                and row["max_gap"] == gs[-1]
                and close(row["med_gap"], med, 1e-6)
                and row["p90_gap"] == p90):
            mis.append((row["user_id"], "got", tuple(row.values())[1:],
                        "exp", (c, gs[0], gs[-1], med, p90)))
    report("events_inter_arrival", mis, len(got) * 5)


def audit_new_vs_returning():
    mis = []
    r = rows(
        "SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) "
        f"FROM '{SF}/events.parquet'")
    first = {}
    for u, d in r:
        first[u] = min(first.get(u, d), d)
    days = {}
    for u, d in r:
        e = days.setdefault(d, [0, 0])
        e[0 if d == first[u] else 1] += 1
    got = dump("events_new_vs_returning")
    cols = dump_cols("events_new_vs_returning")
    import datetime
    for row_ in got:
        row = dict(zip(cols, row_))
        d = datetime.date.fromisoformat(row["day"])
        nn, nr = days[d]
        if not (row["new_users"] == nn and row["returning_users"] == nr):
            mis.append((row["day"], "got",
                        (row["new_users"], row["returning_users"]),
                        "exp", (nn, nr)))
    report("events_new_vs_returning", mis, len(got) * 2)


def audit_cohort_ltv():
    mis = []
    r = rows(
        "SELECT user_id, event_type, "
        "date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)), "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) "
        f"FROM '{SF}/events.parquet'")
    first_day = {}
    for u, _, d, _ in r:
        first_day[u] = min(first_day.get(u, d), d)
    cohort = {u: d // 7 for u, d in first_day.items()}
    n_users = {}
    for u, cw in cohort.items():
        n_users[cw] = n_users.get(cw, 0) + 1
    rev = {}
    for u, t, d, c in r:
        if t == "purchase":
            key = (cohort[u], d // 7 - cohort[u])
            rev[key] = rev.get(key, 0) + int(c)
    got = dump("events_cohort_ltv")
    cols = dump_cols("events_cohort_ltv")
    for row_ in got:
        row = dict(zip(cols, row_))
        cw, wo = row["cohort_week"], row["week_offset"]
        cum = sum(v for (c2, w2), v in rev.items() if c2 == cw and w2 <= wo)
        ltv = math.floor(cum / 100 / n_users[cw] * 10000 + 0.5) / 10000
        if not (row["n_users"] == n_users[cw]
                and close(row["cum_revenue"], cum / 100, 1e-6)
                and close(row["ltv_per_user"], ltv, 1e-6)):
            mis.append(((cw, wo), "got", tuple(row.values())[2:],
                        "exp", (n_users[cw], cum / 100, ltv)))
    report("events_cohort_ltv", mis, len(got) * 3)


def audit_rate_limit():
    mis = []
    r = rows(
        "SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) "
        f"FROM '{SF}/events.parquet' ORDER BY user_id, ts, event_id")
    # token bucket: start 5 tokens, refill 1 per 100s (integer-floored),
    # cap 5, admit iff >= 1 token, first event always admitted (5 -> 4)
    state = {}
    exp = {}
    for u, e, us in r:
        if u not in state:
            tok = 5
        else:
            ptok, pus = state[u]
            tok = min(5, ptok + (us - pus) // 100000000)
        admit = 1 if tok >= 1 else 0
        tok -= admit
        state[u] = (tok, us)
        exp[(u, e)] = (admit, tok)
    got = dump("stream_rate_limit")
    cols = dump_cols("stream_rate_limit")
    for row_ in got:
        row = dict(zip(cols, row_))
        ea, et = exp[(row["user_id"], row["event_id"])]
        if not (row["admitted"] == ea and row["tokens_after"] == et):
            mis.append(((row["user_id"], row["event_id"]), "got",
                        (row["admitted"], row["tokens_after"]), "exp", (ea, et)))
    report("stream_rate_limit", mis, len(got) * 2)


def audit_stateful_funnel():
    mis = []
    r = rows(
        "SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) "
        f"FROM '{SF}/events.parquet'")
    s0 = {}
    for u, t, us in r:
        if t == "signup":
            s0[u] = min(s0.get(u, us), us)
    p0 = {}
    for u, t, us in r:
        if t == "purchase" and u in s0 and us >= s0[u]:
            p0[u] = min(p0.get(u, us), us)
    got = dump("stream_stateful_funnel")
    cols = dump_cols("stream_stateful_funnel")
    seen = set()
    for row_ in got:
        row = dict(zip(cols, row_))
        u = row["user_id"]
        seen.add(u)
        if not (row["signup_us"] == s0.get(u)
                and row["purchase_us"] == p0.get(u)):
            mis.append((u, "got", (row["signup_us"], row["purchase_us"]),
                        "exp", (s0.get(u), p0.get(u))))
    if seen != set(p0):
        mis.append(("converted-user set mismatch", len(seen), len(p0)))
    report("stream_stateful_funnel", mis, len(got) * 2)


def audit_burst_rate():
    mis = []
    r = rows(
        "SELECT user_id, epoch_us(ts) // 1000000 "
        f"FROM '{SF}/events.parquet' ORDER BY user_id, ts")
    secs = {}
    for u, s in r:
        secs.setdefault(u, []).append(s)
    got = dump("events_burst_rate")
    cols = dump_cols("events_burst_rate")
    import bisect
    for row_ in got:
        row = dict(zip(cols, row_))
        ss = sorted(secs[row["user_id"]])
        best = max(bisect.bisect_right(ss, s) - bisect.bisect_left(ss, s - 59)
                   for s in ss)
        if not (row["n_events"] == len(ss) and row["max_burst_60s"] == best):
            mis.append((row["user_id"], "got",
                        (row["n_events"], row["max_burst_60s"]),
                        "exp", (len(ss), best)))
    report("events_burst_rate", mis, len(got) * 2)


def audit_sequence_gaps():
    mis = []
    r = rows(
        "SELECT event_id FROM "
        f"'{SF}/events.parquet' WHERE event_type = 'click' ORDER BY event_id")
    ids = [i for (i,) in r]
    gaps = [(p + 1, n - 1, n - p - 1)
            for p, n in zip(ids, ids[1:]) if n - p > 1]
    exp = sorted(gaps, key=lambda g: (-g[2], g[0]))[:20]
    got = [tuple(x) for x in dump("dq_sequence_gaps")]
    if got != exp:
        mis.append(("got", got[:3], "exp", exp[:3]))
    report("dq_sequence_gaps", mis, len(got))


def audit_mix_temperature():
    mis = []
    r = rows(f"SELECT source, COUNT(*) FROM '{SF}/documents.parquet' GROUP BY 1")
    u = {s: math.floor(n ** 0.3 * 1e6 + 0.5) for s, n in r}
    ndocs = dict(r)
    tot = sum(u.values())
    got = dump("llm_mix_temperature")
    cols = dump_cols("llm_mix_temperature")
    for row_ in got:
        row = dict(zip(cols, row_))
        s = row["source"]
        if not (row["n_docs"] == ndocs[s]
                and close(row["weight"], u[s] / tot, 1e-4)
                and row["epoch_docs"] == math.floor(10000.0 * u[s] / tot + 0.5)):
            mis.append((s, "got", tuple(row.values())[1:],
                        "exp", (ndocs[s], u[s] / tot,
                                math.floor(10000.0 * u[s] / tot + 0.5))))
    report("llm_mix_temperature", mis, len(got) * 3)


def audit_readability():
    mis = []
    import re
    r = rows(f"SELECT doc_id, text FROM '{SF}/documents.parquet'")
    got = dump("text_readability")
    cols = dump_cols("text_readability")
    texts = dict(r)
    for row_ in got:
        row = dict(zip(cols, row_))
        t = texts[row["doc_id"]]
        w = len(t.split(" "))
        syl = len(re.findall(r"[aeiouy]+", t.lower()))
        flesch = 206.835 - 1.015 * w - 84.6 * (syl / w)
        if not (row["n_words"] == w and row["n_syllables"] == syl
                and close(row["flesch"], flesch, 1e-3)):
            mis.append((row["doc_id"], "got", tuple(row.values())[1:],
                        "exp", (w, syl, flesch)))
    report("text_readability", mis, len(got) * 3)


def audit_domain_mix():
    mis = []
    r = rows(f"SELECT source, COUNT(*) FROM '{SF}/documents.parquet' GROUP BY 1")
    sizes = dict(r)
    total = sum(sizes.values())
    quota = math.ceil(0.8 * total / len(sizes))
    got = dump("llm_domain_mix")
    cols = dump_cols("llm_domain_mix")
    for row_ in got:
        row = dict(zip(cols, row_))
        s = row["source"]
        if not (row["n_before"] == sizes[s]
                and row["n_after"] == min(sizes[s], quota)):
            mis.append((s, "got", (row["n_before"], row["n_after"]),
                        "exp", (sizes[s], min(sizes[s], quota))))
    report("llm_domain_mix", mis, len(got) * 2)


def audit_anomaly_iqr():
    mis = []
    g = {}
    for t, v in rows(
            "SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) "
            f"FROM '{SF}/events.parquet'"):
        g.setdefault(t, []).append(int(v))
    got = dump("dq_anomaly_iqr")
    cols = dump_cols("dq_anomaly_iqr")
    for row_ in got:
        row = dict(zip(cols, row_))
        xs = sorted(g[row["event_type"]])
        n = len(xs)
        q1 = xs[(n + 3) // 4 - 1]
        q3 = xs[(3 * n + 3) // 4 - 1]
        # Tukey 1.5×IQR fences in exact doubled-integer form
        out = sum(1 for v in xs
                  if 2 * v < 2 * q1 - 3 * (q3 - q1)
                  or 2 * v > 2 * q3 + 3 * (q3 - q1))
        if not (row["n"] == n and close(row["q1"], q1 / 100, 1e-6)
                and close(row["q3"], q3 / 100, 1e-6)
                and row["n_outliers"] == out):
            mis.append((row["event_type"], "got", tuple(row.values())[1:],
                        "exp", (n, q1 / 100, q3 / 100, out)))
    report("dq_anomaly_iqr", mis, len(got) * 4)


def audit_outlier_zscore():
    mis = []
    g = {}
    for t, e, v in rows(
            "SELECT event_type, event_id, "
            "CAST(floor(value * 100 + 0.5) AS BIGINT) "
            f"FROM '{SF}/events.parquet'"):
        g.setdefault(t, []).append((e, int(v)))
    exp = {}
    for t, evs in g.items():
        vs = [v for _, v in evs]
        n = len(vs)
        m = sum(vs) / n
        sd = math.sqrt(max(0.0, sum(v * v for v in vs) - sum(vs) ** 2 / n)
                       / (n - 1))
        for e, v in evs:
            z = abs(v - m) / sd
            if z > 2.5:
                exp[e] = z
    got = dump("dq_outlier_zscore")
    cols = dump_cols("dq_outlier_zscore")
    seen = set()
    for row_ in got:
        row = dict(zip(cols, row_))
        e = row["event_id"]
        seen.add(e)
        if e not in exp or not close(row["z"], exp[e], 1e-3):
            mis.append((e, "got", row["z"], "exp", exp.get(e)))
    if seen != set(exp):
        mis.append(("outlier set mismatch", len(seen), len(exp)))
    report("dq_outlier_zscore", mis, len(got))


def audit_mode():
    mis = []
    g = {}
    for ck, p in rows(
            f"SELECT o_custkey, o_orderpriority FROM '{SF}/orders.parquet'"):
        g.setdefault(ck, {}).setdefault(p, 0)
        g[ck][p] += 1
    got = dump("agg_mode")
    cols = dump_cols("agg_mode")
    for row_ in got:
        row = dict(zip(cols, row_))
        counts = g[row["o_custkey"]]
        exp = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if row["mode_prio"] != exp:
            mis.append((row["o_custkey"], "got", row["mode_prio"], "exp", exp))
    if len(got) != len(g):
        mis.append(("row count", len(got), len(g)))
    report("agg_mode", mis, len(got))


def audit_hapax():
    mis = []
    g = {}
    for s, t in rows(
            "SELECT source, unnest(string_split(lower(text), ' ')) "
            f"FROM '{SF}/documents.parquet'"):
        g.setdefault(s, {}).setdefault(t, 0)
        g[s][t] += 1
    got = dump("text_hapax_ratio")
    cols = dump_cols("text_hapax_ratio")
    for row_ in got:
        row = dict(zip(cols, row_))
        counts = g[row["source"]]
        n = sum(counts.values())
        v = len(counts)
        h = sum(1 for c in counts.values() if c == 1)
        if not (row["n_tokens"] == n and row["vocab"] == v and row["hapax"] == h
                and close(row["hapax_ratio"], h / v, 1e-5)
                and close(row["type_token_ratio"], v / n, 1e-5)):
            mis.append((row["source"], "got", tuple(row.values())[1:],
                        "exp", (n, v, h, h / v, v / n)))
    report("text_hapax_ratio", mis, len(got) * 5)


def audit_source_kl():
    mis = []
    g = {}
    corpus = {}
    for s, t in rows(
            "SELECT source, unnest(string_split(lower(text), ' ')) "
            f"FROM '{SF}/documents.parquet'"):
        g.setdefault(s, {}).setdefault(t, 0)
        g[s][t] += 1
        corpus[t] = corpus.get(t, 0) + 1
    n = sum(corpus.values())
    got = dump("text_source_kl")
    cols = dump_cols("text_source_kl")
    for row_ in got:
        row = dict(zip(cols, row_))
        counts = g[row["source"]]
        ns = sum(counts.values())
        # KL(p_source || p_corpus) = Σ (c/ns)·ln((c/ns)/(d/n))
        kl = sum(c * math.log((c * n) / (corpus[t] * ns))
                 for t, c in counts.items()) / ns
        if not (row["n_tokens"] == ns and close(row["kl"], kl, 2e-3)):
            mis.append((row["source"], "got", (row["n_tokens"], row["kl"]),
                        "exp", (ns, kl)))
    report("text_source_kl", mis, len(got) * 2)


def audit_histogram():
    mis = []
    r = rows(
        "SELECT CAST(floor(l_quantity / 10) AS BIGINT), COUNT(*), "
        "SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) "
        f"FROM '{SF}/lineitem.parquet' GROUP BY 1")
    exp = {b: (c, s) for b, c, s in r}
    got = dump("agg_histogram")
    cols = dump_cols("agg_histogram")
    for row_ in got:
        row = dict(zip(cols, row_))
        c, s = exp[row["bucket"]]
        avg = round(s / 100 / c, 4)
        if not (row["n"] == c and close(row["avg_qty"], avg, 1e-4)):
            mis.append((row["bucket"], "got", (row["n"], row["avg_qty"]),
                        "exp", (c, avg)))
    report("agg_histogram", mis, len(got) * 2)


def audit_gap_islands():
    mis = []
    r = rows(
        "SELECT DISTINCT user_id, date_diff('day', DATE '2024-01-01', "
        f"CAST(date_trunc('day', ts) AS DATE)) FROM '{SF}/events.parquet'")
    days = {}
    for u, d in r:
        days.setdefault(u, set()).add(d)
    got = dump("win_gap_islands")
    cols = dump_cols("win_gap_islands")
    for row_ in got:
        row = dict(zip(cols, row_))
        ds = sorted(days[row["user_id"]])
        streaks = []
        cur = 1
        for a, b in zip(ds, ds[1:]):
            if b == a + 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        if not (row["n_streaks"] == len(streaks)
                and row["longest"] == max(streaks)
                and row["active_days"] == len(ds)):
            mis.append((row["user_id"], "got", tuple(row.values())[1:],
                        "exp", (len(streaks), max(streaks), len(ds))))
    report("win_gap_islands", mis, len(got) * 3)


def audit_bollinger():
    mis = []
    series = daily_x_series()
    got = dump("ts_bollinger")
    cols = dump_cols("ts_bollinger")
    for row_ in got:
        row = dict(zip(cols, row_))
        pts = series[row["user_id"]]
        idx = [d for d, _ in pts].index(row["day"])
        win = [int(math.floor(x * 10000 + 0.5)) for _, x in
               pts[max(0, idx - 6):idx + 1]]
        nw = len(win)
        sw, qw = sum(win), sum(v * v for v in win)
        mean = sw / nw
        sd = math.sqrt((qw - sw * sw / nw) / nw)
        v4 = win[-1]
        mid = math.floor(mean + 0.5) / 10000
        upper = math.floor(mean + 2 * sd + 0.5) / 10000
        breakout = 1 if abs(v4 - mean) > 2 * sd else 0
        if not (close(row["mid"], mid, 1e-6) and close(row["upper_band"], upper, 1e-6)
                and row["breakout"] == breakout):
            mis.append(((row["user_id"], row["day"]), "got",
                        (row["mid"], row["upper_band"], row["breakout"]),
                        "exp", (mid, upper, breakout)))
    report("ts_bollinger", mis, len(got) * 3)


def audit_attribution():
    mis = []
    r = rows(
        "SELECT user_id, event_id, event_type, epoch_us(ts) // 1000000 "
        f"FROM '{SF}/events.parquet'")
    clicks = {}
    for u, e, t, sec in r:
        if t == "click":
            clicks.setdefault(u, []).append((sec, e))
    got = dump("events_attribution")
    cols = dump_cols("events_attribution")
    for row_ in got:
        row = dict(zip(cols, row_))
        pe = row["event_id"]
        u = row["user_id"]
        psec = next(sec for uu, e, t, sec in r if e == pe)
        cs = [(sec, e) for sec, e in clicks.get(u, [])
              if psec - 604800 <= sec <= psec]
        if not cs:
            ok = row["click_id"] is None and row["lag_s"] is None
        else:
            fc = min(sec for sec, _ in cs)
            cid = min(e for sec, e in cs if sec == fc)
            ok = row["click_id"] == cid and row["lag_s"] == psec - fc
        if not ok:
            mis.append((pe, "got", (row["click_id"], row["lag_s"])))
    report("events_attribution", mis, len(got) * 2)


def audit_uplift_by_segment():
    mis = []
    r = rows(
        "SELECT user_id, CAST(epoch_us(ts) AS BIGINT), "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) "
        f"FROM '{SF}/events.parquet'")
    mid = (min(u for _, u, _ in r) + max(u for _, u, _ in r)) // 2
    users = {}
    for uid, us, c in r:
        e = users.setdefault(uid, [0, 0])
        e[0 if us < mid else 1] += c
    ranked = sorted(users.items(), key=lambda kv: (kv[1][0], kv[0]))
    n = len(ranked)
    segs = {}
    base, extra = divmod(n, 4)
    i = 0
    for tile in range(1, 5):
        size = base + (1 if tile <= extra else 0)
        for uid, (x, y) in ranked[i:i + size]:
            segs.setdefault(tile, []).append((uid, y))
        i += size
    got = dump("events_uplift_by_segment")
    cols = dump_cols("events_uplift_by_segment")
    for row_ in got:
        row = dict(zip(cols, row_))
        members = segs[row["segment"]]
        c0 = [y for uid, y in members if uid % 2 == 0]
        c1 = [y for uid, y in members if uid % 2 == 1]
        m0 = sum(c0) / len(c0) / 100
        m1 = sum(c1) / len(c1) / 100
        if not (row["n0"] == len(c0) and row["n1"] == len(c1)
                and close(row["mean_control"], m0, 1e-4)
                and close(row["mean_treat"], m1, 1e-4)
                and close(row["uplift"], m1 - m0, 1e-3)):
            mis.append((row["segment"], "got", tuple(row.values())[1:6],
                        "exp", (len(c0), len(c1), m0, m1, m1 - m0)))
    report("events_uplift_by_segment", mis, len(got) * 5)


def audit_mixture_kl():
    mis = []
    r = rows(f"SELECT source, COUNT(*) FROM '{SF}/documents.parquet' GROUP BY 1")
    sizes = dict(r)
    total = sum(sizes.values())
    got = dump("llm_mixture_kl")
    cols = dump_cols("llm_mixture_kl")
    for row_ in got:
        row = dict(zip(cols, row_))
        tau = row["tau"]
        w = {s: math.floor(n ** tau * 1e6 + 0.5) for s, n in sizes.items()}
        z = sum(w.values())
        kl = sum((n / total) * math.log((n / total) / (w[s] / z))
                 for s, n in sizes.items())
        if not close(row["kl_nats"], kl, 2e-3):
            mis.append((tau, "got", row["kl_nats"], "exp", kl))
    report("llm_mixture_kl", mis, len(got))


def audit_markov_transitions():
    mis = []
    r = rows(
        "SELECT user_id, event_type FROM "
        f"'{SF}/events.parquet' ORDER BY user_id, ts, event_id")
    trans = {}
    prev = {}
    for u, t in r:
        if u in prev:
            key = (prev[u], t)
            trans[key] = trans.get(key, 0) + 1
        prev[u] = t
    out = {}
    for (s, _), c in trans.items():
        out[s] = out.get(s, 0) + c
    got = dump("events_markov_transitions")
    cols = dump_cols("events_markov_transitions")
    for row_ in got:
        row = dict(zip(cols, row_))
        key = (row["src"], row["dst"])
        if not (row["n"] == trans.get(key)
                and close(row["p"], trans[key] / out[row["src"]], 1e-4)):
            mis.append((key, "got", (row["n"], row["p"]),
                        "exp", (trans.get(key), trans[key] / out[row["src"]])))
    if len(got) != len(trans):
        mis.append(("transition count", len(got), len(trans)))
    report("events_markov_transitions", mis, len(got) * 2)


def audit_freshness():
    mis = []
    r = rows(
        "SELECT event_type, epoch_us(ts) // 1000000 "
        f"FROM '{SF}/events.parquet'")
    gmax = max(sec for _, sec in r)
    g = {}
    for t, sec in r:
        g.setdefault(t, []).append(sec)
    got = dump("dq_freshness")
    cols = dump_cols("dq_freshness")
    for row_ in got:
        row = dict(zip(cols, row_))
        secs = g[row["event_type"]]
        tmax = max(secs)
        n24 = sum(1 for s in secs if s > gmax - 86400)
        if not (row["last_sec"] == tmax and row["lag_sec"] == gmax - tmax
                and row["n_last_24h"] == n24):
            mis.append((row["event_type"], "got", tuple(row.values())[1:],
                        "exp", (tmax, gmax - tmax, n24)))
    report("dq_freshness", mis, len(got) * 3)


def audit_argminmax():
    mis = []
    r = rows(
        "SELECT c_nationkey, c_name, c_custkey, "
        "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) "
        f"FROM '{SF}/customer.parquet'")
    g = {}
    for nk, name, ck, bal in r:
        g.setdefault(nk, []).append((int(bal) * 100000 + ck, name))
    got = dump("agg_argminmax")
    cols = dump_cols("agg_argminmax")
    for row_ in got:
        row = dict(zip(cols, row_))
        xs = g[row["c_nationkey"]]
        if not (row["richest"] == max(xs)[1] and row["poorest"] == min(xs)[1]):
            mis.append((row["c_nationkey"], "got",
                        (row["richest"], row["poorest"]),
                        "exp", (max(xs)[1], min(xs)[1])))
    report("agg_argminmax", mis, len(got) * 2)


def audit_dow_hour_matrix():
    mis = []
    r = rows(
        "SELECT ((date_diff('day', DATE '2024-01-01', "
        "CAST(date_trunc('day', ts) AS DATE)) % 7) + 7) % 7, "
        "(epoch_us(ts) // 3600000000) % 24, COUNT(*) "
        f"FROM '{SF}/events.parquet' GROUP BY 1, 2")
    cells = {(int(d), int(h)): c for d, h, c in r}
    dow_tot = {}
    for (d, _), c in cells.items():
        dow_tot[d] = dow_tot.get(d, 0) + c
    got = dump("events_dow_hour_matrix")
    cols = dump_cols("events_dow_hour_matrix")
    for row_ in got:
        row = dict(zip(cols, row_))
        key = (row["dow"], row["hour"])
        if not (row["n_events"] == cells.get(key)
                and close(row["share_of_dow"],
                          cells[key] / dow_tot[row["dow"]], 1e-5)):
            mis.append((key, "got", (row["n_events"], row["share_of_dow"]),
                        "exp", (cells.get(key), cells[key] / dow_tot[row["dow"]])))
    if len(got) != len(cells):
        mis.append(("cell count", len(got), len(cells)))
    report("events_dow_hour_matrix", mis, len(got) * 2)


def trade_edges():
    return set(rows(
        "SELECT DISTINCT s.s_nationkey, c.c_nationkey "
        f"FROM '{SF}/lineitem.parquet' l "
        f"JOIN '{SF}/orders.parquet' o ON l.l_orderkey = o.o_orderkey "
        f"JOIN '{SF}/customer.parquet' c ON o.o_custkey = c.c_custkey "
        f"JOIN '{SF}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey "
        "WHERE s.s_nationkey <> c.c_nationkey"))


def audit_degree_topk():
    mis = []
    edges = trade_edges()
    sym = {}
    for a, b in edges:
        sym.setdefault(a, set()).add(b)
        sym.setdefault(b, set()).add(a)
    names = dict(rows(
        f"SELECT n_nationkey, n_name FROM '{SF}/nation.parquet'"))
    deg = sorted(((len(v), names[k]) for k, v in sym.items()),
                 key=lambda x: (-x[0], x[1]))[:10]
    got = [(r[0], r[1]) for r in dump("graph_degree_topk")]
    exp = [(n, d) for d, n in deg]
    if got != exp:
        mis.append(("got", got[:3], "exp", exp[:3]))
    report("graph_degree_topk", mis, len(got))


def audit_reciprocity():
    mis = []
    edges = trade_edges()
    recip = sum(1 for a, b in edges if (b, a) in edges)
    row = dict(zip(dump_cols("graph_reciprocity"),
                   dump("graph_reciprocity")[0]))
    if not (row["n_edges"] == len(edges) and row["n_reciprocal"] == recip
            and close(row["reciprocity"], recip / len(edges), 1e-5)):
        mis.append(("got", tuple(row.values()),
                    "exp", (len(edges), recip, recip / len(edges))))
    report("graph_reciprocity", mis, 3)


def audit_neighbor_jaccard():
    mis = []
    edges = trade_edges()
    sym = {}
    for a, b in edges:
        sym.setdefault(a, set()).add(b)
        sym.setdefault(b, set()).add(a)
    nodes = sorted(sym)
    exp = {}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            inter = len(sym[a] & sym[b])
            if inter == 0:
                continue
            j = inter / (len(sym[a]) + len(sym[b]) - inter)
            if j >= 0.5:
                exp[(a, b)] = (inter, j)
    got = dump("graph_neighbor_jaccard")
    cols = dump_cols("graph_neighbor_jaccard")
    seen = set()
    for row_ in got:
        row = dict(zip(cols, row_))
        key = (row["node_a"], row["node_b"])
        seen.add(key)
        e = exp.get(key)
        if e is None or row["shared"] != e[0] or not close(row["jaccard"], e[1], 1e-4):
            mis.append((key, "got", (row["shared"], row["jaccard"]), "exp", e))
    if seen != set(exp):
        mis.append(("pair set mismatch", len(seen), len(exp)))
    report("graph_neighbor_jaccard", mis, max(1, len(got) * 2))


def audit_ts_peaks():
    mis = []
    r = rows(
        "SELECT CAST(date_trunc('day', ts) AS DATE) AS day, "
        "SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) "
        f"FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1")
    days = [d for d, _ in r]
    xs = [int(x) for _, x in r]
    exp = {}
    for i in range(2, len(xs) - 2):
        x = xs[i]
        nb = [xs[i - 1], xs[i - 2], xs[i + 1], xs[i + 2]]
        if all(x > v for v in nb) and 20 * (x - max(nb)) >= x:
            exp[days[i].strftime("%Y-%m-%d")] = \
                (x / 100, math.floor((x - max(nb)) / x * 1e6 + 0.5) / 1e6)
    got = dump("ts_peaks")
    cols = dump_cols("ts_peaks")
    seen = set()
    for row_ in got:
        row = dict(zip(cols, row_))
        seen.add(row["day"])
        e = exp.get(row["day"])
        if e is None or not (close(row["revenue"], e[0], 1e-6)
                             and close(row["prominence"], e[1], 1e-6)):
            mis.append((row["day"], "got",
                        (row["revenue"], row["prominence"]), "exp", e))
    if seen != set(exp):
        mis.append(("peak set mismatch", len(seen), len(exp)))
    report("ts_peaks", mis, max(1, len(got) * 2))


def audit_aging_buckets():
    mis = []
    r = rows(
        "SELECT date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01'), "
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) "
        f"FROM '{SF}/orders.parquet' WHERE o_orderstatus <> 'F'")
    b = {}
    for age, c in r:
        k = "0-29d" if age < 30 else "30-89d" if age < 90 \
            else "90-179d" if age < 180 else "180d+"
        e = b.setdefault(k, [0, 0])
        e[0] += 1
        e[1] += int(c)
    got = dump("agg_aging_buckets")
    cols = dump_cols("agg_aging_buckets")
    for row_ in got:
        row = dict(zip(cols, row_))
        n, v = b[row["age_bucket"]]
        if not (row["n_orders"] == n and close(row["open_value"], v / 100, 1e-6)):
            mis.append((row["age_bucket"], "got",
                        (row["n_orders"], row["open_value"]), "exp", (n, v / 100)))
    report("agg_aging_buckets", mis, len(got) * 2)


def audit_error_rate_slo():
    mis = []
    r = rows(
        "SELECT strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d'), "
        "COUNT(*), SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) "
        f"FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1")
    days = [(d, n, e) for d, n, e in r]
    got = dump("events_error_rate_slo")
    cols = dump_cols("events_error_rate_slo")
    idx = {d: i for i, (d, _, _) in enumerate(days)}
    for row_ in got:
        row = dict(zip(cols, row_))
        i = idx[row["day"]]
        _, n, e = days[i]
        win = days[max(0, i - 6):i + 1]
        n7, e7 = sum(x[1] for x in win), sum(x[2] for x in win)
        if not (row["n_events"] == n and row["n_errors"] == e
                and close(row["error_rate"], e / n, 1e-5)
                and close(row["burn_1d"], e / n / 0.01, 1e-3)
                and close(row["burn_7d"], e7 / n7 / 0.01, 1e-3)):
            mis.append((row["day"], "got", tuple(row.values())[1:],
                        "exp", (n, e, e / n, e / n / 0.01, e7 / n7 / 0.01)))
    report("events_error_rate_slo", mis, len(got) * 5)


def audit_type_overlap():
    mis = []
    r = rows(
        f"SELECT DISTINCT user_id, event_type FROM '{SF}/events.parquet'")
    users = {}
    for u, t in r:
        users.setdefault(t, set()).add(u)
    nu = len({u for u, _ in r})
    got = dump("events_type_overlap")
    cols = dump_cols("events_type_overlap")
    for row_ in got:
        row = dict(zip(cols, row_))
        a, b = users[row["type_a"]], users[row["type_b"]]
        both = len(a & b)
        jac = both / len(a | b)
        lift = both * nu / (len(a) * len(b))
        if not (row["n_a"] == len(a) and row["n_b"] == len(b)
                and row["n_both"] == both and close(row["jaccard"], jac, 1e-5)
                and close(row["lift"], lift, 1e-4)):
            mis.append(((row["type_a"], row["type_b"]), "got",
                        tuple(row.values())[2:],
                        "exp", (len(a), len(b), both, jac, lift)))
    report("events_type_overlap", mis, len(got) * 5)


def audit_trigram_similarity():
    mis = []
    names = [n for (n,) in rows(
        f"SELECT DISTINCT lower(p_name) FROM '{SF}/part.parquet'")]
    tg = {n: {n[i:i + 3] for i in range(len(n) - 2)} for n in names}
    exp = {}
    for a in names:
        for b in names:
            if a < b:
                inter = len(tg[a] & tg[b])
                uni = len(tg[a] | tg[b])
                if 4 * inter >= uni:
                    exp[(a, b)] = (inter, uni, inter / uni)
    got = dump("fn_trigram_similarity")
    cols = dump_cols("fn_trigram_similarity")
    seen = set()
    for row_ in got:
        row = dict(zip(cols, row_))
        key = (row["name_a"], row["name_b"])
        seen.add(key)
        e = exp.get(key)
        if e is None or row["inter"] != e[0] or row["uni"] != e[1] \
                or not close(row["sim"], e[2], 1e-4):
            mis.append((key, "got", (row["inter"], row["uni"], row["sim"]),
                        "exp", e))
    if seen != set(exp):
        mis.append(("pair set mismatch", len(seen), len(exp)))
    report("fn_trigram_similarity", mis, max(1, len(got) * 3))


def audit_spearman():
    mis = []
    r = rows(
        "SELECT CAST(date_trunc('day', ts) AS DATE) AS day, "
        "SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)), COUNT(*) "
        f"FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1")
    days = [(d, int(rev), n) for d, rev, n in r]
    rx = {d: i + 1 for i, (d, _, _) in enumerate(
        sorted(days, key=lambda x: (x[1], x[0])))}
    ry = {d: i + 1 for i, (d, _, _) in enumerate(
        sorted(days, key=lambda x: (x[2], x[0])))}
    n = len(days)
    sd2 = sum((rx[d] - ry[d]) ** 2 for d, _, _ in days)
    rho = 1 - 6.0 * sd2 / (n * (n * n - 1))
    row = dict(zip(dump_cols("ts_spearman"), dump("ts_spearman")[0]))
    if not (row["n_days"] == n and close(row["spearman_rho"], rho, 1e-5)):
        mis.append(("got", tuple(row.values()), "exp", (n, rho)))
    report("ts_spearman", mis, 2)


def audit_ohlc():
    mis = []
    r = rows(
        "SELECT user_id, date_diff('day', DATE '2024-01-01', "
        "CAST(date_trunc('day', ts) AS DATE)), "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) "
        f"FROM '{SF}/events.parquet' ORDER BY user_id, ts, event_id")
    g = {}
    for u, d, v in r:
        g.setdefault((u, int(d)), []).append(int(v))
    got = dump("ts_ohlc_resample")
    cols = dump_cols("ts_ohlc_resample")
    for row_ in got:
        row = dict(zip(cols, row_))
        vs = g[(row["user_id"], row["day"])]
        if not (row["n"] == len(vs) and close(row["open"], vs[0] / 100, 1e-6)
                and close(row["high"], max(vs) / 100, 1e-6)
                and close(row["low"], min(vs) / 100, 1e-6)
                and close(row["close"], vs[-1] / 100, 1e-6)):
            mis.append(((row["user_id"], row["day"]), "got",
                        tuple(row.values())[2:],
                        "exp", (len(vs), vs[0] / 100, max(vs) / 100,
                                min(vs) / 100, vs[-1] / 100)))
    if len(got) != len(g):
        mis.append(("bar count", len(got), len(g)))
    report("ts_ohlc_resample", mis, len(got) * 5)


def audit_histogram2d():
    mis = []
    r = rows(
        "SELECT CAST(floor(l_quantity / 10) AS BIGINT), "
        "CAST(floor(l_extendedprice / 10000) AS BIGINT), COUNT(*), "
        "SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) "
        f"FROM '{SF}/lineitem.parquet' GROUP BY 1, 2")
    cells = {(q, p): (n, int(s)) for q, p, n, s in r}
    got = dump("agg_histogram2d")
    cols = dump_cols("agg_histogram2d")
    for row_ in got:
        row = dict(zip(cols, row_))
        n, s = cells[(row["qty_band"], row["price_band"])]
        if not (row["n"] == n and close(row["revenue"], s / 100, 1e-6)):
            mis.append(((row["qty_band"], row["price_band"]), "got",
                        (row["n"], row["revenue"]), "exp", (n, s / 100)))
    report("agg_histogram2d", mis, len(got) * 2)


def audit_anova_dow():
    mis = []
    r = rows(
        "SELECT ((date_diff('day', DATE '2024-01-01', "
        "CAST(date_trunc('day', ts) AS DATE)) % 7) + 7) % 7 AS dow, "
        "CAST(date_trunc('day', ts) AS DATE) AS day, "
        "SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) "
        f"FROM '{SF}/events.parquet' GROUP BY 1, 2")
    groups = {}
    for dow, _, v in r:
        groups.setdefault(int(dow), []).append(int(v))
    allv = [v for vs in groups.values() for v in vs]
    n = len(allv)
    gm = sum(allv) / n
    ssb = sum(len(vs) * (sum(vs) / len(vs) - gm) ** 2 for vs in groups.values())
    ssw = sum(sum((v - sum(vs) / len(vs)) ** 2 for v in vs)
              for vs in groups.values())
    k = len(groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    got = dump("ts_anova_dow")
    cols = dump_cols("ts_anova_dow")
    row = dict(zip(cols, got[0]))
    fcol = next(c for c in cols if c.startswith("f"))
    if not close(row[fcol], f, 2e-3):
        mis.append(("got", row[fcol], "exp", f))
    report("ts_anova_dow", mis, 1)


def audit_changepoint():
    mis = []
    r = rows(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, "
        "SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) "
        f"FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2")
    g = {}
    for t, d, s in r:
        g.setdefault(t, []).append((d, int(s)))
    got = dump("ts_changepoint")
    cols = dump_cols("ts_changepoint")
    for row_ in got:
        row = dict(zip(cols, row_))
        pts = g[row["event_type"]]
        n = len(pts)
        tot = sum(s for _, s in pts)
        best = None  # (score, day)
        cum = 0
        for t, (d, s) in enumerate(pts, start=1):
            cum += s
            score = abs(n * cum - t * tot)
            if best is None or score > best[0]:
                best = (score, d)
        score, day = best
        if not (row["n_days"] == n
                and row["cp_day"] == day.strftime("%Y-%m-%d")
                and close(row[cols[3]], score / (n * tot), 2e-3)):
            mis.append((row["event_type"], "got", tuple(row.values())[1:],
                        "exp", (n, day, score / (n * tot))))
    report("ts_changepoint", mis, len(got) * 3)


def audit_fingerprint():
    mis = []
    import hashlib
    r = rows(f"SELECT doc_id, text FROM '{SF}/documents.parquet'")
    got = dump("text_fingerprint")
    cols = dump_cols("text_fingerprint")
    texts = dict(r)
    for row_ in got:
        row = dict(zip(cols, row_))
        toks = texts[row["doc_id"]].split(" ")
        fp = 0
        for t in toks:
            fp = (fp * 131 + (ord(t[0]) * 256 + len(t))) % 2147483647
        min_md5 = min(hashlib.md5(t.encode()).hexdigest() for t in toks)
        if not (row["fp_poly"] == fp and row["fp_min_md5"] == min_md5):
            mis.append((row["doc_id"], "got",
                        (row["fp_poly"], row["fp_min_md5"]),
                        "exp", (fp, min_md5)))
    report("text_fingerprint", mis, len(got) * 2)


def audit_dedup_near():
    """Exhaustive all-pairs 3-gram Jaccard — the ground truth the blocked
    candidate join must reproduce EXACTLY (recall 1.0 by construction,
    since any pair with jaccard > 0 shares a shingle)."""
    mis = []
    r = rows(f"SELECT doc_id, text FROM '{SF}/documents.parquet'")
    sh = {}
    for doc_id, text in r:
        tk = text.split(" ")
        if len(tk) >= 3:
            sh[doc_id] = {" ".join(tk[i:i + 3]) for i in range(len(tk) - 2)}
    ids = sorted(sh)
    exp = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            j = inter / (len(sh[a]) + len(sh[b]) - inter)
            if round(j, 4) >= 0.3:
                exp[(a, b)] = j
    got = dump("llm_dedup_near")
    cols = dump_cols("llm_dedup_near")
    seen = set()
    for row_ in got:
        row = dict(zip(cols, row_))
        key = (row["id_a"], row["id_b"])
        seen.add(key)
        if key not in exp or not close(row["jaccard"], exp[key], 1e-4):
            mis.append((key, "got", row["jaccard"], "exp", exp.get(key)))
    if seen != set(exp):
        mis.append(("pair set mismatch (blocked join missed/added pairs)",
                    len(seen), len(exp)))
    report("llm_dedup_near", mis, max(1, len(got)))


def audit_markov_steady():
    """Stationary distribution from first principles: per-user event
    sequences -> transition counts -> 16 exact-integer power-iteration
    rounds at 1e12 fixed point (Python ints are unbounded, so this is the
    arithmetic both engines CLAIM to perform — any floor/overflow slip in
    either diverges here)."""
    mis = []
    ev = rows(f"SELECT user_id, event_type, ts, event_id "
              f"FROM '{SF}/events.parquet'")
    by_user = {}
    for uid, et, ts, eid in ev:
        by_user.setdefault(uid, []).append((ts, eid, et))
    counts = {}
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    types = sorted({et for _, et, _, _ in ev})
    real_out = {}
    for (a, _), c in counts.items():
        real_out[a] = real_out.get(a, 0) + c
    cm = dict(counts)
    for t in types:
        if t not in real_out:
            cm[(t, t)] = 1
    n = {}
    for (a, _), c in cm.items():
        n[a] = n.get(a, 0) + c
    p = {t: 10 ** 12 // len(types) for t in types}
    for _ in range(16):
        p = {t: sum(p[s] * c // n[s]
                    for (s, t2), c in cm.items() if t2 == t)
             for t in types}
    got = dump("events_markov_steady")
    cols = dump_cols("events_markov_steady")
    for row_ in got:
        row = dict(zip(cols, row_))
        t = row["event_type"]
        if row["out_transitions"] != real_out.get(t, 0):
            mis.append((t, "out", row["out_transitions"], real_out.get(t, 0)))
        if not close(row["steady_prob"], p[t] / 1e12, 1e-9):
            mis.append((t, "prob", row["steady_prob"], p[t] / 1e12))
    if len(got) != len(types):
        mis.append(("row count", len(got), len(types)))
    report("events_markov_steady", mis, max(1, 2 * len(got)))


def audit_lsh_recall_grid():
    """Expected LSH recall re-derived from the exhaustive all-pairs
    Jaccard truth set (audit_dedup_near's ground truth) and the collision
    polynomial 1-(1-s^r)^b evaluated with math.pow — a different
    computation route than either engine's multiply chains."""
    mis = []
    r_ = rows(f"SELECT doc_id, text FROM '{SF}/documents.parquet'")
    sh = {}
    for doc_id, text in r_:
        tk = text.split(" ")
        if len(tk) >= 3:
            sh[doc_id] = {" ".join(tk[i:i + 3]) for i in range(len(tk) - 2)}
    ids = sorted(sh)
    js = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            j = round(inter / (len(sh[a]) + len(sh[b]) - inter), 4)
            if j >= 0.3:
                js.append(j)
    got = dump("llm_lsh_recall_grid")
    cols = dump_cols("llm_lsh_recall_grid")
    for row_ in got:
        row = dict(zip(cols, row_))
        r, b = row["rows_per_band"], row["bands"]
        exp = sum(1.0 - (1.0 - j ** r) ** b for j in js) / max(1, len(js))
        if row["n_pairs"] != len(js):
            mis.append((r, b, "n_pairs", row["n_pairs"], len(js)))
        if not close(row["expected_recall"], exp, 1e-5):
            mis.append((r, b, "recall", row["expected_recall"], exp))
    if len(got) != 4:
        mis.append(("row count", len(got), 4))
    report("llm_lsh_recall_grid", mis, max(1, 2 * len(got)))


def audit_sprt():
    """Wald SPRT replayed sequentially in Python with float math.log
    increments (the engines use pinned 1e12 integer literals): cumulative
    LLR per arm over (ts, event_id) order, first boundary crossings at
    +/- ln(19), final LLR."""
    import math
    mis = []
    ev = rows(f"SELECT user_id % 2 AS arm, ts, event_id, "
              f"CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END "
              f"FROM '{SF}/events.parquet'")
    l1, l0, bound = math.log(1.2), math.log(0.88 / 0.90), math.log(19)
    by_arm = {}
    for arm, ts, eid, conv in ev:
        by_arm.setdefault(arm, []).append((ts, eid, conv))
    exp = {}
    for arm, seq in by_arm.items():
        seq.sort()
        s = llr = 0
        cross1 = cross0 = None
        for i, (_, _, conv) in enumerate(seq, 1):
            s += conv
            llr = s * l1 + (i - s) * l0
            if cross1 is None and llr >= bound:
                cross1 = i
            if cross0 is None and llr <= -bound:
                cross0 = i
        exp[arm] = (len(seq), s, llr, cross1, cross0)
    got = dump("events_ab_sequential_sprt")
    cols = dump_cols("events_ab_sequential_sprt")
    for row_ in got:
        row = dict(zip(cols, row_))
        n, s, llr, c1, c0 = exp[row["arm"]]
        if row["n_events"] != n or row["n_conversions"] != s:
            mis.append((row["arm"], "counts", row["n_events"], n))
        if not close(row["llr_final"], llr, 1e-4):
            mis.append((row["arm"], "llr", row["llr_final"], llr))
        # float-vs-fixed-point increments can disagree on the exact
        # crossing EVENT only if an llr value sits within float error of
        # the boundary; allow off-by-nothing here, it never happens on
        # the fixture
        if row["first_cross_h1"] != c1 or row["first_cross_h0"] != c0:
            mis.append((row["arm"], "crossings",
                        (row["first_cross_h1"], row["first_cross_h0"]),
                        (c1, c0)))
    report("events_ab_sequential_sprt", mis, 3 * max(1, len(got)))


def audit_degree_powerlaw():
    """Degree Zipf slope from floats: distinct customer-supplier edges,
    per-customer degree, log-log OLS over the top 100 by (degree desc,
    cust) — math.log instead of the engines' fixed-point lnFix."""
    import math
    mis = []
    ed = rows(f"SELECT DISTINCT o.o_custkey, l.l_suppkey "
              f"FROM '{SF}/lineitem.parquet' l "
              f"JOIN '{SF}/orders.parquet' o "
              f"ON l.l_orderkey = o.o_orderkey")
    deg = {}
    for c, _ in ed:
        deg[c] = deg.get(c, 0) + 1
    ranked = sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    pts = [(math.log(i + 1), math.log(d)) for i, (_, d) in enumerate(ranked)]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    row = dict(zip(dump_cols("graph_degree_powerlaw"),
                   dump("graph_degree_powerlaw")[0]))
    if row["n_nodes"] != len(deg):
        mis.append(("n_nodes", row["n_nodes"], len(deg)))
    if row["n_edges"] != len(ed):
        mis.append(("n_edges", row["n_edges"], len(ed)))
    if row["max_degree"] != max(deg.values()):
        mis.append(("max_degree", row["max_degree"]))
    if not close(row["degree_slope"], slope, 1e-4):
        mis.append(("slope", row["degree_slope"], slope))
    report("graph_degree_powerlaw", mis, 4)


def audit_ar2():
    """Yule-Walker AR(2) from the textbook route: float daily means,
    float autocovariances at lags 0/1/2 (a DIFFERENT centering than the
    engines' exact n*y - S integer form), then the same linear solve."""
    mis = []
    r_ = rows(f"SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d, "
              f"CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) "
              f"AS BIGINT) AS v FROM '{SF}/orders.parquet' "
              f"GROUP BY d ORDER BY d")
    y = [v for _, v in r_]
    n = len(y)
    mean = sum(y) / n
    z = [v - mean for v in y]
    c0 = sum(x * x for x in z)
    c1 = sum(z[i] * z[i - 1] for i in range(1, n))
    c2 = sum(z[i] * z[i - 2] for i in range(2, n))
    r1, r2 = c1 / c0, c2 / c0
    den = 1 - r1 * r1
    phi1 = r1 * (1 - r2) / den
    phi2 = (r2 - r1 * r1) / den
    got = dump("ts_ar2_yule_walker")
    row = dict(zip(dump_cols("ts_ar2_yule_walker"), got[0]))
    if row["n_days"] != n:
        mis.append(("n_days", row["n_days"], n))
    for kk, v in [("r1", r1), ("r2", r2), ("phi1", phi1), ("phi2", phi2),
                  ("noise_ratio", 1 - phi1 * r1 - phi2 * r2)]:
        if not close(row[kk], v, 1e-4):
            mis.append((kk, row[kk], v))
    report("ts_ar2_yule_walker", mis, 6)


def audit_friedman():
    """Friedman Q from the textbook definition: complete-day blocks,
    average ranks (as exact Fractions), Q = 12/(nk(k+1)) SUM R_j^2 -
    3n(k+1) — no 2x-scaled-rank identity, a different route than both
    engines' integer form."""
    mis = []
    ev = rows(f"SELECT CAST(date_trunc('day', ts) AS DATE), event_type, "
              f"CAST(floor(value * 100 + 0.5) AS BIGINT) "
              f"FROM '{SF}/events.parquet'")
    daily = {}
    types = set()
    for day, et, cents in ev:
        types.add(et)
        daily[(day, et)] = daily.get((day, et), 0) + cents
    k = len(types)
    days = sorted({d for d, _ in daily})
    full = [d for d in days
            if sum(1 for t in types if (d, t) in daily) == k]
    rank_sum = {t: Fraction(0) for t in types}
    for d in full:
        vals = sorted((daily[(d, t)], t) for t in types)
        by_v = {}
        for idx, (v, t) in enumerate(vals):
            by_v.setdefault(v, []).append(idx + 1)
        for v, t in vals:
            rank_sum[t] += Fraction(sum(by_v[v]), len(by_v[v]))
    n = len(full)
    s = sum(r * r for r in rank_sum.values())
    q = Fraction(12, n * k * (k + 1)) * s - 3 * n * (k + 1)
    got = dump("stats_friedman_test")
    cols = dump_cols("stats_friedman_test")
    row = dict(zip(cols, got[0]))
    if row["n_blocks"] != n:
        mis.append(("n_blocks", row["n_blocks"], n))
    if row["k"] != k:
        mis.append(("k", row["k"], k))
    if row["sum_rank2_sq"] != sum(int(2 * r) ** 2 for r in rank_sum.values()):
        mis.append(("sum_rank2_sq", row["sum_rank2_sq"]))
    if not close(row["friedman_q"], float(q), 1e-6):
        mis.append(("q", row["friedman_q"], float(q)))
    report("stats_friedman_test", mis, 4)


def audit_dedup_family():
    """The whole hashed dedup machinery reimplemented in Python: md5
    Kirsch-Mitzenmacher MinHash (60+28-bit slices, 32 hashes, 8 bands,
    exact verification at tau 0.3) and md5 SimHash (60+4-bit token
    hashes, 64 vote bits, 4 16-bit bands, Hamming<=3), compared against
    the family-overlap counts — if either engine's banding, bucketing or
    verification drifts from the algorithm, the counts diverge here."""
    import hashlib
    mis = []
    r_ = rows(f"SELECT doc_id, text FROM '{SF}/documents.parquet'")
    sh = {}
    toks = {}
    for doc_id, text in r_:
        tk = text.split(" ")
        toks[doc_id] = tk
        if len(tk) >= 3:
            sh[doc_id] = {" ".join(tk[i:i + 3]) for i in range(len(tk) - 2)}
    ids = sorted(sh)
    near = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            if inter and round(
                    inter / (len(sh[a]) + len(sh[b]) - inter), 4) >= 0.3:
                near.add((a, b))
    # minhash: h_i = h1 + i*h2 over md5 slices; 8 bands of 4 rows
    def slices(s):
        d = hashlib.md5(s.encode()).hexdigest()
        return int(d[:15], 16), int(d[16:23], 16)
    band_buckets = {}
    for doc in ids:
        hs = [slices(s) for s in sh[doc]]
        sig = [min(h1 + i * h2 for h1, h2 in hs) for i in range(32)]
        for j in range(8):
            key = (j, ",".join(str(v) for v in sig[4 * j:4 * j + 4]))
            band_buckets.setdefault(key, []).append(doc)
    mh = set()
    for docs_ in band_buckets.values():
        docs_ = sorted(set(docs_))
        for i, a in enumerate(docs_):
            for b in docs_[i + 1:]:
                inter = len(sh[a] & sh[b])
                if inter and round(
                        inter / (len(sh[a]) + len(sh[b]) - inter), 4) >= 0.3:
                    mh.add((a, b))
    # simhash: 64 md5-derived vote bits, 4 bands of 16
    sigs = {}
    for doc_id, tk in toks.items():
        votes = [0] * 64
        for t in tk:
            d = hashlib.md5(t.encode()).hexdigest()
            h = int(d[:15], 16) | (int(d[15], 16) << 60)
            for b in range(64):
                votes[b] += 1 if (h >> b) & 1 else -1
        sigs[doc_id] = sum(1 << b for b in range(64) if votes[b] > 0)
    sbuckets = {}
    for doc_id, s in sigs.items():
        for j in range(4):
            sbuckets.setdefault((j, (s >> (16 * j)) & 0xFFFF, ),
                                []).append(doc_id)
    simp = set()
    for docs_ in sbuckets.values():
        docs_ = sorted(set(docs_))
        for i, a in enumerate(docs_):
            for b in docs_[i + 1:]:
                if bin(sigs[a] ^ sigs[b]).count("1") <= 3:
                    simp.add((a, b))
    got = dump("llm_dedup_family_overlap")
    cols = dump_cols("llm_dedup_family_overlap")
    row = dict(zip(cols, got[0]))
    exp = {"n_near": len(near), "n_minhash": len(mh), "n_simhash": len(simp),
           "n_minhash_and_near": len(mh & near),
           "n_simhash_and_near": len(simp & near),
           "n_minhash_and_simhash": len(mh & simp)}
    for kk, v in exp.items():
        if row[kk] != v:
            mis.append((kk, row[kk], v))
    report("llm_dedup_family_overlap", mis, len(exp))


def audit_durbin_watson():
    """Durbin-Watson from the textbook route: float daily revenue means,
    float residuals e_t = y_t - ybar (a DIFFERENT centering than the
    engines' exact n*y - S integer form), DW = sum(diff^2)/sum(e^2)."""
    mis = []
    r_ = rows(f"SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d, "
              f"SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS v "
              f"FROM '{SF}/orders.parquet' GROUP BY d ORDER BY d")
    y = [v for _, v in r_]
    n = len(y)
    ybar = sum(y) / n
    e = [v - ybar for v in y]
    dw = sum((e[i] - e[i - 1]) ** 2 for i in range(1, n)) / \
        sum(x * x for x in e)
    row = dict(zip(dump_cols("ts_durbin_watson"), dump("ts_durbin_watson")[0]))
    if row["n_days"] != n:
        mis.append(("n_days", row["n_days"], n))
    if not close(row["dw"], dw, 1e-6):
        mis.append(("dw", row["dw"], dw))
    if not close(row["rho_lag1"], 1 - dw / 2, 1e-6):
        mis.append(("rho_lag1", row["rho_lag1"], 1 - dw / 2))
    report("ts_durbin_watson", mis, 3)


def audit_hurst():
    """Rescaled-range Hurst from the textbook route: float chunk means,
    float cumulative deviations, population std, mean R/S per scale
    (quantized at 1e-6 like the engines), log-log OLS slope."""
    import math
    mis = []
    r_ = rows(f"SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d, "
              f"SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS v "
              f"FROM '{SF}/orders.parquet' GROUP BY d ORDER BY d")
    y = [v for _, v in r_]
    pts = []
    for w in (16, 32, 64, 128):
        qs = []
        for c0 in range(0, len(y) - w + 1, w):
            ch = y[c0:c0 + w]
            mu = sum(ch) / w
            dev = [v - mu for v in ch]
            cum, run = [], 0.0
            for dv in dev:
                run += dv
                cum.append(run)
            r = max(cum) - min(cum)
            s = math.sqrt(sum(d * d for d in dev) / w)
            if s > 0:
                qs.append(math.floor(r / s * 1e6 + 0.5))
        pts.append((math.log(w), math.log(sum(qs) / len(qs) / 1e6)))
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(yy for _, yy in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * yy for x, yy in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    row = dict(zip(dump_cols("ts_hurst"), dump("ts_hurst")[0]))
    if row["n_days"] != len(y):
        mis.append(("n_days", row["n_days"], len(y)))
    if row["n_scales"] != 4:
        mis.append(("n_scales", row["n_scales"]))
    if not close(row["hurst"], slope, 1e-4):
        mis.append(("hurst", row["hurst"], slope))
    report("ts_hurst", mis, 3)


def audit_mcnemar():
    """McNemar discordant pairs recounted row-by-row in Python from the
    raw events (purchase in the user's first vs last 7 active-span days,
    span >= 14), chi2 from the textbook (b-c)^2/(b+c) and
    Edwards-corrected forms."""
    import datetime
    mis = []
    r_ = rows(f"SELECT user_id, CAST(date_trunc('day', ts) AS DATE), "
              f"event_type FROM '{SF}/events.parquet'")
    span = {}
    for u, d, _ in r_:
        lo, hi = span.get(u, (d, d))
        span[u] = (min(lo, d), max(hi, d))
    week = datetime.timedelta(days=7)
    per = {}
    for u, d, t in r_:
        d0, d1 = span[u]
        if (d1 - d0).days < 14:
            continue
        xa, xb = per.get(u, (0, 0))
        conv = 1 if t == "purchase" else 0
        if d < d0 + week:
            xa = max(xa, conv)
        if d > d1 - week:
            xb = max(xb, conv)
        per[u] = (xa, xb)
    pairs = list(per.values())
    b = sum(1 for xa, xb in pairs if xa == 1 and xb == 0)
    c = sum(1 for xa, xb in pairs if xa == 0 and xb == 1)
    chi2 = (b - c) ** 2 / (b + c)
    chi2_cc = (abs(b - c) - 1) ** 2 / (b + c)
    row = dict(zip(dump_cols("stats_mcnemar"), dump("stats_mcnemar")[0]))
    if row["n_pairs"] != len(pairs):
        mis.append(("n_pairs", row["n_pairs"], len(pairs)))
    if row["n10"] != b or row["n01"] != c:
        mis.append(("discordant", (row["n10"], row["n01"]), (b, c)))
    if not close(row["chi2"], chi2, 1e-6):
        mis.append(("chi2", row["chi2"], chi2))
    if not close(row["chi2_cc"], chi2_cc, 1e-6):
        mis.append(("chi2_cc", row["chi2_cc"], chi2_cc))
    report("stats_mcnemar", mis, 4)


def audit_cochran_q():
    """Cochran's Q recomputed from the raw user-week x type participation
    grid: Q = (k-1)(k*sum(C_j^2) - N^2) / (k*N - sum(R_i^2)) with exact
    Fractions."""
    mis = []
    r_ = rows(f"SELECT DISTINCT user_id, date_trunc('week', ts), "
              f"event_type FROM '{SF}/events.parquet'")
    users = sorted({(u, w) for u, w, _ in r_})
    types = sorted({t for _, _, t in r_})
    k = len(types)
    hit = {((u, w), t) for u, w, t in r_}
    colt = {t: sum(1 for b in users if (b, t) in hit) for t in types}
    rowt = {b: sum(1 for t in types if (b, t) in hit) for b in users}
    n_tot = sum(rowt.values())
    sc2 = sum(c * c for c in colt.values())
    sr2 = sum(r * r for r in rowt.values())
    q = Fraction((k - 1) * (k * sc2 - n_tot * n_tot), k * n_tot - sr2)
    row = dict(zip(dump_cols("stats_cochran_q"), dump("stats_cochran_q")[0]))
    if row["n_blocks"] != len(users):
        mis.append(("n_blocks", row["n_blocks"], len(users)))
    if row["k"] != k:
        mis.append(("k", row["k"], k))
    if row["sum_col_sq"] != sc2:
        mis.append(("sum_col_sq", row["sum_col_sq"], sc2))
    if not close(row["cochran_q"], float(q), 1e-6):
        mis.append(("q", row["cochran_q"], float(q)))
    report("stats_cochran_q", mis, 4)


def audit_roc_auc():
    """ROC AUC recomputed the slow textbook way: assign midranks to every
    scored row (sorting rows, not the engines' histogram identity), then
    AUC = (sum of positive midranks - n1(n1+1)/2) / (n1*n0)."""
    mis = []
    r_ = rows(f"SELECT CAST(floor(value * 100 + 0.5) AS BIGINT), "
              f"CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END "
              f"FROM '{SF}/events.parquet' "
              f"WHERE event_type IN ('purchase', 'view')")
    r_ = sorted(r_)
    ranks, i = {}, 0
    while i < len(r_):
        j = i
        while j < len(r_) and r_[j][0] == r_[i][0]:
            j += 1
        mid = (i + 1 + j) / 2  # midrank of the tie group [i+1 .. j]
        ranks[r_[i][0]] = mid
        i = j
    n1 = sum(y for _, y in r_)
    n0 = len(r_) - n1
    rsum = sum(ranks[v] for v, y in r_ if y == 1)
    auc = (rsum - n1 * (n1 + 1) / 2) / (n1 * n0)
    row = dict(zip(dump_cols("ml_roc_auc"), dump("ml_roc_auc")[0]))
    if row["n_pos"] != n1 or row["n_neg"] != n0:
        mis.append(("counts", (row["n_pos"], row["n_neg"]), (n1, n0)))
    if not close(row["auc"], auc, 1e-6):
        mis.append(("auc", row["auc"], auc))
    if not close(row["gini"], 2 * auc - 1, 1e-5):
        mis.append(("gini", row["gini"], 2 * auc - 1))
    report("ml_roc_auc", mis, 3)


def audit_ece():
    """Expected calibration error recomputed row-by-row: md5 split via
    hashlib, 25-dollar buckets, train rate as confidence, weighted
    absolute gap on the test half."""
    import hashlib
    mis = []
    r_ = rows(f"SELECT event_id, CAST(floor(value * 100 + 0.5) AS BIGINT), "
              f"CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END "
              f"FROM '{SF}/events.parquet' "
              f"WHERE event_type IN ('purchase', 'view')")
    tr, te = {}, {}
    for eid, v, y in r_:
        b = min(v // 2500, 15)
        side = tr if hashlib.md5(str(eid).encode()).hexdigest()[0] <= "7" \
            else te
        n1, n = side.get(b, (0, 0))
        side[b] = (n1 + y, n + 1)
    gaps = {b: abs(te[b][0] / te[b][1] - tr[b][0] / tr[b][1])
            for b in te if b in tr}
    n_test = sum(te[b][1] for b in gaps)
    ece = sum(te[b][1] * gaps[b] for b in gaps) / n_test
    row = dict(zip(dump_cols("ml_calibration_ece"),
                   dump("ml_calibration_ece")[0]))
    if row["n_buckets"] != len(gaps):
        mis.append(("n_buckets", row["n_buckets"], len(gaps)))
    if row["n_test"] != n_test:
        mis.append(("n_test", row["n_test"], n_test))
    if not close(row["ece"], ece, 1e-6):
        mis.append(("ece", row["ece"], ece))
    if not close(row["max_gap"], max(gaps.values()), 1e-6):
        mis.append(("max_gap", row["max_gap"], max(gaps.values())))
    report("ml_calibration_ece", mis, 4)


def audit_kfold_cv():
    """5-fold CV OLS recomputed per fold the direct way: train moments
    summed over the four OTHER folds (not global-minus-fold), exact
    Fraction coefficients, float residuals quantized to cents."""
    import math
    mis = []
    r_ = rows(f"SELECT CAST(l_quantity AS BIGINT), "
              f"CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT), "
              f"(l_orderkey + l_linenumber) % 5 "
              f"FROM '{SF}/lineitem.parquet'")
    got = {g[0]: g for g in dump("ml_kfold_cv")}
    for k in range(5):
        train = [(x, y) for x, y, f in r_ if f != k]
        test = [(x, y) for x, y, f in r_ if f == k]
        n = len(train)
        sx = sum(x for x, _ in train)
        sy = sum(y for _, y in train)
        sxx = sum(x * x for x, _ in train)
        sxy = sum(x * y for x, y in train)
        d = n * sxx - sx * sx
        b = Fraction(n * sxy - sx * sy, d)
        a = Fraction(sy * sxx - sx * sxy, d)
        sq = sum(math.floor(y - float(a) - float(b) * x + 0.5) ** 2
                 for x, y in test)
        rmse = math.sqrt(sq / len(test)) / 100
        fold, n_train, n_test, slope, intercept, grmse = got[k]
        if (n_train, n_test) != (n, len(test)):
            mis.append((k, "counts", (n_train, n_test), (n, len(test))))
        if not close(slope, float(b) / 100, 1e-5):
            mis.append((k, "slope", slope, float(b) / 100))
        if not close(intercept, float(a) / 100, 1e-5):
            mis.append((k, "intercept", intercept, float(a) / 100))
        if not close(grmse, rmse, 1e-5):
            mis.append((k, "rmse", grmse, rmse))
    report("ml_kfold_cv", mis, 20)


def audit_silhouette():
    """Simplified silhouette recomputed end to end in Python, INCLUDING
    the 3 quantized Lloyd rounds (seeds = 8 lowest ids, 1e-8-unit integer
    distances, 6-dp integer-mean centroids) — an independent replay of
    the whole kmeans chain plus the (b-a)/max(a,b) centroid silhouette."""
    import math
    mis = []
    r_ = rows(f"SELECT vec_id, CAST(embedding AS DOUBLE[]) "
              f"FROM '{SF}/embeddings.parquet' ORDER BY vec_id")
    vecs = dict(r_)
    ids = sorted(vecs)

    def d2(v, c):
        return sum(math.floor((e - m) * (e - m) * 1e8 + 0.5)
                   for e, m in zip(v, c))

    def mean_centroid(members):
        d = len(vecs[ids[0]])
        out = []
        for j in range(d):
            s = sum(math.floor(vecs[v][j] * 1e6 + 0.5) for v in members)
            out.append(math.floor(s / len(members) + 0.5) / 1e6)
        return out

    cents = {cid: list(vecs[cid]) for cid in ids[:8]}
    assign = {}
    for _ in range(3):
        assign = {v: min(cents, key=lambda c: (d2(vecs[v], cents[c]), c))
                  for v in ids}
        cents = {c: mean_centroid([v for v in ids if assign[v] == c])
                 for c in set(assign.values())}
    # silhouette against centroids recomputed FROM the final assignment
    per = {}
    for v in ids:
        own = assign[v]
        a = math.sqrt(d2(vecs[v], cents[own]))
        b = math.sqrt(min(d2(vecs[v], cents[c]) for c in cents if c != own))
        s6 = 0 if max(a, b) == 0 else \
            math.floor((b - a) / max(a, b) * 1e6 + 0.5)
        n, s = per.get(own, (0, 0))
        per[own] = (n + 1, s + s6)
    got = dump("emb_silhouette")
    if len(got) != len(per):
        mis.append(("n_clusters", len(got), len(per)))
    for cid, n, ms in got:
        en, es = per.get(cid, (0, 0))
        if n != en:
            mis.append((cid, "n", n, en))
        if not close(ms, math.floor(es / en + 0.5) / 1e6, 1e-6):
            mis.append((cid, "mean_sil", ms, es / en / 1e6))
    report("emb_silhouette", mis, len(got) * 2 + 1)


def audit_feature_vector():
    """ml_feature_vector recomputed from raw events in Python: per-user
    view/click/purchase counts, day-recency vs the 2024-01-30 anchor,
    integer-cent monetary — and the exact CSV rendering of the feature
    string (the r9 stringified output seam), including the two-decimal
    cents digits."""
    mis = []
    r_ = rows(f"SELECT user_id, event_type, "
              f"CAST(date_trunc('day', ts) AS DATE) AS day, value "
              f"FROM '{SF}/events.parquet'")
    import datetime
    anchor = datetime.date(2024, 1, 30)
    per = {}
    for uid, et, day, val in r_:
        st = per.setdefault(uid, {"view": 0, "click": 0, "purchase": 0,
                                  "maxday": None, "mon": 0})
        if et in st:
            st[et] += 1
        if st["maxday"] is None or day > st["maxday"]:
            st["maxday"] = day
        if et == "purchase":
            st["mon"] += math.floor(val * 100 + 0.5)
    got = dump("ml_feature_vector")
    if len(got) != len(per):
        mis.append(("n_users", len(got), len(per)))
    cols = dump_cols("ml_feature_vector")
    for row in got:
        d = dict(zip(cols, row))
        st = per.get(d["user_id"])
        if st is None:
            mis.append((d["user_id"], "unknown user"))
            continue
        rec = (anchor - st["maxday"]).days
        mon = st["mon"]
        sign = "-" if mon < 0 else ""
        csv = (f"{st['view']},{st['click']},{st['purchase']},{rec},"
               f"{sign}{abs(mon) // 100}.{abs(mon) % 100:02d}")
        if d["features"] != csv:
            mis.append((d["user_id"], "features", d["features"], csv))
        if d["n_purchase"] != st["purchase"]:
            mis.append((d["user_id"], "n_purchase", d["n_purchase"],
                        st["purchase"]))
        if d["recency_days"] != rec:
            mis.append((d["user_id"], "recency", d["recency_days"], rec))
        if not close(d["monetary"], mon / 100, 1e-9):
            mis.append((d["user_id"], "monetary", d["monetary"], mon / 100))
    report("ml_feature_vector", mis, len(got) * 4)


def audit_array_higher_order():
    """fn_array_higher_order recomputed from the nation-key definition:
    xs = [1 .. k%5+2], squares/evens/zipped as CSV strings, total and
    has_gt3 — verifying both the lambda semantics and the r9 stringified
    rendering (empty evens must be '')."""
    mis = []
    got = dump("fn_array_higher_order")
    cols = dump_cols("fn_array_higher_order")
    for row in got:
        d = dict(zip(cols, row))
        xs = list(range(1, d["k"] % 5 + 3))
        want = {
            "squares": ",".join(str(x * x) for x in xs),
            "evens": ",".join(str(x) for x in xs if x % 2 == 0),
            "total": sum(xs),
            "has_gt3": int(any(x > 3 for x in xs)),
            "zipped_sum": ",".join(str(a + b) for a, b in
                                   zip(xs, sorted(xs, reverse=True))),
        }
        for c, w in want.items():
            if d[c] != w:
                mis.append((d["k"], c, d[c], w))
    report("fn_array_higher_order", mis, len(got) * 5)


def audit_pr_f1():
    """Confusion matrix + precision/recall/F1/accuracy recomputed from raw
    events at each threshold."""
    mis = []
    r_ = rows(f"SELECT value, event_type FROM '{SF}/events.parquet' "
              f"WHERE event_type IN ('purchase', 'view')")
    data = [(math.floor(v * 100 + 0.5), 1 if et == "purchase" else 0)
            for v, et in r_]
    got = dump("ml_pr_f1")
    cols = dump_cols("ml_pr_f1")
    for row in got:
        d = dict(zip(cols, row))
        t = d["thr_cents"]
        tp = sum(1 for v, y in data if v >= t and y == 1)
        fp = sum(1 for v, y in data if v >= t and y == 0)
        fn = sum(1 for v, y in data if v < t and y == 1)
        tn = sum(1 for v, y in data if v < t and y == 0)
        for c, w in [("tp", tp), ("fp", fp), ("fn", fn), ("tn", tn)]:
            if d[c] != w:
                mis.append((t, c, d[c], w))
        checks = [
            ("prec", tp / (tp + fp) if tp + fp else 0.0),
            ("rec", tp / (tp + fn) if tp + fn else 0.0),
            ("f1", 2 * tp / (2 * tp + fp + fn) if 2 * tp + fp + fn else 0.0),
            ("acc", (tp + tn) / len(data)),
        ]
        for c, w in checks:
            if not close(d[c], w, 1e-5):
                mis.append((t, c, d[c], w))
    report("ml_pr_f1", mis, len(got) * 8)


def audit_partial_corr():
    """Pairwise and partial correlations recomputed with exact Fraction
    moments and the textbook first-order partial-correlation recursion."""
    mis = []
    r_ = rows(f"SELECT CAST(l_quantity AS BIGINT), l_extendedprice, "
              f"l_discount FROM '{SF}/lineitem.parquet'")
    xs = [(q, math.floor(p * 100 + 0.5), math.floor(dd * 100 + 0.5))
          for q, p, dd in r_]
    n = len(xs)

    def corr(i, j):
        si = sum(t[i] for t in xs)
        sj = sum(t[j] for t in xs)
        sii = sum(t[i] * t[i] for t in xs)
        sjj = sum(t[j] * t[j] for t in xs)
        sij = sum(t[i] * t[j] for t in xs)
        return (n * sij - si * sj) / math.sqrt(
            (n * sii - si * si) * (n * sjj - sj * sj))

    rxy, rxz, ryz = corr(0, 1), corr(0, 2), corr(1, 2)
    rpart = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    (got,) = dump("stats_partial_corr")
    d = dict(zip(dump_cols("stats_partial_corr"), got))
    for c, w in [("n", n), ("r_xy", rxy), ("r_xz", rxz), ("r_yz", ryz),
                 ("r_xy_given_z", rpart)]:
        ok = d[c] == w if c == "n" else close(d[c], w, 1e-5)
        if not ok:
            mis.append((c, d[c], w))
    report("stats_partial_corr", mis, 5)


def audit_grubbs():
    """Grubbs G = max|x − mean|/sd over daily revenue, population sd,
    recomputed from raw events."""
    mis = []
    r_ = rows(f"SELECT CAST(date_trunc('day', ts) AS DATE), "
              f"CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) "
              f"FROM '{SF}/events.parquet' GROUP BY 1")
    days = dict(r_)
    n = len(days)
    mean = sum(days.values()) / n
    sd = math.sqrt(sum((x - mean) ** 2 for x in days.values()) / n)
    day, x = max(days.items(), key=lambda kv: (abs(kv[1] - mean), kv[0]))
    # integer-argmax tiebreak replay: rank on |n·x − S| with day ASC
    s = sum(days.values())
    day = min((d for d, v in days.items()
               if abs(n * v - s) == max(abs(n * v - s) for v in days.values())))
    x = days[day]
    (got,) = dump("stats_grubbs")
    d = dict(zip(dump_cols("stats_grubbs"), got))
    if d["n_days"] != n:
        mis.append(("n_days", d["n_days"], n))
    if str(d["outlier_day"]) != str(day):
        mis.append(("outlier_day", d["outlier_day"], day))
    if d["outlier_cents"] != x:
        mis.append(("outlier_cents", d["outlier_cents"], x))
    if not close(d["grubbs_g"], abs(x - mean) / sd, 1e-5):
        mis.append(("grubbs_g", d["grubbs_g"], abs(x - mean) / sd))
    report("stats_grubbs", mis, 4)


def audit_logreg():
    """Independent plain-float Newton refit (NO fixed-point quantization,
    straight textbook IRLS over the raw rows) — agreement within the
    quantization budget proves the fixed-point pipeline computes the same
    logistic fit, not just the same bits twice."""
    mis = []
    r_ = rows(f"SELECT value, event_type FROM '{SF}/events.parquet' "
              f"WHERE event_type IN ('purchase', 'view')")
    data = [(math.floor(v * 100 + 0.5) / 10000.0,
             1 if et == "purchase" else 0) for v, et in r_]
    b0 = b1 = 0.0
    for _ in range(3):
        g0 = g1 = h00 = h01 = h11 = 0.0
        for x, y in data:
            p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x)))
            w = p * (1 - p)
            g0 += y - p
            g1 += x * (y - p)
            h00 += w
            h01 += w * x
            h11 += w * x * x
        det = h00 * h11 - h01 * h01
        b0 += (h11 * g0 - h01 * g1) / det
        b1 += (h00 * g1 - h01 * g0) / det
    acc = sum((1 if (b0 + b1 * x > 0) == (y == 1) else 0)
              for x, y in data) / len(data)
    (got,) = dump("ml_logreg_newton")
    d = dict(zip(dump_cols("ml_logreg_newton"), got))
    if d["n"] != len(data):
        mis.append(("n", d["n"], len(data)))
    # p4 sigmoid quantization (1e-4) perturbs each step's gradient by
    # ~0.5e-4 per row; 3 steps compound — budget 5e-3 absolute on the
    # coefficients (they are O(1e-2) here) and 1e-3 on accuracy
    for c, w, tol in [("b0", b0, 5e-3), ("b1", b1, 5e-3),
                      ("train_acc", acc, 1e-3)]:
        if abs(d[c] - w) > tol:
            mis.append((c, d[c], w))
    report("ml_logreg_newton", mis, 4)


def audit_adf():
    """ADF(1) re-fit with a plain-float least-squares solve of
    dx_t = b0 + g*x_{t-1} + phi*dx_{t-1} via the normal equations, and
    the textbook t-statistic for g."""
    mis = []
    r_ = rows(f"SELECT CAST(date_trunc('day', ts) AS DATE) AS day, "
              f"CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) // 100 "
              f"AS BIGINT) AS x FROM '{SF}/events.parquet' "
              f"GROUP BY 1 ORDER BY day")
    xs = [x for _, x in r_]
    obs = [(xs[t] - xs[t - 1], xs[t - 1], xs[t - 1] - xs[t - 2])
           for t in range(2, len(xs))]
    m = len(obs)
    ym = sum(o[0] for o in obs) / m
    um = sum(o[1] for o in obs) / m
    wm = sum(o[2] for o in obs) / m
    cuu = sum((u - um) ** 2 for _, u, _ in obs)
    cww = sum((w - wm) ** 2 for _, _, w in obs)
    cuw = sum((u - um) * (w - wm) for _, u, w in obs)
    cuy = sum((u - um) * (y - ym) for y, u, _ in obs)
    cwy = sum((w - wm) * (y - ym) for y, _, w in obs)
    det = cuu * cww - cuw * cuw
    g = (cuy * cww - cuw * cwy) / det
    phi = (cuu * cwy - cuw * cuy) / det
    b0 = ym - g * um - phi * wm
    rss = sum((y - b0 - g * u - phi * w) ** 2 for y, u, w in obs)
    s2 = rss / (m - 3)
    se_g = math.sqrt(s2 * cww / det)
    (got,) = dump("ts_adf")
    d = dict(zip(dump_cols("ts_adf"), got))
    if d["n_obs"] != m:
        mis.append(("n_obs", d["n_obs"], m))
    for c, w in [("gamma", g), ("phi", phi), ("adf_t", g / se_g)]:
        if not close(d[c], w, 1e-5):
            mis.append((c, d[c], w))
    report("ts_adf", mis, 4)


def audit_gmm():
    """Plain-float 2-component EM refit (same moment init, NO fixed-point
    quantization) — agreement within the quantization budget proves the
    fixed-point EM computes the same mixture, not just the same bits."""
    mis = []
    r_ = rows(f"SELECT floor(value * 100 + 0.5) AS v, COUNT(*) AS c "
              f"FROM '{SF}/events.parquet' "
              f"WHERE event_type IN ('purchase', 'view') GROUP BY 1")
    hist = [(v / 10000.0, c) for v, c in r_]
    n = sum(c for _, c in hist)
    mean = sum(c * x for x, c in hist) / n
    var = sum(c * (x - mean) ** 2 for x, c in hist) / n
    sd = math.sqrt(var)
    w1, mu1, mu2, v1, v2 = 0.5, mean - sd, mean + sd, var, var
    for _ in range(3):
        rr1 = rr2 = m1 = m2 = q1 = q2 = 0.0
        for x, c in hist:
            l1 = w1 * math.exp(-((x - mu1) ** 2) / (2 * v1)) / math.sqrt(v1)
            l2 = (1 - w1) * math.exp(-((x - mu2) ** 2) / (2 * v2)) / math.sqrt(v2)
            r = l1 / (l1 + l2) if l1 + l2 > 0 else 0.5
            rr1 += c * r
            rr2 += c * (1 - r)
            m1 += c * r * x
            m2 += c * (1 - r) * x
            q1 += c * r * x * x
            q2 += c * (1 - r) * x * x
        w1 = rr1 / n
        mu1, mu2 = m1 / rr1, m2 / rr2
        v1 = max(q1 / rr1 - mu1 * mu1, 1e-8)
        v2 = max(q2 / rr2 - mu2 * mu2, 1e-8)
    (got,) = dump("ml_gmm_em")
    d = dict(zip(dump_cols("ml_gmm_em"), got))
    if d["n"] != n:
        mis.append(("n", d["n"], n))
    # 1e-6 responsibility quantization compounds over 3 rounds — 1e-3
    # absolute budget on every parameter (they are O(0.1-1))
    for c, w in [("w1", w1), ("mu1", mu1), ("var1", v1),
                 ("mu2", mu2), ("var2", v2)]:
        if abs(d[c] - w) > 1e-3:
            mis.append((c, d[c], w))
    report("ml_gmm_em", mis, 6)


def audit_cooks():
    """Cook's distance recomputed from the hat-matrix definition (plain
    float OLS, leverage from (x−x̄)²/Sxx) for every day."""
    mis = []
    r_ = rows(f"SELECT CAST(date_trunc('day', ts) AS DATE) AS day, "
              f"CAST(date_diff('day', DATE '2024-01-01', "
              f"CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x, "
              f"CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) // 100 "
              f"AS BIGINT) AS y FROM '{SF}/events.parquet' GROUP BY 1, 2")
    pts = [(x, y) for _, x, y in r_]
    n = len(pts)
    xm = sum(x for x, _ in pts) / n
    ym = sum(y for _, y in pts) / n
    sxx = sum((x - xm) ** 2 for x, _ in pts)
    b1 = sum((x - xm) * (y - ym) for x, y in pts) / sxx
    b0 = ym - b1 * xm
    rss = sum((y - b0 - b1 * x) ** 2 for x, y in pts)
    s2 = rss / (n - 2)
    want = {}
    for x, y in pts:
        e = y - b0 - b1 * x
        h = 1 / n + (x - xm) ** 2 / sxx
        want[x] = (e, h, e * e * h / (2 * s2 * (1 - h) ** 2))
    got = dump("ml_cooks_distance")
    cols = dump_cols("ml_cooks_distance")
    for row in got:
        d = dict(zip(cols, row))
        e, h, cd = want[d["day_idx"]]
        for c, w, tol in [("residual", e, 1e-2), ("leverage", h, 1e-5),
                          ("cooks_d", cd, 1e-4)]:
            if not close(d[c], w, tol):
                mis.append((d["day_idx"], c, d[c], w))
    report("ml_cooks_distance", mis, len(got) * 3)


def audit_isotonic():
    """Isotonic fit recomputed with the SEQUENTIAL pool-adjacent-violators
    algorithm — a genuinely different algorithm from the query's minimax
    triple-join identity; agreement proves the identity was applied
    correctly."""
    mis = []
    r_ = rows(f"SELECT LEAST(GREATEST(CAST(floor(value * 100 + 0.5) "
              f"AS BIGINT), 0) // 2500, 15) AS b, "
              f"CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 "
              f"END) AS BIGINT) AS n1, CAST(COUNT(*) AS BIGINT) AS nt "
              f"FROM '{SF}/events.parquet' "
              f"WHERE event_type IN ('purchase', 'view') "
              f"GROUP BY 1 ORDER BY b")
    # sequential PAV: pools of (sum1, sumn); merge while out of order
    pools = []  # [b_list, s1, sn]
    for b, n1, nt in r_:
        pools.append(([b], n1, nt))
        while len(pools) > 1 and \
                pools[-2][1] * pools[-1][2] >= pools[-1][1] * pools[-2][2]:
            bl2, s12, sn2 = pools.pop()
            bl1, s11, sn1 = pools.pop()
            pools.append((bl1 + bl2, s11 + s12, sn1 + sn2))
    fit = {}
    for bl, s1, sn in pools:
        for b in bl:
            fit[b] = s1 / sn
    got = dump("ml_isotonic_calibration")
    cols = dump_cols("ml_isotonic_calibration")
    prev = -1.0
    for row in got:
        d = dict(zip(cols, row))
        if not close(d["iso_rate"], fit[d["bucket"]], 1e-5):
            mis.append((d["bucket"], d["iso_rate"], fit[d["bucket"]]))
        if d["iso_rate"] < prev - 1e-9:
            mis.append((d["bucket"], "monotonicity violated", d["iso_rate"]))
        prev = d["iso_rate"]
        if not close(d["raw_rate"], d["n1"] / d["nt"], 1e-5):
            mis.append((d["bucket"], "raw", d["raw_rate"], d["n1"] / d["nt"]))
    report("ml_isotonic_calibration", mis, len(got) * 3)


def audit_negbin():
    """Method-of-moments NB fit recomputed from per-user counts."""
    mis = []
    r_ = rows(f"SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) "
              f"FROM '{SF}/events.parquet' GROUP BY 1, 2")
    per = {}
    for et, _, c in r_:
        per.setdefault(et, []).append(c)
    got = dump("stats_negbin_fit")
    cols = dump_cols("stats_negbin_fit")
    for row in got:
        d = dict(zip(cols, row))
        cs = per[d["event_type"]]
        n = len(cs)
        mean = sum(cs) / n
        var = sum((c - mean) ** 2 for c in cs) / n
        if var > mean:
            r_nb, p_nb = mean * mean / (var - mean), mean / var
        else:
            r_nb, p_nb = 0.0, 1.0
        for c, w in [("n_users", n), ("mean_count", mean),
                     ("var_count", var), ("nb_r", r_nb), ("nb_p", p_nb)]:
            ok = d[c] == w if c == "n_users" else close(d[c], w, 1e-4)
            if not ok:
                mis.append((d["event_type"], c, d[c], w))
    report("stats_negbin_fit", mis, len(got) * 5)


def audit_lift():
    """Gains/lift recomputed from raw rows: sort by score desc, value-ranked
    decile = floor(rows_with_higher_score * 10 / n), capture and lift."""
    mis = []
    r_ = rows(f"SELECT floor(value * 100 + 0.5) AS v, "
              f"CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END "
              f"FROM '{SF}/events.parquet' "
              f"WHERE event_type IN ('purchase', 'view')")
    from collections import Counter
    nt = Counter()
    n1 = Counter()
    for v, y in r_:
        nt[v] += 1
        n1[v] += y
    n = sum(nt.values())
    tot1 = sum(n1.values())
    per = {}
    cumhi = 0
    for v in sorted(nt, reverse=True):
        d = cumhi * 10 // n
        a, b = per.get(d, (0, 0))
        per[d] = (a + nt[v], b + n1[v])
        cumhi += nt[v]
    got = dump("ml_lift_gains")
    cols = dump_cols("ml_lift_gains")
    cum = 0
    for row in sorted(got, key=lambda r: r[cols.index("decile")]):
        d = dict(zip(cols, row))
        wr, wp = per[d["decile"]]
        cum += wp
        if (d["n_rows"], d["n_pos"]) != (wr, wp):
            mis.append((d["decile"], "counts", (d["n_rows"], d["n_pos"]),
                        (wr, wp)))
        if not close(d["capture"], cum / tot1, 1e-5):
            mis.append((d["decile"], "capture", d["capture"], cum / tot1))
        if not close(d["lift"], (wp / wr) / (tot1 / n), 1e-4):
            mis.append((d["decile"], "lift", d["lift"], (wp / wr) / (tot1 / n)))
    report("ml_lift_gains", mis, len(got) * 4)


def audit_esd():
    """Generalized ESD replayed sequentially in float: remove the max
    studentized deviation 3 times, recomputing mean/sd each round."""
    mis = []
    r_ = rows(f"SELECT CAST(date_trunc('day', ts) AS DATE), "
              f"CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) "
              f"FROM '{SF}/events.parquet' GROUP BY 1")
    days = dict(r_)
    got = sorted(dump("events_anomaly_esd"))
    cols = dump_cols("events_anomaly_esd")
    for row in got:
        d = dict(zip(cols, row))
        n = len(days)
        mean = sum(days.values()) / n
        sd = math.sqrt(sum((x - mean) ** 2 for x in days.values()) / n)
        day = min(dd for dd, x in days.items()
                  if abs(x - mean) == max(abs(v - mean)
                                          for v in days.values()))
        if str(d["day"]) != str(day):
            mis.append((d["round"], "day", d["day"], day))
        if d["day_cents"] != days[day]:
            mis.append((d["round"], "cents", d["day_cents"], days[day]))
        if not close(d["esd_r"], abs(days[day] - mean) / sd, 1e-5):
            mis.append((d["round"], "r", d["esd_r"],
                        abs(days[day] - mean) / sd))
        del days[day]
    report("events_anomaly_esd", mis, len(got) * 3)


def audit_tree2():
    """Independent greedy depth-2 induction over raw rows: brute-force
    every (feature, threshold) candidate with plain-float weighted gini,
    tiebreak (gini, feature name, threshold), recurse once."""
    mis = []
    r_ = rows(f"SELECT CAST(floor(value * 100 + 0.5) AS BIGINT), "
              f"CAST(hour(ts) AS BIGINT), "
              f"CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END "
              f"FROM '{SF}/events.parquet' "
              f"WHERE event_type IN ('purchase', 'view')")
    data = [(v, h, y) for v, h, y in r_]

    def gini_term(a, b):
        n = a + b
        return n - (a * a + b * b) / n

    def best(rows_):
        t1 = sum(y for _, _, y in rows_)
        t0 = len(rows_) - t1
        cands = []
        for fi, fname in [(0, "v"), (1, "hr")]:
            for thr in sorted({r[fi] for r in rows_}):
                l1 = sum(y for r in rows_ for y in [r[2]] if r[fi] <= thr)
                ln = sum(1 for r in rows_ if r[fi] <= thr)
                l0 = ln - l1
                r1, r0 = t1 - l1, t0 - l0
                if ln == 0 or r1 + r0 == 0:
                    continue
                wg = (gini_term(l1, l0) + gini_term(r1, r0)) / (t1 + t0)
                cands.append((math.floor(wg * 1e8 + 0.5), fname, thr, wg))
        cands.sort()
        _, f, thr, wg = cands[0]
        return f, thr, wg, t1, t0

    got = {r[0]: r for r in dump("ml_tree_depth2")}
    cols = dump_cols("ml_tree_depth2")

    def check(name, rows_):
        f, thr, wg, t1, t0 = best(rows_)
        d = dict(zip(cols, got[name]))
        if (d["feat"], d["threshold"]) != (f, thr):
            mis.append((name, "split", (d["feat"], d["threshold"]), (f, thr)))
        if d["n"] != t1 + t0 or d["n_pos"] != t1:
            mis.append((name, "counts", (d["n"], d["n_pos"]), (t1 + t0, t1)))
        if not close(d["gini_split"], wg, 1e-5):
            mis.append((name, "gini", d["gini_split"], wg))
        return f, thr

    f, thr = check("root", data)
    fi = 0 if f == "v" else 1
    check("left", [r for r in data if r[fi] <= thr])
    check("right", [r for r in data if r[fi] > thr])
    report("ml_tree_depth2", mis, 9)


def audit_cox():
    """Plain-float Cox/Breslow Newton refit (no fixed-point seams) from
    the raw last-activity frame — agreement within the quantization
    budget proves the fixed-point pipeline fits the same hazard model."""
    mis = []
    r_ = rows(f"SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm, "
              f"max(date_diff('day', DATE '2024-01-01', "
              f"CAST(date_trunc('day', ts) AS DATE))) AS t "
              f"FROM '{SF}/events.parquet' GROUP BY 1, 2")
    users = [(arm, t) for _, arm, t in r_]
    max_day = max(t for _, t in users)
    days = sorted({t for _, t in users if t < max_day})
    b = 0.0
    for _ in range(3):
        eb = math.exp(b)
        u = i = 0.0
        for t in days:
            d0 = sum(1 for a, tt in users if tt == t and a == 0)
            d1 = sum(1 for a, tt in users if tt == t and a == 1)
            r0 = sum(1 for a, tt in users if tt >= t and a == 0)
            r1 = sum(1 for a, tt in users if tt >= t and a == 1)
            den = r0 + r1 * eb
            u += d1 - (d0 + d1) * (r1 * eb) / den
            i += (d0 + d1) * (r0 * r1 * eb) / (den * den)
        b += u / i
    (got,) = dump("ml_cox_ph")
    d = dict(zip(dump_cols("ml_cox_ph"), got))
    n_ev = sum(1 for _, t in users if t < max_day)
    if d["n_users"] != len(users):
        mis.append(("n_users", d["n_users"], len(users)))
    if d["events_arm0"] + d["events_arm1"] != n_ev:
        mis.append(("events", d["events_arm0"] + d["events_arm1"], n_ev))
    if abs(d["beta"] - b) > 1e-4:
        mis.append(("beta", d["beta"], b))
    if abs(d["hazard_ratio"] - math.exp(b)) > 1e-4:
        mis.append(("hr", d["hazard_ratio"], math.exp(b)))
    report("ml_cox_ph", mis, 4)


def audit_logrank():
    """Log-rank recomputed from the textbook O/E/V definition in plain
    floats over raw user survival rows."""
    mis = []
    r_ = rows(f"SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm, "
              f"max(date_diff('day', DATE '2024-01-01', "
              f"CAST(date_trunc('day', ts) AS DATE))) AS t "
              f"FROM '{SF}/events.parquet' GROUP BY 1, 2")
    users = [(arm, t) for _, arm, t in r_]
    max_day = max(t for _, t in users)
    o1 = e1 = v = 0.0
    for t in sorted({t for _, t in users if t < max_day}):
        d0 = sum(1 for a, tt in users if tt == t and a == 0)
        d1 = sum(1 for a, tt in users if tt == t and a == 1)
        r0 = sum(1 for a, tt in users if tt >= t and a == 0)
        r1 = sum(1 for a, tt in users if tt >= t and a == 1)
        d, r = d0 + d1, r0 + r1
        o1 += d1
        e1 += d * r1 / r
        v += d * r1 / r * (r0 / r) * (r - d) / max(r - 1, 1)
    chi2 = (o1 - e1) ** 2 / v
    (got,) = dump("events_logrank_test")
    d_ = dict(zip(dump_cols("events_logrank_test"), got))
    if d_["events_arm1"] != o1:
        mis.append(("o1", d_["events_arm1"], o1))
    if not close(d_["expected_arm1"], e1, 1e-5):
        mis.append(("e1", d_["expected_arm1"], e1))
    if not close(d_["logrank_chi2"], chi2, 1e-4):
        mis.append(("chi2", d_["logrank_chi2"], chi2))
    report("events_logrank_test", mis, 3)


def audit_rate_ratio():
    """Incidence-rate ratio and Wald z recomputed from raw counts."""
    mis = []
    r_ = rows(f"SELECT CAST(user_id % 2 AS BIGINT) AS arm, user_id, "
              f"COUNT(*) FROM '{SF}/events.parquet' GROUP BY 1, 2")
    n = {0: 0, 1: 0}
    c = {0: 0, 1: 0}
    for arm, _, cnt in r_:
        n[arm] += 1
        c[arm] += cnt
    rr = (c[1] / n[1]) / (c[0] / n[0])
    z = math.log(rr) / math.sqrt(1 / c[0] + 1 / c[1])
    (got,) = dump("stats_rate_ratio")
    d = dict(zip(dump_cols("stats_rate_ratio"), got))
    for k, w in [("n0", n[0]), ("n1", n[1]), ("c0", c[0]), ("c1", c[1])]:
        if d[k] != w:
            mis.append((k, d[k], w))
    for k, w in [("rate0", c[0] / n[0]), ("rate1", c[1] / n[1]),
                 ("rate_ratio", rr), ("log_rr", math.log(rr)),
                 ("wald_z", z)]:
        if not close(d[k], w, 1e-5):
            mis.append((k, d[k], w))
    report("stats_rate_ratio", mis, 9)


def audit_wilson():
    """Wilson score interval recomputed from the textbook closed form."""
    mis = []
    r_ = rows(f"SELECT CAST(user_id % 2 AS BIGINT) AS arm, user_id, "
              f"max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
              f"FROM '{SF}/events.parquet' GROUP BY 1, 2")
    n = {0: 0, 1: 0}
    x = {0: 0, 1: 0}
    for arm, _, conv in r_:
        n[arm] += 1
        x[arm] += conv
    got = dump("stats_wilson_ci")
    cols = dump_cols("stats_wilson_ci")
    z = 1.96
    for row in got:
        d = dict(zip(cols, row))
        a = d["arm"]
        p = x[a] / n[a]
        den = 1 + z * z / n[a]
        ctr = p + z * z / (2 * n[a])
        half = z * math.sqrt(p * (1 - p) / n[a] + z * z / (4 * n[a] ** 2))
        for c, w in [("n", n[a]), ("x", x[a])]:
            if d[c] != w:
                mis.append((a, c, d[c], w))
        for c, w in [("phat", p), ("wilson_lo", (ctr - half) / den),
                     ("wilson_hi", (ctr + half) / den)]:
            if not close(d[c], w, 1e-5):
                mis.append((a, c, d[c], w))
    report("stats_wilson_ci", mis, len(got) * 5)


def audit_diurnal():
    """Harmonic OLS refit in plain floats (unquantized sin/cos) — the
    1e-6 regressor quantization must not move the fit past 1e-4."""
    mis = []
    r_ = rows(f"SELECT CAST(hour(ts) AS BIGINT), CAST(COUNT(*) AS BIGINT) "
              f"FROM '{SF}/events.parquet' GROUP BY 1")
    pts = [(math.sin(2 * math.pi * h / 24), math.cos(2 * math.pi * h / 24), c)
           for h, c in r_]
    m = len(pts)
    um = sum(u for u, _, _ in pts) / m
    wm = sum(w for _, w, _ in pts) / m
    ym = sum(y for _, _, y in pts) / m
    cuu = sum((u - um) ** 2 for u, _, _ in pts)
    cww = sum((w - wm) ** 2 for _, w, _ in pts)
    cuw = sum((u - um) * (w - wm) for u, w, _ in pts)
    cuy = sum((u - um) * (y - ym) for u, _, y in pts)
    cwy = sum((w - wm) * (y - ym) for _, w, y in pts)
    det = cuu * cww - cuw * cuw
    b1 = (cuy * cww - cuw * cwy) / det
    b2 = (cuu * cwy - cuw * cuy) / det
    (got,) = dump("ts_diurnal_harmonic")
    d = dict(zip(dump_cols("ts_diurnal_harmonic"), got))
    for c, w, tol in [("n_hours", m, 0), ("mean_count", ym, 1e-5),
                      ("beta_sin", b1, 1e-3), ("beta_cos", b2, 1e-3),
                      ("amplitude", math.hypot(b1, b2), 1e-3),
                      ("phase", math.atan2(b2, b1), 1e-3)]:
        ok = d[c] == w if tol == 0 else abs(d[c] - w) <= tol
        if not ok:
            mis.append((c, d[c], w))
    report("ts_diurnal_harmonic", mis, 6)


def audit_ttr():
    """Type-token-ratio curve recomputed from raw documents."""
    mis = []
    r_ = rows(f"SELECT doc_id, string_split(lower(text), ' ') "
              f"FROM '{SF}/documents.parquet'")
    per = {}
    for _, tk in r_:
        if not tk:
            continue
        b = len(tk) // 50
        t6 = math.floor(len(set(tk)) / len(tk) * 1e6 + 0.5)
        nd, nt, s6 = per.get(b, (0, 0, 0))
        per[b] = (nd + 1, nt + len(tk), s6 + t6)
    got = dump("text_ttr_curve")
    cols = dump_cols("text_ttr_curve")
    for row in got:
        d = dict(zip(cols, row))
        nd, nt, s6 = per[d["len_bucket"]]
        if (d["n_docs"], d["n_tokens"]) != (nd, nt):
            mis.append((d["len_bucket"], "counts",
                        (d["n_docs"], d["n_tokens"]), (nd, nt)))
        if not close(d["avg_ttr"], s6 / nd / 1e6, 1e-5):
            mis.append((d["len_bucket"], "ttr", d["avg_ttr"], s6 / nd / 1e6))
    report("text_ttr_curve", mis, len(got) * 3)


def audit_cmh():
    """CMH chi-square and MH odds ratio recomputed from the textbook
    per-stratum O/E/V and pooled-odds definitions."""
    mis = []
    r_ = rows(f"SELECT CAST(((date_diff('day', DATE '2024-01-01', "
              f"CAST(date_trunc('day', ts) AS DATE)) % 7) + 7) % 7 AS BIGINT) "
              f"AS dow, CAST(user_id % 2 AS BIGINT) AS arm, "
              f"CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y, "
              f"COUNT(*) FROM '{SF}/events.parquet' "
              f"WHERE event_type IN ('purchase', 'view') GROUP BY 1, 2, 3")
    cells = {}
    for dow, arm, y, c in r_:
        cells[(dow, arm, y)] = c
    strata = sorted({k[0] for k in cells})
    sa = e = v = orn = ord_ = 0.0
    for k in strata:
        a = cells.get((k, 1, 1), 0)
        b = cells.get((k, 1, 0), 0)
        c = cells.get((k, 0, 1), 0)
        d = cells.get((k, 0, 0), 0)
        t = a + b + c + d
        sa += a
        e += (a + b) * (a + c) / t
        v += (a + b) * (c + d) * (a + c) * (b + d) / (t * t * (t - 1))
        orn += a * d / t
        ord_ += b * c / t
    chi2 = (sa - e) ** 2 / v
    (got,) = dump("events_cmh_test")
    dd = dict(zip(dump_cols("events_cmh_test"), got))
    if dd["n_strata"] != len(strata) or dd["sum_a"] != sa:
        mis.append(("counts", (dd["n_strata"], dd["sum_a"]),
                    (len(strata), sa)))
    for c_, w in [("expected_a", e), ("cmh_chi2", chi2),
                  ("or_mh", orn / ord_)]:
        if not close(dd[c_], w, 1e-4):
            mis.append((c_, dd[c_], w))
    report("events_cmh_test", mis, 5)


def audit_bp():
    """Breusch-Pagan LM recomputed with plain-float OLS + auxiliary R²."""
    mis = []
    r_ = rows(f"SELECT CAST(date_diff('day', DATE '2024-01-01', "
              f"CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x, "
              f"CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) // 100 "
              f"AS BIGINT) AS y FROM '{SF}/events.parquet' GROUP BY 1")
    pts = list(r_)
    n = len(pts)
    xm = sum(x for x, _ in pts) / n
    ym = sum(y for _, y in pts) / n
    sxx = sum((x - xm) ** 2 for x, _ in pts)
    b1 = sum((x - xm) * (y - ym) for x, y in pts) / sxx
    b0 = ym - b1 * xm
    e2 = [(x, (y - b0 - b1 * x) ** 2) for x, y in pts]
    em = sum(e for _, e in e2) / n
    see = sum((e - em) ** 2 for _, e in e2)
    sxe = sum((x - xm) * (e - em) for x, e in e2)
    r2 = sxe * sxe / (sxx * see)
    (got,) = dump("stats_breusch_pagan")
    d = dict(zip(dump_cols("stats_breusch_pagan"), got))
    if d["n_days"] != n:
        mis.append(("n_days", d["n_days"], n))
    if not close(d["r2_aux"], r2, 1e-4):
        mis.append(("r2_aux", d["r2_aux"], r2))
    if not close(d["bp_lm"], n * r2, 1e-3):
        mis.append(("bp_lm", d["bp_lm"], n * r2))
    report("stats_breusch_pagan", mis, 3)


def audit_budget_fill():
    """Greedy water-filling replayed sequentially over the dumped source
    frame: the taken column must equal the explicit loop, and the total
    taken must equal exactly half the corpus tokens (floor division)."""
    mis = []
    got = dump("llm_budget_fill")
    cols = dump_cols("llm_budget_fill")
    rows_ = [dict(zip(cols, r)) for r in got]
    # replay in the emitted (quality desc, source) order
    order = sorted(rows_, key=lambda d: (-d["quality"], d["source"]))
    budget = sum(d["tokens"] for d in rows_) // 2
    rem = budget
    for d in order:
        want = max(min(d["tokens"], rem), 0)
        if d["taken"] != want:
            mis.append((d["source"], "taken", d["taken"], want))
        rem -= min(d["tokens"], max(rem, 0)) if rem > 0 else 0
    total_taken = sum(d["taken"] for d in rows_)
    if total_taken != min(budget, sum(d["tokens"] for d in rows_)):
        mis.append(("total", total_taken, budget))
    report("llm_budget_fill", mis, len(got) + 1)


def audit_auc_pr():
    """Average precision recomputed from a plain sorted sweep over raw
    rows (ties grouped at one threshold, step-wise AP)."""
    mis = []
    r_ = rows(f"SELECT floor(value * 100 + 0.5) AS v, "
              f"CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END "
              f"FROM '{SF}/events.parquet' "
              f"WHERE event_type IN ('purchase', 'view')")
    from collections import Counter
    n1 = Counter()
    n0 = Counter()
    for v, y in r_:
        (n1 if y else n0)[v] += 1
    t1 = sum(n1.values())
    t0 = sum(n0.values())
    tp = fp = 0
    ap = 0.0
    for v in sorted(set(n1) | set(n0), reverse=True):
        tp += n1[v]
        fp += n0[v]
        if n1[v] > 0:
            ap += n1[v] / t1 * (tp / (tp + fp))
    (got,) = dump("ml_auc_pr")
    d = dict(zip(dump_cols("ml_auc_pr"), got))
    if (d["n_pos"], d["n_neg"]) != (t1, t0):
        mis.append(("counts", (d["n_pos"], d["n_neg"]), (t1, t0)))
    if not close(d["baseline_prec"], t1 / (t1 + t0), 1e-5):
        mis.append(("baseline", d["baseline_prec"], t1 / (t1 + t0)))
    if not close(d["auc_pr"], ap, 1e-5):
        mis.append(("auc_pr", d["auc_pr"], ap))
    report("ml_auc_pr", mis, 4)


def audit_cronbach():
    """Cronbach's alpha recomputed from per-user item vectors with plain
    population variances."""
    mis = []
    r_ = rows(f"SELECT user_id, event_type, COUNT(*) "
              f"FROM '{SF}/events.parquet' GROUP BY 1, 2")
    items = ["view", "click", "purchase", "signup", "error"]
    per = {}
    for uid, et, c in r_:
        per.setdefault(uid, dict.fromkeys(items, 0))
        if et in per[uid]:
            per[uid][et] = c
    mat = [[d[i] for i in items] for d in per.values()]
    n = len(mat)

    def var(xs):
        mu = sum(xs) / n
        return sum((x - mu) ** 2 for x in xs) / n

    item_vars = sum(var([row[j] for row in mat]) for j in range(5))
    tot_var = var([sum(row) for row in mat])
    alpha = 5 / 4 * (1 - item_vars / tot_var)
    (got,) = dump("stats_cronbach_alpha")
    d = dict(zip(dump_cols("stats_cronbach_alpha"), got))
    if d["n_users"] != n:
        mis.append(("n_users", d["n_users"], n))
    if not close(d["item_var_share"], item_vars / tot_var, 1e-5):
        mis.append(("share", d["item_var_share"], item_vars / tot_var))
    if not close(d["cronbach_alpha"], alpha, 1e-4):
        mis.append(("alpha", d["cronbach_alpha"], alpha))
    report("stats_cronbach_alpha", mis, 3)


def audit_bartlett():
    """Bartlett's variance-homogeneity test recomputed with plain sample
    variances and math.log."""
    mis = []
    r_ = rows(f"SELECT event_type, floor(value * 100 + 0.5) "
              f"FROM '{SF}/events.parquet'")
    groups = {}
    for et, v in r_:
        groups.setdefault(et, []).append(v)
    k = len(groups)
    nt = sum(len(g) for g in groups.values())
    s2 = {}
    for et, g in groups.items():
        mu = sum(g) / len(g)
        s2[et] = sum((x - mu) ** 2 for x in g) / (len(g) - 1)
    sp2 = sum((len(g) - 1) * s2[et] for et, g in groups.items()) / (nt - k)
    t = (nt - k) * math.log(sp2) - sum(
        (len(g) - 1) * math.log(s2[et]) for et, g in groups.items())
    c = 1 + (sum(1 / (len(g) - 1) for g in groups.values())
             - 1 / (nt - k)) / (3 * (k - 1))
    (got,) = dump("stats_bartlett")
    d = dict(zip(dump_cols("stats_bartlett"), got))
    if (d["n_total"], d["k_groups"]) != (nt, k):
        mis.append(("counts", (d["n_total"], d["k_groups"]), (nt, k)))
    if not close(d["corr_c"], c, 1e-6):
        mis.append(("corr_c", d["corr_c"], c))
    if not close(d["chi2_bartlett"], t / c, 1e-4):
        mis.append(("chi2", d["chi2_bartlett"], t / c))
    report("stats_bartlett", mis, 4)


def audit_theil_u():
    """Theil's U recomputed from plain joint/marginal entropies."""
    mis = []
    r_ = rows(
        "SELECT event_type, ((date_diff('day', DATE '2024-01-01', "
        "CAST(date_trunc('day', ts) AS DATE)) % 7) + 7) % 7, COUNT(*) "
        f"FROM '{SF}/events.parquet' GROUP BY 1, 2")
    n = sum(c for _, _, c in r_)

    def ent(counts):
        return -sum(c / n * math.log(c / n) for c in counts if c > 0)

    from collections import Counter
    cx = Counter()
    cy = Counter()
    for x, y, c in r_:
        cx[x] += c
        cy[y] += c
    hx = ent(cx.values())
    hy = ent(cy.values())
    hxy = ent([c for _, _, c in r_])
    mi = hx + hy - hxy
    (got,) = dump("stats_theil_u")
    d = dict(zip(dump_cols("stats_theil_u"), got))
    if d["n_events"] != n:
        mis.append(("n", d["n_events"], n))
    if not close(d["mi_nats"], mi, 1e-4):
        mis.append(("mi", d["mi_nats"], mi))
    if not close(d["u_x_given_y"], mi / hx, 1e-4):
        mis.append(("u_xy", d["u_x_given_y"], mi / hx))
    if not close(d["u_y_given_x"], mi / hy, 1e-4):
        mis.append(("u_yx", d["u_y_given_x"], mi / hy))
    report("stats_theil_u", mis, 4)


def audit_cohen_kappa():
    """Cohen's kappa recomputed from the raw 2x2 agreement table."""
    mis = []
    r_ = rows(f"SELECT n_chars > 500, "
              f"len(string_split(text, ' ')) > 80 "
              f"FROM '{SF}/documents.parquet'")
    n11 = sum(1 for a, b in r_ if a and b)
    n10 = sum(1 for a, b in r_ if a and not b)
    n01 = sum(1 for a, b in r_ if not a and b)
    n00 = sum(1 for a, b in r_ if not a and not b)
    n = len(r_)
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / n / n
    kappa = (po - pe) / (1 - pe)
    (got,) = dump("ml_cohen_kappa")
    d = dict(zip(dump_cols("ml_cohen_kappa"), got))
    if (d["n11"], d["n10"], d["n01"], d["n00"]) != (n11, n10, n01, n00):
        mis.append(("cells", (d["n11"], d["n10"], d["n01"], d["n00"]),
                    (n11, n10, n01, n00)))
    if not close(d["p_obs"], po, 1e-5):
        mis.append(("p_obs", d["p_obs"], po))
    if not close(d["p_exp"], pe, 1e-5):
        mis.append(("p_exp", d["p_exp"], pe))
    if not close(d["kappa"], kappa, 1e-4):
        mis.append(("kappa", d["kappa"], kappa))
    report("ml_cohen_kappa", mis, 4)


def audit_kpss():
    """KPSS eta recomputed from plain partial sums and Bartlett-weighted
    long-run variance (L=4), floats throughout."""
    mis = []
    r_ = rows("SELECT CAST(date_trunc('day', ts) AS DATE) AS day, "
              "SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) "
              f"FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1")
    xs = [x for _, x in r_]
    n = len(xs)
    mu = sum(xs) / n
    e = [x - mu for x in xs]
    s = []
    acc = 0.0
    for v in e:
        acc += v
        s.append(acc)
    num = sum(v * v for v in s) / n / n
    lrv = sum(v * v for v in e) / n
    for lag in range(1, 5):
        w = 1 - lag / 5
        lrv += 2 * w * sum(e[t] * e[t - lag] for t in range(lag, n)) / n
    eta = num / lrv
    (got,) = dump("ts_kpss")
    d = dict(zip(dump_cols("ts_kpss"), got))
    if d["n_days"] != n:
        mis.append(("n_days", d["n_days"], n))
    if not close(d["kpss_stat"], eta, 1e-4):
        mis.append(("eta", d["kpss_stat"], eta))
    report("ts_kpss", mis, 2)


def audit_perm_entropy():
    """Permutation entropy (m=3) recomputed with argsort rank patterns
    (stable ties) and plain Shannon entropy."""
    mis = []
    r_ = rows("SELECT CAST(date_trunc('day', ts) AS DATE) AS day, "
              "SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) "
              f"FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1")
    xs = [x for _, x in r_]
    from collections import Counter
    pats = Counter()
    for i in range(len(xs) - 2):
        w = xs[i:i + 3]
        # stable argsort: order of indices when sorted by (value, index)
        order = tuple(sorted(range(3), key=lambda j: (w[j], j)))
        pats[order] += 1
    n = sum(pats.values())
    h = -sum(c / n * math.log(c / n) for c in pats.values())
    (got,) = dump("ts_permutation_entropy")
    d = dict(zip(dump_cols("ts_permutation_entropy"), got))
    if d["n_triples"] != n:
        mis.append(("n_triples", d["n_triples"], n))
    if d["n_patterns"] != len(pats):
        mis.append(("n_patterns", d["n_patterns"], len(pats)))
    if not close(d["h_perm"], h, 1e-4):
        mis.append(("h", d["h_perm"], h))
    if not close(d["pe_norm"], h / math.log(6), 1e-4):
        mis.append(("pe_norm", d["pe_norm"], h / math.log(6)))
    report("ts_permutation_entropy", mis, 4)


def audit_yule_k():
    """Yule's K and Simpson's D recomputed from plain token counts."""
    mis = []
    r_ = rows("SELECT source, unnest(string_split(lower(text), ' ')) AS t "
              f"FROM '{SF}/documents.parquet'")
    from collections import Counter
    per = {}
    for src, t in r_:
        per.setdefault(src, Counter())[t] += 1
    got = {r[0]: r for r in dump("text_yule_k")}
    cols = dump_cols("text_yule_k")
    for src, cnt in sorted(per.items()):
        n = sum(cnt.values())
        m2 = sum(c * c for c in cnt.values())
        k = 1e4 * (m2 - n) / n / n
        sd = (m2 - n) / n / (n - 1)
        d = dict(zip(cols, got[src]))
        if d["n_tokens"] != n or d["vocab"] != len(cnt):
            mis.append((src, (d["n_tokens"], d["vocab"]), (n, len(cnt))))
        if not close(d["yule_k"], k, 1e-4):
            mis.append((src + ":k", d["yule_k"], k))
        if not close(d["simpson_d"], sd, 1e-4):
            mis.append((src + ":d", d["simpson_d"], sd))
    report("text_yule_k", mis, 3 * len(per))


def audit_ridge():
    """Ridge regression recomputed with a plain-float 3x3 Gaussian solve
    of (X'X + lambda*diag(1,1,0)) beta = X'y, lambda=1000."""
    mis = []
    r_ = rows(
        "SELECT SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END), "
        "COUNT(DISTINCT user_id), "
        "SUM(CASE WHEN event_type='purchase' "
        "THEN CAST(floor(value*100+0.5) AS BIGINT) ELSE 0 END) "
        f"FROM '{SF}/events.parquet' "
        "GROUP BY CAST(date_trunc('day', ts) AS DATE)")

    def solve3(mat, vec):
        m = [row[:] + [v] for row, v in zip(mat, vec)]
        for col_ in range(3):
            piv = max(range(col_, 3), key=lambda r: abs(m[r][col_]))
            m[col_], m[piv] = m[piv], m[col_]
            for r2 in range(3):
                if r2 != col_:
                    f = m[r2][col_] / m[col_][col_]
                    m[r2] = [a - f * b for a, b in zip(m[r2], m[col_])]
        return [m[i][3] / m[i][i] for i in range(3)]

    n = len(r_)
    s1 = sum(x1 for x1, _, _ in r_)
    s2 = sum(x2 for _, x2, _ in r_)
    sy = sum(y for _, _, y in r_)
    s11 = sum(x1 * x1 for x1, _, _ in r_)
    s12 = sum(x1 * x2 for x1, x2, _ in r_)
    s22 = sum(x2 * x2 for _, x2, _ in r_)
    s1y = sum(x1 * y for x1, _, y in r_)
    s2y = sum(x2 * y for _, x2, y in r_)
    lam = 1000.0
    ar, br, cr = solve3([[s11 + lam, s12, s1], [s12, s22 + lam, s2],
                         [s1, s2, n]], [s1y, s2y, sy])
    ao, bo, _ = solve3([[s11, s12, s1], [s12, s22, s2], [s1, s2, n]],
                       [s1y, s2y, sy])
    shrink = math.sqrt((ar * ar + br * br) / (ao * ao + bo * bo))
    (got,) = dump("ml_ridge_regression")
    d = dict(zip(dump_cols("ml_ridge_regression"), got))
    if d["n_days"] != n:
        mis.append(("n_days", d["n_days"], n))
    if not close(d["coef_clicks"], ar, 1e-4):
        mis.append(("coef_clicks", d["coef_clicks"], ar))
    if not close(d["coef_users"], br, 1e-4):
        mis.append(("coef_users", d["coef_users"], br))
    if not close(d["intercept"], cr, 1e-3):
        mis.append(("intercept", d["intercept"], cr))
    if not close(d["shrink_ratio"], shrink, 1e-4):
        mis.append(("shrink", d["shrink_ratio"], shrink))
    report("ml_ridge_regression", mis, 5)


def audit_haar():
    """Haar energies recomputed by plain recursive pairwise folding."""
    mis = []
    r_ = rows("SELECT CAST(date_trunc('day', ts) AS DATE) AS day, "
              "SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) "
              f"FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1")
    xs = [x for _, x in r_]
    want = []
    cur = xs
    for lvl in (1, 2, 3):
        nxt = []
        es = 0
        for p in range(len(cur) // 2):
            a, b = cur[2 * p], cur[2 * p + 1]
            es += (a - b) ** 2
            nxt.append(a + b)
        want.append((lvl, len(cur) // 2, es / 2 ** lvl))
        cur = nxt
    te = sum(e for _, _, e in want)
    got = {r[0]: r for r in dump("ts_haar_energy")}
    cols = dump_cols("ts_haar_energy")
    for lvl, np_, e in want:
        d = dict(zip(cols, got[lvl]))
        if d["n_pairs"] != np_:
            mis.append((f"l{lvl}:n_pairs", d["n_pairs"], np_))
        if not close(d["energy_usd2"], e / 1e4, 1e-4):
            mis.append((f"l{lvl}:energy", d["energy_usd2"], e / 1e4))
        if not close(d["share"], e / te, 1e-5):
            mis.append((f"l{lvl}:share", d["share"], e / te))
    report("ts_haar_energy", mis, 9)


def audit_fisher():
    """Fisher's exact test recomputed with math.lgamma hypergeometric
    probabilities and the textbook two-sided rule."""
    mis = []
    r_ = rows(f"SELECT lang = 'en', n_chars > 500 "
              f"FROM '{SF}/documents.parquet'")
    a = sum(1 for x, y in r_ if x and y)
    b = sum(1 for x, y in r_ if x and not y)
    c = sum(1 for x, y in r_ if not x and y)
    d0 = sum(1 for x, y in r_ if not x and not y)
    r1, r0, c1, c0 = a + b, c + d0, a + c, b + d0
    n = len(r_)

    def lnp(k):
        lg = math.lgamma
        return (lg(r1 + 1) + lg(r0 + 1) + lg(c1 + 1) + lg(c0 + 1)
                - lg(n + 1) - lg(k + 1) - lg(r1 - k + 1) - lg(c1 - k + 1)
                - lg(r0 - c1 + k + 1))

    lo, hi = max(0, c1 - r0), min(r1, c1)
    ps = {k: math.exp(lnp(k)) for k in range(lo, hi + 1)}
    p_obs = ps[a]
    p_two = sum(p for p in ps.values() if p <= p_obs * (1 + 1e-9))
    p_gt = sum(p for k, p in ps.items() if k >= a)
    (got,) = dump("stats_fisher_exact")
    d = dict(zip(dump_cols("stats_fisher_exact"), got))
    if (d["a"], d["b"], d["c"], d["d"]) != (a, b, c, d0):
        mis.append(("cells", (d["a"], d["b"], d["c"], d["d"]),
                    (a, b, c, d0)))
    if not close(d["p_obs"], p_obs, 1e-4):
        mis.append(("p_obs", d["p_obs"], p_obs))
    if not close(d["p_two_sided"], p_two, 1e-4):
        mis.append(("p_two", d["p_two_sided"], p_two))
    if not close(d["p_greater"], p_gt, 1e-4):
        mis.append(("p_gt", d["p_greater"], p_gt))
    orr = a * d0 / (b * c) if b * c else None
    if orr is not None and not close(d["odds_ratio"], orr, 1e-4):
        mis.append(("or", d["odds_ratio"], orr))
    report("stats_fisher_exact", mis, 5)


def audit_bradley_terry():
    """Bradley-Terry strengths recomputed with brute-force pairwise win
    counting over doc pairs and plain-float MM iterations."""
    mis = []
    r_ = rows(f"SELECT lang, source, n_chars "
              f"FROM '{SF}/documents.parquet'")
    from collections import defaultdict
    by_lang = defaultdict(list)
    for lang, src, v in r_:
        by_lang[lang].append((src, v))
    wins = defaultdict(int)
    for docs_ in by_lang.values():
        for si, vi in docs_:
            for sj, vj in docs_:
                if si != sj and vi > vj:
                    wins[(si, sj)] += 1
    srcs = sorted({src for _, src, _ in r_})
    nij = {(i, j): wins.get((i, j), 0) + wins.get((j, i), 0)
           for i in srcs for j in srcs if i != j}
    wi = {i: sum(w for (a_, _), w in wins.items() if a_ == i) for i in srcs}
    p = {i: 1 / len(srcs) for i in srcs}
    for _ in range(3):
        newp = {}
        for i in srcs:
            den = sum(nij[(i, j)] / (p[i] + p[j])
                      for j in srcs if j != i and nij[(i, j)] > 0)
            newp[i] = wi[i] / den if den else 0.0
        tot = sum(newp.values())
        p = {i: v / tot for i, v in newp.items()}
    got = {r[0]: r for r in dump("llm_bradley_terry")}
    cols = dump_cols("llm_bradley_terry")
    for i in srcs:
        d = dict(zip(cols, got[i]))
        games = sum(nij[(i, j)] for j in srcs if j != i)
        if d["games"] != games or d["wins"] != wi[i]:
            mis.append((i, (d["games"], d["wins"]), (games, wi[i])))
        if not close(d["strength"], p[i], 1e-4):
            mis.append((i + ":strength", d["strength"], p[i]))
    report("llm_bradley_terry", mis, 2 * len(srcs))


def audit_gamma_fit():
    """Gamma method-of-moments recomputed with plain population moments."""
    mis = []
    r_ = rows(f"SELECT floor(value * 100 + 0.5) FROM '{SF}/events.parquet' "
              "WHERE event_type = 'purchase' AND floor(value * 100 + 0.5) > 0")
    vs = [v for (v,) in r_]
    n = len(vs)
    mu = sum(vs) / n
    var = sum((v - mu) ** 2 for v in vs) / n
    (got,) = dump("stats_gamma_fit")
    d = dict(zip(dump_cols("stats_gamma_fit"), got))
    if d["n"] != n:
        mis.append(("n", d["n"], n))
    if not close(d["mean_usd"], mu / 100, 1e-4):
        mis.append(("mean", d["mean_usd"], mu / 100))
    if not close(d["var_usd2"], var / 1e4, 1e-4):
        mis.append(("var", d["var_usd2"], var / 1e4))
    if not close(d["shape"], mu * mu / var, 1e-4):
        mis.append(("shape", d["shape"], mu * mu / var))
    if not close(d["scale_usd"], var / mu / 100, 1e-4):
        mis.append(("scale", d["scale_usd"], var / mu / 100))
    report("stats_gamma_fit", mis, 5)


def audit_burstiness():
    """Burstiness and Fano factor recomputed from plain token counts."""
    mis = []
    r_ = rows(f"SELECT source, len(string_split(text, ' ')) "
              f"FROM '{SF}/documents.parquet'")
    from collections import defaultdict
    per = defaultdict(list)
    for src, m in r_:
        per[src].append(m)
    got = {r[0]: r for r in dump("text_burstiness")}
    cols = dump_cols("text_burstiness")
    for src, ms in sorted(per.items()):
        n = len(ms)
        mu = sum(ms) / n
        var = sum((m - mu) ** 2 for m in ms) / n
        sd = math.sqrt(var)
        d = dict(zip(cols, got[src]))
        if not close(d["mean_tokens"], mu, 1e-3):
            mis.append((src + ":mean", d["mean_tokens"], mu))
        if not close(d["burstiness"], (sd - mu) / (sd + mu), 1e-4):
            mis.append((src + ":b", d["burstiness"], (sd - mu) / (sd + mu)))
        if not close(d["fano"], var / mu, 1e-3):
            mis.append((src + ":f", d["fano"], var / mu))
    report("text_burstiness", mis, 3 * len(per))


def audit_croston():
    """Croston z/p EWMAs and the SBC quadrant replayed sequentially in
    plain Python floats."""
    mis = []
    spine = rows(f"SELECT date_trunc('hour', ts) FROM '{SF}/events.parquet' "
                 "GROUP BY 1 ORDER BY 1")
    dem = dict(rows(
        "SELECT date_trunc('hour', ts), "
        "SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) "
        f"FROM '{SF}/events.parquet' "
        "WHERE event_type = 'purchase' AND value > 90 GROUP BY 1"))
    qs = [dem.get(h, 0) for (h,) in spine]
    nz = [(i + 1, q) for i, q in enumerate(qs) if q > 0]
    z = p = prev = None
    for rn, q in nz:
        if z is None:
            z, p, prev = float(q), float(rn), rn
        else:
            z = 0.2 * q + 0.8 * z
            p = 0.2 * (rn - prev) + 0.8 * p
            prev = rn
    n_periods, n_demand = len(qs), len(nz)
    mu = sum(q for _, q in nz) / n_demand
    var = sum((q - mu) ** 2 for _, q in nz) / n_demand
    adi = n_periods / n_demand
    cv2 = var / mu / mu
    sbc = ("smooth" if adi < 1.32 and cv2 < 0.49 else
           "intermittent" if cv2 < 0.49 else
           "erratic" if adi < 1.32 else "lumpy")
    (got,) = dump("ts_croston")
    d = dict(zip(dump_cols("ts_croston"), got))
    if (d["n_periods"], d["n_demand"]) != (n_periods, n_demand):
        mis.append(("counts", (d["n_periods"], d["n_demand"]),
                    (n_periods, n_demand)))
    if not close(d["adi"], adi, 1e-4):
        mis.append(("adi", d["adi"], adi))
    if not close(d["cv2"], cv2, 1e-4):
        mis.append(("cv2", d["cv2"], cv2))
    if not close(d["croston_forecast_usd"], z / p / 100, 1e-4):
        mis.append(("forecast", d["croston_forecast_usd"], z / p / 100))
    if d["sbc_class"] != sbc:
        mis.append(("sbc", d["sbc_class"], sbc))
    report("ts_croston", mis, 5)


def audit_rank_fusion():
    """RRF fusion recomputed with brute-force float scoring and sorts."""
    mis = []
    r_ = rows(f"SELECT vec_id, CAST(embedding AS DOUBLE[]) "
              f"FROM '{SF}/embeddings.parquet'")
    vecs = dict(r_)
    out = {}
    for pid in [v for v in vecs if v < 5]:
        pe = vecs[pid]
        scored = []
        for vid, ce in vecs.items():
            if vid == pid:
                continue
            dot = round(sum(x * y for x, y in zip(pe, ce)), 4)
            cos = round(sum(x * y for x, y in zip(pe, ce))
                        / (math.sqrt(sum(x * x for x in pe))
                           * math.sqrt(sum(x * x for x in ce))), 4)
            scored.append((vid, cos, dot))
        ra = {v: i + 1 for i, (v, _, _) in enumerate(
            sorted(scored, key=lambda t: (-t[1], t[0])))}
        rb = {v: i + 1 for i, (v, _, _) in enumerate(
            sorted(scored, key=lambda t: (-t[2], t[0])))}
        rrf = {v: 1 / (60 + ra[v]) + 1 / (60 + rb[v]) for v, _, _ in scored}
        top = sorted(rrf, key=lambda v: (-rrf[v], v))[:10]
        out[pid] = [(v, ra[v], rb[v], rrf[v]) for v in top]
    cols = dump_cols("sim_rank_fusion")
    for row in dump("sim_rank_fusion"):
        d = dict(zip(cols, row))
        v, ra_, rb_, rrf_ = out[d["probe_id"]][d["rn"] - 1]
        if (d["vec_id"], d["rank_cos"], d["rank_dot"]) != (v, ra_, rb_):
            mis.append((f"{d['probe_id']}#{d['rn']}",
                        (d["vec_id"], d["rank_cos"], d["rank_dot"]),
                        (v, ra_, rb_)))
        if not close(d["rrf"], rrf_, 1e-6):
            mis.append((f"{d['probe_id']}#{d['rn']}:rrf", d["rrf"], rrf_))
    report("sim_rank_fusion", mis, 100)


def audit_anderson_darling():
    """A-D statistic recomputed with math.erf's exact normal CDF — also
    validates the query's Abramowitz-Stegun polynomial end to end."""
    mis = []
    r_ = rows("SELECT CAST(date_trunc('day', ts) AS DATE) AS day, "
              "SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) "
              f"FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1")
    xs = sorted(x for _, x in r_)
    n = len(xs)
    mu = sum(xs) / n
    sd = math.sqrt(sum((x - mu) ** 2 for x in xs) / (n - 1))

    def cdf(z):
        return 0.5 * (1 + math.erf(z / math.sqrt(2)))

    a2 = -n - sum(
        (2 * (i + 1) - 1) * (math.log(cdf((xs[i] - mu) / sd))
                             + math.log(1 - cdf((xs[n - 1 - i] - mu) / sd)))
        for i in range(n)) / n
    a2s = a2 * (1 + 0.75 / n + 2.25 / n / n)
    (got,) = dump("stats_anderson_darling")
    d = dict(zip(dump_cols("stats_anderson_darling"), got))
    if d["n_days"] != n:
        mis.append(("n", d["n_days"], n))
    if not close(d["a2"], a2, 1e-3):
        mis.append(("a2", d["a2"], a2))
    if not close(d["a2_star"], a2s, 1e-3):
        mis.append(("a2_star", d["a2_star"], a2s))
    report("stats_anderson_darling", mis, 3)


def audit_bass():
    """Bass p/q/m recomputed with a float 3x3 solve and the quadratic
    root formula."""
    mis = []
    r_ = rows("SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) "
              f"FROM '{SF}/events.parquet' WHERE event_type = 'signup' "
              "GROUP BY 1 ORDER BY 1")
    ns = [c for _, c in r_]
    cum = [sum(ns[:i]) for i in range(len(ns))]
    n = len(ns)
    s1 = sum(cum)
    s2 = sum(c * c for c in cum)
    s3 = sum(c ** 3 for c in cum)
    s4 = sum(c ** 4 for c in cum)
    sy = sum(ns)
    s1y = sum(c * y for c, y in zip(cum, ns))
    s2y = sum(c * c * y for c, y in zip(cum, ns))
    # solve [[s2,s3,s1],[s3,s4,s2],[s1,s2,n]] [b,c,a]' = [s1y,s2y,sy]'
    mat = [[s2, s3, s1], [s3, s4, s2], [s1, s2, n]]
    vec = [s1y, s2y, sy]
    m_ = [row[:] + [v] for row, v in zip(mat, vec)]
    for col_ in range(3):
        piv = max(range(col_, 3), key=lambda r2: abs(m_[r2][col_]))
        m_[col_], m_[piv] = m_[piv], m_[col_]
        for r2 in range(3):
            if r2 != col_:
                f = m_[r2][col_] / m_[col_][col_]
                m_[r2] = [u - f * w for u, w in zip(m_[r2], m_[col_])]
    b, cc, a = [m_[i][3] / m_[i][i] for i in range(3)]
    (got,) = dump("events_bass_diffusion")
    d = dict(zip(dump_cols("events_bass_diffusion"), got))
    if not close(d["coef_a"], a, 1e-3):
        mis.append(("a", d["coef_a"], a))
    if not close(d["coef_b"], b, 1e-3):
        mis.append(("b", d["coef_b"], b))
    if not close(d["coef_c"], cc, 1e-3):
        mis.append(("c", d["coef_c"], cc))
    if cc < 0 and b * b - 4 * a * cc >= 0:
        mm = (-b - math.sqrt(b * b - 4 * a * cc)) / (2 * cc)
        p, q = a / mm, -cc * mm
        if not close(d["market_m"], mm, 1e-3):
            mis.append(("m", d["market_m"], mm))
        if not close(d["p_innov"], p, 1e-3):
            mis.append(("p", d["p_innov"], p))
        if not close(d["q_imit"], q, 1e-3):
            mis.append(("q", d["q_imit"], q))
        if not close(d["peak_t"], math.log(q / p) / (p + q), 1e-3):
            mis.append(("peak", d["peak_t"], math.log(q / p) / (p + q)))
    elif d["market_m"] is not None:
        mis.append(("m_guard", d["market_m"], None))
    report("events_bass_diffusion", mis, 7)


def audit_sampen():
    """Sample entropy recomputed by brute-force template matching."""
    mis = []
    r_ = rows("SELECT date_trunc('hour', ts) AS h, "
              "SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) "
              f"FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1")
    xs = [x for _, x in r_]
    n = len(xs)
    mu = sum(xs) / n
    r_tol = math.floor(0.2 * math.sqrt(
        sum((x - mu) ** 2 for x in xs) / (n - 1)))

    def count(m):
        tpl = [xs[i:i + m] for i in range(n - m + 1)]
        return sum(
            1 for i in range(len(tpl)) for j in range(i + 1, len(tpl))
            if max(abs(u - v) for u, v in zip(tpl[i], tpl[j])) <= r_tol)

    b, a = count(2), count(3)
    (got,) = dump("ts_sample_entropy")
    d = dict(zip(dump_cols("ts_sample_entropy"), got))
    if (d["n_periods"], d["r_cents"]) != (n, r_tol):
        mis.append(("n/r", (d["n_periods"], d["r_cents"]), (n, r_tol)))
    if (d["b_count"], d["a_count"]) != (b, a):
        mis.append(("counts", (d["b_count"], d["a_count"]), (b, a)))
    want = -math.log(a / b) if a and b else None
    if want is not None and not close(d["sampen"], want, 1e-4):
        mis.append(("sampen", d["sampen"], want))
    report("ts_sample_entropy", mis, 4)


def audit_tost():
    """TOST equivalence recomputed with plain Welch machinery."""
    mis = []
    r_ = rows("SELECT user_id % 2, floor(value * 100 + 0.5) "
              f"FROM '{SF}/events.parquet' WHERE event_type = 'purchase'")
    g = {0: [], 1: []}
    for arm, v in r_:
        g[arm].append(v)
    mu = {a: sum(vs) / len(vs) for a, vs in g.items()}
    var = {a: sum((v - mu[a]) ** 2 for v in vs) / (len(vs) - 1)
           for a, vs in g.items()}
    se = math.sqrt(var[1] / len(g[1]) + var[0] / len(g[0]))
    dmu = mu[1] - mu[0]
    tl, tu = (dmu + 50) / se, (dmu - 50) / se
    (got,) = dump("stats_tost_equivalence")
    d = dict(zip(dump_cols("stats_tost_equivalence"), got))
    if (d["n1"], d["n0"]) != (len(g[1]), len(g[0])):
        mis.append(("n", (d["n1"], d["n0"]), (len(g[1]), len(g[0]))))
    if not close(d["diff_usd"], dmu / 100, 1e-3):
        mis.append(("diff", d["diff_usd"], dmu / 100))
    if not close(d["t_lower"], tl, 1e-3):
        mis.append(("t_lower", d["t_lower"], tl))
    if not close(d["t_upper"], tu, 1e-3):
        mis.append(("t_upper", d["t_upper"], tu))
    if d["equivalent"] != (tl > 1.6449 and tu < -1.6449):
        mis.append(("verdict", d["equivalent"], tl > 1.6449 > -tu))
    report("stats_tost_equivalence", mis, 5)


def audit_forecast_metrics():
    """snaive-7 forecast metrics recomputed with plain float loops."""
    mis = []
    r_ = rows("SELECT event_type, CAST(date_trunc('day', ts) AS DATE), "
              "SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) "
              f"FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2")
    from collections import defaultdict
    per = defaultdict(list)
    for et, _, x in r_:
        per[et].append(x)
    got = {r[0]: r for r in dump("ts_forecast_metrics")}
    cols = dump_cols("ts_forecast_metrics")
    for et, xs in sorted(per.items()):
        ev = [(xs[i], xs[i - 7]) for i in range(7, len(xs))]
        nd = [(xs[i], xs[i - 1]) for i in range(1, len(xs))]
        mae = sum(abs(x - f) for x, f in ev) / len(ev)
        rmse = math.sqrt(sum((x - f) ** 2 for x, f in ev) / len(ev))
        mape_t = [abs(x - f) / x for x, f in ev if x > 0]
        smape_t = [2 * abs(x - f) / (x + f) for x, f in ev if x + f > 0]
        mase = mae / (sum(abs(x - p) for x, p in nd) / len(nd))
        d = dict(zip(cols, got[et]))
        if d["n_eval"] != len(ev):
            mis.append((et + ":n", d["n_eval"], len(ev)))
        for k, w in (("mae_usd", mae / 100), ("rmse_usd", rmse / 100),
                     ("mape", sum(mape_t) / len(mape_t)),
                     ("smape", sum(smape_t) / len(smape_t)),
                     ("mase", mase)):
            if not close(d[k], w, 1e-3):
                mis.append((f"{et}:{k}", d[k], w))
    report("ts_forecast_metrics", mis, 6 * len(per))


def audit_adaboost():
    """AdaBoost recomputed per-example with float weights and a
    brute-force stump search — a genuinely different implementation of
    the same 2-round boost."""
    mis = []
    r_ = rows("SELECT floor(value * 100 + 0.5), "
              "CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END "
              f"FROM '{SF}/events.parquet' "
              "WHERE event_type IN ('purchase', 'view')")
    xs = [(int(v), y) for v, y in r_]
    n = len(xs)
    w = [1.0] * n
    thetas = sorted({v for v, _ in xs})
    picked = []
    for _ in range(2):
        wt = sum(w)
        best = None
        for th in thetas:
            for dr in (0, 1):
                err = sum(
                    wi for wi, (v, y) in zip(w, xs)
                    if (1 if ((dr == 0) == (v >= th)) else -1) != y)
                key = (err, dr, th)
                if best is None or key < best:
                    best = key
        err, dr, th = best
        alpha = 0.5 * math.log(max(wt - err, 1e-12) / max(err, 1e-12))
        picked.append((th, dr, err / wt, alpha))
        w = [wi * math.exp(-alpha * y
                           * (1 if ((dr == 0) == (v >= th)) else -1))
             for wi, (v, y) in zip(w, xs)]
    correct = sum(
        1 for v, y in xs
        if (1 if sum(a * (1 if ((dr == 0) == (v >= th)) else -1)
                     for th, dr, _, a in picked) > 0 else -1) == y)
    (got,) = dump("ml_adaboost_stumps")
    d = dict(zip(dump_cols("ml_adaboost_stumps"), got))
    if d["n"] != n:
        mis.append(("n", d["n"], n))
    for i, (th, dr, eps, alpha) in enumerate(picked, start=1):
        if d[f"r{i}_theta_cents"] != th:
            mis.append((f"r{i}_theta", d[f"r{i}_theta_cents"], th))
        if d[f"r{i}_dir"] != ("ge" if dr == 0 else "lt"):
            mis.append((f"r{i}_dir", d[f"r{i}_dir"], dr))
        if not close(d[f"r{i}_eps"], eps, 1e-4):
            mis.append((f"r{i}_eps", d[f"r{i}_eps"], eps))
        if not close(d[f"r{i}_alpha"], alpha, 1e-4):
            mis.append((f"r{i}_alpha", d[f"r{i}_alpha"], alpha))
    if not close(d["train_acc"], correct / n, 1e-4):
        mis.append(("train_acc", d["train_acc"], correct / n))
    report("ml_adaboost_stumps", mis, 10)


def audit_bhattacharyya():
    """BC / Bhattacharyya / Hellinger recomputed from plain bucket
    probabilities."""
    mis = []
    r_ = rows("SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) // 500, "
              "event_type, COUNT(*) "
              f"FROM '{SF}/events.parquet' "
              "WHERE event_type IN ('purchase', 'click') GROUP BY 1, 2")
    from collections import Counter
    c1, c0 = Counter(), Counter()
    for b, et, c in r_:
        (c1 if et == "purchase" else c0)[b] += c
    n1, n0 = sum(c1.values()), sum(c0.values())
    bc = sum(math.sqrt(c1[b] / n1 * (c0[b] / n0))
             for b in set(c1) | set(c0))
    (got,) = dump("stats_bhattacharyya")
    d = dict(zip(dump_cols("stats_bhattacharyya"), got))
    if (d["n1"], d["n0"]) != (n1, n0):
        mis.append(("n", (d["n1"], d["n0"]), (n1, n0)))
    if not close(d["bc_coef"], bc, 1e-4):
        mis.append(("bc", d["bc_coef"], bc))
    if not close(d["bhattacharyya_d"], -math.log(bc), 1e-4):
        mis.append(("db", d["bhattacharyya_d"], -math.log(bc)))
    if not close(d["hellinger"], math.sqrt(1 - bc), 1e-4):
        mis.append(("h", d["hellinger"], math.sqrt(1 - bc)))
    report("stats_bhattacharyya", mis, 4)


def audit_geo_harmonic():
    """Pythagorean means recomputed with plain float loops."""
    mis = []
    r_ = rows(f"SELECT floor(value * 100 + 0.5) FROM '{SF}/events.parquet' "
              "WHERE event_type = 'purchase' AND floor(value * 100 + 0.5) > 0")
    vs = [v for (v,) in r_]
    n = len(vs)
    arith = sum(vs) / n / 100
    geo = math.exp(sum(math.log(v) for v in vs) / n) / 100
    harm = n / sum(1 / v for v in vs) / 100
    (got,) = dump("agg_geo_harmonic_mean")
    d = dict(zip(dump_cols("agg_geo_harmonic_mean"), got))
    if d["n"] != n:
        mis.append(("n", d["n"], n))
    if not close(d["arith_usd"], arith, 1e-4):
        mis.append(("arith", d["arith_usd"], arith))
    if not close(d["geo_usd"], geo, 1e-4):
        mis.append(("geo", d["geo_usd"], geo))
    if not close(d["harmonic_usd"], harm, 1e-4):
        mis.append(("harm", d["harmonic_usd"], harm))
    if not (d["arith_usd"] >= d["geo_usd"] >= d["harmonic_usd"]):
        mis.append(("am-gm-hm order", (d["arith_usd"], d["geo_usd"],
                                       d["harmonic_usd"]), "AM>=GM>=HM"))
    report("agg_geo_harmonic_mean", mis, 5)


def audit_ndcg():
    """NDCG@10 recomputed with brute-force float ranking."""
    mis = []
    r_ = rows(f"SELECT vec_id, CAST(embedding AS DOUBLE[]), label "
              f"FROM '{SF}/embeddings.parquet'")
    vecs = {v: (e, l) for v, e, l in r_}
    got = {r[0]: r for r in dump("sim_ndcg")}
    cols = dump_cols("sim_ndcg")
    for pid in sorted(v for v in vecs if v < 10):
        pe, pl = vecs[pid]
        scored = []
        for vid, (ce, cl) in vecs.items():
            if vid == pid:
                continue
            cos = round(sum(x * y for x, y in zip(pe, ce))
                        / (math.sqrt(sum(x * x for x in pe))
                           * math.sqrt(sum(x * x for x in ce))), 4)
            scored.append((vid, cos, 1 if cl == pl else 0))
        ranked = sorted(scored, key=lambda t: (-t[1], t[0]))
        n_rel = sum(rel for _, _, rel in scored)
        dcg = sum(rel / math.log2(i + 2)
                  for i, (_, _, rel) in enumerate(ranked[:10]))
        idcg = sum(1 / math.log2(i + 2) for i in range(min(n_rel, 10)))
        d = dict(zip(cols, got[pid]))
        if d["n_rel"] != n_rel:
            mis.append((f"{pid}:n_rel", d["n_rel"], n_rel))
        if not close(d["dcg10"], dcg, 1e-4):
            mis.append((f"{pid}:dcg", d["dcg10"], dcg))
        want = dcg / idcg if n_rel else None
        if want is not None and not close(d["ndcg10"], want, 1e-4):
            mis.append((f"{pid}:ndcg", d["ndcg10"], want))
    report("sim_ndcg", mis, 30)


def audit_heaps():
    """Heaps' law log-log OLS recomputed with plain floats."""
    mis = []
    r_ = rows("SELECT source, COUNT(*), COUNT(DISTINCT token) FROM ("
              "SELECT source, unnest(string_split(lower(text), ' ')) AS token "
              f"FROM '{SF}/documents.parquet') GROUP BY source")
    pts = [(math.log(n), math.log(v)) for _, n, v in r_]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    syy = sum(y * y for _, y in pts)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    k = math.exp((sy - beta * sx) / n)
    r2 = (n * sxy - sx * sy) ** 2 / (n * sxx - sx * sx) / (n * syy - sy * sy)
    (got,) = dump("text_heaps_law")
    d = dict(zip(dump_cols("text_heaps_law"), got))
    if d["n_points"] != n:
        mis.append(("n", d["n_points"], n))
    if not close(d["beta"], beta, 1e-4):
        mis.append(("beta", d["beta"], beta))
    if not close(d["k_coef"], k, 1e-3):
        mis.append(("k", d["k_coef"], k))
    if not close(d["r2"], r2, 1e-4):
        mis.append(("r2", d["r2"], r2))
    report("text_heaps_law", mis, 4)


def audit_capture_recapture():
    """Lincoln-Petersen / Chapman recomputed from raw user sets."""
    mis = []
    clickers = {u for (u,) in rows(
        f"SELECT DISTINCT user_id FROM '{SF}/events.parquet' "
        "WHERE event_type = 'click'")}
    buyers = {u for (u,) in rows(
        f"SELECT DISTINCT user_id FROM '{SF}/events.parquet' "
        "WHERE event_type = 'purchase'")}
    (total,) = rows(f"SELECT COUNT(DISTINCT user_id) "
                    f"FROM '{SF}/events.parquet'")[0]
    n1, n2, m = len(clickers), len(buyers), len(clickers & buyers)
    lp = n1 * n2 / m
    chap = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    (got,) = dump("stats_capture_recapture")
    d = dict(zip(dump_cols("stats_capture_recapture"), got))
    if (d["n1"], d["n2"], d["overlap"], d["actual_users"]) != \
            (n1, n2, m, total):
        mis.append(("counts", (d["n1"], d["n2"], d["overlap"],
                               d["actual_users"]), (n1, n2, m, total)))
    if not close(d["lp_estimate"], lp, 1e-4):
        mis.append(("lp", d["lp_estimate"], lp))
    if not close(d["chapman_estimate"], chap, 1e-4):
        mis.append(("chapman", d["chapman_estimate"], chap))
    if not close(d["coverage_ratio"], chap / total, 1e-4):
        mis.append(("coverage", d["coverage_ratio"], chap / total))
    report("stats_capture_recapture", mis, 4)


def audit_mood_median():
    """Mood's median test recomputed with sorted-list median and a plain
    2x2 chi-square."""
    mis = []
    r_ = rows("SELECT user_id % 2, floor(value * 100 + 0.5) "
              f"FROM '{SF}/events.parquet' WHERE event_type = 'purchase'")
    vs = sorted(v for _, v in r_)
    n = len(vs)
    med = vs[(n - 1) // 2]  # lower median == first v with 2*cum >= n
    a = sum(1 for arm, v in r_ if arm == 1 and v > med)
    b = sum(1 for arm, v in r_ if arm == 1 and v < med)
    c = sum(1 for arm, v in r_ if arm == 0 and v > med)
    d0 = sum(1 for arm, v in r_ if arm == 0 and v < med)
    nt = a + b + c + d0
    chi2 = (nt * (a * d0 - b * c) ** 2
            / ((a + b) * (c + d0) * (a + c) * (b + d0)))
    (got,) = dump("stats_mood_median")
    d = dict(zip(dump_cols("stats_mood_median"), got))
    if (d["n1_above"], d["n1_below"], d["n0_above"], d["n0_below"]) != \
            (a, b, c, d0):
        mis.append(("cells", (d["n1_above"], d["n1_below"], d["n0_above"],
                              d["n0_below"]), (a, b, c, d0)))
    if not close(d["median_usd"], med / 100, 1e-6):
        mis.append(("median", d["median_usd"], med / 100))
    if not close(d["chi2"], chi2, 1e-4):
        mis.append(("chi2", d["chi2"], chi2))
    report("stats_mood_median", mis, 3)


def audit_elasticity():
    """Price elasticity recomputed with plain-float log-log OLS."""
    mis = []
    r_ = rows("SELECT floor(l_extendedprice / l_quantity * 100 + 0.5), "
              "floor(l_quantity + 0.5) "
              f"FROM '{SF}/lineitem.parquet' "
              "WHERE l_quantity > 0 AND l_extendedprice > 0")
    pts = [(math.log(p), math.log(q)) for p, q in r_]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    syy = sum(y * y for _, y in pts)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    icpt = (sy - beta * sx) / n
    r2 = (n * sxy - sx * sy) ** 2 / (n * sxx - sx * sx) / (n * syy - sy * sy)
    (got,) = dump("stats_price_elasticity")
    d = dict(zip(dump_cols("stats_price_elasticity"), got))
    if d["n_lines"] != n:
        mis.append(("n", d["n_lines"], n))
    if not close(d["elasticity"], beta, 1e-4):
        mis.append(("beta", d["elasticity"], beta))
    if not close(d["intercept_ln"], icpt, 1e-3):
        mis.append(("intercept", d["intercept_ln"], icpt))
    if not close(d["r2"], r2, 1e-4):
        mis.append(("r2", d["r2"], r2))
    report("stats_price_elasticity", mis, 4)


def audit_mix_shift():
    """Mix/rate decomposition recomputed with plain floats, and the
    identity check sum(mix)+sum(rate) == overall delta."""
    mis = []
    r_ = rows(
        "SELECT event_type, CASE WHEN date_diff('day', DATE '2024-01-01', "
        "CAST(date_trunc('day', ts) AS DATE)) < 15 THEN 1 ELSE 2 END, "
        "COUNT(*), SUM(floor(value * 100 + 0.5)) "
        f"FROM '{SF}/events.parquet' GROUP BY 1, 2")
    from collections import defaultdict
    g = defaultdict(dict)
    nt = defaultdict(int)
    for et, p, n, s_ in r_:
        g[et][p] = (n, s_)
        nt[p] += n
    got = {r[0]: r for r in dump("events_mix_shift")}
    cols = dump_cols("events_mix_shift")
    tot_mix = tot_rate = 0.0
    for et in sorted(g):
        (n1, s1), (n2, s2) = g[et][1], g[et][2]
        w1, w2 = n1 / nt[1], n2 / nt[2]
        m1, m2 = s1 / n1 / 100, s2 / n2 / 100
        d = dict(zip(cols, got[et]))
        for k, want in (("w1", w1), ("w2", w2), ("m1_usd", m1),
                        ("m2_usd", m2), ("mix_effect_usd", (w2 - w1) * m1),
                        ("rate_effect_usd", w2 * (m2 - m1))):
            if not close(d[k], want, 1e-3):
                mis.append((f"{et}:{k}", d[k], want))
        tot_mix += (w2 - w1) * m1
        tot_rate += w2 * (m2 - m1)
    overall = (sum(s for _, p, _, s in
                   [(None, p, n, s) for et in g for p, (n, s) in
                    g[et].items()] if p == 2) / nt[2]
               - sum(s for et in g for p, (n, s) in g[et].items()
                     if p == 1) / nt[1]) / 100
    if not close(tot_mix + tot_rate, overall, 1e-6):
        mis.append(("identity", tot_mix + tot_rate, overall))
    report("events_mix_shift", mis, 6 * len(g) + 1)


def audit_weibull():
    """Weibull median-rank regression recomputed with plain floats over
    the same second-granularity gap histogram mid-ranks."""
    mis = []
    r_ = rows(
        "SELECT t, COUNT(*) FROM ("
        "SELECT (epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id))) // 1000000 AS t "
        f"FROM '{SF}/events.parquet' WHERE event_type = 'purchase') "
        "WHERE t IS NOT NULL AND t > 0 GROUP BY t ORDER BY t")
    n = sum(c for _, c in r_)
    cb = 0
    pts = []
    for t, c in r_:
        f = (cb + (c + 1) / 2.0 - 0.3) / (n + 0.4)
        pts.append((c, math.log(t), math.log(-math.log(1 - f))))
        cb += c
    w = sum(c for c, _, _ in pts)
    sx = sum(c * x for c, x, _ in pts)
    sy = sum(c * y for c, _, y in pts)
    sxx = sum(c * x * x for c, x, _ in pts)
    sxy = sum(c * x * y for c, x, y in pts)
    syy = sum(c * y * y for c, _, y in pts)
    k = (w * sxy - sx * sy) / (w * sxx - sx * sx)
    lam = math.exp(-((sy - k * sx) / w) / k)
    r2 = (w * sxy - sx * sy) ** 2 / (w * sxx - sx * sx) / (w * syy - sy * sy)
    (got,) = dump("events_weibull_fit")
    d = dict(zip(dump_cols("events_weibull_fit"), got))
    if d["n_gaps"] != n:
        mis.append(("n", d["n_gaps"], n))
    if not close(d["shape_k"], k, 1e-3):
        mis.append(("k", d["shape_k"], k))
    if not close(d["scale_sec"], lam, 1e-3):
        mis.append(("lambda", d["scale_sec"], lam))
    if not close(d["r2"], r2, 1e-3):
        mis.append(("r2", d["r2"], r2))
    report("events_weibull_fit", mis, 4)


def audit_sign_test():
    """Paired sign test recomputed from plain daily sums."""
    mis = []
    r_ = rows(
        "SELECT SUM(CASE WHEN event_type='purchase' "
        "THEN floor(value*100+0.5) ELSE 0 END), "
        "SUM(CASE WHEN event_type='click' "
        "THEN floor(value*100+0.5) ELSE 0 END) "
        f"FROM '{SF}/events.parquet' "
        "WHERE event_type IN ('purchase','click') "
        "GROUP BY CAST(date_trunc('day', ts) AS DATE)")
    k = sum(1 for p, c in r_ if p > c)
    n = sum(1 for p, c in r_ if p != c)
    (got,) = dump("stats_sign_test")
    d = dict(zip(dump_cols("stats_sign_test"), got))
    if (d["n_days"], d["n_untied"], d["n_purchase_wins"]) != \
            (len(r_), n, k):
        mis.append(("counts", (d["n_days"], d["n_untied"],
                               d["n_purchase_wins"]), (len(r_), n, k)))
    if not close(d["sign_z"], (2 * k - n) / math.sqrt(n), 1e-4):
        mis.append(("z", d["sign_z"], (2 * k - n) / math.sqrt(n)))
    report("stats_sign_test", mis, 2)


def audit_conversion_sweep():
    """Attribution-window sweep replayed sequentially per user."""
    mis = []
    r_ = rows("SELECT user_id, epoch_us(ts), event_type, event_id "
              f"FROM '{SF}/events.parquet' "
              "WHERE event_type IN ('click','purchase') "
              "ORDER BY user_id, 2, event_id")
    last = {}
    gaps = []
    for uid, us, et, _ in r_:
        if et == "purchase":
            gaps.append(us - last[uid] if uid in last else None)
        else:
            last[uid] = us
    counts = {h: sum(1 for g in gaps
                     if g is not None and g <= h * 3600000000)
              for h in (1, 6, 24)}
    got = {r[0]: r for r in dump("events_conversion_window_sweep")}
    cols = dump_cols("events_conversion_window_sweep")
    for h in (1, 6, 24):
        d = dict(zip(cols, got[h]))
        if d["attributed"] != counts[h]:
            mis.append((f"{h}h", d["attributed"], counts[h]))
        if not close(d["conversion_rate"], counts[h] / len(gaps), 1e-5):
            mis.append((f"{h}h:rate", d["conversion_rate"],
                        counts[h] / len(gaps)))
    report("events_conversion_window_sweep", mis, 6)


def audit_pack_bfd():
    """Best-fit-decreasing packing replayed item-by-item in Python (the
    Spark side batches placements per (bin, class); the oracle recurses
    per item in SQL; this is a third, list-based replay)."""
    C = 128
    per = {}
    for s, t in rows("SELECT source, text "
                     f"FROM '{SF}/documents.parquet'"):
        per.setdefault(s, []).append(len(t.split(' ')))
    mis = []
    out = dump("llm_pack_bfd")
    for source, n_docs, total_tokens, bins, lower_bound, util in out:
        lens = per[source]
        res = []
        for ln in sorted(lens, reverse=True):
            fits = [r for r in res if r >= ln]
            if fits:
                r = min(fits)
                res.remove(r)
                res.append(r - ln)
            else:
                res.append(C - ln)
        t = sum(lens)
        want = (len(lens), t, len(res), -(-t // C),
                math.floor(t / (len(res) * C) * 1e6 + 0.5) / 1e6)
        got = (n_docs, total_tokens, bins, lower_bound, util)
        if got[:4] != want[:4] or not close(util, want[4], 1e-6):
            mis.append((source, got, want))
    report("llm_pack_bfd", mis, len(out) * 5)


def audit_kneser_ney():
    """Interpolated Kneser-Ney bigram probabilities recomputed from raw
    docs with a Counter walk (discount 0.75, textbook interpolation)."""
    from collections import Counter
    bc = Counter()
    for (t,) in rows(f"SELECT lower(text) FROM '{SF}/documents.parquet'"):
        tk = t.split(' ')
        for i in range(len(tk) - 1):
            bc[(tk[i], tk[i + 1])] += 1
    c_v, n1_v, n1_w = Counter(), Counter(), Counter()
    for (v, w), c in bc.items():
        c_v[v] += c
        n1_v[v] += 1
        n1_w[w] += 1
    n_types = len(bc)
    mis = []
    out = dump("text_lm_kneser_ney")
    for v, w, n_vw, p_mle, p_kn in out:
        c = bc[(v, w)]
        mle = c / c_v[v]
        kn = (c - 0.75) / c_v[v] + 0.75 * n1_v[v] / c_v[v] * (n1_w[w] / n_types)
        if n_vw != c:
            mis.append((v, w, "count", n_vw, c))
        if not close(p_mle, mle, 1e-5):
            mis.append((v, w, "mle", p_mle, mle))
        if not close(p_kn, kn, 1e-5):
            mis.append((v, w, "kn", p_kn, kn))
    # the top-20 selection itself: highest counts win (full tiebreak)
    top = sorted(bc.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = [(v, w) for (v, w), _ in top]
    got = [(v, w) for v, w, *_ in out]
    if got != want:
        mis.append(("top20-order", got[:3], want[:3]))
    report("text_lm_kneser_ney", mis, len(out) * 3 + 1)


def audit_pq_train_kmeans():
    """Per-subspace PQ codebook training replayed in pure Python from the
    raw embeddings — the same quantized-Lloyd scheme as the kmeans
    audits (1e-8 BIGINT distances, 6-dp integer-mean updates, lowest-id
    seeds) applied independently per (subq) with m=8, k=16, 2 rounds."""
    import math
    mis = []
    r_ = rows(f"SELECT vec_id, CAST(embedding AS DOUBLE[]) "
              f"FROM '{SF}/embeddings.parquet' ORDER BY vec_id")
    vecs = dict(r_)
    ids = sorted(vecs)
    d = len(vecs[ids[0]])
    m, k = 8, 16
    sub = d // m

    def slc(v, sq):
        return vecs[v][sq * sub:(sq + 1) * sub]

    def d2(x, c):
        return sum(math.floor((e - mm) * (e - mm) * 1e8 + 0.5)
                   for e, mm in zip(x, c))

    expect = []
    for sq in range(m):
        cents = {code + 1: slc(ids[code], sq) for code in range(k)}
        for it in (1, 2):
            assign = {v: min(cents, key=lambda c: (d2(slc(v, sq), cents[c]), c))
                      for v in ids}
            n_codes = len(set(assign.values()))
            tot = sum(d2(slc(v, sq), cents[assign[v]]) for v in ids)
            expect.append((it, sq, n_codes, tot / 1e8 / len(ids)))
            new = {}
            for c in set(assign.values()):
                members = [v for v in ids if assign[v] == c]
                new[c] = [math.floor(sum(math.floor(slc(v, sq)[j] * 1e6 + 0.5)
                                         for v in members) / len(members) + 0.5)
                          / 1e6 for j in range(sub)]
            cents = new
    expect.sort()
    got = dump("emb_pq_train_kmeans")
    got = sorted((int(it), int(sq), int(nc), mse) for it, sq, nc, mse in got)
    if len(got) != len(expect):
        mis.append(("n_rows", len(got), len(expect)))
    for g, e in zip(got, expect):
        if g[:3] != e[:3]:
            mis.append((g[:3], e[:3]))
        if not close(g[3], e[3], 1e-9):
            mis.append((g[:2], "mse", g[3], e[3]))
    report("emb_pq_train_kmeans", mis, len(expect) * 2)


def audit_gbt_stumps():
    """Gradient-boosted regression stumps replayed per-ROW in Python (the
    engine runs on the hour histogram with closed-form moment updates;
    this replay keeps an explicit residual per event — agreement shows
    the histogram algebra equals the naive definition)."""
    import math
    mis = []
    ev = rows(f"SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT), "
              f"CAST(floor(value * 100 + 0.5) AS BIGINT) "
              f"FROM '{SF}/events.parquet'")
    n = len(ev)
    m0 = math.floor(sum(y for _, y in ev) / n + 0.5)
    resid = [(h, y - m0) for h, y in ev]
    out = [n, m0 / 100, sum(r * r for _, r in resid) / 10000]
    for _ in (1, 2):
        hours = sorted(set(h for h, _ in resid))
        best = None
        for th in hours:
            l = [r for h, r in resid if h <= th]
            r_ = [r for h, r in resid if h > th]
            if not r_:
                continue
            ssel = sum(x * x for x in l) - sum(l) * sum(l) / len(l)
            sser = sum(x * x for x in r_) - sum(r_) * sum(r_) / len(r_)
            key = (math.floor((ssel + sser) * 100 + 0.5), th)
            if best is None or key < best[0]:
                lc = math.floor(sum(l) / len(l) + 0.5)
                rc = math.floor(sum(r_) / len(r_) + 0.5)
                best = (key, th, lc, rc)
        _, th, lc, rc = best
        resid = [(h, r - (lc if h <= th else rc)) for h, r in resid]
        out += [th, lc / 100, rc / 100, sum(r * r for _, r in resid) / 10000]
    got = list(dump("ml_gbt_stumps")[0])
    for i, (g, e) in enumerate(zip(got, out)):
        if not close(float(g), float(e), 1e-9):
            mis.append((i, g, e))
    report("ml_gbt_stumps", mis, len(out))


def audit_grpo_advantage():
    """(reward - group mean) / group sample std recomputed per-row in
    Python with statistics.stdev — no shared fixed-point scheme with the
    engine beyond the 1e-6 reward grid."""
    import math
    import statistics
    mis = []
    ev = rows(f"SELECT user_id, event_id, "
              f"CAST(floor(value * 1000000 + 0.5) AS BIGINT) "
              f"FROM '{SF}/events.parquet'")
    groups = {}
    for g, i, v in ev:
        groups.setdefault(g, []).append(v)
    got = dump("llm_grpo_advantage")
    vmap = {(g, i): v for g, i, v in ev}
    n_checked = 0
    for g, i, reward, n_group, adv in got:
        vs = groups[g]
        if len(vs) != n_group:
            mis.append((g, "n", n_group, len(vs)))
        if len(vs) < 2 or statistics.stdev(vs) == 0:
            exp = 0.0
        else:
            exp = (vmap[(g, i)] - statistics.mean(vs)) / statistics.stdev(vs)
            exp = math.floor(exp * 1e6 + 0.5) / 1e6
        if not close(adv, exp, 1e-6):
            mis.append((g, i, adv, exp))
        n_checked += 1
    report("llm_grpo_advantage", mis, n_checked)


def audit_cdc_chunks():
    """CDC chunk boundaries replayed with an explicit per-char rolling
    loop in Python (the engine computes the same hash with window lags);
    checks chunk count / mean / max per doc AND the chunk-level dedup
    readout's shared-chunk accounting via real chunk substrings."""
    import hashlib
    import math
    mis = []
    docs = rows(f"SELECT doc_id, text FROM '{SF}/documents.parquet' "
                f"ORDER BY doc_id")
    stats = {}
    sig_docs = {}
    chunks_of = {}
    for doc_id, text in docs:
        cps = [ord(c) for c in text]
        lens, cur = [], 0
        for i in range(len(cps)):
            cur += 1
            if i >= 3 and (cps[i] + 31 * cps[i - 1] + 961 * cps[i - 2]
                           + 29791 * cps[i - 3]) % 16 == 0:
                lens.append(cur)
                cur = 0
        if cur > 0:
            lens.append(cur)
        # NOTE boundary at pos ENDS a chunk at pos (chunk id increments
        # AFTER the boundary row) — mirror: boundary char belongs to the
        # chunk it closes
        stats[doc_id] = (len(lens), sum(lens) / len(lens), max(lens))
        st = 0
        cl = []
        for ln in lens:
            piece = text[st:st + ln]
            sig = hashlib.md5(piece.encode("utf-8")).hexdigest()
            cl.append((sig, ln))
            sig_docs.setdefault(sig, set()).add(doc_id)
            st += ln
        chunks_of[doc_id] = cl
    for doc_id, n_chunks, avg_len, max_len in dump("text_cdc_chunks"):
        en, ea, em = stats[doc_id]
        if n_chunks != en or max_len != em or \
                not close(avg_len, math.floor(ea * 1e4 + 0.5) / 1e4, 1e-9):
            mis.append((doc_id, (n_chunks, avg_len, max_len), (en, ea, em)))
    for doc_id, n_chunks, n_shared, frac in dump("llm_dedup_cdc_chunks"):
        cl = chunks_of[doc_id]
        es = sum(1 for sig, _ in cl if len(sig_docs[sig]) > 1)
        ef = sum(ln for sig, ln in cl if len(sig_docs[sig]) > 1) \
            / sum(ln for _, ln in cl)
        if n_chunks != len(cl) or n_shared != es or \
                not close(frac, math.floor(ef * 1e4 + 0.5) / 1e4, 1e-9):
            mis.append((doc_id, (n_chunks, n_shared, frac), (len(cl), es, ef)))
    report("text_cdc_chunks+llm_dedup_cdc_chunks", mis, 2 * len(docs))


def audit_random_projection():
    """JL sign projection + pair-distance ratio buckets replayed in plain
    Python (numpy-free; explicit sign matrix from the integer mixer)."""
    import math
    mis = []
    r_ = rows(f"SELECT vec_id, CAST(embedding AS DOUBLE[]) "
              f"FROM '{SF}/embeddings.parquet' WHERE vec_id < 60 "
              f"ORDER BY vec_id")
    vecs = {v: [math.floor(x * 1e6 + 0.5) for x in e] for v, e in r_}
    ids = sorted(vecs)
    dj = len(vecs[ids[0]])
    sign = {(d, j): (1 if ((d * 2654435761 + j * 40503) // 65536) % 2 == 0
                     else -1)
            for d in range(16) for j in range(1, dj + 1)}
    proj = {v: [sum(sign[(d, j + 1)] * x for j, x in enumerate(vecs[v]))
                for d in range(16)] for v in ids}
    buckets = {}
    for a_i in range(len(ids)):
        for b_i in range(a_i + 1, len(ids)):
            a, b = ids[a_i], ids[b_i]
            do2 = sum((x - y) ** 2 for x, y in zip(vecs[a], vecs[b]))
            if do2 == 0:
                continue
            dp2 = sum((x - y) ** 2 for x, y in zip(proj[a], proj[b]))
            ratio = math.sqrt(dp2 / 16 / do2)
            bk = math.floor(ratio * 10)
            n, mn, mx = buckets.get(bk, (0, 9e9, -9e9))
            buckets[bk] = (n + 1, min(mn, ratio), max(mx, ratio))
    got = dump("emb_random_projection")
    if len(got) != len(buckets):
        mis.append(("n_buckets", len(got), len(buckets)))
    for bk, n, mn, mx in got:
        en, emn, emx = buckets.get(bk, (0, 0, 0))
        if n != en:
            mis.append((bk, "n", n, en))
        if not close(mn, math.floor(emn * 1e4 + 0.5) / 1e4, 1e-9) or \
           not close(mx, math.floor(emx * 1e4 + 0.5) / 1e4, 1e-9):
            mis.append((bk, "minmax", (mn, mx), (emn, emx)))
    report("emb_random_projection", mis, 3 * len(got))


def audit_feature_hashing():
    """Hashing-trick bucket loads replayed with hashlib.md5 — fully
    independent of both engines' md5/substring/ascii trees."""
    import hashlib
    mis = []
    docs = rows(f"SELECT text FROM '{SF}/documents.parquet'")
    toks = set()
    for (t,) in docs:
        w = t.lower().split(" ")
        toks.update(f"{w[i]} {w[i + 1]}" for i in range(len(w) - 1))
    load = {}
    for t in toks:
        b = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:2], 16)
        load[b] = load.get(b, 0) + 1
    hist = {}
    for _, n in load.items():
        hist[n] = hist.get(n, 0) + 1
    got = dump("ml_feature_hashing")
    if len(got) != len(hist):
        mis.append(("n_rows", len(got), len(hist)))
    for bl, nb, tl in got:
        if hist.get(bl) != nb or bl * hist.get(bl, 0) != tl:
            mis.append((bl, (nb, tl), (hist.get(bl), bl * hist.get(bl, 0))))
    report("ml_feature_hashing", mis, 2 * len(got))


def audit_bh_fdr():
    """Chi-square (dof=2, closed-form p=exp(-x/2)) + Benjamini-Hochberg
    step-up replayed from raw events in Python; float chi2 (no shared
    fixed point) compared at 5e-3 tolerance, BH frontier re-derived."""
    import math
    mis = []
    ev = rows(f"SELECT event_type, EXTRACT(hour FROM ts) // 6, "
              f"user_id % 2, "
              f"CASE WHEN value < 20 THEN 0 WHEN value < 55 THEN 1 "
              f"ELSE 2 END FROM '{SF}/events.parquet'")
    cells = {}
    for t, hb, arm, vb in ev:
        cells[(t, hb, arm, vb)] = cells.get((t, hb, arm, vb), 0) + 1
    groups = sorted(set((t, hb) for t, hb, _, _ in cells))
    ps = []
    for (t, hb) in groups:
        sub = {(a, v): n for (tt, hh, a, v), n in cells.items()
               if tt == t and hh == hb}
        n = sum(sub.values())
        chi = 0.0
        for a in (0, 1):
            for v in (0, 1, 2):
                rt = sum(sub.get((a, vv), 0) for vv in (0, 1, 2))
                ct = sum(sub.get((aa, v), 0) for aa in (0, 1))
                e = rt * ct / n
                o = sub.get((a, v), 0)
                if e > 0:
                    chi += (o - e) ** 2 / e
        ps.append((math.exp(-chi / 2), chi, t, hb))
    ps.sort(key=lambda x: (x[0], x[2], x[3]))
    m = len(ps)
    k = max([i + 1 for i in range(m) if ps[i][0] <= (i + 1) / m * 0.05],
            default=0)
    exp_by_key = {(t, hb): (i + 1, p, chi, (i + 1) <= k)
                  for i, (p, chi, t, hb) in enumerate(ps)}
    got = dump("stats_bh_fdr")
    if len(got) != m:
        mis.append(("n_tests", len(got), m))
    for t, hb, chi2, pv, rnk, rej in got:
        ernk, ep, echi, erej = exp_by_key[(t, hb)]
        if rnk != ernk or rej != erej:
            mis.append((t, hb, (rnk, rej), (ernk, erej)))
        if not close(chi2, echi) or not close(pv, ep):
            mis.append((t, hb, (chi2, pv), (echi, ep)))
    report("stats_bh_fdr", mis, 2 * m)


def audit_theta_setops():
    """Audience set algebra replayed with literal Python sets — blind to
    both engines' sketch/distinct machinery."""
    mis = []
    per = {}
    for t, u in rows(f"SELECT event_type, user_id FROM '{SF}/events.parquet'"):
        per.setdefault(t, set()).add(u)
    exp = {t: len(s) for t, s in per.items()}
    exp["any"] = len(set().union(*per.values()))
    exp["click_and_purchase"] = len(per.get("click", set())
                                    & per.get("purchase", set()))
    exp["click_not_purchase"] = len(per.get("click", set())
                                    - per.get("purchase", set()))
    got = dict(dump("agg_theta_setops"))
    if set(got) != set(exp):
        mis.append(("keys", sorted(got), sorted(exp)))
    for k, v in exp.items():
        if got.get(k) != v:
            mis.append((k, got.get(k), v))
    report("agg_theta_setops", mis, len(exp))


def audit_approx_topk():
    """Heavy hitters replayed with collections.Counter (covers both the
    direct and the accumulate/combine forms — same expected rows)."""
    from collections import Counter
    c = Counter(t for (t,) in rows(
        f"SELECT event_type FROM '{SF}/events.parquet'"))
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    mis = []
    for name in ("agg_approx_topk", "agg_approx_topk_union"):
        got = dump(name)
        if [tuple(r) for r in got] != exp:
            mis.append((name, got, exp))
    report("agg_approx_topk+union", mis, 6)


def audit_variant_group():
    """Canonical variant key replayed with Python json: sorted keys,
    compact separators — independent of Spark's variant renderer."""
    import json
    agg = {}
    for p, v in rows(f"SELECT props, value FROM '{SF}/events.parquet'"):
        key = json.dumps(json.loads(p), separators=(",", ":"), sort_keys=True)
        n, cents = agg.get(key, (0, 0))
        agg[key] = (n + 1, cents + math.floor(v * 100 + 0.5))
    mis = []
    got = dump("agg_variant_group")
    if len(got) != len(agg):
        mis.append(("n_groups", len(got), len(agg)))
    for k, n, sv in got:
        en, ec = agg.get(k, (None, None))
        if n != en or not close(sv, ec / 100.0 if ec is not None else None):
            mis.append((k, (n, sv), (en, ec)))
    report("agg_variant_group", mis, 2 * len(agg))


def audit_scripting_while():
    """The WHILE fold is Σ monthly cents = Σ all cents (months 1–12 are
    exhaustive) — replayed as one literal pass."""
    cents = sum(math.floor(p * 100 + 0.5) for (p,) in rows(
        f"SELECT o_totalprice FROM '{SF}/orders.parquet'"))
    got = dump("sql_scripting_while")
    mis = []
    if len(got) != 1 or got[0][0] != 12 or not close(got[0][1], cents / 100.0):
        mis.append((got, (12, cents / 100.0)))
    report("sql_scripting_while", mis, 2)


def audit_tws_interval_join():
    """The interval join replayed as a literal nested loop per user."""
    evs = rows("SELECT user_id, event_type, event_id, epoch_us(ts) "
               f"FROM '{SF}/events.parquet' "
               "WHERE event_type IN ('click', 'purchase')")
    by_user = {}
    for u, t, e, ts in evs:
        by_user.setdefault(u, []).append((t, e, ts))
    exp = set()
    for u, es in by_user.items():
        for t1, e1, ts1 in es:
            if t1 != "click":
                continue
            for t2, e2, ts2 in es:
                if t2 == "purchase" and ts1 < ts2 <= ts1 + 600000000:
                    exp.add((u, e1, ts1, e2, ts2))
    got = {tuple(r) for r in dump("stream_interval_join_tws")}
    mis = [] if got == exp else [("pairs", len(got), len(exp),
                                  sorted(got ^ exp)[:3])]
    report("stream_interval_join_tws", mis, len(exp))


def audit_tws_mapstate_counts():
    from collections import Counter
    c = Counter((u, t) for u, t in rows(
        f"SELECT user_id, event_type FROM '{SF}/events.parquet'"))
    got = {(u, t): n for u, t, n in dump("stream_tws_mapstate_counts")}
    mis = [] if got == dict(c) else [("cells", len(got), len(c))]
    report("stream_tws_mapstate_counts", mis, len(c))


def audit_state_store_scan():
    exp = sorted({u for (u,) in rows(
        f"SELECT user_id FROM '{SF}/events.parquet'")})
    got = [r[0] for r in dump("scan_state_store")]
    mis = [] if got == exp else [("keys", len(got), len(exp))]
    report("scan_state_store", mis, len(exp))


def audit_stream_left_join():
    """The streaming left-outer flush rule replayed literally: matched
    pairs, plus null rows ONLY for clicks whose 10-minute window closed
    under the final min-watermark."""
    evs = rows("SELECT user_id, event_type, event_id, epoch_us(ts) "
               f"FROM '{SF}/events.parquet' "
               "WHERE event_type IN ('click', 'purchase')")
    clicks = [(u, e, ts) for u, t, e, ts in evs if t == "click"]
    purch = [(u, e, ts) for u, t, e, ts in evs if t == "purchase"]
    wm = min(max(ts for _, _, ts in clicks), max(ts for _, _, ts in purch))
    exp = set()
    matched = set()
    for u, ce, cts in clicks:
        for pu, pe, pts in purch:
            if u == pu and cts < pts <= cts + 600000000:
                exp.add((u, ce, cts, pe, pts))
                matched.add(ce)
    for u, ce, cts in clicks:
        if ce not in matched and cts + 600000000 <= wm:
            exp.add((u, ce, cts, None, None))
    got = {tuple(r) for r in dump("stream_stream_left_join")}
    mis = [] if got == exp else [("rows", len(got), len(exp),
                                  sorted(got ^ exp, key=str)[:3])]
    report("stream_stream_left_join", mis, len(exp))


def audit_stream_full_join():
    """The two-sided flush: unmatched clicks wait out their forward
    window (c_ts + 10 min < wm), unmatched purchases only their own
    timestamp (p_ts < wm, strictly — the row AT the watermark stays
    open). Replayed literally."""
    evs = rows("SELECT user_id, event_type, event_id, epoch_us(ts) "
               f"FROM '{SF}/events.parquet' "
               "WHERE event_type IN ('click', 'purchase')")
    clicks = [(u, e, ts) for u, t, e, ts in evs if t == "click"]
    purch = [(u, e, ts) for u, t, e, ts in evs if t == "purchase"]
    wm = min(max(ts for _, _, ts in clicks), max(ts for _, _, ts in purch))
    exp = set()
    mc, mp = set(), set()
    for u, ce, cts in clicks:
        for pu, pe, pts in purch:
            if u == pu and cts < pts <= cts + 600000000:
                exp.add((u, ce, cts, pe, pts))
                mc.add(ce)
                mp.add(pe)
    for u, ce, cts in clicks:
        if ce not in mc and cts + 600000000 < wm:
            exp.add((u, ce, cts, None, None))
    for u, pe, pts in purch:
        if pe not in mp and pts < wm:
            exp.add((u, None, None, pe, pts))
    got = {tuple(r) for r in dump("stream_stream_full_join")}
    mis = [] if got == exp else [("rows", len(got), len(exp),
                                  sorted(got ^ exp, key=str)[:3])]
    report("stream_stream_full_join", mis, len(exp))


def audit_tws_initial_state():
    """Seed + increment fold replayed literally: orders history cents per
    custkey, plus event cents, emitted only for streamed users."""
    seed = {}
    for u, p in rows(f"SELECT o_custkey, o_totalprice FROM '{SF}/orders.parquet'"):
        seed[u] = seed.get(u, 0) + math.floor(p * 100 + 0.5)
    inc = {}
    for u, v in rows(f"SELECT user_id, value FROM '{SF}/events.parquet'"):
        inc[u] = inc.get(u, 0) + math.floor(v * 100 + 0.5)
    exp = {u: n + seed.get(u, 0) for u, n in inc.items()}
    got = dict(dump("stream_tws_initial_state"))
    mis = [] if got == exp else [
        ("cells", len(got), len(exp),
         sorted(set(got.items()) ^ set(exp.items()))[:3])]
    report("stream_tws_initial_state", mis, len(exp))


def audit_unigram_lm():
    """The unigram-LM EM step replayed from the textbook definition:
    substring counts → fixed-point log-scores → per-word Viterbi (exact
    integer path costs, segmentation-string tiebreak) → recount."""
    from collections import Counter
    wf = Counter()
    for (t,) in rows(f"SELECT lower(text) FROM '{SF}/documents.parquet'"):
        for word in t.split(" "):
            if word:
                wf[word] += 1
    pc = Counter()
    for word, n in wf.items():
        for i in range(len(word)):
            for l in range(1, min(4, len(word) - i) + 1):
                pc[word[i:i + l]] += n
    tt = float(sum(pc.values()))
    s6 = {p: math.floor(math.log(c / tt) * 1000000 + 0.5)
          for p, c in pc.items()}
    em = Counter()
    for word, n in wf.items():
        if len(word) > 8:  # the graded sides' maxLen: longer words drop
            continue       # out of the EM recount (not out of pc)
        best = {0: (0, "")}
        for i in range(1, len(word) + 1):
            cands = []
            for l in range(1, min(4, i) + 1):
                piece = word[i - l:i]
                s_prev, seg_prev = best[i - l]
                cands.append((s_prev + s6[piece], seg_prev + "/" + piece))
            best[i] = max(cands)  # (score, seg) lexicographic = the DP rule
        for piece in best[len(word)][1][1:].split("/"):
            em[piece] += n
    exp = sorted(((p, pc[p], em.get(p, 0), s6[p] / 1e6) for p in pc),
                 key=lambda r: (-r[2], r[0]))[:20]
    got = [tuple(r) for r in dump("llm_unigram_lm_step")]
    mis = []
    if len(got) != len(exp):
        mis.append(("n", len(got), len(exp)))
    for g, e in zip(got, exp):
        if g[0] != e[0] or g[1] != e[1] or g[2] != e[2] \
                or not close(g[3], e[3], tol=1e-5):
            mis.append((g, e))
    report("llm_unigram_lm_step", mis, 4 * len(exp))


def audit_sql_udfs():
    """SQL UDF bodies replayed literally: the floor-chain tax and the
    per-order tier fan-out."""
    mis = []
    taxed = {k: math.floor(math.floor(p * 100 + 0.5) * 1.07 + 0.5)
             for k, p in rows(
                 f"SELECT o_orderkey, o_totalprice FROM '{SF}/orders.parquet'")}
    for k, t in dump("udf_sql_scalar"):
        if taxed.get(k) != t:
            mis.append((k, t, taxed.get(k)))
    exp_tiers = [(k, i) for (k,) in rows(
        f"SELECT o_orderkey FROM '{SF}/orders.parquet' ORDER BY 1")
        for i in range(1, k % 3 + 2)]
    got_tiers = [tuple(r) for r in dump("udf_sql_table")]
    if got_tiers != exp_tiers:
        mis.append(("tiers", len(got_tiers), len(exp_tiers)))
    report("udf_sql_scalar+table", mis, len(taxed) + len(exp_tiers))


def _add_months(d, n):
    """Calendar month-add with end-of-month clamping (the ANSI rule both
    engines follow)."""
    import calendar
    import datetime
    y, m = d.year + (d.month - 1 + n) // 12, (d.month - 1 + n) % 12 + 1
    return datetime.date(y, m, min(d.day, calendar.monthrange(y, m)[1]))


def audit_interval_arith():
    """ANSI interval arithmetic replayed with Python's calendar: month
    adds clamp to month-end; day-time adds are exact timedeltas."""
    import datetime
    mis, n = [], 0
    got = {r[0]: r[1:] for r in dump("fn_interval_arith")}
    for k, d in rows(f"SELECT o_orderkey, o_orderdate FROM '{SF}/orders.parquet'"):
        ts = datetime.datetime(d.year, d.month, d.day)
        exp = (_add_months(d, 18).strftime("%Y-%m-%d"),
               (ts + datetime.timedelta(days=2, hours=3, minutes=4,
                                        seconds=5)).strftime("%Y-%m-%d %H:%M:%S"),
               _add_months(d, k % 4).strftime("%Y-%m-%d"),
               (ts + datetime.timedelta(hours=k % 5)).strftime("%Y-%m-%d %H:%M:%S"))
        n += 4
        if got.get(k) != exp:
            mis.append((k, got.get(k), exp))
    report("fn_interval_arith", mis, n)


def audit_timestamp_ntz():
    """NTZ construction + fixed-offset zone conversions replayed as
    timedeltas (Tokyo +9:00, Kolkata +5:30 — both DST-free)."""
    import datetime
    mis, n = [], 0
    got = {r[0]: r[1:] for r in dump("fn_timestamp_ntz")}
    for k, d in rows(f"SELECT o_orderkey, o_orderdate FROM '{SF}/orders.parquet'"):
        ntz = datetime.datetime(d.year, d.month, d.day, k % 24, 30, 0)
        f = "%Y-%m-%d %H:%M:%S"
        exp = (ntz.strftime(f),
               (ntz + datetime.timedelta(hours=9)).strftime(f),
               (ntz - datetime.timedelta(hours=5, minutes=30)).strftime(f))
        n += 3
        if got.get(k) != exp:
            mis.append((k, got.get(k), exp))
    report("fn_timestamp_ntz", mis, n)


def audit_number_format():
    """to_char/to_number round-trip replayed with Python string formatting
    from the exact integer cents."""
    mis, n = [], 0
    got = {r[0]: r[1:] for r in dump("fn_number_format")}
    for (k, p) in rows(
            f"SELECT o_orderkey, o_totalprice FROM '{SF}/orders.parquet'"):
        cents = math.floor(p * 100 + 0.5)
        usd = f"{cents // 100:,}.{cents % 100:02d}".rjust(12)
        exp = (usd, f"{k:07d}", cents / 100.0)
        n += 3
        g = got.get(k)
        if g is None or g[0] != exp[0] or g[1] != exp[1] \
                or not close(g[2], exp[2], tol=1e-9):
            mis.append((k, g, exp))
    report("fn_number_format", mis, n)


def audit_sql_identifier():
    """IDENTIFIER() indirection must equal the direct group-count."""
    from collections import Counter
    c = Counter(st for (st,) in rows(
        f"SELECT o_orderstatus FROM '{SF}/orders.parquet'"))
    got = dict(dump("sql_identifier"))
    mis = [] if got == dict(c) else [("groups", got, dict(c))]
    report("sql_identifier", mis, len(c))


def audit_observe_metrics():
    """The observed metric map must equal the plain aggregates."""
    n_rows = cents = n_f = 0
    d_min = d_max = None
    for st, p, d in rows("SELECT o_orderstatus, o_totalprice, o_orderdate "
                         f"FROM '{SF}/orders.parquet'"):
        n_rows += 1
        cents += math.floor(p * 100 + 0.5)
        n_f += 1 if st == "F" else 0
        d_min = d if d_min is None or d < d_min else d_min
        d_max = d if d_max is None or d > d_max else d_max
    got = dump("etl_observe_metrics")[0]
    exp = (n_rows, cents / 100.0, n_f,
           d_min.strftime("%Y-%m-%d"), d_max.strftime("%Y-%m-%d"))
    mis = []
    if got[0] != exp[0] or not close(got[1], exp[1]) or got[2] != exp[2] \
            or got[3] != exp[3] or got[4] != exp[4]:
        mis.append((got, exp))
    report("etl_observe_metrics", mis, 5)


def audit_variant_explode():
    """variant_explode replayed literally: sorted-key field order, pos
    0-based, canonical JSON value rendering."""
    exp = []
    for e, v, t, u in sorted(rows(
            "SELECT event_id, value, event_type, user_id "
            f"FROM '{SF}/events.parquet' WHERE event_id < 300")):
        exp.append((e, 0, "amt", str(math.floor(v * 100 + 0.5))))
        exp.append((e, 1, "et", f'"{t}"'))
        exp.append((e, 2, "grp", str(u % 5)))
    got = [tuple(r) for r in dump("udtf_variant_explode")]
    mis = [] if got == exp else [("rows", len(got), len(exp),
                                  got[:2], exp[:2])]
    report("udtf_variant_explode", mis, 4 * len(exp))


def audit_length_units():
    """Char/byte/bit lengths replayed with Python's own UTF-8 machinery."""
    mis, n = [], 0
    got = {r[0]: r[1:] for r in dump("fn_length_units")}
    for d, t in rows(f"SELECT doc_id, text FROM '{SF}/documents.parquet'"):
        s = t + "汉" * (d % 4)
        b = len(s.encode("utf-8"))
        exp = (len(s), b, b * 8, s[:3], s[-2:])
        n += 5
        if got.get(d) != exp:
            mis.append((d, got.get(d), exp))
    report("fn_length_units", mis, n)


def audit_glob_options():
    """The recursive glob-filtered read must equal the F+O order rows."""
    exp = sorted((k, st) for k, st in rows(
        f"SELECT o_orderkey, o_orderstatus FROM '{SF}/orders.parquet'")
        if st in ("F", "O"))
    got = sorted((r[0], r[1]) for r in dump("scan_glob_options"))
    mis = [] if got == exp else [("rows", len(got), len(exp))]
    report("scan_glob_options", mis, len(exp))


def audit_lateral_alias():
    """The alias chain cents -> total_usd -> avg_usd replayed literally."""
    agg = {}
    for st, p in rows(
            f"SELECT o_orderstatus, o_totalprice FROM '{SF}/orders.parquet'"):
        c, n = agg.get(st, (0, 0))
        agg[st] = (c + math.floor(p * 100 + 0.5), n + 1)
    mis = []
    for st, cents, usd, n, avg in dump("sql_lateral_alias"):
        ec, en = agg[st]
        eu = ec / 100.0
        ea = round(eu / en, 4)
        if cents != ec or n != en or not close(usd, eu, 1e-9) \
                or not close(avg, ea, 1e-6):
            mis.append((st, (cents, usd, n, avg), (ec, eu, en, ea)))
    report("sql_lateral_alias", mis, 4 * len(agg))


def audit_matryoshka():
    """MRL recall@10 replayed literally: left-fold float dots (Spark's
    summation order), shortest-repr HALF_UP 4-dp rounding (Spark's
    round()), id tiebreak, set overlap."""
    from decimal import Decimal, ROUND_HALF_UP

    def r4(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.0001"),
                                                rounding=ROUND_HALF_UP))

    emb = {v: list(map(float, e)) for v, e in rows(
        f"SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM '{SF}/embeddings.parquet'")}

    def top10(dim):
        out = {}
        for p in (v for v in emb if v < 20):
            pv = emb[p][:dim]
            scored = []
            for c, cv in emb.items():
                if c == p:
                    continue
                dot = 0.0
                for a, b in zip(pv, cv[:dim]):
                    dot += a * b
                np_ = math.sqrt(sum_lf(x * x for x in pv))
                nc = math.sqrt(sum_lf(x * x for x in cv[:dim]))
                scored.append((-r4(dot / (np_ * nc)), c))
            out[p] = {c for _, c in sorted(scored)[:10]}
        return out

    def sum_lf(it):
        s = 0.0
        for x in it:
            s += x
        return s

    tf, tt = top10(64), top10(16)
    exp = {p: len(tf[p] & tt[p]) for p in tf}
    mis = []
    for p, n, rec in dump("emb_matryoshka_recall"):
        if exp.get(p) != n or not close(rec, n / 10.0, tol=1e-9):
            mis.append((p, (n, rec), exp.get(p)))
    report("emb_matryoshka_recall", mis, 2 * len(exp))


def audit_foreachbatch_upsert():
    """The upsert table's merged (n_events, cents) per user replayed as a
    plain per-user fold over the raw events — independent of both the
    sink's merge protocol and the oracle's SQL tree."""
    import math
    agg = {}
    for u, v in rows(f"SELECT user_id, value FROM '{SF}/events.parquet'"):
        n, c = agg.get(u, (0, 0))
        agg[u] = (n + 1, c + math.floor(v * 100 + 0.5))
    mis = []
    got = {r[0]: (r[1], r[2]) for r in dump("stream_foreachbatch_upsert")}
    if set(got) != set(agg):
        mis.append(("keys", len(got), len(agg)))
    for u, e in agg.items():
        if got.get(u) != e:
            mis.append((u, got.get(u), e))
    report("stream_foreachbatch_upsert", mis, 2 * len(agg))


def audit_state_rescale():
    """The 4->8-partition state migration's stitched counts must equal a
    plain per-user count over ALL events (no key lost or double-counted
    across the re-layout)."""
    agg = {}
    for (u,) in rows(f"SELECT user_id FROM '{SF}/events.parquet'"):
        agg[u] = agg.get(u, 0) + 1
    got = {r[0]: r[1] for r in dump("stream_state_rescale")}
    mis = []
    if set(got) != set(agg):
        mis.append(("keys", len(got), len(agg)))
    for u, e in agg.items():
        if got.get(u) != e:
            mis.append((u, got.get(u), e))
    report("stream_state_rescale", mis, len(agg))


def audit_variant_shredded():
    """The shredded-roundtrip aggregate replayed from the raw JSON props
    with Python's own json machinery."""
    import math, json
    agg = {}
    for t, v, pr in rows(
            f"SELECT event_type, value, props FROM '{SF}/events.parquet'"):
        n, c, k = agg.get(t, (0, 0, 0))
        agg[t] = (n + 1, c + math.floor(v * 100 + 0.5),
                  k + int(json.loads(pr)["k"]))
    got = {r[0]: (r[1], r[2], r[3]) for r in dump("scan_variant_shredded")}
    mis = []
    if set(got) != set(agg):
        mis.append(("keys", sorted(got), sorted(agg)))
    for t, e in agg.items():
        if got.get(t) != e:
            mis.append((t, got.get(t), e))
    report("scan_variant_shredded", mis, 3 * len(agg))



AUDITS = {
    "fn_interval_arith": audit_interval_arith,
    "fn_timestamp_ntz": audit_timestamp_ntz,
    "fn_number_format": audit_number_format,
    "sql_identifier": audit_sql_identifier,
    "etl_observe_metrics": audit_observe_metrics,
    "emb_matryoshka_recall": audit_matryoshka,
    "udtf_variant_explode": audit_variant_explode,
    "fn_length_units": audit_length_units,
    "scan_glob_options": audit_glob_options,
    "sql_lateral_alias": audit_lateral_alias,
    "agg_theta_setops": audit_theta_setops,
    "agg_approx_topk": audit_approx_topk,
    "agg_variant_group": audit_variant_group,
    "sql_scripting_while": audit_scripting_while,
    "stream_interval_join_tws": audit_tws_interval_join,
    "stream_tws_mapstate_counts": audit_tws_mapstate_counts,
    "scan_state_store": audit_state_store_scan,
    "stream_tws_initial_state": audit_tws_initial_state,
    "stream_stream_left_join": audit_stream_left_join,
    "stream_stream_full_join": audit_stream_full_join,
    "llm_unigram_lm_step": audit_unigram_lm,
    "udf_sql_scalar": audit_sql_udfs,
    "stats_bh_fdr": audit_bh_fdr,
    "emb_pq_train_kmeans": audit_pq_train_kmeans,
    "ml_gbt_stumps": audit_gbt_stumps,
    "llm_grpo_advantage": audit_grpo_advantage,
    "text_cdc_chunks": audit_cdc_chunks,
    "emb_random_projection": audit_random_projection,
    "ml_feature_hashing": audit_feature_hashing,
    "llm_pack_bfd": audit_pack_bfd,
    "text_lm_kneser_ney": audit_kneser_ney,
    "stats_sign_test": audit_sign_test,
    "events_conversion_window_sweep": audit_conversion_sweep,
    "events_weibull_fit": audit_weibull,
    "events_mix_shift": audit_mix_shift,
    "stats_price_elasticity": audit_elasticity,
    "stats_mood_median": audit_mood_median,
    "sim_ndcg": audit_ndcg,
    "text_heaps_law": audit_heaps,
    "stats_capture_recapture": audit_capture_recapture,
    "stats_bhattacharyya": audit_bhattacharyya,
    "agg_geo_harmonic_mean": audit_geo_harmonic,
    "ml_adaboost_stumps": audit_adaboost,
    "stats_tost_equivalence": audit_tost,
    "ts_forecast_metrics": audit_forecast_metrics,
    "stats_anderson_darling": audit_anderson_darling,
    "events_bass_diffusion": audit_bass,
    "ts_sample_entropy": audit_sampen,
    "stats_gamma_fit": audit_gamma_fit,
    "text_burstiness": audit_burstiness,
    "ts_croston": audit_croston,
    "sim_rank_fusion": audit_rank_fusion,
    "ml_ridge_regression": audit_ridge,
    "ts_haar_energy": audit_haar,
    "stats_fisher_exact": audit_fisher,
    "llm_bradley_terry": audit_bradley_terry,
    "stats_bartlett": audit_bartlett,
    "stats_theil_u": audit_theil_u,
    "ml_cohen_kappa": audit_cohen_kappa,
    "ts_kpss": audit_kpss,
    "ts_permutation_entropy": audit_perm_entropy,
    "text_yule_k": audit_yule_k,
    "ml_auc_pr": audit_auc_pr,
    "stats_cronbach_alpha": audit_cronbach,
    "llm_budget_fill": audit_budget_fill,
    "events_cmh_test": audit_cmh,
    "stats_breusch_pagan": audit_bp,
    "stats_wilson_ci": audit_wilson,
    "ts_diurnal_harmonic": audit_diurnal,
    "text_ttr_curve": audit_ttr,
    "stats_rate_ratio": audit_rate_ratio,
    "events_logrank_test": audit_logrank,
    "ml_cox_ph": audit_cox,
    "ml_tree_depth2": audit_tree2,
    "ml_lift_gains": audit_lift,
    "events_anomaly_esd": audit_esd,
    "ml_isotonic_calibration": audit_isotonic,
    "stats_negbin_fit": audit_negbin,
    "ml_cooks_distance": audit_cooks,
    "ml_gmm_em": audit_gmm,
    "ts_adf": audit_adf,
    "ml_logreg_newton": audit_logreg,
    "ml_pr_f1": audit_pr_f1,
    "stats_partial_corr": audit_partial_corr,
    "stats_grubbs": audit_grubbs,
    "ml_feature_vector": audit_feature_vector,
    "fn_array_higher_order": audit_array_higher_order,
    "events_ab_sequential_sprt": audit_sprt,
    "graph_degree_powerlaw": audit_degree_powerlaw,
    "ts_ar2_yule_walker": audit_ar2,
    "events_markov_steady": audit_markov_steady,
    "llm_lsh_recall_grid": audit_lsh_recall_grid,
    "stats_friedman_test": audit_friedman,
    "llm_dedup_family_overlap": audit_dedup_family,
    "events_ab_welch": audit_welch,
    "stats_jarque_bera": audit_jarque_bera,
    "agg_skew_kurtosis": audit_skew_kurtosis,
    "ts_mann_kendall": audit_mann_kendall,
    "ts_theil_sen": audit_theil_sen,
    "ts_autocorr": audit_autocorr,
    "stats_kendall_tau": audit_kendall_tau,
    "stats_cramers_v": audit_cramers_v,
    "events_ks_test": audit_ks_test,
    "ts_granger_lite": audit_granger,
    "stats_levene": audit_levene,
    "stats_kruskal_wallis": audit_kruskal,
    "events_overdispersion": audit_overdispersion,
    "stats_mutual_information": audit_mutual_information,
    "ts_ljung_box": audit_ljung_box,
    "stats_cohens_d": audit_cohens_d,
    "dq_drift_jsd": audit_drift_jsd,
    "dq_drift_psi": audit_drift_psi,
    "dq_benford": audit_benford,
    "agg_gini": audit_gini,
    "agg_theil_index": audit_theil,
    "stats_fdr_bh": audit_fdr_bh,
    "events_survival_km": audit_survival_km,
    "events_ab_cuped": audit_ab_cuped,
    "events_diff_in_diff": audit_diff_in_diff,
    "ts_chow_break": audit_chow_break,
    "events_ab_power": audit_ab_power,
    "ts_rsi": audit_rsi,
    "ts_drawdown": audit_drawdown,
    "events_pareto_coverage": audit_pareto,
    "text_zipf_slope": audit_zipf,
    "ts_variance_ratio": audit_variance_ratio,
    "stats_runs_test": audit_runs_test,
    "ts_ewma": audit_ewma,
    "ts_cusum": audit_cusum,
    "ts_holt": audit_holt,
    "win_hampel": audit_hampel,
    "events_decay_score": audit_decay_score,
    "ts_backtest_snaive": audit_backtest_snaive,
    "agg_corr_matrix": audit_corr_matrix,
    "agg_winsorize": audit_winsorize,
    "agg_exact_deciles": audit_exact_deciles,
    "ts_pacf": audit_pacf,
    "ml_naive_bayes": audit_naive_bayes,
    "events_srm_check": audit_srm_check,
    "dq_value_entropy": audit_value_entropy,
    "events_funnel_latency": audit_funnel_latency,
    "events_entropy_rate": audit_entropy_rate,
    "events_inter_arrival": audit_inter_arrival,
    "events_new_vs_returning": audit_new_vs_returning,
    "events_cohort_ltv": audit_cohort_ltv,
    "stream_rate_limit": audit_rate_limit,
    "stream_stateful_funnel": audit_stateful_funnel,
    "events_burst_rate": audit_burst_rate,
    "dq_sequence_gaps": audit_sequence_gaps,
    "llm_mix_temperature": audit_mix_temperature,
    "text_readability": audit_readability,
    "llm_domain_mix": audit_domain_mix,
    "dq_anomaly_iqr": audit_anomaly_iqr,
    "dq_outlier_zscore": audit_outlier_zscore,
    "agg_mode": audit_mode,
    "text_hapax_ratio": audit_hapax,
    "text_source_kl": audit_source_kl,
    "agg_histogram": audit_histogram,
    "win_gap_islands": audit_gap_islands,
    "ts_bollinger": audit_bollinger,
    "events_attribution": audit_attribution,
    "events_uplift_by_segment": audit_uplift_by_segment,
    "llm_mixture_kl": audit_mixture_kl,
    "events_markov_transitions": audit_markov_transitions,
    "dq_freshness": audit_freshness,
    "agg_argminmax": audit_argminmax,
    "events_dow_hour_matrix": audit_dow_hour_matrix,
    "graph_degree_topk": audit_degree_topk,
    "graph_reciprocity": audit_reciprocity,
    "graph_neighbor_jaccard": audit_neighbor_jaccard,
    "ts_peaks": audit_ts_peaks,
    "agg_aging_buckets": audit_aging_buckets,
    "events_error_rate_slo": audit_error_rate_slo,
    "events_type_overlap": audit_type_overlap,
    "fn_trigram_similarity": audit_trigram_similarity,
    "ts_spearman": audit_spearman,
    "ts_ohlc_resample": audit_ohlc,
    "agg_histogram2d": audit_histogram2d,
    "ts_anova_dow": audit_anova_dow,
    "ts_changepoint": audit_changepoint,
    "text_fingerprint": audit_fingerprint,
    "llm_dedup_near": audit_dedup_near,
    "ts_durbin_watson": audit_durbin_watson,
    "ts_hurst": audit_hurst,
    "stats_mcnemar": audit_mcnemar,
    "stats_cochran_q": audit_cochran_q,
    "ml_roc_auc": audit_roc_auc,
    "ml_calibration_ece": audit_ece,
    "ml_kfold_cv": audit_kfold_cv,
    "emb_silhouette": audit_silhouette,
    "stream_foreachbatch_upsert": audit_foreachbatch_upsert,
    "stream_state_rescale": audit_state_rescale,
    "scan_variant_shredded": audit_variant_shredded,
}

for name, fn in AUDITS.items():
    if ONLY and name not in ONLY:
        continue
    try:
        fn()
    except Exception as e:  # noqa: BLE001 - audit must report, not die
        fails.append(name)
        checked.append(name)
        print(f"ERROR {name}: {e}")

print(f"\n{len(checked) - len(fails)}/{len(checked)} audits agree")
sys.exit(1 if fails else 0)
