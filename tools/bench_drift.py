#!/usr/bin/env python3
"""Three-way bench drift diff (r15, the r14 verdict's ask #4).

The last two verdicts each had to hand-compute the same analysis:
driver-run bench numbers vs the builder's committed run at HEAD vs the
committed previous round, to separate REAL regressions from shared-box
drift. A row that "regressed" 0.4->1.1 s inside a run whose MEDIAN
common-key ratio is 0.85 moved against a falling tide — a watch item,
not a code bug; a row that regresses against a flat median is real.

Usage:
    python3 tools/bench_drift.py SPEC SPEC [SPEC ...]

Each SPEC is either a JSON file path or a git "rev:path" (resolved via
`git show`). Accepted JSON shapes (auto-detected):
  - a bench-v3 full map: {"queries": {name: sec, ...}, ...}
    (BENCH_FULL.json — both the builder's committed runs and the
    driver's clobbered artifact use this)
  - a driver wrapper: {"tail": "...", "parsed": ...} — the per-query
    map is taken from "parsed" if present, else the LAST
    {"metric":...} line inside "tail" (driver parse is often null);
    summary-only lines (slowest-15) fall back to the "slowest" map
    with a warning that coverage is partial.

For every adjacent pair (A,B), (B,C), ... prints: common-key count,
MEDIAN and p90 of sec_A/sec_B, and outlier rows where the ratio
exceeds 1.5x in either direction AND the slower side is >0.8 s (the
same thresholds the r13/r14 verdicts used). Exit code 0 always — this
is a lens, not a gate; gates belong in specs.
"""
import json
import re
import statistics
import subprocess
import sys


def load_spec(spec: str) -> dict:
    try:
        with open(spec) as f:
            return json.load(f)
    except FileNotFoundError:
        if ":" not in spec:
            raise
    rev, _, path = spec.partition(":")
    raw = subprocess.check_output(["git", "show", f"{rev}:{path}"], text=True)
    return json.loads(raw)


def queries_of(spec: str, doc: dict) -> dict:
    if isinstance(doc.get("queries"), dict):
        return doc["queries"]
    parsed = doc.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return parsed["queries"]
    tail = doc.get("tail", "")
    metric_lines = [l for l in tail.splitlines() if '"metric"' in l]
    for line in reversed(metric_lines):
        m = re.search(r"\{.*\}", line)
        if not m:
            continue
        try:
            j = json.loads(m.group(0))
        except json.JSONDecodeError:
            continue
        if isinstance(j.get("queries"), dict):
            return j["queries"]
        if isinstance(j.get("slowest"), dict):
            print(f"WARN {spec}: only a slowest-{len(j['slowest'])} summary "
                  f"map available — drift stats are partial", file=sys.stderr)
            return j["slowest"]
    raise SystemExit(f"{spec}: no per-query map found")


def diff(name_a, qa, name_b, qb):
    common = sorted(set(qa) & set(qb))
    if not common:
        print(f"-- {name_a} vs {name_b}: NO common keys")
        return
    ratios = {k: qa[k] / qb[k] for k in common if qb[k] > 0}
    vals = sorted(ratios.values())
    med = statistics.median(vals)
    p90 = vals[int(len(vals) * 0.9)] if len(vals) > 1 else vals[0]
    print(f"-- {name_a} vs {name_b}: {len(common)} common keys, "
          f"MEDIAN ratio {med:.3f}, p90 {p90:.3f} "
          f"(only A {len(set(qa) - set(qb))}, only B {len(set(qb) - set(qa))})")
    outliers = [(k, r) for k, r in ratios.items()
                if (r > 1.5 or r < 1 / 1.5) and max(qa[k], qb[k]) > 0.8]
    # drift-correct: how far off the run-wide median is each outlier?
    for k, r in sorted(outliers, key=lambda kv: -abs(kv[1] - med)):
        tag = "REGRESSION" if r > med else "speedup"
        print(f"   {tag:>10} {k}: {qb[k]:.3f} -> {qa[k]:.3f} s "
              f"(ratio {r:.2f}, {r / med:.2f}x vs run median)")
    if not outliers:
        print("   no outliers (>1.5x in either direction at >0.8 s)")


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 1
    specs = argv[1:]
    loaded = [(s, queries_of(s, load_spec(s))) for s in specs]
    for (na, qa), (nb, qb) in zip(loaded, loaded[1:]):
        diff(na, qa, nb, qb)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
