#!/usr/bin/env python3
"""Per-query bench diff against the last PARSED driver artifact.

Usage: scripts/bench_diff.py [BENCH_rN.json] [bench_full.json]

The driver artifact (BENCH_rN.json) stores only a 2000-char stdout tail;
its per-query map is the slowest-first prefix that fit the budget, so
the diff covers exactly the queries the judge can see. The local
bench_full.json side carries every query. Ratios > 2x or absolute times
> 30 s are flagged — the r14 close rule (VERDICT r13 Next #2/#4).

Builder-side runs are TREND, not ground truth: machine noise at sf0.1
is ±30% run-to-run, and driver runs happen on a quieter host.
"""
import json
import re
import sys

ref_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r12.json"
cur_path = sys.argv[2] if len(sys.argv) > 2 else "target/bench_full.json"

ref = json.load(open(ref_path))
tail = ref.get("tail", "")
parsed = ref.get("parsed")
if parsed:
    ref_total = parsed["value"]
    ref_q = {k: float(v) for k, v in parsed.get("queries", {}).items()}
else:
    # parse the metric line out of the captured tail (its head may be
    # truncated; the end of the line is always intact)
    m = re.search(r'\\?"metric\\?":\\?"total\\?",\\?"value\\?":([0-9.]+)', tail)
    ref_total = float(m.group(1)) if m else float("nan")
    qseg = tail[tail.rfind('queries'):]
    ref_q = {k: float(v) for k, v in
             re.findall(r'\\?"([a-z0-9_]+)\\?":([0-9.]+)', qseg)}

cur = json.load(open(cur_path))
cur_q = {k: v["sec"] for k, v in cur["queries"].items()}

print(f"ref {ref_path}: total {ref_total} s over {len(ref_q)} visible queries")
print(f"cur {cur_path}: total {cur['total']} s over {cur['n_queries']} queries")
print(f"{'query':<28} {'ref_s':>8} {'cur_s':>8} {'ratio':>6}  flag")
flags = 0
for k in sorted(set(ref_q) | set(cur_q),
                key=lambda k: -(cur_q.get(k) or 0)):
    r, c = ref_q.get(k), cur_q.get(k)
    if r is None and c is not None and 0 <= c < 1.0:
        continue  # fast query invisible in the ref tail: nothing to say
        # (negative sec = FAILED must never take this exit)
    ratio = (c / r) if (r and c and r > 0) else None
    flag = ""
    if c is not None and c > 30.0:
        flag += " OVER-30s"
    if ratio is not None and ratio > 2.0:
        flag += " REGRESSED>2x"
    if c is not None and c < 0:
        flag += " FAILED"
    if flag:
        flags += 1
    print(f"{k:<28} {r if r is not None else '-':>8} "
          f"{c if c is not None else '-':>8} "
          f"{f'{ratio:.2f}' if ratio else '-':>6} {flag}")
print(f"\n{flags} flagged")
sys.exit(1 if flags else 0)
