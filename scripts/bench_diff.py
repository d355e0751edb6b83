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


def load_driver_artifact(path):
    """(total, {query: sec}) from a driver BENCH_rN.json."""
    ref = json.load(open(path))
    tail = ref.get("tail", "")
    parsed = ref.get("parsed")
    if parsed:
        return parsed["value"], {k: float(v)
                                 for k, v in parsed.get("queries", {}).items()}
    # parse the metric line out of the captured tail (its head may be
    # truncated; the end of the line is always intact)
    m = re.search(r'\\?"metric\\?":\\?"total\\?",\\?"value\\?":([0-9.]+)', tail)
    total = float(m.group(1)) if m else float("nan")
    qseg = tail[tail.rfind('queries'):]
    return total, {k: float(v) for k, v in
                   re.findall(r'\\?"([a-z0-9_]+)\\?":([0-9.]+)', qseg)}


def spikes(driver_path, close_paths):
    """Driver-artifact spike adjudication (VERDICT r16 Next #6): flag
    every query whose DRIVER reading exceeds its same-tree close-run
    minimum by >3x — the d43/d55 class, where the driver artifact
    carries run-context elevation none of the committed close runs
    show. Mechanical output for STATUS: per suspect, the driver
    reading, the close min, and every close sample.
    Exit 0 always — spikes are adjudication input, not a gate."""
    _, drv = load_driver_artifact(driver_path)
    closes = {}
    for p in close_paths:
        b = json.load(open(p))
        for k, v in b["queries"].items():
            closes.setdefault(k, []).append((v["sec"], p))
    suspects = []
    for k, d in sorted(drv.items(), key=lambda kv: -kv[1]):
        samples = closes.get(k)
        if not samples or d <= 0:
            continue
        cmin = min(s for s, _ in samples)
        # driver floor 1.0s: a sub-second driver reading at 3x a tiny
        # close min is scheduler noise; a MULTI-second driver reading
        # over a sub-second close min (the d55 class, 0.19s -> 3.41s)
        # is exactly the context elevation this exists to catch
        if d >= 1.0 and d > 3.0 * cmin:
            suspects.append((k, d, cmin, samples))
    print(f"driver {driver_path} vs close min over {len(close_paths)} "
          f"same-tree runs ({len(drv)} driver-visible queries)")
    if not suspects:
        print("no driver-artifact spikes >3x close min — "
              "nothing to adjudicate")
        return
    print(f"{len(suspects)} SUSPECT(S) (driver >3x close min — record "
          "in STATUS, per VERDICT r16 Next #6):")
    import os
    for k, d, cmin, samples in suspects:
        ss = [s for s, _ in samples]
        # per-query run coverage (VERDICT r17 stretch #9): close runs
        # from an earlier tree may predate a query entirely — say
        # which runs actually contain it so suspect ratios never
        # silently mix trees
        n_runs = len(set(p for _, p in samples))
        cover = f"runs {n_runs}/{len(close_paths)}"
        if n_runs < len(close_paths):
            cover += " (" + ",".join(sorted(
                os.path.basename(p) for _, p in samples)) + ")"
        print(f"  {k:<28} driver {d:>7.3f}s  close_min {cmin:>7.3f}s  "
              f"ratio {d / cmin:>5.2f}x  close samples "
              f"{[round(s, 3) for s in sorted(ss)]}  {cover}")


if len(sys.argv) > 1 and sys.argv[1] == "--spikes":
    # Usage: bench_diff.py --spikes BENCH_rN.json bench/bench_full_rN_*.json
    spikes(sys.argv[2], sys.argv[3:])
    sys.exit(0)

ref_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r12.json"
cur_path = sys.argv[2] if len(sys.argv) > 2 else "target/bench_full.json"

ref_total, ref_q = load_driver_artifact(ref_path)

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
