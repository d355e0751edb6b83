#!/usr/bin/env bash
# Round-start preflight: catch the two failure modes that cost rounds
# 8-10 their gate evidence BEFORE building anything new.
#
#  1. HEAD must compile — the driver's end-of-round snapshot commits the
#     working tree verbatim, and one type error zeroes every
#     CORRECTNESS/BENCH artifact until someone notices (r8/r9).
#  2. The driver can regenerate /root/testdata between rounds with
#     different physical parquet schemas (events.ts changed
#     TIMESTAMP(NANOS) -> TIMESTAMP micros before r10, breaking 12
#     tests at a green HEAD). Run the suite against the CURRENT data,
#     then eyeball the schema dump if anything timestamp-shaped fails.
#
# Usage: scripts/preflight.sh   (from the repo root; ~6 min)
set -u

echo "== 1/4 compile"
sbt -batch compile || exit 1

echo "== 2/4 testdata physical schemas (compare against Tables.load assumptions)"
# failure-gated: a missing python3/duckdb or absent parquet must fail the
# preflight, not let it print GREEN without the schema evidence this
# script exists to capture
python3 - <<'EOF' || exit 1
import duckdb
for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]:
    d = duckdb.sql(
        f"DESCRIBE SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'"
    ).fetchall()
    print(f"{t}: " + ", ".join(f"{c[0]}:{c[1]}" for c in d))
EOF

echo "== 3/4 full unit suite"
sbt -batch test || exit 1

echo "== 4/4 oracle smoke (3 queries spanning scan/join/edit paths)"
SPARK_GRAFT_CPUS=8 sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.01 target/preflight q01_pricing_summary e02_sessionize d41_edit_pairs" \
  || exit 1
python3 scripts/check.py /root/testdata/sf0.01 target/preflight || exit 1

echo "PREFLIGHT GREEN"
