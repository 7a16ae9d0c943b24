#!/usr/bin/env bash
# Gate guard (VERDICT r13 what's-wrong #1 + r14 what's-wrong #2): the
# driver parses the LAST stdout line of a Bench run as JSON out of a
# 2000-char tail. This check replays that contract end-to-end: run
# Bench on a small subset, take the last non-empty stdout line, require
# it to parse as JSON and carry the verdict fields — including the
# round-15 "skipped" / "single_pass" fields that make budget exhaustion
# distinguishable from genuinely broken queries (r14 recorded 116
# budget-skips as "failures").
set -euo pipefail
cd "$(dirname "$0")/.."
SUBSET="${1:-q01_pricing_summary,q23_rolling_stats}"
OUT=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_CPUS=8 \
  SPARK_GRAFT_ONLY="$SUBSET" SPARK_GRAFT_PASSES=1 \
  sbt -batch "runMain graft.Bench" 2>/dev/null)
LAST=$(printf '%s\n' "$OUT" | grep -v '^\s*$' | tail -n 1)
python3 - "$LAST" <<'EOF'
import json, sys
line = sys.argv[1]
d = json.loads(line)  # raises -> nonzero exit
for k in ("metric", "value", "failures", "skipped", "single_pass", "n_queries"):
    assert k in d, f"summary line missing {k!r}: {line}"
assert d["failures"] == 0, f"bench reported failures: {line}"
assert d["skipped"] == 0, f"bench skipped queries on an idle subset: {line}"
# PASSES=1 -> every timing rests on one pass and must be flagged
assert d["single_pass"] == d["n_queries"], \
    f"single-pass run must flag every query single_pass: {line}"
print(f"BENCH TAIL OK: n_queries={d['n_queries']} value={d['value']}s "
      f"skipped={d['skipped']} single_pass={d['single_pass']}")
EOF
# bench_out.json must carry the NAME lists (skipped/failed/single_pass)
python3 - <<'EOF'
import json
d = json.loads(open("bench_out.json").read())
for k in ("failed", "skipped", "single_pass"):
    assert isinstance(d.get(k), list), f"bench_out.json missing list {k!r}"
print(f"BENCH_OUT OK: failed={d['failed']} skipped={d['skipped']} "
      f"single_pass={d['single_pass']}")
EOF
