#!/usr/bin/env bash
# Round-14 gate guard (VERDICT r13 what's-wrong #1): the driver parses
# the LAST stdout line of a Bench run as JSON out of a 2000-char tail.
# This check replays that contract end-to-end: run Bench on a small
# subset, take the last non-empty stdout line, require it to parse as
# JSON and carry the verdict fields.
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
for k in ("metric", "value", "failures", "n_queries"):
    assert k in d, f"summary line missing {k!r}: {line}"
assert d["failures"] == 0, f"bench reported failures: {line}"
print(f"BENCH TAIL OK: n_queries={d['n_queries']} value={d['value']}s")
EOF
