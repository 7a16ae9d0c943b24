#!/usr/bin/env bash
# Round-15 gate guard (VERDICT r14 next-round #4): the last two rounds'
# official-record losses were both LOAD-triggered (a ~2x-loaded driver
# box blew the Verify wall and the Bench budget). This drill runs both
# gate mains under a deliberate CPU hog (16 spinners) and asserts both
# artifacts still parse and are non-empty — proving the gates degrade
# (fewer passes, budget skips recorded honestly) instead of zeroing.
set -euo pipefail
cd "$(dirname "$0")/.."
SUBSET="${1:-q01_pricing_summary,q03_star_join,q07_top_events,q23_rolling_stats}"
OUT=/tmp/graft_gate_drill
rm -rf "$OUT"; mkdir -p "$OUT"

# the hog: 16 busy-loops, cleaned up on any exit
HOGS=()
for i in $(seq 16); do
  (while :; do :; done) & HOGS+=($!)
done
trap 'kill "${HOGS[@]}" 2>/dev/null || true' EXIT
echo "[drill] 16 CPU spinners up"

echo "[drill] Verify under load..."
SPARK_GRAFT_CPUS=8 SPARK_GRAFT_ONLY="$SUBSET" \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.001 $OUT/verify" >/dev/null 2>&1 || true
python3 - "$OUT" <<'EOF'
import json, sys, os
out = sys.argv[1]
d = json.load(open(f"{out}/verify/oracle_sql.json"))
assert len(d) >= 1, "verify: oracle_sql.json empty under load"
m = json.load(open(f"{out}/verify/verify_meta.json"))
assert m["completed"] >= 1, f"verify: zero completed under load: {m}"
print(f"[drill] verify OK under load: {m['completed']} completed, "
      f"{len(m['skipped'])} skipped, {len(m['failed'])} failed")
EOF
python3 tools/compare.py /root/testdata/sf0.001 "$OUT/verify" | tail -1

echo "[drill] Bench under load..."
BOUT=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_CPUS=8 \
  SPARK_GRAFT_ONLY="$SUBSET" SPARK_GRAFT_PASSES=2 SPARK_GRAFT_BUDGET=300 \
  sbt -batch "runMain graft.Bench" 2>/dev/null) || true
LAST=$(printf '%s\n' "$BOUT" | grep -v '^\s*$' | tail -n 1)
python3 - "$LAST" <<'EOF'
import json, sys
d = json.loads(sys.argv[1])
for k in ("metric", "value", "failures", "skipped", "single_pass", "n_queries"):
    assert k in d, f"bench summary missing {k!r}: {sys.argv[1]}"
assert d["failures"] == 0, f"bench under load reported real failures: {sys.argv[1]}"
print(f"[drill] bench OK under load: n={d['n_queries']} value={d['value']}s "
      f"skipped={d['skipped']} single_pass={d['single_pass']}")
EOF
echo "GATE DRILL OK: both artifacts valid and non-empty under 16-spinner load"
