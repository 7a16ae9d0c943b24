#!/usr/bin/env bash
# Gate guard for the ABNORMAL-termination path: the driver may kill a
# Bench run mid-board (budget ceilings, restarts). The shutdown hook
# must still make the true LAST stdout line a parseable summary — with
# the round-15 fields — reflecting whatever was measured up to the kill
# (never-attempted queries counted as "skipped", not "failures").
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/graft_bench_term.out
: > "$OUT"

CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_CPUS=8 SPARK_GRAFT_PASSES=3 \
  SPARK_GRAFT_ONLY=q01_pricing_summary,q02_monthly_shipments,q03_star_join,q04_revenue_by_nation,q05_bucket_self_join,q06_active_users,q07_top_events,q08_leaderboard \
  java -cp "$CP" $ADD_OPENS -Xmx8g -Dspark.ui.enabled=false \
  graft.Bench > "$OUT" 2>/tmp/graft_bench_term.err &
PID=$!

# wait until at least two queries have a timing, then SIGTERM mid-board
for i in $(seq 1 480); do
  n=$(grep -c "timed1" /tmp/graft_bench_term.err || true)
  if [ "$n" -ge 2 ]; then break; fi
  if ! kill -0 "$PID" 2>/dev/null; then break; fi
  sleep 0.25
done
kill -TERM "$PID" 2>/dev/null || true
wait "$PID" 2>/dev/null || true

LAST=$(grep -v '^\s*$' "$OUT" | tail -n 1)
python3 - "$LAST" <<'EOF'
import json, sys
line = sys.argv[1]
d = json.loads(line)  # raises -> nonzero exit
for k in ("metric", "value", "failures", "skipped", "single_pass", "n_queries"):
    assert k in d, f"terminated-run summary missing {k!r}: {line}"
assert d["failures"] == 0, f"kill mid-run must not invent failures: {line}"
assert d["skipped"] + d["single_pass"] > 0 or d["n_queries"] > 0, line
print(f"BENCH TERM OK: last stdout line parses after SIGTERM "
      f"(n={d['n_queries']} timed_value={d['value']} skipped={d['skipped']})")
EOF
