#!/usr/bin/env bash
# Round-15 gate guard (VERDICT r14 what's-wrong #1): CORRECTNESS_r14 was
# `{}` because a driver-side kill hit Verify before its single
# final-step oracle_sql.json write. The fix writes the map FIRST and
# atomically rewrites it restricted-to-attempted after EVERY completed
# dump. This test replays the failure: SIGKILL a Verify run mid-board
# and require the DuckDB compare to still emit a PASS row for every
# completed query and ZERO fails (no truncation noise).
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/graft_kill_test
rm -rf "$OUT"
SUBSET="${1:-q01_pricing_summary,q02_monthly_shipments,q03_star_join,q04_revenue_by_nation,q05_bucket_self_join,q06_active_users,q07_top_events,q08_leaderboard}"

# Run the class directly (not via sbt) so the kill -9 hits the Spark
# JVM itself, exactly like a driver kill. Same JDK17 add-opens set as
# build.sbt (spark-submit would normally inject these).
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS=8 SPARK_GRAFT_ONLY="$SUBSET" \
  java -cp "$CP" $ADD_OPENS -Xmx8g \
  graft.Verify /root/testdata/sf0.001 "$OUT" 2>/dev/null &
PID=$!

# wait until >=2 dumps are complete, then kill -9 mid-board
for i in $(seq 1 240); do
  n=$( (ls "$OUT"/*/_SUCCESS 2>/dev/null || true) | wc -l)
  if [ "$n" -ge 2 ] && [ "$n" -lt 8 ]; then break; fi
  if ! kill -0 "$PID" 2>/dev/null; then break; fi
  sleep 0.25
done
kill -9 "$PID" 2>/dev/null || true
wait "$PID" 2>/dev/null || true

[ -s "$OUT/oracle_sql.json" ] || { echo "KILL TEST FAIL: no oracle_sql.json"; exit 1; }
python3 - "$OUT" <<'EOF'
import json, sys
d = json.load(open(f"{sys.argv[1]}/oracle_sql.json"))
assert len(d) >= 1, "oracle_sql.json empty after kill"
print(f"oracle_sql.json valid after SIGKILL: {len(d)} attempted queries")
EOF
RES=$(python3 tools/compare.py /root/testdata/sf0.001 "$OUT")
echo "$RES"
echo "$RES" | grep -qE "^== [1-9][0-9]* pass, 0 fail" \
  || { echo "KILL TEST FAIL: compare did not report all-PASS partial gate"; exit 1; }
echo "KILL TEST OK: mid-board SIGKILL left a valid all-PASS partial record"
