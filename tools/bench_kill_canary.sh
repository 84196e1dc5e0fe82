#!/usr/bin/env bash
# Kill-harness canary for the bench stdout contract (r19 verdict #1).
#
# BENCH_r19.json was rc=124 / parsed:null — a driver-side timeout in a
# slow host window destroyed the round's official bench record, because
# Bench printed its only parseable stdout line LAST, after every series.
# Bench now emits one self-contained medians line per stage the moment it
# completes (warmup → b2b → rr → noop), each superseding the last. This
# canary proves that contract the hard way: run the REAL bench, SIGKILL
# it at each deadline, keep only the last 2 KB of combined stdout+stderr
# (the driver's tail budget), and require that the tail's last complete
# {"metric":"total",...} line parses with real numbers.
#
# A deadline that lands before the FIRST emission (JVM + session + the
# warm-up pass still running) yields no line by construction — the canary
# records that honestly as NO-EMISSION-YET instead of failing, and FAILS
# if any line was emitted but the 2 KB tail does not parse.
#
# Usage: tools/bench_kill_canary.sh [deadline_seconds...]
#        default deadlines: 60 120 300
#   env: SF (default /root/testdata/sf0.1), CPUS (default 32),
#        ITERS (default 3)
# Runs java directly against target/scala-2.13/classes + /opt/spark/jars
# (no sbt: the kill must hit the bench JVM, not a launcher).
set -uo pipefail
cd "$(dirname "$0")/.."

SF=${SF:-/root/testdata/sf0.1}
CPUS=${CPUS:-32}
ITERS=${ITERS:-3}
DEADLINES=("$@")
[ ${#DEADLINES[@]} -eq 0 ] && DEADLINES=(60 120 300)

CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | paste -sd:)"
OPENS=(
  --add-opens=java.base/java.lang=ALL-UNNAMED
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED
  --add-opens=java.base/java.io=ALL-UNNAMED
  --add-opens=java.base/java.net=ALL-UNNAMED
  --add-opens=java.base/java.nio=ALL-UNNAMED
  --add-opens=java.base/java.util=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED
  --add-opens=java.base/sun.security.action=ALL-UNNAMED
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED
)

fail=0
for T in "${DEADLINES[@]}"; do
  out=$(mktemp /tmp/bench_kill_XXXX.log)
  med=$(mktemp /tmp/bench_kill_med_XXXX.json)
  echo "== kill canary: deadline ${T}s (sf=$SF cpus=$CPUS iters=$ITERS) =="
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" SPARK_GRAFT_ITERS="$ITERS" \
  SPARK_GRAFT_MEDIANS_FILE="$med" SPARK_GRAFT_RUNS_FILE=/dev/null \
    timeout -s KILL "$T" \
    java -Xmx8g "${OPENS[@]}" -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench \
      > "$out" 2>&1
  rc=$?
  emitted=$(grep -c '"metric":"total"' "$out" || true)
  tail -c 2048 "$out" > "$out.tail"
  verdict=$(python3 - "$out.tail" "$emitted" <<'PY'
import json, sys
tail = open(sys.argv[1], errors="replace").read()
emitted = int(sys.argv[2])
best = None
for line in tail.splitlines():
    i = line.find('{"metric":"total"')
    if i < 0:
        continue
    try:
        best = json.loads(line[i:])
    except Exception:
        continue
def numbers(d):
    qs = d.get("queries") or d.get("queries_noop") or {}
    return len([v for v in qs.values() if isinstance(v, (int, float)) and v >= 0])
if best is not None and numbers(best) > 0:
    print(f"PARSEABLE series={best.get('series','count')} value={best.get('value')} "
          f"queries={numbers(best)}")
elif emitted == 0:
    print("NO-EMISSION-YET (killed before the first stage completed)")
else:
    print("FAIL (lines were emitted but the 2 KB tail does not parse)")
PY
)
  echo "  rc=$rc emitted_lines=$emitted -> $verdict"
  case "$verdict" in FAIL*) fail=1;; esac
  rm -f "$out" "$out.tail" "$med"
done
if [ "$fail" -ne 0 ]; then
  echo "== kill canary: FAIL =="
  exit 1
fi
echo "== kill canary: PASS =="
