#!/bin/bash
# Driver-gate stress harness: runs the driver's EXACT gate loop — all
# registered queries, one SparkSession, sf0.01 — repeatedly, under
# induced CPU load and task-retry injection, and compares every
# result against the DuckDB oracle through BOTH parquet read paths
# (tools/compare.py). On a mismatch the differing rows are dumped
# next to the hashes.
#
# This exists because "it passed once locally" is demonstrated to be
# insufficient evidence (VERDICT r9): q_incremental_agg failed the
# driver's gate twice while local single runs were green. A query is
# only believed deterministic after it survives N full-gate runs with
#   - background CPU load (LOAD_PROCS busy spinners),
#   - forced task retries (graft.tools.TaskRetryInjector kills a
#     deterministic subset of attempt-0 tasks; spark.task.maxFailures
#     raised so the retries are routine, not fatal),
#   - the dual-path hash compare.
#
# Usage: tools/gate_stress.sh [iters] [sf_dir] [query,query,...]
#   iters    default 10
#   sf_dir   default /root/testdata/sf0.01
#   queries  optional comma list to restrict (default: full gate)
set -u
cd "$(dirname "$0")/.."

ITERS="${1:-10}"
SF_DIR="${2:-/root/testdata/sf0.01}"
QUERIES="${3:-}"
LOAD_PROCS="${LOAD_PROCS:-8}"
WORK="${GATE_STRESS_DIR:-/tmp/gate_stress.$$}"
mkdir -p "$WORK"

# GRAFT_CLASSES overrides the classes dir — point it at a frozen
# snapshot when sbt may recompile target/ mid-run
CP="${GRAFT_CLASSES:-target/scala-2.13/classes}:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

# ---- induced CPU load: LOAD_PROCS busy spinners for the whole run
LOAD_PIDS=()
for i in $(seq 1 "$LOAD_PROCS"); do
  python3 -c 'while True: pass' &
  LOAD_PIDS+=($!)
done
cleanup() { kill "${LOAD_PIDS[@]}" 2>/dev/null; }
trap cleanup EXIT
echo "[gate_stress] $LOAD_PROCS load spinners up; $ITERS iterations at $SF_DIR"

FAILED=0
for it in $(seq 1 "$ITERS"); do
  OUT="$WORK/iter$it"
  ERR="$WORK/iter$it.err"
  rm -rf "$OUT"
  # the driver's loop: ONE session, every query, task-retry injection on
  java $ADD_OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx"${SPARK_DRIVER_MEM:-8g}" \
    -Dspark.extraListeners=graft.tools.TaskRetryInjector \
    -Dspark.task.maxFailures=4 \
    -Dspark.graft.inject.taskFailureMod="${INJECT_MOD:-11}" \
    -cp "$CP" graft.Verify "$SF_DIR" "$OUT" $QUERIES 2>"$ERR"
  INJ=$(grep -c "graft-inject" "$ERR" || true)
  if [ "$INJ" -eq 0 ]; then
    echo "[gate_stress] iter $it: ERROR — no injected task kills observed; not a valid stress run"
    FAILED=1
  fi
  if python3 tools/compare.py "$SF_DIR" "$OUT" > "$WORK/iter$it.cmp" 2>&1; then
    echo "[gate_stress] iter $it: ALL GREEN (injected kills: $INJ)"
  else
    echo "[gate_stress] iter $it: FAILURES (injected kills: $INJ) — row dumps in $WORK/iter$it.cmp:"
    grep -E "FAIL|ERROR" "$WORK/iter$it.cmp" | head -20
    FAILED=1
  fi
done

if [ "$FAILED" -eq 0 ]; then
  echo "[gate_stress] PASS: $ITERS/$ITERS full-gate runs green under load + retry injection"
else
  echo "[gate_stress] FAIL: see $WORK/iter*.cmp"
fi
exit "$FAILED"
