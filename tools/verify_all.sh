#!/usr/bin/env bash
# One-command verify gate — runs the FULL recipe and fails loudly on any
# stage, so no commit ships on a partial check:
#
#   0. tools/leakcopy_check.py (leak + verbatim-reference-line scan over
#      tracked files — mirrors the driver's LEAKCHECK/COPYCHECK sweeps
#      so a leak can't sit in the repo between rounds)
#   1. graft.Verify at sf0.01  (dump every query result + oracle SQL)
#   2. graft.Bench plans-only  (dump formatted plans at the bench SF)
#   3. sbt test                (all operator specs)
#   4. tools/check.py          (DuckDB oracle compare; exits 1 on mismatch)
#   5. tools/plan_digest.py + diff -rq vs plans/  (plan-shape regression)
#
# Stages 1-3 share ONE sbt batch invocation (cold JVM start costs ~2 min;
# sbt batch mode aborts the command list on the first failing command and
# exits nonzero). The timed bench is NOT part of the gate — plan digests
# catch shape regressions cheaply; run `runMain graft.Bench` separately
# when numbers are the question.
#
# Usage: tools/verify_all.sh            (from anywhere; cd's to the repo)
#   env overrides: SF_SMALL, SF_BENCH, OUT, PLANS
set -euo pipefail
cd "$(dirname "$0")/.."

SF_SMALL=${SF_SMALL:-/root/testdata/sf0.01}
SF_BENCH=${SF_BENCH:-/root/testdata/sf0.1}
OUT=${OUT:-/tmp/verify_out}
PLANS=${PLANS:-/tmp/graft_plans}
DIGESTS=${DIGESTS:-/tmp/graft_plan_digests}
rm -rf "$OUT" "$PLANS" "$DIGESTS"

stage() { printf '\n== verify_all: %s ==\n' "$1"; }

stage "leak/copy scan (tools/leakcopy_check.py)"
python3 tools/leakcopy_check.py

stage "Verify (sf=$SF_SMALL) + plan dump (sf=$SF_BENCH) + sbt test"
sbt -batch \
  "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"$SF_BENCH\", \"SPARK_GRAFT_CPUS\" -> \"8\", \"SPARK_GRAFT_PLANS_ONLY\" -> \"1\", \"SPARK_GRAFT_EXPLAIN_DIR\" -> \"$PLANS\")" \
  "runMain graft.Verify $SF_SMALL $OUT" \
  "runMain graft.Bench" \
  test

stage "DuckDB oracle compare"
python3 tools/check.py "$SF_SMALL" "$OUT"

stage "plan digest diff vs plans/"
python3 tools/plan_digest.py "$PLANS" "$DIGESTS"
# -x r*: per-round optimization deliverables (plans/r21/... formatted
# before/after plans) live under plans/ but are not digests
diff -rq -x 'r[0-9]*' plans "$DIGESTS"

# Opt-in scaling-slope probe (r18 verdict #3): SLOPE_MULT=3 tools/verify_all.sh
# Builds a referential-integrity-preserving mult-x copy of SF_BENCH
# (graft.ScaleTestData), runs the full rr-median suite at BOTH scales
# (ITERS=3 so the cold first pass is absorbed by the median; no noop
# series), then gates: any NON-exempt query whose slope exceeds
# mult x 1.5 — or any exempt query past its contract-quadratic budget
# mult^2 x 1.5, or any query erroring at scale — fails the recipe
# (tools/scaling_slope.py --gate; the four contract exemptions are
# pinned there). Opt-in like the lock soaks: two extra bench suites
# cost ~25-30 min, too slow for the per-commit gate, but a regression
# that turns a linear operator quadratic has no other gate until an
# sf1.0 run is re-done by hand.
if [[ -n "${SLOPE_MULT:-}" ]]; then
  stage "scaling-slope probe (mult=$SLOPE_MULT)"
  SLOPE_DIR=${SLOPE_DIR:-/tmp/graft_slope}
  rm -rf "$SLOPE_DIR"
  mkdir -p "$SLOPE_DIR"
  sbt -batch \
    "runMain graft.ScaleTestData $SF_BENCH $SLOPE_DIR/scaled $SLOPE_MULT" \
    "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"$SF_BENCH\", \"SPARK_GRAFT_CPUS\" -> \"32\", \"SPARK_GRAFT_ITERS\" -> \"3\", \"SPARK_GRAFT_ORDER\" -> \"roundrobin\", \"SPARK_GRAFT_NOOP\" -> \"0\", \"SPARK_GRAFT_MEDIANS_FILE\" -> \"$SLOPE_DIR/small.json\", \"SPARK_GRAFT_RUNS_FILE\" -> \"$SLOPE_DIR/small_runs.json\")" \
    "runMain graft.Bench" \
    "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"$SLOPE_DIR/scaled\", \"SPARK_GRAFT_CPUS\" -> \"32\", \"SPARK_GRAFT_ITERS\" -> \"3\", \"SPARK_GRAFT_ORDER\" -> \"roundrobin\", \"SPARK_GRAFT_NOOP\" -> \"0\", \"SPARK_GRAFT_MEDIANS_FILE\" -> \"$SLOPE_DIR/big.json\", \"SPARK_GRAFT_RUNS_FILE\" -> \"$SLOPE_DIR/big_runs.json\")" \
    "runMain graft.Bench"
  python3 tools/scaling_slope.py "$SLOPE_DIR/small.json" "$SLOPE_DIR/big.json" --gate "$SLOPE_MULT"
fi

stage "ALL STAGES GREEN"
