#!/usr/bin/env bash
# One-command round gate: re-runs every shipped verification artifact in
# one shot and prints ONE summary line, so artifacts can never skew
# against each other (the round-5 lesson: PLANS.md lagged a fix by one
# commit because regeneration was a separate manual step).
#
# Usage: tools/gate.sh [tag]        (tag names the scratch dir only)
# Steps: sbt test -> Verify+check.py at sf0.001 AND sf0.01 -> Bench at
#        sf0.1 -> Explain+plan_audit (rewrites PLANS.md in place) ->
#        leak grep over the source tree.
# Exit 0 iff every step is green.
set -u
cd "$(dirname "$0")/.."
TAG=${1:-local}
OUT=/tmp/graft_gate_$TAG
mkdir -p "$OUT"
FAIL=""

echo "== gate [$TAG] scratch: $OUT =="

echo "-- sbt test"
sbt -batch test >"$OUT/test.log" 2>&1
TESTS=$(grep -oE "succeeded [0-9]+, failed [0-9]+" "$OUT/test.log" | tail -1)
grep -q "All tests passed." "$OUT/test.log" || FAIL="$FAIL test"

CHECKS=""
for SF in 0.001 0.01; do
  echo "-- Verify + oracle check sf$SF"
  sbt -batch "runMain graft.Verify /root/testdata/sf$SF $OUT/verify$SF" \
    >"$OUT/verify$SF.log" 2>&1 || FAIL="$FAIL verify$SF"
  python3 tools/check.py "/root/testdata/sf$SF" "$OUT/verify$SF" \
    >"$OUT/check$SF.log" 2>&1 || FAIL="$FAIL check$SF"
  G=$(grep -oE "[0-9]+/[0-9]+ green" "$OUT/check$SF.log" | tail -1)
  CHECKS="$CHECKS sf$SF=${G:-MISSING}"
  NUM=${G%%/*}; DEN=$(echo "${G:-0/1}" | sed 's|.*/||; s| green||')
  { [ -n "$G" ] && [ "$NUM" = "$DEN" ]; } || FAIL="$FAIL check$SF"
  # Land the exact check.py per-query JSON as a tracked artifact so an
  # empty/failed driver-side CORRECTNESS drop never leaves a round
  # unevidenced (the round-10 lesson: driver JSON arrived as {}).
  python3 - "$OUT/check$SF.log" "CORRECTNESS_LOCAL_sf$SF.json" <<'PYEOF' || true
import json, sys
txt = open(sys.argv[1]).read()
cut = txt.rfind("\n== ")
if cut > 0:
    json.dump(json.loads(txt[:cut]), open(sys.argv[2], "w"), indent=1)
PYEOF
done

# Two back-to-back passes (SPARK_GRAFT_BENCH_PASSES=2, the r3 protocol)
# make contention vs regression decidable from artifacts alone: a mover
# that is slow in pass1 but normal in pass2 is contention, not code.
BPASSES="${SPARK_GRAFT_BENCH_PASSES:-1}"
BTOTALS=""
for P in $(seq 1 "$BPASSES"); do
  echo "-- Bench sf0.1 (pass $P/$BPASSES)"
  # no budget default here: Bench's own surface-scaled default
  # (max(1500, 8*|queries|)) governs unless the caller pins one
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_OUT="$OUT/bench$P.full.json" \
    sbt -batch "runMain graft.Bench" \
    >"$OUT/bench$P.out" 2>"$OUT/bench$P.err" || FAIL="$FAIL bench$P"
  # prefer the file artifact (full per-query map); Bench's LAST stdout
  # line is a compact tail-safe summary, so the stdout fallback takes the
  # FIRST metric line (the full one)
  if [ -s "$OUT/bench$P.full.json" ]; then
    cp "$OUT/bench$P.full.json" "$OUT/bench$P.json"
  else
    grep -o '{"metric".*' "$OUT/bench$P.out" | head -1 >"$OUT/bench$P.json"
  fi
  read -r BTOTAL BFAILED BCOLD <<EOF
$(python3 -c "
import json,sys
try:
    j=json.loads(open('$OUT/bench$P.json').read())
    print(round(j['value'],1), j['failed'], len(j.get('cold',[])))
except Exception:
    print('MISSING 1 0')")
EOF
  BTOTALS="$BTOTALS p$P=${BTOTAL}s"
  [ "${BFAILED:-1}" = "0" ] || FAIL="$FAIL bench$P"
done
cp "$OUT/bench1.json" "$OUT/bench.json" 2>/dev/null || true
cp "$OUT/bench1.json" BENCH_LOCAL.json 2>/dev/null || true

echo "-- plan audit (rewrites PLANS.md)"
# write to scratch first: a plan_audit failure must never leave the
# committed PLANS.md truncated by the shell redirect
if sbt -batch "runMain graft.Explain /root/testdata/sf0.001" >"$OUT/plans.txt" 2>"$OUT/plans.err" \
  && python3 tools/plan_audit.py "$OUT/plans.txt" >"$OUT/PLANS.md"; then
  mv "$OUT/PLANS.md" PLANS.md
else
  FAIL="$FAIL plans"
fi

echo "-- leak grep"
# --exclude=gate.sh: this script's own pattern line must not count
LEAKS=$(grep -rniE "anthropic|claude|proprietary|companyinternal" \
  --exclude=gate.sh src/ build.sbt tools/ 2>/dev/null | grep -cv "Binary file" || true)
[ "$LEAKS" = "0" ] || FAIL="$FAIL leaks($LEAKS)"

STATUS=OK; [ -z "$FAIL" ] || STATUS="FAIL:$FAIL"
echo "GATE[$TAG] $STATUS tests=[${TESTS:-MISSING}] checks=[${CHECKS# }] bench_totals=[${BTOTALS# }] bench_failed=${BFAILED:-MISSING} bench_cold_entries=${BCOLD:-0} plans=PLANS.md leaks=$LEAKS"
[ -z "$FAIL" ]
