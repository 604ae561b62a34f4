#!/usr/bin/env bash
# Round-close bench attestation gate (VERDICT r12 brief item 8).
#
# Runs the full graft.Bench three times in sequence (each run is itself a
# per-query median-of-3), merges the runs into bench_attestation.json via
# bench_median.py (per-query median across runs, total = sum of medians,
# calib = median calib), then adjudicates against the PRIOR committed
# attestation with bench_diff.py and REFUSES the close (exit 1) if any
# query is >2x its calib-normalized prior in both the new single runs and
# the merged attestation.
#
# Run it in a quiet window: no concurrent sbt/test/Verify processes — the
# host swings +-25% between phases (BASELINE.md "Timing definition") and a
# loaded box turns host noise into false regressions.
#
# Usage: scripts/attest.sh [prior_attestation.json]
#   prior defaults to the committed bench_attestation.json (pre-run copy).
set -euo pipefail
cd "$(dirname "$0")/.."

# Coverage guard (VERDICT r13 brief item 8): the attestation must cover
# every operator SparkEntry registers — SURVEY.md's mechanically-enforced
# totals line (SurveyContractSpec pins it to the registry) is the cheap
# ground truth. Post-close waves that add ops without re-attesting leave
# bench_attestation.json short, and this refuses the close.
check_coverage() {
  local reg nq
  reg=$(grep -oP '(?<=\*\*Totals: )\d+' SURVEY.md | head -1)
  nq=$(python3 -c "import json; print(len(json.load(open('bench_attestation.json'))['queries']))")
  if [[ "$nq" -lt "$reg" ]]; then
    echo "REFUSING: bench_attestation.json covers $nq queries but SparkEntry registers $reg — re-run scripts/attest.sh" >&2
    return 1
  fi
  echo "coverage guard OK: attestation covers $nq/$reg registered operators"
}

if [[ "${1:-}" == "--check" ]]; then
  check_coverage
  exit $?
fi

PRIOR="${1:-bench_attestation.json}"
if [[ -f "$PRIOR" ]]; then
  cp "$PRIOR" /tmp/attest_prior.json
else
  echo "WARNING: no prior attestation at $PRIOR — diff gate will be skipped" >&2
fi

if pgrep -f "sbt-launch|org.scalatest" | grep -v "$$" >/dev/null 2>&1; then
  echo "WARNING: other sbt/test JVMs are running — this is not a quiet window" >&2
fi

sbt -batch compile >/dev/null

for i in 1 2 3; do
  echo "=== attestation run $i/3 ==="
  sbt -batch "runMain graft.Bench" >/dev/null
  # Bench writes the full per-query JSON to bench.json; snapshot per run
  cp bench.json "/tmp/attest_run$i.json"
done

python3 scripts/bench_median.py bench_attestation.json \
  /tmp/attest_run1.json /tmp/attest_run2.json /tmp/attest_run3.json
cp bench_attestation.json bench.json
echo "merged -> bench_attestation.json (and bench.json)"

if [[ -f /tmp/attest_prior.json ]]; then
  # prior as baseline; last single run as "driver"; merged as attestation.
  # bench_diff exits 1 only on >2x in BOTH — the round-close refusal.
  python3 scripts/bench_diff.py /tmp/attest_prior.json \
    /tmp/attest_run3.json bench_attestation.json
  echo "attestation gate PASSED (no >2x regressions vs $PRIOR)"
else
  echo "attestation gate SKIPPED (no prior)"
fi

check_coverage
