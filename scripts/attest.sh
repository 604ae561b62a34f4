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

# Coverage guard (VERDICT r13 brief item 8, hardened per r14 ADVICE): the
# attestation must cover EXACTLY the operator set SparkEntry registers —
# SURVEY.md §2's row keys (SurveyContractSpec pins them to the registry,
# both directions) are the cheap ground truth. A count-only check missed
# renames (add+remove keeps counts equal while a dead name lingers in the
# attestation), so this compares the NAME SETS and refuses on any diff.
check_coverage() {
  python3 - <<'PYEOF'
import json, re, sys
lines = open('SURVEY.md', encoding='utf-8').read().splitlines()
s2, on = [], False
for l in lines:
    if l.startswith('## 2.'): on = True
    elif l.startswith('## 3.'): on = False
    elif on: s2.append(l)
reg = set(m.group(1) for m in
          (re.match(r'^\| `([a-z0-9_]+)` \|', l) for l in s2) if m)
att = set(json.load(open('bench_attestation.json'))['queries'])
missing = sorted(reg - att)
extra = sorted(att - reg)
if missing or extra:
    print(f"REFUSING: attestation/registry name-set mismatch — "
          f"{len(missing)} registered ops unattested {missing[:8]}, "
          f"{len(extra)} stale attested names {extra[:8]} — "
          f"re-run scripts/attest.sh", file=sys.stderr)
    sys.exit(1)
print(f"coverage guard OK: attestation name-set == all {len(reg)} registered operators")
PYEOF
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

# Spill witness (VERDICT r14 brief item 7): the tag-excluded constrained-
# memory suite rots silently unless something re-runs it — every close
# does, with the heap PINNED (SPARK_DRIVER_MEM=4g -> deterministic spill
# threshold across hosts; the spec additionally scales its key count with
# the actual -Xmx). Spilled bytes land in /tmp/attest_spill.log for the
# BASELINE.md close note.
echo "=== spill witness (pinned 4g heap) ==="
SPARK_DRIVER_MEM=4g sbt -batch \
  'set Test / testOptions := Seq(Tests.Argument(TestFrameworks.ScalaTest, "-n", "graft.SpillWitness"))' \
  'testOnly graft.SpillWitnessSpec' >/tmp/attest_spill.log 2>&1 || {
    tail -20 /tmp/attest_spill.log >&2
    echo "REFUSING: spill witness failed — see /tmp/attest_spill.log" >&2
    exit 1
  }
grep -E "spilled bytes|heap " /tmp/attest_spill.log | sed 's/^\[info\] *//'
echo "spill witness PASSED"
