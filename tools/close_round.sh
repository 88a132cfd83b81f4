#!/usr/bin/env bash
# Round-close artifact generator (r12 verdict ask #4 made the hostile-
# session-timezone oracle a STANDING closing artifact; this script makes
# the whole closing checklist one command so no artifact regresses into
# a manual step).
#
# Usage: bash tools/close_round.sh <round-number>
#
# Emits, in order (each step independent — a failure prints loudly and
# the script continues so one flaky stage doesn't hide the rest):
#   1. full-registry oracle at sf0.1 (log: /tmp/close_r{N}_sf01.log)
#   2. DEGEN_r{N}.json            — doctored-corpus differential sweep
#   3. DEGEN_r{N}_empty.json      — zero-row-table sweep
#   4. DEGEN_streaming_r{N}.json  — streaming drains: doctored arrivals,
#                                   torn drains, torn compactions
#   5. TZCHECK_r{N}.json          — full registry at sf0.01 under
#      spark.sql.session.timeZone=America/New_York (oracle UTC-naive)
#   6. TZCHECK_r{N}_doctored.json — the same hostile zone over the
#      doctored corpus (extreme timestamps under DST/LMT offsets)
# The closing bench + PLANS.md re-dump stay separate (they want an idle
# box and a canary read; see BASELINE.md procedure).
set -u
R=${1:?usage: close_round.sh <round-number>}
cd "$(dirname "$0")/.."

step() {
  echo "==== [$(date +%H:%M:%S)] $*"
  "$@"
  echo "==== exit $? : $*"
}

step python tools/oracle_check.py /root/testdata/sf0.1 2>&1 | tee "/tmp/close_r${R}_sf01.log" | tail -3
step python tools/degenerate_sweep.py --emit "DEGEN_r${R}.json" /root/testdata/sf0.001 2>&1 | tail -3
step python tools/degenerate_sweep.py --empty --emit "DEGEN_r${R}_empty.json" /root/testdata/sf0.001 2>&1 | tail -3
step python tools/degenerate_streaming.py /root/testdata/sf0.001 --emit "DEGEN_streaming_r${R}.json" 2>&1 | tail -8
step python tools/oracle_check.py /root/testdata/sf0.01 --session-tz America/New_York --json "TZCHECK_r${R}.json" 2>&1 | tail -3
# the doctored dir was (re)built by the sweep in step 2
step python tools/oracle_check.py /tmp/spark_graft_degenerate/sf --session-tz America/New_York --json "TZCHECK_r${R}_doctored.json" 2>&1 | tail -3
echo "==== close_round ${R} done; artifacts: DEGEN_r${R}*.json DEGEN_streaming_r${R}.json TZCHECK_r${R}*.json"
