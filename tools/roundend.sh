#!/usr/bin/env bash
# Round-end gate: everything that must be green before a round's final
# commit. Run from the repo root. Driver-side tooling only.
#
#   1. unit + property + plan-guard specs
#   2. full Verify dump at sf0.01 + DuckDB oracle compare (the driver's gate)
#   3. MicroBench warm-median perf gate vs the committed MICROBENCH.json
#      (>1.3x warm regression on any tracked query fails; pass --update
#      via UPDATE_PERF=1 to refresh the artifact after it passes)
#   4. driver-artifact hygiene: every BENCH_*/CORRECTNESS_*/LEAKCHECK/
#      COPYCHECK/MICROBENCH artifact must be committed (untracked round
#      artifacts were an r12 AND r13 verdict item — this makes it a gate)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 0/4 testdata mtime stamp =="
# A mid-round driver regeneration of /root/testdata invalidated a green
# sbt-test run silently in r15 (BloomStreamSpec fixture guard). Record the
# newest parquet mtime in the gate log and in a tracked stamp file, so any
# regeneration is loud here and visible in git history; the full sbt test
# in step 1 then re-validates against the regenerated corpus.
stamp="$(find /root/testdata -name '*.parquet' -printf '%T@ %p\n' | sort -n | tail -1)"
echo "newest testdata parquet: $stamp"
if [[ -f .testdata_stamp ]] && [[ "$(cat .testdata_stamp)" != "$stamp" ]]; then
  echo "NOTE: /root/testdata CHANGED since the last gate run:"
  echo "  was: $(cat .testdata_stamp)"
  echo "  now: $stamp"
fi
echo "$stamp" > .testdata_stamp

echo "== 1/4 sbt test =="
sbt -batch test

echo "== 2/4 correctness gate (sf0.01) =="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/roundend_verify"
python3 tools/selfcheck.py /tmp/roundend_verify /root/testdata/sf0.01

echo "== 3/4 perf gate (warm medians, sf0.1) =="
if [[ "${UPDATE_PERF:-0}" == "1" ]]; then
  sbt -batch "runMain graft.MicroBench --gate --update"
else
  sbt -batch "runMain graft.MicroBench --gate"
fi

echo "== 4/4 driver-artifact hygiene =="
dirty="$(git status --porcelain -- 'BENCH_*.json' 'CORRECTNESS_*.json' \
  'LEAKCHECK.json' 'COPYCHECK.json' 'MICROBENCH.json' 'BASELINE.md' \
  'PROGRESS.jsonl')"
if [[ -n "$dirty" ]]; then
  echo "untracked/modified driver artifacts — commit them before round end:"
  echo "$dirty"
  exit 1
fi

echo "round-end gate: ALL GREEN"
