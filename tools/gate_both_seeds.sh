#!/usr/bin/env bash
# The round correctness gate at BOTH data seeds, one command (VERDICT r11 #6):
#   tools/gate_both_seeds.sh [round_tag]
#
# 1. driver seed (42):  graft.Verify over /root/testdata/sf0.01, DuckDB check
# 2. shifted seed 4242: regenerate the twin corpus if absent (schema/domain
#    mirror, different values — proves the 149 hash gates bind to the
#    OPERATORS, not fixture accidents), then the same Verify + check.
#
# Writes CORRECTNESS_SEED2_<round_tag>.txt with both checkers' outputs.
# Exits non-zero if either seed has any failure.
set -u
cd "$(dirname "$0")/.."
TAG="${1:-local}"
OUT="CORRECTNESS_SEED2_${TAG}.txt"
TWIN=testdata_twin/sf0.01
fail=0

{
  echo "# Two-seed correctness gate — $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo "# seed 42 (driver corpus) + seed 4242 (tools/gen_testdata_twin.py)"
  echo
} > "$OUT"

run_seed() { # $1=label $2=data_dir $3=verify_out
  echo "== $1 ==" | tee -a "$OUT"
  rm -rf "$3"
  sbt -batch "runMain graft.Verify $2 $3" 2>&1 | grep '\[verify\].*failed' \
    | tee -a "$OUT"
  python3 tools/check_correctness.py "$2" "$3" | tail -5 | tee -a "$OUT"
  python3 tools/check_correctness.py "$2" "$3" | tail -1 \
    | grep -q ' 0 fail ==' || fail=1
}

run_seed "seed 42" /root/testdata/sf0.01 /tmp/verify_seed42

if [ ! -f "$TWIN/lineitem.parquet" ]; then
  echo "generating twin corpus (seed 4242)..." | tee -a "$OUT"
  python3 tools/gen_testdata_twin.py "$TWIN" 4242 | tail -2 | tee -a "$OUT"
fi
run_seed "seed 4242 (twin)" "$TWIN" /tmp/verify_seed4242

echo | tee -a "$OUT"
if [ "$fail" -eq 0 ]; then
  echo "BOTH SEEDS GREEN" | tee -a "$OUT"
else
  echo "GATE FAILED — see above" | tee -a "$OUT"
fi
exit "$fail"
