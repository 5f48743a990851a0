#!/usr/bin/env bash
# Preflight gate: run before EVERY end-of-round (or milestone) commit.
# Round 8 shipped a snapshot that did not compile and zeroed the round's
# official CORRECTNESS/BENCH record; this script makes that impossible.
#
# Usage:
#   scripts/preflight.sh                 # compile + full Verify + oracle
#   scripts/preflight.sh q1,q2,...       # compile + Verify on listed gates
#
# Exit 0 = safe to commit.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}"
OUT=/tmp/preflight_out
ONLY="${1:-}"

echo "[preflight] 1/3 compile (main + test)"
sbt -batch "Test / compile" > /tmp/preflight_compile.log 2>&1 || {
  echo "[preflight] COMPILE FAILED — do not commit"; tail -20 /tmp/preflight_compile.log; exit 1; }

echo "[preflight] 2/3 Verify @ $SF_DIR ${ONLY:+(only: $ONLY)}"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  sbt -batch "runMain graft.Verify $SF_DIR $OUT $ONLY" \
  > /tmp/preflight_verify.log 2>&1 || {
  echo "[preflight] VERIFY FAILED"; grep "\[verify\]" /tmp/preflight_verify.log | tail; exit 1; }
if grep -q "\[verify\].*failed" /tmp/preflight_verify.log; then
  echo "[preflight] some queries FAILED:"; grep "\[verify\].*failed" /tmp/preflight_verify.log; exit 1
fi

echo "[preflight] 3/3 DuckDB oracle compare"
python3 scripts/check_oracle.py "$OUT" "$SF_DIR" || {
  echo "[preflight] ORACLE MISMATCH — do not commit"; exit 1; }

echo "[preflight] OK — safe to commit"
