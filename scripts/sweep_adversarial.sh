#!/usr/bin/env bash
# Run every adversarial-input sweep (scripts/gen_adversarial.py modes)
# through the Verify main and summarize failures. Intentional loud
# guards (model training / z-order need data) are expected on `empty`.
#
# Usage: scripts/sweep_adversarial.sh [srcdir]
set -u
SRC="${1:-/root/testdata/sf0.001}"
cd "$(dirname "$0")/.."
for mode in empty nulls dup unicode nonfinite; do
  data="/tmp/sf_sweep_$mode"
  out="/tmp/vout_sweep_$mode"
  rm -rf "$data" "$out"
  python3 scripts/gen_adversarial.py "$mode" "$SRC" "$data" >/dev/null || {
    echo "$mode: GENERATOR FAILED"; continue; }
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
    sbt -batch "runMain graft.Verify $data $out" >"/tmp/sweep_$mode.log" 2>&1
  rc=$?
  fails=$(grep -cE '\[verify\].*failed' "/tmp/sweep_$mode.log")
  echo "$mode: exit=$rc failures=$fails"
  grep -E '\[verify\].*failed' "/tmp/sweep_$mode.log" | sed 's/^/  /'
done
