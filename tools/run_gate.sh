#!/usr/bin/env bash
# Full local replica of the driver's gates: build, specs, correctness
# (DuckDB oracle at both sfs), bench. Exit nonzero on any failure.
#
# Repeat mode (determinism check — the q64 incident showed one green
# run is NOT evidence of determinism):
#   tools/run_gate.sh --repeat N [query ...]
# runs the correctness dump N times at sf0.01, ROTATING the CPU count
# through 4/16/32 to vary partial-aggregation order (4 is the
# DRIVER'S default — SPARK_GRAFT_CPUS unset — so the rotation covers
# the exact config the round gate runs under), checks every run
# against the oracle, and reports any query that is not PASS-stable
# across all runs. With no query args it repeats the full suite.
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" == "--repeat" ]]; then
  N="${2:?usage: run_gate.sh --repeat N [query ...]}"
  shift 2
  QUERIES=("$@")
  declare -A FAILCOUNT
  CPU_ROTATION=(4 16 32)
  for ((i = 1; i <= N; i++)); do
    CPUS=${CPU_ROTATION[$(( (i - 1) % 3 ))]}
    OUT="/tmp/gate_repeat_$i"
    echo "== repeat $i/$N (CPUS=$CPUS) =="
    SPARK_GRAFT_CPUS=$CPUS sbt -batch \
      "runMain graft.Verify /root/testdata/sf0.01 $OUT ${QUERIES[*]:-}" \
      > /dev/null 2>&1
    NPASS=0
    NFAIL=0
    while read -r status q rest; do
      if [[ ${#QUERIES[@]} -gt 0 ]]; then
        HIT=0
        for want in "${QUERIES[@]}"; do
          [[ "${q%:}" == "$want" ]] && HIT=1
        done
        [[ $HIT -eq 0 ]] && continue
      fi
      if [[ "$status" == "FAIL" ]]; then
        FAILCOUNT[${q%:}]=$(( ${FAILCOUNT[${q%:}]:-0} + 1 ))
        NFAIL=$(( NFAIL + 1 ))
        echo "  FAIL ${q%:} $rest"
      else
        NPASS=$(( NPASS + 1 ))
      fi
    done < <(python3 tools/check_oracle.py /root/testdata/sf0.01 "$OUT" \
      | grep -E "^(PASS|FAIL)")
    echo "  run $i: $NPASS pass, $NFAIL fail"
    if [[ $NPASS -eq 0 && $NFAIL -eq 0 ]]; then
      echo "  ERROR: run $i produced no checked queries — bad query name or broken run" >&2
      exit 2
    fi
    rm -rf "$OUT"
  done
  echo "== stability over $N runs =="
  if [[ ${FAILCOUNT[@]+x} ]]; then
    for q in "${!FAILCOUNT[@]}"; do
      echo "UNSTABLE $q: failed ${FAILCOUNT[$q]}/$N runs"
    done
    exit 1
  else
    echo "all queries PASS-stable across $N runs"
  fi
  exit 0
fi

echo "== compile + test =="
sbt -batch compile test

echo "== verify + oracle sf0.001 =="
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/gate_sf0.001"
python3 tools/check_oracle.py /root/testdata/sf0.001 /tmp/gate_sf0.001

echo "== verify + oracle sf0.01 =="
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/gate_sf0.01"
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/gate_sf0.01

echo "== bench sf0.1 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" | grep metric

echo "== gate PASSED =="
