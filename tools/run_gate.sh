#!/usr/bin/env bash
# Full local replica of the driver's gates: build, specs, correctness
# (DuckDB oracle at both sfs), bench. Exit nonzero on any failure.
set -euo pipefail
cd "$(dirname "$0")/.."

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
