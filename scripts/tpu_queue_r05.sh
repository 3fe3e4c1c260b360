#!/bin/bash
# Round-5 TPU measurement queue — run AFTER profile_groups finishes.
# One job at a time (the tunneled chip corrupts concurrent timings).
set -uo pipefail
cd "$(dirname "$0")/.."
stamp() { date +%H:%M:%S; }

echo "[$(stamp)] bench_g2 2^16"
timeout 1800 python profile/bench_g2.py > results/bench_g2_r05.log 2>&1
echo "rc=$?" >> results/bench_g2_r05.log

echo "[$(stamp)] bench_g2 2^18"
timeout 1500 python profile/bench_g2.py 18 > results/bench_g2_2e18_r05.log 2>&1
echo "rc=$?" >> results/bench_g2_2e18_r05.log

echo "[$(stamp)] multiexp grid 16,18,20 both"
timeout 5400 python profile/profile_multiexp.py 16,18,20 both \
  > results/multiexp_grid_r05.log 2>&1
echo "GRID_RC=$?" >> results/multiexp_grid_r05.log

echo "[$(stamp)] done"
