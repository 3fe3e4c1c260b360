#!/bin/bash
# Round-5 TPU queue #2: headline bench validation + the per-surface
# benches (pairing, fixed-base, streaming, per-curve MSMs).
set -uo pipefail
cd "$(dirname "$0")/.."
stamp() { date +%H:%M:%S; }

echo "[$(stamp)] bench.py full validation"
timeout 1500 python bench.py > results/bench_validate_r05.log 2>&1
echo "rc=$?" >> results/bench_validate_r05.log

echo "[$(stamp)] bench_pairing"
timeout 2400 python profile/bench_pairing.py > results/bench_pairing_r05.log 2>&1
echo "rc=$?" >> results/bench_pairing_r05.log

echo "[$(stamp)] bench_fixed_base 2^16"
timeout 1500 python profile/bench_fixed_base.py 16 \
  > results/bench_fixed_base_r05.log 2>&1
echo "rc=$?" >> results/bench_fixed_base_r05.log

echo "[$(stamp)] bench_curve_msm sweep"
for spec in "bw6_761 g1 14" "bw6_761 g1 16" "mnt4 g1 14" "mnt6 g1 14" \
            "edwards g1 14" "bls12_377 g1 16" "bls12_377 g2 16"; do
  set -- $spec
  timeout 2400 python profile/bench_curve_msm.py $1 $2 $3 \
    >> results/bench_curve_msm_r05.log 2>&1 \
    || echo "{\"curve\": \"$1_$2_$3\", \"error\": \"rc!=0\"}" \
       >> results/bench_curve_msm_r05.log
done

echo "[$(stamp)] bench_stream 2^24"
BENCH_BUDGET_S=2400 timeout 2700 python profile/bench_stream.py 24 20 \
  > results/bench_stream_r05.log 2>&1
echo "rc=$?" >> results/bench_stream_r05.log

echo "[$(stamp)] done"
