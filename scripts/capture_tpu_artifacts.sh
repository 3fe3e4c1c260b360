#!/bin/bash
# One-shot TPU artifact capture (run when the axon tunnel is healthy).
# Produces committed-artifact logs under results/ in priority order:
#   1. engine cross-check (all kernels bit-exact vs host oracle)
#   2. G1 config sweep at 2^20  (c, L, tb, merge)
#   3. G2 config sweep at 2^16
#   4. G2 benchmark line (vs the measured 50,152 pts/s baseline)
#   5. full bench.py (BENCH-format lines)
# Each step under its own timeout; partial results are still artifacts.
set -u -o pipefail
cd "$(dirname "$0")/.."
mkdir -p results
stamp=$(date -u +%Y%m%dT%H%M%S)

run() {
  local name=$1 tmo=$2; shift 2
  echo "== $name ($(date -u +%H:%M:%S)) =="
  # pipefail: rc reflects the timed command, not grep; stamped filenames
  # so re-runs never overwrite earlier committed artifacts
  timeout "$tmo" "$@" 2>&1 | grep -vE "WARNING.*xla_bridge" \
    > "results/${name}_${stamp}.log"
  echo "rc=$? -> results/${name}_${stamp}.log"
}

# Priority order (VERDICT r03): the official bench artifact first — a
# short healthy-tunnel window must still yield the round's headline
# number — then G2, the tuning sweeps, engines, and the r04 additions
# (group-op profile, BW6-761 48-limb MSM, streaming 2^24).
run bench_full 1500 env BENCH_BUDGET_S=1380 BENCH_TPU_WAIT_S=60 python bench.py
# the unproven SOS kernel variants get their own timed invocations so a
# Mosaic compile stall cannot take the known-good roofline datapoint down
run roofline_sos 700 python profile/roofline.py 18 sos
run roofline_sos2 700 python profile/roofline.py 18 sos2
run bench_g2 1200 python profile/bench_g2.py
# only sweep the SOS kernel configs if their roofline compile was seen to
# finish (a Mosaic stall there would otherwise eat the sweep budget)
sos_ok=0
grep -q '"field_mul_sos_ns": [0-9]' "results/roofline_sos_${stamp}.log" \
  && sos_ok=1
run sweep_g1_2e20 2100 env SWEEP_SOS=$sos_ok python profile/sweep_insert.py 20 g1 1900
run sweep_g2_2e16 1700 env SWEEP_SOS=$sos_ok python profile/sweep_insert.py 16 g2 1500
run engines_check 1500 python profile/check_pallas_engines.py
run profile_groups 1200 python profile/profile_groups.py
run bench_bw6 1800 python profile/bench_bw6.py 14
run bench_stream 1200 python profile/bench_stream.py 24 20
run affine_exp 1000 python profile/affine_experiment.py
run multiexp_grid 1800 python profile/profile_multiexp.py 16 20 g1
echo "done $stamp"
