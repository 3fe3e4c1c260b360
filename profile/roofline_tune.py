"""Roofline-closing sweep: the real Montgomery multiplier kernel across
(impl, chains, Ls) — the ILP/register-pressure axes VERDICT r03 #2 asked
to explore (interleave independent elements per kernel instance; tile
shape variants).

The production kernel (msm/pallas_insert3.py) and roofline.py's
_real_pallas_mul_time fix chains=4, Ls=4.  The CIOS carry chain is a
~2n^2-step serial dependency; if the VPU mul latency is k cycles, at
least k independent chains are needed to keep the pipeline full, and
each extra chain costs ~n+2 live (Ls,128) u32 temporaries — so chains
and Ls trade ILP against vector-register spills.  This harness measures
the whole plane and prints one JSON line per config plus a final "best".

Usage: python profile/roofline_tune.py [budget_s]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax                                             # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/libff_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from libff_tpu.curves.device import device_curve       # noqa: E402
from roofline import _real_pallas_mul_time, _sol_pallas_mul_time  # noqa: E402

T0 = time.time()


def main() -> None:
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 2400.0
    dc = device_curve("alt_bn128")
    F = dc.fq

    sol = _sol_pallas_mul_time(F.n)
    print(json.dumps({"sol_ns": round(sol * 1e9, 3)}), flush=True)

    # priority order: incumbent first (cached compile), then more chains
    # (carry-chain latency hiding), then bigger tiles (one full vreg per
    # limb at Ls=8), then SOS at high ILP (its deferred-carry columns
    # only pay off if the spills they cause are survivable)
    grid = [("cios", 4, 4), ("cios", 8, 4), ("cios", 2, 4),
            ("cios", 1, 4), ("cios", 1, 8), ("cios", 2, 8),
            ("cios", 4, 8), ("cios", 8, 8), ("cios", 16, 4),
            ("sos", 8, 4), ("sos2", 8, 4)]
    results = []
    for impl, chains, Ls in grid:
        if time.time() - T0 > budget - 300:
            print(json.dumps({"skipped": f"{impl}/ch{chains}/Ls{Ls}",
                              "reason": "budget"}), flush=True)
            continue
        t0 = time.time()
        try:
            per = _real_pallas_mul_time(
                F, T=8192, Ls=Ls, muls_per_step=16 * max(1, chains // 4),
                chains=chains, impl=impl)
        except Exception as e:  # noqa: BLE001 - keep sweeping
            print(json.dumps({"impl": impl, "chains": chains, "Ls": Ls,
                              "error": f"{type(e).__name__}: {e}"[:160]}),
                  flush=True)
            continue
        r = {"impl": impl, "chains": chains, "Ls": Ls,
             "mul_ns": round(per * 1e9, 3),
             "ratio": round(per / sol, 3),
             "compile_plus_run_s": round(time.time() - t0, 1)}
        results.append(r)
        print(json.dumps(r), flush=True)

    if results:
        best = min(results, key=lambda r: r["mul_ns"])
        print(json.dumps({"best": best, "sol_ns": round(sol * 1e9, 3),
                          "target": 1.3, "ok": best["ratio"] <= 1.3}),
              flush=True)


if __name__ == "__main__":
    main()
