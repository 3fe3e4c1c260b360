"""Fixed-base batch_exp benchmark — the multiexp.tcc:885-947 counterpart.

The reference's batch_exp is an OpenMP-parallel per-scalar table walk; the
device version (msm/fixed_base.py device_batch_exp) is one jitted program:
per outer window a one-hot masked table-row read plus a single complete
mixed-add over the whole scalar batch.

Workload: 2^logn SHA512_rng scalars on the alt_bn128 G1 generator with the
library's own tuned window choice (get_exp_window_size).  Correctness:
32 sampled lanes vs the host-oracle windowed_exp, bit-exact.  Reference
comparison column: refbuild/bin/baseline_driver2 batch_exp row.

Usage: python profile/bench_fixed_base.py [logn]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax                                             # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/libff_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp                                # noqa: E402
import numpy as np                                     # noqa: E402

from libff_tpu.curves.device import device_curve       # noqa: E402
from libff_tpu.host import field as hf                 # noqa: E402
from libff_tpu.msm import fixed_base as fb             # noqa: E402


def main():
    on_tpu = jax.default_backend() == "tpu"
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else (16 if on_tpu else 10)
    n = 1 << logn
    dc = device_curve("alt_bn128")
    cd = dc.cd
    G = dc.g1
    E, gen = cd.g1.curve, cd.g1.generator
    bits = cd.r.bit_length()

    ks = [hf.sha512_rng(cd.fr.mp, i) for i in range(n)]
    limbs = dc.fr.plain_from_ints(ks)
    # the library's tuned window targets a serial table walk; the device's
    # one-hot table read costs 2^w * N vector ops per outer window, so the
    # device optimum is smaller — cap at 8 (measured sweet spot: the read
    # then costs about as much as the single mixed-add it feeds)
    lib_window = fb.get_exp_window_size(G, n)
    window = min(lib_window, 8)
    table = fb.device_window_table(G, E, bits, window, gen)
    htable = fb.get_window_table(E, bits, window, gen)

    fn = jax.jit(lambda s: fb.device_batch_exp(G, bits, window, table, s))
    out = fn(limbs)

    # bit-exact sample check vs host windowed_exp
    idx = np.linspace(0, n - 1, 32).astype(int)
    sub = jax.tree.map(lambda a: a[..., idx], out)
    A = jax.jit(G.to_affine)(sub)
    ax = G.F.to_ints(jax.device_get(A.x))
    ay = G.F.to_ints(jax.device_get(A.y))
    for j, i in enumerate(idx):
        want = fb.windowed_exp(E, bits, window, htable, ks[i])
        assert (ax[j], ay[j]) == want, f"lane {i} mismatch"

    iters = 3
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        o = fn(limbs.at[0].set((limbs[0] + i) & 0xFFFF))
        _ = np.asarray(o.z[:1, :1])   # one-element fence (tunnel!)
    dt = (time.perf_counter() - t0) / iters
    line = {
        "metric": f"alt_bn128_g1_batch_exp_per_sec_2e{logn}",
        "value": round(n / dt, 1), "unit": "exps/sec",
        "window": window, "lib_window": lib_window,
        "bit_exact_sample": True}
    if logn == 16:
        # measured libff OpenMP batch_exp on the build host (BASELINE.md)
        line["vs_baseline"] = round(n / dt / 120485.0, 4)
    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
