"""BW6-761 G1 MSM benchmark — the 48-limb (761-bit base field) datapoint.

BW6-761 is the only curve family whose device MSM had no perf datapoint
through round 3 (VERDICT r03 missing #6): its 48-limb field exceeds the
direct/pallas engines' compile-bounded 16-limb cap, so the MSM runs the
formula-VM + XLA one-hot path (msm/pippenger.py _resolve_engine).  The
reference's analogue harness is profile_multiexp.cpp:401-414 instantiated
over bw6_761_pp (bw6_761_g1.cpp, bw6_761_init.hpp:12-13: r = 377-bit
BLS12-377 q, q = 761-bit).

Workload mirrors bench.py: SHA512_rng scalars over Fr (377-bit), 32
distinct generator multiples repeated, full-size structured-oracle check
(one host scalar mul), honest input-varying fenced timing.  Prints ONE
JSON line.

Usage: python profile/bench_bw6.py [log2n] [c] [lanes]   (default 2^14)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np                                     # noqa: E402

import jax                                             # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/libff_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp                                # noqa: E402

from libff_tpu.curves.device import device_curve       # noqa: E402
from libff_tpu.curves.group import AffinePoint         # noqa: E402
from libff_tpu.host import field as hf                 # noqa: E402
from libff_tpu.msm.pippenger import MsmConfig, msm_pippenger  # noqa: E402


def main() -> None:
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    n = 1 << log2n
    metric = f"bw6_761_g1_msm_points_per_sec_2e{log2n}"
    dc = device_curve("bw6_761")
    cd = dc.cd
    G = dc.g1
    E = cd.g1.curve
    gen = cd.g1.generator
    num_bits = cd.fr.mp.bits                           # 377
    nl = dc.fr.n                                       # 24 u16 limbs

    ks = [hf.sha512_rng(cd.fr.mp, i) for i in range(n)]
    base = [E.mul(i + 1, gen) for i in range(32)]
    bx = np.asarray(G.F.from_ints([p[0] for p in base]))
    by = np.asarray(G.F.from_ints([p[1] for p in base]))
    rep = np.arange(n) % 32
    x = jnp.asarray(bx[..., rep])
    y = jnp.asarray(by[..., rep])
    inf = jnp.zeros((n,), dtype=jnp.bool_)
    raw = b"".join(k.to_bytes(2 * nl, "little") for k in ks)
    limbs = jnp.asarray(
        np.frombuffer(raw, dtype="<u2").reshape(n, nl).T.astype(np.uint32))

    c = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    if len(sys.argv) > 4:
        G.vm_mul = sys.argv[4]           # "loop" | "unrolled" | "sos"
    cfg = MsmConfig(c=c, lanes=L)

    def msm_step(s, x, y, i, sft):
        s = s.at[0].set((s[0] + sft) & 0xFFFF)
        return msm_pippenger(G, s, AffinePoint(x, y, i), num_bits,
                             config=cfg)

    fn = jax.jit(msm_step)

    t0 = time.perf_counter()
    out = fn(limbs, x, y, inf, jnp.uint32(0))
    _ = np.asarray(out.z).sum()
    compile_s = time.perf_counter() - t0

    total = 0
    for j in range(32):
        kj = sum(k for i, k in enumerate(ks) if i % 32 == j)
        total = (total + (j + 1) * kj) % cd.r
    want = E.mul(total, gen)
    A = G.to_affine(out)
    got = (G.F.to_host(jax.device_get(A.x)), G.F.to_host(jax.device_get(A.y)))
    if got != want:
        print(json.dumps({"metric": metric, "value": 0.0,
                          "unit": "points/sec",
                          "error": "result mismatch vs oracle"}))
        sys.exit(1)

    iters = 3
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        out = fn(limbs, x, y, inf, jnp.uint32(i))
        _ = np.asarray(out.z).sum()
    dt = (time.perf_counter() - t0) / iters
    pps = n / dt
    print(json.dumps({
        "metric": metric,
        "value": round(pps, 1),
        "unit": "points/sec",
        "bit_exact_vs_oracle": True,
        "config": {"c": c, "lanes": L, "engine": "xla+vm",
                   "vm_mul": G.vm_mul},
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
