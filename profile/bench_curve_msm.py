"""Per-curve MSM benchmark — profile_multiexp.cpp:401-414 instantiated
over any curve's pp, as the reference does per template parameter.

Covers the curves the headline bench does not: MNT4/MNT6 (a != 0
Jacobian path + masked-scan Horner), Edwards (inverted-coordinate
complete path), BW6-761 (48-limb wide field), and the BLS12 G1/G2s.

Workload mirrors bench.py: SHA512_rng scalars over the curve's Fr, 32
distinct generator multiples repeated, full-size structured-oracle check
(one host scalar mul), honest input-varying fenced timing.  Prints ONE
JSON line per (curve, group, size).

Usage: python profile/bench_curve_msm.py <curve> [g1|g2] [log2n] [c] [L]
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
from libff_tpu.curves.group import AffinePoint         # noqa: E402
from libff_tpu.host import field as hf                 # noqa: E402
from libff_tpu.msm.pippenger import MsmConfig, msm_pippenger  # noqa: E402


# measured libff MULTICORE-chunks=4 baselines on the 4-vCPU Xeon build
# host (BASELINE.md round-5 extension, refbuild/baseline_driver2.cpp)
BASELINES = {
    ("bw6_761", "g1", 14): 17015.0,
    ("bw6_761", "g1", 16): 24463.0,
    ("bls12_377", "g2", 16): 19905.0,
    ("alt_bn128", "g2", 20): 43930.0,
}


def main() -> None:
    cname = sys.argv[1] if len(sys.argv) > 1 else "mnt4"
    gname = sys.argv[2] if len(sys.argv) > 2 else "g1"
    log2n = int(sys.argv[3]) if len(sys.argv) > 3 else 14
    n = 1 << log2n
    metric = f"{cname}_{gname}_msm_points_per_sec_2e{log2n}"
    dc = device_curve(cname)
    cd = dc.cd
    G = getattr(dc, gname)
    gd = getattr(cd, gname)
    E, gen = gd.curve, gd.generator
    num_bits = cd.fr.mp.bits
    nl = dc.fr.n

    ks = [hf.sha512_rng(cd.fr.mp, i) for i in range(n)]
    base = [E.mul(i + 1, gen) for i in range(32)]
    if G.F.degree == 1:
        bx = np.asarray(G.F.from_ints([p[0] for p in base]))
        by = np.asarray(G.F.from_ints([p[1] for p in base]))
    else:
        bx = np.asarray(G.F.from_host_batch([p[0] for p in base]))
        by = np.asarray(G.F.from_host_batch([p[1] for p in base]))
    rep = np.arange(n) % 32
    x = jnp.asarray(bx[..., rep])
    y = jnp.asarray(by[..., rep])
    inf = jnp.zeros((n,), dtype=jnp.bool_)
    raw = b"".join(k.to_bytes(2 * nl, "little") for k in ks)
    limbs = jnp.asarray(
        np.frombuffer(raw, dtype="<u2").reshape(n, nl).T.astype(np.uint32))

    cfg = None
    if len(sys.argv) > 4:
        cfg = MsmConfig(c=int(sys.argv[4]),
                        lanes=int(sys.argv[5]) if len(sys.argv) > 5 else 256)

    def msm_step(s, x, y, i, sft):
        s = s.at[0].set((s[0] + sft) & 0xFFFF)
        return msm_pippenger(G, s, AffinePoint(x, y, i), num_bits,
                             config=cfg)

    fn = jax.jit(msm_step)

    t0 = time.perf_counter()
    out = fn(limbs, x, y, inf, jnp.uint32(0))
    _ = np.asarray(out.z).ravel()[:1]
    compile_s = time.perf_counter() - t0

    total = 0
    for j in range(32):
        kj = sum(k for i, k in enumerate(ks) if i % 32 == j)
        total = (total + (j + 1) * kj) % cd.r
    want = E.mul(total, gen)
    A = jax.jit(G.to_affine)(jax.tree.map(lambda a: a[..., None], out))
    if G.F.degree == 1:
        got = (G.F.to_ints(A.x)[0], G.F.to_ints(A.y)[0])
    else:
        got = (G.F.to_host_batch(A.x)[0], G.F.to_host_batch(A.y)[0])
    if got != want:
        print(json.dumps({"metric": metric, "value": 0.0,
                          "unit": "points/sec",
                          "error": "result mismatch vs oracle"}))
        sys.exit(1)

    iters = 3
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        out = fn(limbs, x, y, inf, jnp.uint32(i))
        _ = np.asarray(out.z).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters
    line = {
        "metric": metric,
        "value": round(n / dt, 1),
        "unit": "points/sec",
        "bit_exact_vs_oracle": True,
        "compile_s": round(compile_s, 1),
    }
    base = BASELINES.get((cname, gname, log2n))
    if base:
        line["vs_baseline"] = round(n / dt / base, 4)
    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
