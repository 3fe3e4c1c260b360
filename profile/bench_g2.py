"""G2 MSM benchmark: alt_bn128 G2 signed-digit Pippenger at 2^16 points.

The reference profiles the same grid on G2 (profile_multiexp.cpp:410-411);
the measured libff baseline on the build host is 50,152 pts/s (G2 2^16,
BDLO12_signed+mixed, MULTICORE chunks=4 — BASELINE.md).

Workload mirrors the G1 bench: SHA512_rng scalars x (i%16 + 1) * gen2
points, full-size bit-exact oracle check (one host G2 scalar mul), honest
input-varying fenced timing.  Prints ONE JSON line.
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

BASELINE_G2_2E16_PPS = 50152.0
# measured libff G2 baselines per size (BASELINE.md, MULTICORE chunks=4);
# sizes without a measured cell fall back to the 2^16 number
BASELINE_G2_PPS = {16: 50152.0, 18: 47533.0, 20: 43930.0}


def main() -> None:
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = 1 << log2n
    dc = device_curve("alt_bn128")
    cd = dc.cd
    G = dc.g2
    E2 = cd.g2.curve
    gen2 = cd.g2.generator

    ks = [hf.sha512_rng(cd.fr.mp, i) for i in range(n)]
    base = [E2.mul(i + 1, gen2) for i in range(16)]
    bx = np.asarray(G.F.from_host_batch([p[0] for p in base]))
    by = np.asarray(G.F.from_host_batch([p[1] for p in base]))
    rep = np.arange(n) % 16
    x = jnp.asarray(bx[..., rep])
    y = jnp.asarray(by[..., rep])
    inf = jnp.zeros((n,), dtype=jnp.bool_)
    raw = b"".join(k.to_bytes(32, "little") for k in ks)
    limbs = jnp.asarray(
        np.frombuffer(raw, dtype="<u2").reshape(n, 16).T.astype(np.uint32))

    # engine/config from argv.  Default: the r04 sweep winner
    # (results/sweep_g2_2e16_*.log): pallas3 via auto, c=6/L=512/tb=4/sos
    # — 28,091 pts/s at 2^16 vs 24,840 for the old XLA default; the tb<=8
    # Mosaic-compile fix is hardware-validated by that sweep.
    eng = sys.argv[2] if len(sys.argv) > 2 else "auto"
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    L = int(sys.argv[4]) if len(sys.argv) > 4 else 512
    tb = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    kmul = sys.argv[6] if len(sys.argv) > 6 else "sos"
    cfg = MsmConfig(c=c, lanes=L, engine=eng, tb=tb, kmul=kmul)

    def msm_step(s, x, y, i, sft):
        s = s.at[0].set((s[0] + sft) & 0xFFFF)
        return msm_pippenger(G, s, AffinePoint(x, y, i), 254, config=cfg)

    fn = jax.jit(msm_step)

    out = fn(limbs, x, y, inf, jnp.uint32(0))
    total = 0
    for j in range(16):
        kj = sum(k for i, k in enumerate(ks) if i % 16 == j)
        total = (total + (j + 1) * kj) % cd.r
    want = E2.mul(total, gen2)
    A = G.to_affine(out)
    got = (G.F.to_host(jax.device_get(A.x)), G.F.to_host(jax.device_get(A.y)))
    if got != want:
        print(json.dumps({"metric": "alt_bn128_g2_msm_points_per_sec_2e16",
                          "value": 0.0, "unit": "points/sec",
                          "vs_baseline": 0.0,
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
        "metric": f"alt_bn128_g2_msm_points_per_sec_2e{log2n}",
        "value": round(pps, 1),
        "unit": "points/sec",
        "bit_exact_vs_oracle": True,
        "vs_baseline": round(
            pps / BASELINE_G2_PPS.get(log2n, BASELINE_G2_2E16_PPS), 4),
    }))


if __name__ == "__main__":
    main()
