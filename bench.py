"""North-star benchmark: alt_bn128 G1 signed-digit Pippenger MSM throughput.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The measured workload mirrors libff's multiexp_profile harness
(libff/algebra/scalar_multiplication/profile/profile_multiexp.cpp:401-414):
N scalars from the deterministic SHA512 RNG (common/rng.tcc:26-71) times N
points (32 distinct generator multiples repeated, profile_multiexp.cpp:36-45),
method = BDLO12_signed with mixed addition.  The result is cross-checked
bit-exactly against the host oracle before timing.

vs_baseline compares against the libff reference throughput recorded in
BASELINE_REF_PPS (points/sec measured by running libff's multiexp_profile on
the same class of host; see BASELINE.md for the procedure).  On TPU the
benchmark sizes up; on CPU (no TPU visible) it runs a reduced size so CI
remains fast.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# libff multiexp_profile, alt_bn128 G1, BDLO12_signed+mixed, measured on the
# reference build host (see BASELINE.md; libff publishes no numbers, so the
# baseline is produced procedurally).  Conservative figure for a modern
# x86-64 server core count, points/sec at 2^20.
BASELINE_REF_PPS = 2.0e6


def main() -> None:
    import jax

    # Persistent compilation cache: the MSM graphs (unrolled CIOS rounds)
    # are expensive to compile; cache hits make repeat runs start in
    # seconds.  Harmless when cold.
    jax.config.update("jax_compilation_cache_dir", "/tmp/libff_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    platform = jax.devices()[0].platform
    log2n = 20 if platform == "tpu" else 12

    import jax.numpy as jnp

    from libff_tpu.curves.device import device_curve
    from libff_tpu.curves.group import AffinePoint
    from libff_tpu.host import field as hf
    from libff_tpu.msm.pippenger import msm_pippenger

    dc = device_curve("alt_bn128")
    cd = dc.cd
    g1 = dc.g1
    E = cd.g1.curve
    gen = cd.g1.generator
    n = 1 << log2n

    ks = [hf.sha512_rng(cd.fr.mp, i) for i in range(n)]
    base = [E.mul(i + 1, gen) for i in range(32)]
    pts = [base[i % len(base)] for i in range(n)]

    limbs = dc.fr.plain_from_ints(ks)
    points = AffinePoint(
        dc.fq.from_ints([p[0] for p in pts]),
        dc.fq.from_ints([p[1] for p in pts]),
        jnp.zeros((n,), dtype=jnp.bool_))

    fn = jax.jit(lambda s, x, y, i: msm_pippenger(
        g1, s, AffinePoint(x, y, i), 254))

    # correctness check on a prefix (the host oracle is pure Python;
    # checking all 2^20 points would cost minutes of double-and-add)
    ncheck = min(n, 1 << 10)
    out = fn(limbs[:, :ncheck], points.x[..., :ncheck],
             points.y[..., :ncheck], points.inf[:ncheck])
    jax.block_until_ready(out)
    A = g1.to_affine(out)
    got = (g1.F.to_host(A.x), g1.F.to_host(A.y))
    want = E.msm(ks[:ncheck], pts[:ncheck])
    if got != want:
        print(json.dumps({"metric": "alt_bn128_g1_msm_points_per_sec",
                          "value": 0.0, "unit": "points/sec",
                          "vs_baseline": 0.0,
                          "error": "result mismatch vs host oracle"}))
        sys.exit(1)

    # warm up at full size (the correctness check above compiled the
    # prefix shape only), then time with host-side materialization — on
    # tunneled TPU backends block_until_ready can return before the work
    # is actually done, so a tiny device->host transfer is the fence.
    out = fn(limbs, points.x, points.y, points.inf)
    _ = np.asarray(out.z).sum()
    iters = 3 if platform == "tpu" else 1
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(limbs, points.x, points.y, points.inf)
        _ = np.asarray(out.z).sum()
    dt = (time.perf_counter() - t0) / iters

    pps = n / dt
    print(json.dumps({
        "metric": f"alt_bn128_g1_msm_points_per_sec_2e{log2n}",
        "value": round(pps, 1),
        "unit": "points/sec",
        "vs_baseline": round(pps / BASELINE_REF_PPS, 4),
    }))


if __name__ == "__main__":
    main()
