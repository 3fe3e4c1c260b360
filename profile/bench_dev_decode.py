"""Standalone bulk device point-decode measurement (one row per run).

Separated from profile_groups because the batched-sqrt decode graph can
crash the experimental axon TPU worker at large batches — a crashed
worker poisons every subsequent call in the process, so each compressed
measurement gets its own process (the profile_groups grid stays alive).

Usage: python profile/bench_dev_decode.py <curve> <g1|g2> <logn> [comp]
Prints one line in the profile_groups row format.
"""

from __future__ import annotations

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

import numpy as np                                     # noqa: E402

from libff_tpu.curves.device import device_curve       # noqa: E402
from libff_tpu.serialization import codec as ser       # noqa: E402
from libff_tpu.serialization import device_codec as dser  # noqa: E402


def main():
    cname = sys.argv[1] if len(sys.argv) > 1 else "alt_bn128"
    gname = sys.argv[2] if len(sys.argv) > 2 else "g1"
    logn = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    comp = (sys.argv[4] != "0") if len(sys.argv) > 4 else True
    n = 1 << logn
    dc = device_curve(cname)
    G = getattr(dc, gname)
    gd = getattr(dc.cd, gname)
    E, gen = gd.curve, gd.generator
    base = [E.mul(i + 1, gen) for i in range(32)]
    hpts = [base[i % 32] for i in range(n)]
    gc = ser.GroupCodec(gd)
    blob = ser.write_point_vector(gc, hpts, compressed=comp)
    A, bad = dser.read_point_vector_device(gc, G, blob, compressed=comp)
    _ = np.asarray(A.x[(slice(0, 1),) * A.x.ndim])     # warm
    t0 = time.perf_counter()
    A, bad = dser.read_point_vector_device(gc, G, blob, compressed=comp)
    _ = np.asarray(A.x[(slice(0, 1),) * A.x.ndim])
    dt = time.perf_counter() - t0
    assert not bool(np.asarray(bad).any())
    if G.F.degree == 1:
        xs, ys = G.F.to_ints(A.x[..., :8]), G.F.to_ints(A.y[..., :8])
    else:
        xs = G.F.to_host_batch(A.x[..., :8])
        ys = G.F.to_host_batch(A.y[..., :8])
    assert all((xs[i], ys[i]) == hpts[i] for i in range(8))
    tag = "compressed" if comp else "uncompressed"
    print(f"{cname} {gname} deserialize {tag} dev (2^{logn}): "
          f"{n / dt / 1e3:.3f} Kpts/s", flush=True)


if __name__ == "__main__":
    main()
