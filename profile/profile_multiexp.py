"""MSM profiling harness — the multiexp_profile counterpart.

Mirrors libff/algebra/scalar_multiplication/profile/profile_multiexp.cpp:
for sizes 2^lo..2^hi, times the MSM methods on alt_bn128 G1 with
deterministic SHA512_rng scalars over 32 repeated generator multiples
(profile_multiexp.cpp:36-64), cross-checks every method's answer against
the exact host oracle (:316-375), and prints a CSV-ish table.

Usage:  python profile/profile_multiexp.py [lo_log2] [hi_log2]
Timing uses host-transfer fencing (tunneled TPU backends return early
from block_until_ready).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax                                             # noqa: E402
import jax.numpy as jnp                                # noqa: E402
import numpy as np                                     # noqa: E402

from libff_tpu.curves.device import device_curve       # noqa: E402
from libff_tpu.curves.group import AffinePoint         # noqa: E402
from libff_tpu.host import field as hf                 # noqa: E402
from libff_tpu.msm.multiexp import Method, multi_exp   # noqa: E402

NUM_ITERATIONS = 3


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    dc = device_curve("alt_bn128")
    cd = dc.cd
    G = dc.g1
    E = cd.g1.curve
    gen = cd.g1.generator
    base = [E.mul(i + 1, gen) for i in range(32)]

    methods = [Method.BDLO12_signed, Method.BDLO12]
    print("size," + ",".join(m.value for m in methods) + "  (points/sec)")
    for logn in range(lo, hi + 1):
        n = 1 << logn
        ks = [hf.sha512_rng(cd.fr.mp, i) for i in range(n)]
        pts = [base[i % 32] for i in range(n)]
        limbs = dc.fr.plain_from_ints(ks)
        A = AffinePoint(G.F.from_ints([p[0] for p in pts]),
                        G.F.from_ints([p[1] for p in pts]),
                        jnp.zeros((n,), bool))
        # oracle answer on a prefix (full oracle is too slow at 2^20)
        nc = min(n, 1 << 10)
        want = E.msm(ks[:nc], pts[:nc])
        row = [str(n)]
        for m in methods:
            fn = jax.jit(lambda s, x, y, i, m=m: multi_exp(
                G, s, AffinePoint(x, y, i), 254, method=m))
            # correctness at prefix size
            out = fn(limbs[:, :nc], A.x[..., :nc], A.y[..., :nc], A.inf[:nc])
            Ar = G.to_affine(jax.tree.map(lambda a: a[..., None], out))
            got = (G.F.to_ints(Ar.x)[0], G.F.to_ints(Ar.y)[0])
            assert got == want, (m, logn)
            # timed full size (warm, host-fenced)
            out = fn(limbs, A.x, A.y, A.inf)
            _ = np.asarray(out.z).sum()
            t0 = time.perf_counter()
            for _ in range(NUM_ITERATIONS):
                out = fn(limbs, A.x, A.y, A.inf)
                _ = np.asarray(out.z).sum()
            dt = (time.perf_counter() - t0) / NUM_ITERATIONS
            row.append(f"{n / dt:.0f}")
        print(",".join(row), flush=True)


if __name__ == "__main__":
    main()
