"""G2 MSM phase breakdown, part 2: split the reduce+horner 2.15 s.

g2_phases.py (results/g2_phases_r04b.log) found G2 2^16 spends 0.175 s
in the insert kernel and 2.15 s in everything after it.  This harness
times insert+reduce (no horner) and insert+reduce+merge-kernel variants
to apportion the loss between:

  * lane merge (XLA halving tree over (W, B, L) Fq2 VM padds)
  * bucket suffix-sum (5 VM padds at (W, B))
  * horner (the batch-free sequential VM program — G1's measured 573 ms
    analogue, suspected dominant for G2)

Usage: python profile/g2_phases2.py [log2n] [c] [L] [tb] [kmul]
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
from libff_tpu.msm import digits as dig                # noqa: E402
from libff_tpu.msm.pallas_insert3 import insert_pallas3  # noqa: E402
from libff_tpu.msm.pippenger import (MsmConfig, _prepare,  # noqa: E402
                                     _reduce_buckets)


def _fence(o):
    arr = o if hasattr(o, "dtype") else o.z
    return np.asarray(arr).ravel()[0]


def _time(fn, make_args, iters=3):
    _fence(fn(*make_args(0)))
    best = float("inf")
    for i in range(1, iters + 1):
        t0 = time.perf_counter()
        _fence(fn(*make_args(i)))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    tb = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    kmul = sys.argv[5] if len(sys.argv) > 5 else "sos"
    N = 1 << log2n
    dc = device_curve("alt_bn128")
    G = dc.g2
    F2 = G.F
    cfg = MsmConfig(c=c, lanes=L, tb=tb, kmul=kmul)
    B = 1 << (c - 1)
    W = dig.num_signed_digits(G.order, 254, c)

    rng = np.random.default_rng(2)
    vals = [[int(v) for v in rng.integers(1, 2**61, (2,))] for _ in range(64)]
    xs = np.asarray(F2.from_host_batch(vals))
    ys = np.asarray(F2.from_host_batch(vals[::-1]))
    x = jnp.asarray(np.tile(xs, (1, 1, N // 64)))
    y = jnp.asarray(np.tile(ys, (1, 1, N // 64)))
    inf = jnp.zeros((N,), bool)
    limbs = jnp.asarray(
        rng.integers(0, 2**16, (dc.fr.n, N)).astype(np.uint32))

    def upto(stage, merge=False):
        def f(s, x, y, i, sft):
            s = s.at[0].set((s[0] + sft) & 0xFFFF)
            s2, pts, el, T, L2 = _prepare(G, s, AffinePoint(x, y, i), cfg)
            d = dig.signed_digits(s2, c, W).reshape(W, T, L2)
            bk = insert_pallas3(G, d, pts, B, tb=tb, kmul=kmul, merge=merge)
            if stage == "insert":
                return jnp.sum(bk.z, dtype=jnp.uint32)
            tot = _reduce_buckets(G, bk, B, False)
            return jnp.sum(tot.z, dtype=jnp.uint32)
        return f

    args = lambda i: (limbs, x, y, inf, jnp.uint32(i))  # noqa: E731

    t_ins = _time(jax.jit(upto("insert")), args)
    print(json.dumps({"insert_s": round(t_ins, 4)}), flush=True)

    t_red = _time(jax.jit(upto("reduce")), args)
    print(json.dumps({"insert_plus_reduce_s": round(t_red, 4),
                      "reduce_s": round(t_red - t_ins, 4),
                      "derived_horner_s_from_phases1":
                          round(2.3262 - t_red, 4)}), flush=True)

    # merge="kernel": VMEM lane merge replaces the XLA halving tree;
    # _reduce_buckets then only does the (W, B) suffix sums
    t_mk = _time(jax.jit(upto("reduce", merge="kernel")), args)
    print(json.dumps({"insert_plus_reduce_mergekernel_s": round(t_mk, 4),
                      "config": f"c{c}/L{L}/tb{tb}/{kmul}",
                      "log2n": log2n}), flush=True)


if __name__ == "__main__":
    main()
