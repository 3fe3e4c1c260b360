"""Phase-level timing of the Pippenger MSM at a given size on the live chip.

Times digits / insert / reduce / horner separately and the full MSM, with
honest fencing (input varied per call, scalar host transfer as fence).

Usage: python profile/phases.py [log2n] [c,L[,tb] ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax                                             # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/libff_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp                                # noqa: E402
import numpy as np                                     # noqa: E402

from libff_tpu.curves.device import device_curve       # noqa: E402
from libff_tpu.curves.group import AffinePoint         # noqa: E402
from libff_tpu.host import field as hf                 # noqa: E402
from libff_tpu.msm import digits as dig                # noqa: E402
from libff_tpu.msm.pippenger import (MsmConfig, _prepare,  # noqa: E402
                                     _reduce_buckets,
                                     msm_pippenger)


def bench(name, jitfn, make_args, iters=3):
    out = jitfn(*make_args(0))
    jax.tree.map(lambda x: x.block_until_ready(), out)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        out = jitfn(*make_args(i))
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s}: {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    configs = []
    for a in sys.argv[2:]:
        parts = [int(x) for x in a.split(",")]
        configs.append(tuple(parts + [16] * (3 - len(parts))))
    if not configs:
        configs = [(5, 512, 16)]

    dc = device_curve("alt_bn128")
    cd = dc.cd
    G = dc.g1
    F = dc.fq
    N = 1 << log2n
    E = cd.g1.curve
    gen = cd.g1.generator

    cache = f"/tmp/msm_inputs_{log2n}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        limbs = jnp.asarray(z["limbs"])
        A = AffinePoint(jnp.asarray(z["x"]), jnp.asarray(z["y"]),
                        jnp.zeros((N,), bool))
    else:
        ks = [hf.sha512_rng(cd.fr.mp, i) for i in range(N)]
        base = [E.mul(i + 1, gen) for i in range(32)]
        bx = np.stack([np.asarray(F.from_ints([p[0] for p in base])),
                       np.asarray(F.from_ints([p[1] for p in base]))])
        rep = np.arange(N) % 32
        x, y = bx[0][:, rep], bx[1][:, rep]
        limbs = np.asarray(dc.fr.plain_from_ints(ks))
        np.savez(cache, limbs=limbs, x=x, y=y)
        limbs = jnp.asarray(limbs)
        A = AffinePoint(jnp.asarray(x), jnp.asarray(y),
                        jnp.zeros((N,), bool))
    args = lambda i: (limbs, A.x, A.y, A.inf, jnp.uint32(i))

    for (c, L, tb) in configs:
        print(f"== 2^{log2n}  c={c} L={L} tb={tb}", flush=True)
        cfg = MsmConfig(c=c, lanes=L)
        B = 1 << (c - 1)
        W = dig.num_signed_digits(G.order, 254, c)

        def vary(s, sft):
            return s.at[0].set((s[0] + sft) & 0xFFFF)

        # digits only
        def f_dig(s, x, y, i, sft):
            s2, p2, el, T, L2 = _prepare(G, vary(s, sft),
                                         AffinePoint(x, y, i), cfg)
            d = dig.signed_digits(s2, c, W).reshape(W, T, L2)
            return jnp.sum(d, dtype=jnp.int32)
        bench(f"digits W={W}", jax.jit(f_dig), args)

        # insert only
        from libff_tpu.msm.pallas_insert3 import insert_pallas3

        def f_ins(s, x, y, i, sft):
            s2, p2, el, T, L2 = _prepare(G, vary(s, sft),
                                         AffinePoint(x, y, i), cfg)
            d = dig.signed_digits(s2, c, W).reshape(W, T, L2)
            bk = insert_pallas3(G, d, p2, B, tb=tb)
            return jnp.sum(bk.z, dtype=jnp.uint32)
        t_ins = bench(f"insert (pallas3) B={B}", jax.jit(f_ins), args)
        madds = N * W
        print(f"   {madds/t_ins/1e6:8.1f} M madd/s "
              f"({madds/t_ins*11/1e6:8.0f} M fieldmul/s)", flush=True)

        # insert + reduce
        def f_red(s, x, y, i, sft):
            s2, p2, el, T, L2 = _prepare(G, vary(s, sft),
                                         AffinePoint(x, y, i), cfg)
            d = dig.signed_digits(s2, c, W).reshape(W, T, L2)
            bk = insert_pallas3(G, d, p2, B, tb=tb)
            tot = _reduce_buckets(G, bk, B, False)
            return jnp.sum(tot.z, dtype=jnp.uint32)
        bench("insert+reduce", jax.jit(f_red), args)

        # full
        def f_full(s, x, y, i, sft):
            out = msm_pippenger(G, vary(s, sft), AffinePoint(x, y, i), 254,
                                config=cfg)
            return jnp.sum(out.z, dtype=jnp.uint32)
        t_full = bench("full msm", jax.jit(f_full), args)
        print(f"   -> {N/t_full/1e3:8.0f} Kpts/s", flush=True)


if __name__ == "__main__":
    main()
