"""Microbenchmarks for the MSM hot path on the real chip.

Times, bottom-up: raw VPU op chains, the Montgomery field mul, the
complete mixed add, XLA sort/gather primitives (bucket-phase design
inputs), and the full Pippenger MSM at several configs.

HONEST TIMING on the axon TPU tunnel (see .claude/skills/verify):
`jax.block_until_ready` can return early and identical dispatches can be
served from an execution cache.  Every measurement here (a) varies an
input each call and (b) fences with a scalar host transfer.  The ~30ms
round-trip is amortized by doing `reps` units of work inside one jit.

Usage: python profile/microbench.py [what ...]
  what in {vpu, mul, madd, sortgather, msm, all} (default: vpu mul madd)
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

import jax.numpy as jnp                                # noqa: E402
import numpy as np                                     # noqa: E402

from libff_tpu.curves.device import device_curve       # noqa: E402
from libff_tpu.curves import formulas as fml           # noqa: E402


def bench(name, jitfn, make_args, units_per_call, unit_name,
          iters=3, per_unit=False):
    """jitfn must end in a scalar; make_args(i) varies inputs per call."""
    out = jitfn(*make_args(0))
    _ = int(out)                       # warm-up + fence
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        _ = int(jitfn(*make_args(i)))
    dt = (time.perf_counter() - t0) / iters
    per = dt / units_per_call
    rate = units_per_call / dt
    if per_unit:
        print(f"{name:24s}: {per*1e6:10.2f} us/{unit_name}"
              f"  ({rate/1e6:8.2f} M{unit_name}/s)", flush=True)
    else:
        print(f"{name:24s}: {dt*1e3:8.2f} ms/call"
              f"  ({rate/1e12:6.3f} T{unit_name}/s)", flush=True)
    return per


def main():
    what = set(sys.argv[1:]) or {"vpu", "mul", "madd"}
    rng = np.random.default_rng(0)

    if what & {"vpu", "all"}:
        N = 1 << 22
        a = jnp.asarray(rng.integers(0, 2**32, (N,), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, (N,), dtype=np.uint32))
        DEPTH, REPS = 64, 16

        def mk_chain(body, nops):
            def f(a, b, s):
                def rep(i, x):
                    x = x ^ s
                    for _ in range(DEPTH):
                        x = body(x, a, b)
                    return x
                x = jax.lax.fori_loop(0, REPS, rep, a)
                return jnp.sum(x, dtype=jnp.uint32)
            return jax.jit(f), DEPTH * REPS * nops * N

        for nm, body, nops in (
                ("u32 mul+add+and", lambda x, a, b: (x * b + a) & 0xFFFFFF, 3),
                ("u32 add+xor", lambda x, a, b: (x + b) ^ a, 2),
                ("u32 shr+add+and",
                 lambda x, a, b: ((x >> 16) + b) & 0xFFFF, 3)):
            f, ops = mk_chain(body, nops)
            bench(nm, f, lambda i: (a, b, jnp.uint32(i)), ops, "op")

    dc = device_curve("alt_bn128")
    F = dc.fq
    G = dc.g1
    n = F.n

    def rand_f(batch):
        tot = int(np.prod(batch))
        vals = [int(x) for x in rng.integers(1, 2**63, tot)]
        return F.from_ints(vals).reshape((n, *batch))

    if what & {"mul", "all"}:
        N = 1 << 20
        a = rand_f((N,))
        b = rand_f((N,))
        REPS = 8
        for nm, mulfn in (("field mul_loop", F.mul_loop),
                          ("field mul_unrolled", F.mul_unrolled)):
            def f(a, b, s, mulfn=mulfn):
                def rep(i, x):
                    return mulfn(x, b)
                x = jax.lax.fori_loop(0, REPS, rep, F.add(a, b))
                return jnp.sum(x, dtype=jnp.uint32)
            jf = jax.jit(f)
            bench(nm, jf, lambda i: (a, b, jnp.uint32(i)),
                  REPS * N, "mul", per_unit=True)

    if what & {"madd", "all"}:
        M = 1 << 18
        X, Y, Z = rand_f((M,)), rand_f((M,)), rand_f((M,))
        x2, y2 = rand_f((M,)), rand_f((M,))
        b3 = dc.cd.g1.curve.b * 3
        REPS = 8

        def f(X, Y, Z, x2, y2, s):
            def rep(i, P):
                return fml.rcb_madd_a0(F, P[0], P[1], P[2], x2, y2, b3)
            P = jax.lax.fori_loop(0, REPS, rep, (X, Y, Z))
            return jnp.sum(P[0], dtype=jnp.uint32)
        jf = jax.jit(f)
        bench("rcb_madd", jf, lambda i: (X, Y, Z, x2, y2, jnp.uint32(i)),
              REPS * M, "madd", per_unit=True)

    if what & {"sortgather", "all"}:
        M = 1 << 20
        keys = jnp.asarray(rng.integers(0, 4096, M, dtype=np.int32))
        idx = jnp.arange(M, dtype=jnp.int32)
        REPS = 4

        def f(k, v, s):
            def rep(i, acc):
                kk, vv = jax.lax.sort_key_val(k ^ i, v)
                return acc + vv[0] + kk[M - 1]
            return jax.lax.fori_loop(0, REPS, rep, jnp.int32(0))
        bench("sort_key_val 2^20", jax.jit(f),
              lambda i: (keys, idx, jnp.int32(i)), REPS, "sort",
              per_unit=True)

        P = jnp.asarray(rng.integers(0, 2**32, (M, 32), dtype=np.uint32))
        perm = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v)[1])(keys, idx)

        def g(p, P, s):
            def rep(i, acc):
                gg = jnp.take(P, (p + i) % M, axis=0)
                return acc + jnp.sum(gg[0], dtype=jnp.uint32)
            return jax.lax.fori_loop(0, REPS, rep, jnp.uint32(s))
        bench("gather (2^20,32) ax0", jax.jit(g),
              lambda i: (perm, P, jnp.uint32(i)), REPS, "gather",
              per_unit=True)

        P2 = jnp.asarray(np.ascontiguousarray(np.asarray(P).T))

        def g2(p, P, s):
            def rep(i, acc):
                gg = jnp.take(P, (p + i) % M, axis=1)
                return acc + jnp.sum(gg[:, 0], dtype=jnp.uint32)
            return jax.lax.fori_loop(0, REPS, rep, jnp.uint32(s))
        bench("gather (32,2^20) ax1", jax.jit(g2),
              lambda i: (perm, P2, jnp.uint32(i)), REPS, "gather",
              per_unit=True)

    if what & {"engines", "g2", "insert"}:
        from libff_tpu.curves.group import AffinePoint
        from libff_tpu.msm.pippenger import MsmConfig, msm_pippenger
        from libff_tpu.host import field as hf

        cd = dc.cd

        def mk_inputs(grp, E, gen, log2n):
            Nm = 1 << log2n
            ks = [hf.sha512_rng(cd.fr.mp, i) for i in range(Nm)]
            base = [E.mul(i + 1, gen) for i in range(32)]
            pts = [base[i % 32] for i in range(Nm)]
            limbs = dc.fr.plain_from_ints(ks)
            A = AffinePoint(grp.F.from_ints([p[0] for p in pts]),
                            grp.F.from_ints([p[1] for p in pts]),
                            jnp.zeros((Nm,), bool))
            return Nm, limbs, A

        def msm_fn(grp, cfg):
            def f(s, x, y, i, sft):
                s = s.at[0].set((s[0] + sft) & 0xFFFF)
                out = msm_pippenger(grp, s, AffinePoint(x, y, i), 254,
                                    config=cfg)
                return jnp.sum(out.z, dtype=jnp.uint32)
            return jax.jit(f)

        if what & {"engines"}:
            Nm, limbs, A = mk_inputs(G, cd.g1.curve, cd.g1.generator, 18)
            for eng in ("xla", "pallas3"):
                for c, L in ((5, 512), (6, 512), (7, 512), (6, 1024)):
                    cfg = MsmConfig(c=c, lanes=L, engine=eng)
                    try:
                        jf = msm_fn(G, cfg)
                        per = bench(
                            f"g1 2^18 {eng} c={c} L={L}", jf,
                            lambda i: (limbs, A.x, A.y, A.inf,
                                       jnp.uint32(i)),
                            1, "msm", iters=2, per_unit=True)
                        print(f"   -> {Nm/per/1e3:.0f} Kpts/s", flush=True)
                    except Exception as e:
                        print(f"g1 2^18 {eng} c={c} L={L}: FAIL "
                              f"{type(e).__name__}: {e}", flush=True)

        if what & {"g2"}:
            G2 = dc.g2
            Nm, limbs, A = mk_inputs(G2, cd.g2.curve, cd.g2.generator, 14)
            for eng in ("xla", "pallas3"):
                cfg = MsmConfig(c=5, lanes=256, engine=eng)
                try:
                    jf = msm_fn(G2, cfg)
                    per = bench(
                        f"g2 2^14 {eng} c=5 L=256", jf,
                        lambda i: (limbs, A.x, A.y, A.inf, jnp.uint32(i)),
                        1, "msm", iters=2, per_unit=True)
                    print(f"   -> {Nm/per/1e3:.0f} Kpts/s", flush=True)
                except Exception as e:
                    print(f"g2 2^14 {eng}: FAIL {type(e).__name__}: {e}",
                          flush=True)

        if what & {"insert"}:
            # raw insert-phase timing (digits recomputed in-jit; cheap)
            from libff_tpu.msm import digits as dig
            from libff_tpu.msm.pippenger import _prepare
            from libff_tpu.msm.pallas_insert3 import insert_pallas3

            Nm, limbs, A = mk_inputs(G, cd.g1.curve, cd.g1.generator, 18)
            for c, L, tb in ((5, 512, 16), (6, 512, 16), (7, 512, 16),
                             (6, 512, 32), (6, 1024, 16)):
                cfg = MsmConfig(c=c, lanes=L)
                B = 1 << (c - 1)
                W = dig.num_signed_digits(G.order, 254, c)

                def mk(insert, cfg=cfg, B=B, W=W, tb=tb):
                    def f(s, x, y, i, sft):
                        s = s.at[0].set((s[0] + sft) & 0xFFFF)
                        s2, pts, el, T, L2 = _prepare(
                            G, s, AffinePoint(x, y, i), cfg)
                        d = dig.signed_digits(s2, cfg.c, W).reshape(
                            W, T, L2)
                        bk = insert(G, d, pts, B, tb=tb)
                        return jnp.sum(bk.z, dtype=jnp.uint32)
                    return jax.jit(f)

                for nm, ins in (("p3", insert_pallas3),):
                    try:
                        jf = mk(ins)
                        bench(f"insert {nm} c={c} L={L} tb={tb}", jf,
                              lambda i: (limbs, A.x, A.y, A.inf,
                                         jnp.uint32(i)),
                              1, "insert", iters=2, per_unit=True)
                    except Exception as e:
                        print(f"insert {nm} c={c} L={L} tb={tb}: FAIL "
                              f"{type(e).__name__}: {e}", flush=True)

    if what & {"msm", "all"}:
        from libff_tpu.curves.group import AffinePoint
        from libff_tpu.msm.pippenger import MsmConfig, msm_pippenger
        from libff_tpu.host import field as hf

        cd = dc.cd
        E = cd.g1.curve
        gen = cd.g1.generator
        Nm = 1 << 18
        ks = [hf.sha512_rng(cd.fr.mp, i) for i in range(Nm)]
        base = [E.mul(i + 1, gen) for i in range(32)]
        pts = [base[i % 32] for i in range(Nm)]
        limbs = dc.fr.plain_from_ints(ks)
        A = AffinePoint(F.from_ints([p[0] for p in pts]),
                        F.from_ints([p[1] for p in pts]),
                        jnp.zeros((Nm,), bool))
        for c, L in ((5, 512), (6, 512), (7, 512), (6, 1024), (8, 512)):
            cfg = MsmConfig(c=c, lanes=L)

            def f(s, x, y, i, sft, cfg=cfg):
                # vary scalars: rotate limb 0 by sft (valid scalars still)
                s = s.at[0].set((s[0] + sft) & 0xFFFF)
                out = msm_pippenger(G, s, AffinePoint(x, y, i), 254,
                                    config=cfg)
                return jnp.sum(out.z, dtype=jnp.uint32)
            jf = jax.jit(f)
            per = bench(f"msm 2^18 c={c} L={L}", jf,
                        lambda i: (limbs, A.x, A.y, A.inf, jnp.uint32(i)),
                        1, "msm", iters=2, per_unit=True)
            print(f"   -> {Nm/per/1e3:.0f} Kpts/s", flush=True)


if __name__ == "__main__":
    main()
