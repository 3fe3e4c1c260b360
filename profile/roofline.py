"""Field-mul roofline reporter (BASELINE.md: field-mul <= 1.3x roofline).

The Montgomery CIOS multiplier (fields/fp.py _cios / mul_loop) has a
statically known op budget per field mul over n 16-bit limbs:

  per outer iteration i (n of them):
    multiply row:   n u32 muls, 2n adds, n ands, n shifts   (+4 tail ops)
    reduce step:    n+1 u32 muls, 2n adds, n+1 ands, n shifts (+4 tail)
  final:            conditional subtract ~6n ops

i.e. ops(n) = n*(2n+1) u32 multiplies and ~n*(6n+8)+6n cheap VPU ops
(add/and/shift).  The speed-of-light for the kernel is the time the VPU
needs to execute that op mix with no algorithmic stalls; we measure it
with a synthetic dependency-light kernel running the identical mix, then
report measured_field_mul / synthetic as the roofline ratio.

HONEST TIMING (see .claude/skills/verify): every measurement varies an
input per call and fences with a scalar host transfer.

Usage: python profile/roofline.py [log2N]   (default 2^20 elements)
Prints one JSON line:
  {"field_mul_ns": .., "roofline_ns": .., "ratio": .., "target": 1.3, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax                                             # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # env alone can be overridden by the site boot; config wins
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/libff_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp                                # noqa: E402
import numpy as np                                     # noqa: E402

from libff_tpu.curves.device import device_curve       # noqa: E402

MASK = jnp.uint32(0xFFFF)


def _time(jitfn, make_args, iters=3):
    """MIN over per-iteration wall times: the tunneled backend adds a
    variable ~30ms round-trip per call; the minimum is the cleanest
    estimate of the device-side duration."""
    out = jitfn(*make_args(0))
    _ = int(out)                                       # warm-up + fence
    best = float("inf")
    for i in range(1, iters + 1):
        t0 = time.perf_counter()
        _ = int(jitfn(*make_args(i)))
        best = min(best, time.perf_counter() - t0)
    return best


def _sol_pallas_mul_time(n: int, T: int = 8192, Ls: int = 4,
                         muls_per_step: int = 16):
    """Speed-of-light seconds per field mul: a Pallas kernel with the
    production insert kernel's exact structure (grid over T steps, fully
    unrolled straight-line body on (n, Ls, 128) u32 tiles) executing the
    CIOS op MIX with the serial carry chain removed — per synthetic mul,
    2n^2 independent {mul, and, shift, 2 adds} MAC groups (the same op
    counts as fields/fp.py _cios, minus only the data dependences and the
    ~6n-op conditional subtract).  This is the no-stall bound the real
    multiplier is compared against."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, o_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            o_ref[...] = jnp.zeros_like(o_ref)

        a = [a_ref[0, i] for i in range(n)]          # n x (Ls, 128)
        b = [b_ref[0, i] for i in range(n)]
        lo = [o_ref[0, i] for i in range(n)]
        hi = [o_ref[0, (i + 1) % n] for i in range(n)]
        for _ in range(muls_per_step):
            # multiply phase + reduce phase: 2 * n^2 MAC groups
            for _phase in range(2):
                for i in range(n):
                    ai = a[i]
                    for j in range(n):
                        p = ai * b[j]
                        lo[j] = lo[j] + (p & 0xFFFF)
                        hi[j] = hi[j] + (p >> 16)
            a, b = b, a
        for i in range(n):
            o_ref[0, i] = lo[i] ^ hi[i]

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.integers(0, 2**16, (T, n, Ls, 128), dtype=np.uint32))
    b = jnp.asarray(rng.integers(1, 2**16, (T, n, Ls, 128), dtype=np.uint32))
    spec = pl.BlockSpec((1, n, Ls, 128), lambda t: (t, 0, 0, 0),
                        memory_space=pltpu.VMEM)

    f = jax.jit(lambda a, b: jnp.sum(pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((1, n, Ls, 128), lambda t: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n, Ls, 128), jnp.uint32),
    )(a, b), dtype=jnp.uint32))

    t = _time(lambda a, b, s: f(a + s, b), lambda i: (a, b, jnp.uint32(i)),
              iters=3)
    elements = T * Ls * 128
    return t / (elements * muls_per_step)


def synthetic_cios_mix(n: int, reps: int):
    """A dependency-light kernel executing the CIOS op mix `reps` times:
    n*(2n+1) u32 muls and n*(6n+8)+6n cheap ops per rep, arranged in 8
    independent chains so the VPU pipeline stays full."""
    muls = n * (2 * n + 1)
    cheap = n * (6 * n + 8) + 6 * n
    # per chain step: 1 mul + 3 cheap (x*b+a, &mask, >>shift folded): so a
    # chain step covers (1 mul, 3 cheap); leftover cheap ops run as
    # add/and pairs (2 cheap per step).
    mul_steps = muls
    cheap_steps = max(0, cheap - 3 * muls) // 2

    def f(a, b, s):
        xs = [a + jnp.uint32(k) + s for k in range(8)]

        def rep(i, xs8):
            xs = list(xs8)
            for k in range(8):
                x = xs[k]
                for _ in range(mul_steps // 8):
                    x = (x * b + a) & MASK
                for _ in range(cheap_steps // 8):
                    x = (x + b) & MASK
                xs[k] = x
            return tuple(xs)

        xs = jax.lax.fori_loop(0, reps, rep, tuple(xs))
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        return jnp.sum(acc, dtype=jnp.uint32)

    return jax.jit(f)


def _real_pallas_mul_time(F, T: int = 8192, Ls: int = 8,
                          muls_per_step: int = 32, chains: int = 8,
                          impl: str = "cios"):
    """Seconds per ACTUAL Montgomery mul in the same Pallas structure as
    the speed-of-light kernel: `chains` independent serial mul chains per
    grid step for ILP.  impl: "cios" (fields/fp.py mul_unrolled, serial
    carry chain) or "sos" (mul_sos, deferred-carry column accumulation)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = F.n
    assert muls_per_step % chains == 0
    mulfn = {"sos": F.mul_sos, "sos2": F.mul_sos2}.get(impl,
                                                       F.mul_unrolled)

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[0]
        b = b_ref[0]
        xs = [F.add(a, F.add(b, a) if k else b) for k in range(chains)]
        for _ in range(muls_per_step // chains):
            xs = [mulfn(x, b) for x in xs]
        acc = xs[0]
        for x in xs[1:]:
            acc = F.add(acc, x)
        o_ref[0] = acc

    rng = np.random.default_rng(5)
    vals = [int(v) for v in rng.integers(1, 2**61, (64,))]
    base = np.asarray(F.from_ints(vals))                    # (n, 64)
    a = jnp.asarray(np.tile(base, (1, T * Ls * 2)).reshape(
        n, T, Ls, 128).transpose(1, 0, 2, 3))
    b = jnp.asarray(np.tile(base[:, ::-1], (1, T * Ls * 2)).reshape(
        n, T, Ls, 128).transpose(1, 0, 2, 3))
    spec = pl.BlockSpec((1, n, Ls, 128), lambda t: (t, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    f = jax.jit(lambda a, b: jnp.sum(pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((1, n, Ls, 128), lambda t: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n, Ls, 128), jnp.uint32),
    )(a, b), dtype=jnp.uint32))

    t = _time(lambda a, b, s: f(a + (s & 1), b),
              lambda i: (a, b, jnp.uint32(i)), iters=3)
    return t / (T * Ls * 128 * muls_per_step)


def _measure_insert_mul_ns(dc, log2n: int) -> float:
    """Effective ns per field mul inside the PRODUCTION hot kernel: time
    one pallas3 insert pass and divide by its statically known mul count
    (N * W mixed adds x 11 muls each, rcb_madd_a0).  Conservatively counts
    the kernel's adds/one-hot traffic as mul time."""
    from libff_tpu.curves.group import AffinePoint
    from libff_tpu.msm import digits as dig
    from libff_tpu.msm.pallas_insert3 import insert_pallas3
    from libff_tpu.msm.pippenger import MsmConfig, _prepare

    G = dc.g1
    N = 1 << log2n
    rng = np.random.default_rng(1)
    c, L = 5, 512
    cfg = MsmConfig(c=c, lanes=L)
    B = 1 << (c - 1)
    W = dig.num_signed_digits(G.order, 254, c)
    # any valid inputs work; 64 distinct points tiled, random scalars
    xs = dc.fq.from_ints([int(v) for v in rng.integers(1, 2**61, (64,))])
    ys = dc.fq.from_ints([int(v) for v in rng.integers(1, 2**61, (64,))])
    x = jnp.tile(xs, (1, N // 64))
    y = jnp.tile(ys, (1, N // 64))
    inf = jnp.zeros((N,), bool)
    limbs = jnp.asarray(
        rng.integers(0, 2**16, (dc.fr.n, N)).astype(np.uint32))

    def f(s, x, y, i, sft):
        s = s.at[0].set((s[0] + sft) & 0xFFFF)
        s2, pts, el, T, L2 = _prepare(G, s, AffinePoint(x, y, i), cfg)
        d = dig.signed_digits(s2, c, W).reshape(W, T, L2)
        bk = insert_pallas3(G, d, pts, B)
        return jnp.sum(bk.z, dtype=jnp.uint32)

    t = _time(jax.jit(f), lambda i: (limbs, x, y, inf, jnp.uint32(i)),
              iters=3)
    return t / (N * W * 11)


def measure(log2n: int = 20,
            impls: tuple = ("cios", "sos", "sos2")) -> dict:
    """Measure the roofline ratio; returns the full result dict."""
    N = 1 << log2n
    dc = device_curve("alt_bn128")
    F = dc.fq
    n = F.n
    rng = np.random.default_rng(0)
    platform = jax.devices()[0].platform

    a = F.from_ints([int(x) for x in rng.integers(1, 2**61, (64,))])
    a = jnp.tile(a, (1, N // 64))
    b = F.from_ints([int(x) for x in rng.integers(1, 2**61, (64,))])
    b = jnp.tile(b, (1, N // 64))

    REPS = 8

    def fm(a, b, s):
        def rep(i, x):
            return F.mul(x, b)
        x = jax.lax.fori_loop(0, REPS, rep, F.add(a, jnp.broadcast_to(
            s.reshape(1, 1), a.shape).astype(jnp.uint32)))
        return jnp.sum(x, dtype=jnp.uint32)

    t_field = _time(jax.jit(fm), lambda i: (a, b, jnp.uint32(i)))
    per_mul_xla = t_field / (REPS * N)

    # Speed-of-light for the CIOS op mix.  On TPU: a Pallas kernel with
    # the production insert kernel's structure running the identical op
    # mix with the carry chain removed (a latency-bound XLA chain
    # under-reports peak by >10x).
    if platform == "tpu":
        per_syn = _sol_pallas_mul_time(n)
    else:
        av = jnp.asarray(rng.integers(0, 2**32, (N,), dtype=np.uint32))
        bv = jnp.asarray(rng.integers(1, 2**16, (N,), dtype=np.uint32))
        syn = synthetic_cios_mix(n, REPS)
        t_syn = _time(syn, lambda i: (av, bv, jnp.uint32(i)))
        per_syn = t_syn / (REPS * N)

    # field-mul measurements (TPU: the pure Montgomery multiplier in a
    # Pallas kernel — the apples-to-apples number vs the SOL mix — plus
    # the production insert kernel's EFFECTIVE per-mul time, which folds
    # in the madd's adds and the one-hot bucket traffic)
    per_mul_pallas = None
    per_mul_sos = None
    per_mul_sos2 = None
    per_mul_insert = None
    if platform == "tpu":
        # impls: which multiplier kernels to measure.  An unproven kernel
        # variant can stall the Mosaic compiler for longer than any
        # reasonable budget, so callers that must not lose the known-good
        # datapoint (bench.py) pass impls=("cios",) and the capture script
        # measures sos/sos2 in separate timed invocations.
        if "cios" in impls:
            per_mul_pallas = _real_pallas_mul_time(F, impl="cios")
        if "sos" in impls:
            per_mul_sos = _real_pallas_mul_time(F, impl="sos")
        if "sos2" in impls:
            per_mul_sos2 = _real_pallas_mul_time(F, impl="sos2")
        per_mul_insert = _measure_insert_mul_ns(dc, min(log2n, 18))

    best = min(v for v in (per_mul_xla, per_mul_pallas, per_mul_sos,
                           per_mul_sos2, per_mul_insert)
               if v is not None)
    ratio = best / per_syn if per_syn > 0 else float("inf")
    # two honest ratios (r04 advisor finding): `ratio` certifies the best
    # ISOLATED multiplier kernel against the op-mix bound — proof the mul
    # itself reaches the hardware; `production_ratio` is the insert
    # kernel's EFFECTIVE per-mul time (folding in the madd's adds and the
    # one-hot bucket traffic) against the same bound — the number the MSM
    # actually pays.  `ok` is the isolated ratio (the BASELINE.md
    # field-mul-kernel target); production is reported alongside, not
    # hidden behind the min().
    prod_ratio = (per_mul_insert / per_syn
                  if per_mul_insert and per_syn > 0 else None)
    return {
        "platform": platform,
        "limbs": n,
        "elements": N,
        "field_mul_xla_ns": round(per_mul_xla * 1e9, 2),
        "field_mul_pallas_ns":
            round(per_mul_pallas * 1e9, 2) if per_mul_pallas else None,
        "field_mul_sos_ns":
            round(per_mul_sos * 1e9, 2) if per_mul_sos else None,
        "field_mul_sos2_ns":
            round(per_mul_sos2 * 1e9, 2) if per_mul_sos2 else None,
        "field_mul_insert_kernel_ns":
            round(per_mul_insert * 1e9, 2) if per_mul_insert else None,
        "roofline_ns": round(per_syn * 1e9, 2),
        "ratio": round(ratio, 3),
        "production_ratio": round(prod_ratio, 3) if prod_ratio else None,
        "target": 1.3,
        "ok": ratio <= 1.3,
    }


def roofline_ratio(log2n: int = 20) -> float:
    return measure(log2n)["ratio"]


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    impls = tuple(sys.argv[2].split(",")) if len(sys.argv) > 2 else \
        ("cios", "sos", "sos2")
    print(json.dumps(measure(log2n, impls)))


if __name__ == "__main__":
    main()
