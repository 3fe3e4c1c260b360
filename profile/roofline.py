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
    out = jitfn(*make_args(0))
    _ = int(out)                                       # warm-up + fence
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        _ = int(jitfn(*make_args(i)))
    return (time.perf_counter() - t0) / iters


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


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
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
    per_mul = t_field / (REPS * N)

    av = jnp.asarray(rng.integers(0, 2**32, (N,), dtype=np.uint32))
    bv = jnp.asarray(rng.integers(1, 2**16, (N,), dtype=np.uint32))
    syn = synthetic_cios_mix(n, REPS)
    t_syn = _time(syn, lambda i: (av, bv, jnp.uint32(i)))
    per_syn = t_syn / (REPS * N)

    ratio = per_mul / per_syn if per_syn > 0 else float("inf")
    print(json.dumps({
        "platform": platform,
        "limbs": n,
        "elements": N,
        "field_mul_ns": round(per_mul * 1e9, 2),
        "roofline_ns": round(per_syn * 1e9, 2),
        "ratio": round(ratio, 3),
        "target": 1.3,
        "ok": ratio <= 1.3,
    }))


if __name__ == "__main__":
    main()
