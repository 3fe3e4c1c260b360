"""VPU issue-rate micro-benchmarks for the defended roofline derivation
(docs/roofline_derivation.md).

The SOL bound in profile/roofline.py assumes every op of the CIOS mix
issues back-to-back with zero dependency stalls.  This harness measures
what the v5e VPU actually sustains per op class, in the same Pallas
structure as the production kernel (grid over T steps, (8, 128) u32
tiles), so the bound can be restated in terms of MEASURED issue rates:

  * mul_indep:    independent u32 multiplies, 8-way ILP
  * cheap_indep:  independent u32 add/and/shift stream, 8-way ILP
  * mac_indep:    the SOL MAC group {mul, and, shift, 2 adds}, 8-way
  * mul_chain_k:  a SERIAL multiply-add chain at k-way interleave —
                  latency-bound until k covers the mul pipeline depth;
                  the k where it flattens IS the pipeline depth the CIOS
                  carry chain must hide

Each line: ns per op (the op being one mul for mul_*, one cheap op for
cheap_indep, one 5-op group for mac_indep).  Usage:
  python profile/vpu_issue.py
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
from jax.experimental import pallas as pl              # noqa: E402
from jax.experimental.pallas import tpu as pltpu       # noqa: E402

def _time(f, args, iters=3):
    out = f(*args(0))
    _ = int(out)
    best = float("inf")
    for i in range(1, iters + 1):
        t0 = time.perf_counter()
        _ = int(f(*args(i)))
        best = min(best, time.perf_counter() - t0)
    return best


def _bench(body, ops_per_elem, T=2048, Ls=8, name=""):
    """Run `body(xs, b) -> xs` inside a Pallas grid kernel over
    (1, Ls, 128) u32 tiles; report ns per op (T*Ls*128 elems)."""

    def kernel(a_ref, b_ref, o_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            o_ref[...] = jnp.zeros_like(o_ref)

        a = a_ref[0]
        b = b_ref[0]
        o_ref[0] = o_ref[0] ^ body(a, b)

    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.integers(0, 2**16, (T, Ls, 128), dtype=np.uint32))
    b = jnp.asarray(rng.integers(1, 2**16, (T, Ls, 128), dtype=np.uint32))
    spec = pl.BlockSpec((1, Ls, 128), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)
    interp = jax.default_backend() != "tpu"
    f = jax.jit(lambda a, b: jnp.sum(pl.pallas_call(
        kernel, grid=(T,), in_specs=[spec, spec], interpret=interp,
        out_specs=pl.BlockSpec((1, Ls, 128), lambda t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Ls, 128), jnp.uint32),
    )(a, b), dtype=jnp.uint32))
    t = _time(lambda a, b, s: f(a + s, b), lambda i: (a, b, jnp.uint32(i)))
    per = t / (T * Ls * 128 * ops_per_elem)
    return round(per * 1e9, 4)


def main() -> None:
    R = 1024  # op-group repetitions per element per grid step
    # (large so the straight-line body dwarfs per-grid-step overhead)
    out = {"platform": jax.devices()[0].platform}

    def mul_indep(a, b):
        xs = [a + k for k in range(8)]
        for _ in range(R // 8):
            xs = [x * b for x in xs]
        acc = xs[0]
        for x in xs[1:]:
            acc = acc ^ x
        return acc

    out["mul_indep_ns"] = _bench(mul_indep, R, name="mul_indep")

    def cheap_indep(a, b):
        xs = [a + k for k in range(8)]
        for _ in range(R // 8):
            xs = [((x + b) & 0xFFFF) >> 1 for x in xs]   # add, and, shift
        acc = xs[0]
        for x in xs[1:]:
            acc = acc ^ x
        return acc

    out["cheap_indep_ns"] = _bench(cheap_indep, 3 * R, name="cheap_indep")

    def mac_indep(a, b):
        # the SOL kernel's exact group: p = x*b; lo += p & MASK;
        # hi += p >> 16  (1 mul + 4 cheap)
        lo = [a + k for k in range(4)]
        hi = [b + k for k in range(4)]
        for _ in range(R // 4):
            for k in range(4):
                p = lo[k] * b
                lo[k] = lo[k] + (p & 0xFFFF)
                hi[k] = hi[k] + (p >> 16)
        acc = lo[0]
        for x in lo[1:] + hi:
            acc = acc ^ x
        return acc

    out["mac_group_ns"] = _bench(mac_indep, R, name="mac_group")

    for k in (1, 2, 4, 8):
        def chain(a, b, k=k):
            xs = [a + i for i in range(k)]
            for _ in range(R // k):
                xs = [x * b + a for x in xs]    # serial mul-add chain
            acc = xs[0]
            for x in xs[1:]:
                acc = acc ^ x
            return acc

        out[f"mul_chain_{k}_ns"] = _bench(chain, R, name=f"chain{k}")

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
