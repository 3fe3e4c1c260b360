"""G2 MSM phase breakdown: where do the milliseconds go?

Round-4 finding: G2 2^16 runs ~833 ns/madd against G1 2^20's ~17 ns/madd
— a ~48x per-madd gap where the arithmetic (Karatsuba Fq2, 33 vs 11 base
muls per madd, 2x one-hot rows) predicts ~3x.  This harness isolates the
phases to find the lost factor:

  1. full     — msm_pippenger end to end (the sweep's number)
  2. insert   — insert_pallas3 alone (digits prep included, fenced)
  3. fq2mul   — a pure _KernelField2 Karatsuba mul chain in the same
                Pallas tile structure as the insert kernel: ns per Fq2
                mul vs 3x the G1 base-mul time (roofline.py: 0.90 ns)
  4. reduce   — derived: full - insert (lane merge + suffix + horner)

Usage: python profile/g2_phases.py [log2n] [c] [L] [tb] [kmul]
Prints JSON lines; safe to run only when the TPU is otherwise idle.
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

from libff_tpu.curves.device import device_curve       # noqa: E402
from libff_tpu.curves.group import AffinePoint         # noqa: E402
from libff_tpu.msm import digits as dig                # noqa: E402
from libff_tpu.msm.pallas_insert import _KernelField2  # noqa: E402
from libff_tpu.msm.pallas_insert3 import insert_pallas3  # noqa: E402
from libff_tpu.msm.pippenger import (MsmConfig, _prepare,  # noqa: E402
                                     msm_pippenger)


def _fence(o):
    arr = o if hasattr(o, "dtype") else o.z
    return np.asarray(arr).ravel()[0]


def _time(fn, make_args, iters=3):
    _fence(fn(*make_args(0)))                          # warm-up, fenced
    best = float("inf")
    for i in range(1, iters + 1):
        t0 = time.perf_counter()
        _fence(fn(*make_args(i)))
        best = min(best, time.perf_counter() - t0)
    return best


def fq2_mul_ns(F2, T=4096, Ls=4, muls_per_step=8, chains=4, kmul="sos"):
    """ns per Fq2 Karatsuba mul in the insert kernel's tile structure:
    (K=2n, Ls, 128) u32 tiles, `chains` independent serial chains."""
    kf = _KernelField2(F2, kmul)
    n = F2.B.n
    K = 2 * n

    def split(arr):
        return (arr[:n], arr[n:])

    def join(v):
        return jnp.concatenate(list(v), axis=0)

    def kernel(a_ref, b_ref, o_ref):
        a = split(a_ref[0])
        b = split(b_ref[0])
        xs = [kf.add(a, kf.add(b, a) if k else b) for k in range(chains)]
        for _ in range(muls_per_step // chains):
            xs = [kf.mul(x, b) for x in xs]
        acc = xs[0]
        for x in xs[1:]:
            acc = kf.add(acc, x)
        o_ref[0] = join(acc)

    rng = np.random.default_rng(11)
    vals = [[int(v) for v in rng.integers(1, 2**61, (2,))] for _ in range(64)]
    base = np.asarray(F2.from_host_batch(vals))          # (2, n, 64)
    a = np.tile(base.reshape(K, 64), (1, T * Ls * 2)).reshape(
        K, T, Ls, 128).transpose(1, 0, 2, 3)
    b = np.ascontiguousarray(a[::-1])
    a, b = jnp.asarray(a), jnp.asarray(b)
    spec = pl.BlockSpec((1, K, Ls, 128), lambda t: (t, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    f = jax.jit(lambda a, b: jnp.sum(pl.pallas_call(
        kernel, grid=(T,), in_specs=[spec, spec],
        out_specs=pl.BlockSpec((1, K, Ls, 128), lambda t: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, K, Ls, 128), jnp.uint32),
    )(a, b), dtype=jnp.uint32))
    t = _time(lambda a, b, s: f(a + (s & 1), b),
              lambda i: (a, b, jnp.uint32(i)))
    return t / (T * Ls * 128 * muls_per_step)


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

    # pure Fq2 Karatsuba mul in kernel tiles
    per2 = fq2_mul_ns(F2, kmul=kmul)
    print(json.dumps({"fq2_mul_ns": round(per2 * 1e9, 3),
                      "per_base_mul_ns": round(per2 * 1e9 / 3, 3),
                      "kmul": kmul}), flush=True)

    # inputs (structure irrelevant for timing; any valid Fq2 coords)
    rng = np.random.default_rng(2)
    vals = [[int(v) for v in rng.integers(1, 2**61, (2,))] for _ in range(64)]
    xs = np.asarray(F2.from_host_batch(vals))
    ys = np.asarray(F2.from_host_batch(vals[::-1]))
    x = jnp.asarray(np.tile(xs, (1, 1, N // 64)))
    y = jnp.asarray(np.tile(ys, (1, 1, N // 64)))
    inf = jnp.zeros((N,), bool)
    limbs = jnp.asarray(
        rng.integers(0, 2**16, (dc.fr.n, N)).astype(np.uint32))

    def ins(s, x, y, i, sft):
        s = s.at[0].set((s[0] + sft) & 0xFFFF)
        s2, pts, el, T, L2 = _prepare(G, s, AffinePoint(x, y, i), cfg)
        d = dig.signed_digits(s2, c, W).reshape(W, T, L2)
        bk = insert_pallas3(G, d, pts, B, tb=tb, kmul=kmul)
        return jnp.sum(bk.z, dtype=jnp.uint32)

    t_ins = _time(jax.jit(ins), lambda i: (limbs, x, y, inf, jnp.uint32(i)))
    print(json.dumps({"insert_s": round(t_ins, 4),
                      "insert_madd_ns": round(t_ins / (N * W) * 1e9, 1),
                      "insert_per_mul_ns":
                          round(t_ins / (N * W * 33) * 1e9, 3)}), flush=True)

    def full(s, x, y, i, sft):
        s = s.at[0].set((s[0] + sft) & 0xFFFF)
        return msm_pippenger(G, s, AffinePoint(x, y, i), 254, config=cfg)

    t_full = _time(jax.jit(full), lambda i: (limbs, x, y, inf, jnp.uint32(i)))
    print(json.dumps({"full_s": round(t_full, 4),
                      "pts_per_sec": round(N / t_full, 1),
                      "reduce_plus_horner_s": round(t_full - t_ins, 4),
                      "config": f"c{c}/L{L}/tb{tb}/{kmul}",
                      "log2n": log2n}), flush=True)


if __name__ == "__main__":
    main()
