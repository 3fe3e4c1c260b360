"""Batched-affine bucket-add experiment (VERDICT r03 next-step #4).

libff's fast path adds AFFINE points into buckets (mixed_add +
batch_to_special, multiexp.tcc:949-974) because an affine add is ~6 field
muls once the per-add inversion is amortized by the Montgomery trick
(field_utils.tcc:419-439).  The TPU insert kernel instead uses the
complete projective madd (rcb_madd_a0, 11 muls) with projective buckets —
3 bucket coords of one-hot gather/scatter traffic.

The affine alternative would store buckets as (x, y, inf): 2/3 the
one-hot traffic and a ~4-mul add body (lambda = num/den, x3, y3), PLUS a
per-step batched inversion of the lane-wide denominator vector.  The open
question is the real cost of that inversion INSIDE the kernel, where the
only cross-lane primitive is a vreg roll: the product tree and the
prefix/suffix unwind are log2(L)-level roll+mul butterflies whose every
level is a FULL-width vector op (Mosaic has no narrow-vreg discount), and
the total-product Fermat inversion is a ~380-mul serial chain at 1-lane
occupancy.

This harness times, at production tile shapes ((n, Ls, 128) u32, grid T):
  madd_pass       one rcb_madd_a0 per step           (the incumbent)
  affine_body     affine add body per step, inversion EXCLUDED
  lane_inv        the batched lane-inversion primitive per step
                  (roll-butterfly prefix+suffix products, masked Fermat
                  inversion of the total, per-lane combine)
and prints accept/reject: affine wins iff
  affine_body + lane_inv < madd_pass * (1 - traffic_credit)
where traffic_credit = 1/3 of the measured one-hot share (the judge-run
r03 breakdown put one-hot traffic at ~60% of insert time, so the credit
is ~0.2 of the madd pass).

Usage: python profile/affine_experiment.py [T] [Ls]
Prints one JSON line.
"""

from __future__ import annotations

import json
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
from jax.experimental import pallas as pl              # noqa: E402
from jax.experimental.pallas import tpu as pltpu       # noqa: E402

from libff_tpu.curves import formulas as fml           # noqa: E402
from libff_tpu.curves.device import device_curve       # noqa: E402
from libff_tpu.msm.pallas_insert import _KernelField   # noqa: E402


def _time(jitfn, make_args, iters=3):
    out = jitfn(*make_args(0))
    _ = int(out)
    best = float("inf")
    for i in range(1, iters + 1):
        t0 = time.perf_counter()
        _ = int(jitfn(*make_args(i)))
        best = min(best, time.perf_counter() - t0)
    return best


def _run_kernel(kernel, n, T, Ls, n_in=2):
    """Time a kernel of signature (a_ref, b_ref[, ...], o_ref) over a
    (T,) grid of (n, Ls, 128) u32 tiles."""
    rng = np.random.default_rng(7)
    args = [jnp.asarray(rng.integers(1, 2**16, (T, n, Ls, 128),
                                     dtype=np.uint32)) for _ in range(n_in)]
    spec = pl.BlockSpec((1, n, Ls, 128), lambda t: (t, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    f = jax.jit(lambda s, *a: jnp.sum(pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[spec] * n_in,
        out_specs=pl.BlockSpec((1, n, Ls, 128), lambda t: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n, Ls, 128), jnp.uint32),
    )(*(x + s for x in a)), dtype=jnp.uint32))
    return _time(f, lambda i: (jnp.uint32(i),) + tuple(args))


def main() -> None:
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    Ls = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    dc = device_curve("alt_bn128")
    F = _KernelField(dc.fq)
    n = dc.fq.n
    b3 = dc.g1._b3_host
    L = Ls * 128

    # --- 1) incumbent: one complete projective madd per step --------------
    def madd_kernel(a_ref, b_ref, o_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
        a = a_ref[0]
        b = b_ref[0]
        X, Y, Z = o_ref[0], a, b
        X3, Y3, Z3 = fml.rcb_madd_a0(F, X, Y, Z, a, b, b3)
        o_ref[0] = X3 ^ Y3 ^ Z3

    t_madd = _run_kernel(madd_kernel, n, T, Ls)

    # --- 2) affine add body, inversion excluded ---------------------------
    def affine_kernel(a_ref, b_ref, o_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
        x1, y1 = o_ref[0], a_ref[0]          # bucket (affine)
        x2, y2 = a_ref[0], b_ref[0]          # incoming point
        dinv = b_ref[0]                      # stand-in for the inverse
        # select add vs dbl numerator (data-dependent so the compiler
        # cannot fold the select away)
        x_eq = jnp.all(x1 == x2, axis=0, keepdims=True)
        num_add = F.sub(y2, y1)
        sq = F.mul(x1, x1)
        num_dbl = F.add(F.add(sq, sq), sq)   # 3*x1^2
        num = jnp.where(x_eq, num_dbl, num_add)
        lam = F.mul(num, dinv)
        x3 = F.sub(F.sub(F.mul(lam, lam), x1), x2)
        y3 = F.sub(F.mul(lam, F.sub(x1, x3)), y1)
        o_ref[0] = x3 ^ y3

    t_aff = _run_kernel(affine_kernel, n, T, Ls)

    # --- 3) lane batch-inversion primitive per step -----------------------
    # product across L lanes: Ls-halving + 7 roll butterflies (every level
    # a full-width mul); Fermat inversion of the (redundant, all-lanes)
    # total via the ~(bits + popcount)-mul ladder at full tile shape (the
    # kernel cannot shrink below a vreg anyway); per-lane combine with
    # prefix*suffix butterfly products (Hillis-Steele inclusive scans,
    # log2(L) mul levels each).
    p = dc.fq.p
    ebits = bin(p - 2)[2:]

    def inv_kernel(a_ref, b_ref, o_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
        d = a_ref[0]
        # prefix products (inclusive scan over the flattened lane axis):
        # stride-doubling roll+mul, masked so lanes < stride keep theirs
        pre = d
        stride = 1
        while stride < 128:
            rolled = pltpu.roll(pre, stride, 2)
            lane = jax.lax.broadcasted_iota(jnp.int32, pre.shape, 2)
            pre = jnp.where(lane >= stride, F.mul(pre, rolled), pre)
            stride *= 2
        s = 1
        while s < Ls:
            shifted = pltpu.roll(pre, s, 1)
            sub = jax.lax.broadcasted_iota(jnp.int32, pre.shape, 1)
            pre = jnp.where(sub >= s, F.mul(pre, shifted), pre)
            s *= 2
        # suffix products: same butterfly, reversed direction
        suf = d
        stride = 1
        while stride < 128:
            rolled = pltpu.roll(suf, 128 - stride, 2)
            lane = jax.lax.broadcasted_iota(jnp.int32, suf.shape, 2)
            suf = jnp.where(lane < 128 - stride, F.mul(suf, rolled), suf)
            stride *= 2
        # total product = last lane of pre (broadcast via roll-sum trick):
        total = pre                       # all-lanes redundant stand-in
        # Fermat ladder a^(p-2): square always, mul on set bits
        acc = total
        for bit in ebits[1:]:
            acc = F.mul(acc, acc)
            if bit == "1":
                acc = F.mul(acc, total)
        o_ref[0] = F.mul(F.mul(pre, suf), acc)

    t_inv = _run_kernel(inv_kernel, n, T, Ls)

    traffic_credit = 0.2     # 1/3 coord traffic saved x ~60% one-hot share
    affine_total = t_aff + t_inv
    win = affine_total < t_madd * (1 + traffic_credit)
    per = 1e9 / (T * L)
    print(json.dumps({
        "metric": "affine_bucket_experiment",
        "platform": jax.devices()[0].platform,
        "T": T, "lanes": L,
        "madd_ns_per_el": round(t_madd * per, 3),
        "affine_body_ns_per_el": round(t_aff * per, 3),
        "lane_inv_ns_per_el": round(t_inv * per, 3),
        "affine_total_ns_per_el": round(affine_total * per, 3),
        "traffic_credit": traffic_credit,
        "accept": bool(win),
        "note": ("accept = affine_body + lane_inv < madd * (1 + "
                 "traffic_credit); the Fermat ladder runs at full tile "
                 "shape because Mosaic has no sub-vreg discount"),
    }))


if __name__ == "__main__":
    main()
