"""Pallas TPU kernel for the Pippenger bucket-insert phase.

The XLA formulation (pippenger._window_totals_complete) streams the whole
bucket array through HBM on every scan step and runs the mixed-add through
the formula VM's instruction scan.  This kernel removes both costs:

  * grid = (W, T) with T innermost; the bucket block's index_map ignores
    t, so Pallas keeps each window's buckets resident in VMEM across all
    T steps (the classic accumulator/revisiting pattern) and writes them
    back to HBM once per window;
  * the complete RCB15 mixed addition and the radix-2^16 CIOS Montgomery
    multiplier are fully unrolled vector code on (n_limbs, L) u32 tiles —
    no scan, no switch, no register-file traffic.

Bucket VMEM footprint per window: 3 coords x n x B x L x 4B
(alt_bn128 c=6, L=512: 6.3 MB — fits v5e VMEM).  Only a == 0 curves
(RCB formulas), Fq degree 1 (G1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..curves import formulas as fml
from ..curves.group import ProjectivePoint
from ..host import mont as hm


def _insert_kernel(F, b3_host, B, d_ref, px_ref, py_ref,
                   pneg_ref, pinf_ref, one_ref, bx_ref, by_ref, bz_ref):
    w = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        bx_ref[...] = jnp.zeros_like(bx_ref)
        one = one_ref[:, 0]                      # (n,)
        by_ref[...] = jnp.broadcast_to(
            one[None, :, None, None], by_ref.shape)
        bz_ref[...] = jnp.zeros_like(bz_ref)

    d = d_ref[0, w, :]                               # (L,) int32
    inf = pinf_ref[0, 0, :] != 0                     # (L,)
    absd = jnp.abs(d)
    idx = jnp.clip(absd - 1, 0, B - 1)
    valid = (absd > 0) & (~inf)
    neg = d < 0

    onehot = (jax.lax.broadcasted_iota(jnp.int32, (B, idx.shape[0]), 0)
              == idx[None, :])                       # (B, L)

    bx = bx_ref[0, :, :, :]                          # (n, B, L)
    by = by_ref[0, :, :, :]
    bz = bz_ref[0, :, :, :]

    oh = onehot[None, :, :]

    def gather(arr):
        # Mosaic lacks unsigned reductions: bitcast u32->i32 (two's
        # complement, value-preserving bitwise) for the one-hot sum
        s = jnp.sum(jnp.where(oh, arr.astype(jnp.int32), 0), axis=1)
        return s.astype(jnp.uint32)                    # (n, L)

    cx, cy, cz = gather(bx), gather(by), gather(bz)

    qx = px_ref[0, :, :]
    qy = jnp.where(neg[None, :], pneg_ref[0, :, :], py_ref[0, :, :])

    X3, Y3, Z3 = fml.rcb_madd_a0(F, cx, cy, cz, qx, qy, b3_host)

    v = valid[None, :]
    nx = jnp.where(v, X3, cx)
    ny = jnp.where(v, Y3, cy)
    nz = jnp.where(v, Z3, cz)

    bx_ref[0, :, :, :] = jnp.where(oh, nx[:, None, :], bx)
    by_ref[0, :, :, :] = jnp.where(oh, ny[:, None, :], by)
    bz_ref[0, :, :, :] = jnp.where(oh, nz[:, None, :], bz)


class _KernelField:
    """Thin adapter exposing the field-formula API over (n, L) u32 tiles
    inside the kernel, using the unrolled Montgomery multiplier of
    fields/fp.py.

    mul_impl: "cios" (operand-scanning, 2n^2-step serial carry chain) or
    "sos" (deferred-carry separated operand scanning, mul_sos — same op
    mix, far more ILP for the VPU pipeline)."""

    def __init__(self, F, mul_impl: str = "cios"):
        self.F = F
        self._mul = {"sos": F.mul_sos, "sos2": F.mul_sos2}.get(
            mul_impl, F.mul_unrolled)

    def mul(self, a, b):
        return self._mul(a, b)

    def sqr(self, a):
        return self._mul(a, a)

    def add(self, a, b):
        return self.F.add(a, b)

    def sub(self, a, b):
        return self.F.sub(a, b)

    def double(self, a):
        return self.F.add(a, a)

    def mul_small_const(self, a, c):
        c %= self.F.p
        if c == 0:
            return jnp.zeros_like(a)
        # small constants via the PrimeField addition chains; big ones must
        # stay on the UNROLLED multiplier inside the kernel (mul_loop's
        # fori_loop state defeats Mosaic's register allocation)
        if c <= 64 or self.F.p - c <= 64:
            return self.F.mul_small_const(a, c)
        cc = jnp.asarray(np.array(
            hm.int_to_limbs((c * self.F.mp.R) % self.F.p, self.F.n),
            dtype=np.uint32))
        return self.F.mul_unrolled(
            a, jnp.broadcast_to(
                cc.reshape((self.F.n,) + (1,) * (a.ndim - 1)), a.shape))


class _KernelField2:
    """Fq2 = Fq[U]/(U^2 - nr) arithmetic over PAIRS of (n, ...) u32 tiles
    (Karatsuba mul / complex squaring, fp2.tcc:101-151), built on the
    unrolled CIOS base multiplier — the tower analogue of _KernelField for
    the G2 insert kernel."""

    def __init__(self, F2, mul_impl: str = "cios"):
        """F2: device ExtField of degree 2 over a PrimeField."""
        assert F2.d == 2 and F2.B.el_ndim == 1
        self.B = _KernelField(F2.B, mul_impl)
        self.nr = F2._nr_host

    def _nr_mul(self, x):
        return self.B.mul_small_const(x, self.nr)

    def mul(self, a, b):
        B = self.B
        a0, a1 = a
        b0, b1 = b
        v0 = B.mul(a0, b0)
        v1 = B.mul(a1, b1)
        t = B.mul(B.add(a0, a1), B.add(b0, b1))
        return (B.add(v0, self._nr_mul(v1)), B.sub(B.sub(t, v0), v1))

    def sqr(self, a):
        B = self.B
        a0, a1 = a
        v = B.mul(a0, a1)
        t0 = B.mul(B.add(a0, a1), B.add(a0, self._nr_mul(a1)))
        return (B.sub(B.sub(t0, v), self._nr_mul(v)), B.add(v, v))

    def add(self, a, b):
        return (self.B.add(a[0], b[0]), self.B.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.B.sub(a[0], b[0]), self.B.sub(a[1], b[1]))

    def double(self, a):
        return (self.B.add(a[0], a[0]), self.B.add(a[1], a[1]))

    def mul_small_const(self, a, c_host):
        """Multiply by a host Fq2 constant (c0, c1).

        A general Fq2 constant would require embedding limb arrays, which
        Pallas forbids as captured kernel constants — the kernel passes
        such constants in as inputs and registers them via
        `const_overrides` (host value -> in-kernel tile tuple)."""
        ov = getattr(self, "const_overrides", {})
        if c_host in ov:
            return self.mul(a, ov[c_host])
        B = self.B
        c0, c1 = c_host
        a0, a1 = a
        if c1 % B.F.p == 0:
            return (B.mul_small_const(a0, c0), B.mul_small_const(a1, c0))
        # a general Fq2 constant (c1 != 0) would route large values through
        # _KernelField.mul_small_const, which embeds a captured limb-array
        # constant in the kernel — exactly what Pallas forbids.  Every such
        # constant (today: the twist b3) must be passed in as a kernel
        # input and registered in const_overrides.
        raise NotImplementedError(
            "general Fq2 kernel constant: pass it as an input and register "
            "it via const_overrides (see insert_pallas3's b3 handling)")


def insert_pallas(G, d, pts, B: int, *, interpret: bool | str = False
                  ) -> ProjectivePoint:
    """Bucket accumulation on TPU via the Pallas kernel.

    d: (W, T, L) int32 signed digits; pts: (px, py, pneg, pinf) with
    coords (n, T, L) and pinf (T, L).  Returns projective buckets
    (coords (n, W, B, L)).

    Mosaic block rules: the last two dims of every block must be full (or
    8/128-aligned), so arrays are fed time-major — digits (T, W, L) with a
    full-W block and an in-kernel dynamic row select, coords (T, n, L) —
    and buckets are produced as (W, n, B, L) then transposed once.
    """
    F = G.F
    assert F.el_ndim == 1, "pallas insert supports prime-field G1 only"
    px, py, pneg, pinf = pts
    W, T, L = d.shape
    n = F.n
    kf = _KernelField(F)
    one_mont = jnp.asarray(np.asarray(F._one_mont, dtype=np.uint32)
                           ).reshape(n, 1)
    kernel = functools.partial(_insert_kernel, kf, G._b3_host, B)

    d_t = jnp.moveaxis(d, 1, 0)                       # (T, W, L)
    px_t = jnp.moveaxis(px, 1, 0)                     # (T, n, L)
    py_t = jnp.moveaxis(py, 1, 0)
    pneg_t = jnp.moveaxis(pneg, 1, 0)
    pinf_t = pinf.astype(jnp.int32).reshape(T, 1, L)

    out_shape = [jax.ShapeDtypeStruct((W, n, B, L), jnp.uint32)
                 for _ in range(3)]
    bucket_spec = pl.BlockSpec((1, n, B, L), lambda w, t: (w, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    coord_spec = pl.BlockSpec((1, n, L), lambda w, t: (t, 0, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, W, L), lambda w, t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        coord_spec, coord_spec, coord_spec,
        pl.BlockSpec((1, 1, L), lambda w, t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, 1), lambda w, t: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = (d_t, px_t, py_t, pneg_t, pinf_t, one_mont)
    if interpret == "reference":
        # deterministic pure-JAX execution of the same kernel body (CPU
        # CI; see pallas_ref.py)
        import sys

        from .pallas_ref import reference_pallas_call

        res = reference_pallas_call(
            sys.modules[__name__], kernel, (W, T), in_specs,
            [bucket_spec] * 3, out_shape, inputs)
    else:
        res = pl.pallas_call(
            kernel,
            grid=(W, T),
            in_specs=in_specs,
            out_specs=[bucket_spec] * 3,
            out_shape=out_shape,
            interpret=interpret,
        )(*inputs)
    return ProjectivePoint(*(jnp.moveaxis(r, 0, 1) for r in res))


def window_totals_pallas(G, d, pts, B: int, *, interpret: bool = False
                         ) -> ProjectivePoint:
    """insert (Pallas) + lane merge + bucket suffix tree, same contract as
    pippenger._window_totals_complete."""
    from . import pippenger as pp

    buckets = insert_pallas(G, d, pts, B, interpret=interpret)
    return pp._reduce_buckets(G, buckets, B)
