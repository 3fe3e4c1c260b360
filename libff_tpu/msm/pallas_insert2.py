"""Pallas bucket-insert kernel v2: multi-step grid blocks.

The v1 kernel (pallas_insert.py) runs grid (W, T) with one digit row per
grid step; measured on v5e the per-step overhead (~1.5 ms: block DMA
turnaround + Mosaic layout changes on the (1, n, B, L) revisited block)
dwarfs the ~25 us of useful VPU work, making it 4x slower than the XLA
one-hot formulation.

v2 amortizes that overhead: grid (W, T // TB) where each step consumes a
block of TB consecutive digit rows / point tiles and runs the insert loop
for them inside the kernel (a Python loop over TB — fully unrolled, no
scan).  The bucket block stays (1, n, B, L) VMEM-resident across the whole
T // TB sweep (index_map ignores t), so the HBM traffic is unchanged:
points in once per window, buckets out once per window.

Same contract as insert_pallas; reference semantics multiexp.tcc:519-561.
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
from .pallas_insert import _KernelField


def _insert_kernel(F, b3_host, B, TB, d_ref, px_ref, py_ref,
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

    for s in range(TB):
        d = d_ref[s, w, :]                           # (L,) int32
        inf = pinf_ref[s, 0, :] != 0                 # (L,)
        absd = jnp.abs(d)
        idx = jnp.clip(absd - 1, 0, B - 1)
        valid = (absd > 0) & (~inf)
        neg = d < 0

        onehot = (jax.lax.broadcasted_iota(jnp.int32, (B, idx.shape[0]), 0)
                  == idx[None, :])                   # (B, L)

        bx = bx_ref[0, :, :, :]                      # (n, B, L)
        by = by_ref[0, :, :, :]
        bz = bz_ref[0, :, :, :]

        oh = onehot[None, :, :]

        def gather(arr):
            s_ = jnp.sum(jnp.where(oh, arr.astype(jnp.int32), 0), axis=1)
            return s_.astype(jnp.uint32)             # (n, L)

        cx, cy, cz = gather(bx), gather(by), gather(bz)

        qx = px_ref[s, :, :]
        qy = jnp.where(neg[None, :], pneg_ref[s, :, :], py_ref[s, :, :])

        X3, Y3, Z3 = fml.rcb_madd_a0(F, cx, cy, cz, qx, qy, b3_host)

        v = valid[None, :]
        nx = jnp.where(v, X3, cx)
        ny = jnp.where(v, Y3, cy)
        nz = jnp.where(v, Z3, cz)

        bx_ref[0, :, :, :] = jnp.where(oh, nx[:, None, :], bx)
        by_ref[0, :, :, :] = jnp.where(oh, ny[:, None, :], by)
        bz_ref[0, :, :, :] = jnp.where(oh, nz[:, None, :], bz)


def insert_pallas2(G, d, pts, B: int, *, tb: int = 16,
                   interpret: bool = False) -> ProjectivePoint:
    """Bucket accumulation with TB digit rows per grid step.

    d: (W, T, L) int32 signed digits; pts coords (n, T, L), pinf (T, L).
    Returns projective buckets (coords (n, W, B, L)).  T must be a
    multiple of tb (callers pad N to a lane multiple already; pick tb
    dividing T).
    """
    F = G.F
    assert F.el_ndim == 1, "pallas insert supports prime-field G1 only"
    px, py, pneg, pinf = pts
    W, T, L = d.shape
    tb = min(tb, T)
    assert T % tb == 0, (T, tb)
    n = F.n
    kf = _KernelField(F)
    one_mont = jnp.asarray(np.asarray(F._one_mont, dtype=np.uint32)
                           ).reshape(n, 1)
    kernel = functools.partial(_insert_kernel, kf, G._b3_host, B, tb)

    d_t = jnp.moveaxis(d, 1, 0)                       # (T, W, L)
    px_t = jnp.moveaxis(px, 1, 0)                     # (T, n, L)
    py_t = jnp.moveaxis(py, 1, 0)
    pneg_t = jnp.moveaxis(pneg, 1, 0)
    pinf_t = pinf.astype(jnp.int32).reshape(T, 1, L)

    out_shape = [jax.ShapeDtypeStruct((W, n, B, L), jnp.uint32)
                 for _ in range(3)]
    bucket_spec = pl.BlockSpec((1, n, B, L), lambda w, t: (w, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    coord_spec = pl.BlockSpec((tb, n, L), lambda w, t: (t, 0, 0),
                              memory_space=pltpu.VMEM)
    res = pl.pallas_call(
        kernel,
        grid=(W, T // tb),
        in_specs=[
            pl.BlockSpec((tb, W, L), lambda w, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((tb, 1, L), lambda w, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda w, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[bucket_spec] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(d_t, px_t, py_t, pneg_t, pinf_t, one_mont)
    return ProjectivePoint(*(jnp.moveaxis(r, 0, 1) for r in res))
