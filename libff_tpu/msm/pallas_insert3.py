"""Pallas bucket-insert kernel v3: vreg-shaped lanes.

Lesson from the superseded v2 kernel (deleted in round 2): operand tiles
shaped (n, L) make every CIOS step slice a 1-D row (L,), which Mosaic lays
out as a single sublane — 1/8 VPU utilization plus relayouts.  v3 shapes
the lane axis as (Ls, 128) with Ls = L // 128 (Ls = 8 -> one full (8, 128)
vreg per limb row), so every field-arithmetic op in the unrolled CIOS is a
native 2-D vector op.  v2's other ideas survive here unchanged: grid
(W, T/tb) with the bucket block's index_map ignoring t (VMEM-resident
accumulator), and tb time-rows per grid step to amortize grid overhead.

Same contract and bit-identical results; reference semantics
multiexp.tcc:519-561.
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
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        bx_ref[...] = jnp.zeros_like(bx_ref)
        one = one_ref[:, 0]                          # (n,)
        by_ref[...] = jnp.broadcast_to(
            one[None, :, None, None, None], by_ref.shape)
        bz_ref[...] = jnp.zeros_like(bz_ref)

    for s in range(TB):
        d = d_ref[s, 0, :, :]                        # (Ls, 128) int32
        inf = pinf_ref[s, 0, :, :] != 0              # (Ls, 128)
        absd = jnp.abs(d)
        idx = jnp.clip(absd - 1, 0, B - 1)
        valid = (absd > 0) & (~inf)
        neg = d < 0

        b_iota = jax.lax.broadcasted_iota(jnp.int32, (B,) + idx.shape, 0)
        onehot = b_iota == idx[None]                 # (B, Ls, 128)

        bx = bx_ref[0]                               # (n, B, Ls, 128)
        by = by_ref[0]
        bz = bz_ref[0]

        oh = onehot[None]                            # (1, B, Ls, 128)

        def gather(arr):
            s_ = jnp.sum(jnp.where(oh, arr.astype(jnp.int32), 0), axis=1)
            return s_.astype(jnp.uint32)             # (n, Ls, 128)

        cx, cy, cz = gather(bx), gather(by), gather(bz)

        qx = px_ref[s]                               # (n, Ls, 128)
        qy = jnp.where(neg[None], pneg_ref[s], py_ref[s])

        X3, Y3, Z3 = fml.rcb_madd_a0(F, cx, cy, cz, qx, qy, b3_host)

        v = valid[None]
        nx = jnp.where(v, X3, cx)
        ny = jnp.where(v, Y3, cy)
        nz = jnp.where(v, Z3, cz)

        bx_ref[0] = jnp.where(oh, nx[:, None], bx)
        by_ref[0] = jnp.where(oh, ny[:, None], by)
        bz_ref[0] = jnp.where(oh, nz[:, None], bz)


def insert_pallas3(G, d, pts, B: int, *, tb: int = 16,
                   interpret: bool = False) -> ProjectivePoint:
    """Bucket accumulation, vreg-lane layout.

    d: (W, T, L) int32 signed digits; pts coords (n, T, L), pinf (T, L);
    L must be a multiple of 128.  Returns projective buckets with coords
    (n, W, B, L), bit-identical to insert_pallas/insert_pallas2.
    """
    F = G.F
    assert F.el_ndim == 1, "pallas insert supports prime-field G1 only"
    px, py, pneg, pinf = pts
    W, T, L = d.shape
    assert L % 128 == 0, L
    Ls = L // 128
    tb = min(tb, T)
    assert T % tb == 0, (T, tb)
    n = F.n
    kf = _KernelField(F)
    one_mont = jnp.asarray(np.asarray(F._one_mont, dtype=np.uint32)
                           ).reshape(n, 1)
    kernel = functools.partial(_insert_kernel, kf, G._b3_host, B, tb)

    d_t = jnp.moveaxis(d, 1, 0).reshape(T, W, Ls, 128)
    px_t = jnp.moveaxis(px, 1, 0).reshape(T, n, Ls, 128)
    py_t = jnp.moveaxis(py, 1, 0).reshape(T, n, Ls, 128)
    pneg_t = jnp.moveaxis(pneg, 1, 0).reshape(T, n, Ls, 128)
    pinf_t = pinf.astype(jnp.int32).reshape(T, 1, Ls, 128)

    out_shape = [jax.ShapeDtypeStruct((W, n, B, Ls, 128), jnp.uint32)
                 for _ in range(3)]
    bucket_spec = pl.BlockSpec((1, n, B, Ls, 128),
                               lambda w, t: (w, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    coord_spec = pl.BlockSpec((tb, n, Ls, 128), lambda w, t: (t, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    res = pl.pallas_call(
        kernel,
        grid=(W, T // tb),
        in_specs=[
            pl.BlockSpec((tb, 1, Ls, 128), lambda w, t: (t, w, 0, 0),
                         memory_space=pltpu.VMEM),
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((tb, 1, Ls, 128), lambda w, t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda w, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[bucket_spec] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(d_t, px_t, py_t, pneg_t, pinf_t, one_mont)
    res = [r.reshape(W, n, B, L) for r in res]
    return ProjectivePoint(*(jnp.moveaxis(r, 0, 1) for r in res))
