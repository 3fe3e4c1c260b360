"""Batched group-operation Pallas kernels: kernel-speed `G.add` et al.

profile_algebra_groups measures raw batched add / mixed_add / dbl
throughput (profile_algebra_groups.cpp:17-99).  Through XLA those ops are
memory-scheduling-bound: a standalone unrolled Montgomery mul measures
~23 ns on v5e while the same mul inside a Pallas kernel runs at ~1.4 ns
(profile/roofline.py, BENCH_r04 detail) — XLA splits the ~2000-op CIOS
graph into many partial fusions with HBM round-trips.  These kernels run
one whole group formula per batch tile in VMEM/registers, reusing the MSM
insert kernel's field machinery (msm/pallas_insert._KernelField[2]) and
the shared EFD/RCB15 formula definitions (curves/formulas.py), so results
are bit-identical to the VM executors.

Layout (the pallas_insert3 lesson): the batch axis is shaped (Ls, 128)
vreg tiles, inputs are (T, K, Ls, 128) with grid (T/tb,) and tb formula
applications per grid step.

Scope: short-Weierstrass groups with a == 0 over a prime field or an
Fq2 tower (kernel_eligible) — alt_bn128 / bls12_377 / bls12_381 G1+G2.
Other curves keep the rounds/scan executors (curves/group.py _run).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import formulas as fml
from ..msm.pallas_insert import _KernelField, _KernelField2

LANES = 128
LS = 8                        # sublanes: one full (8, 128) vreg per row


def _is_zero(k, v):
    """Canonical-form zero test over (K, Ls, 128) limb rows (or k-tuple)."""
    if k == 1:
        return jnp.all(v == 0, axis=0)
    return jnp.all(v[0] == 0, axis=0) & jnp.all(v[1] == 0, axis=0)


def _sel(k, mask, a, b):
    """where over field values; mask (Ls, 128)."""
    if k == 1:
        return jnp.where(mask[None], a, b)
    return tuple(jnp.where(mask[None], x, y) for x, y in zip(a, b))


def _split(k, n, arr):
    if k == 1:
        return arr
    return tuple(arr[i * n:(i + 1) * n] for i in range(k))


def _join(k, val):
    if k == 1:
        return val
    return jnp.concatenate(list(val), axis=0)


def _op_kernel(kf, k, n, op, b3_host, TB, *refs):
    """refs: coord inputs, mask inputs, [one], [b3 if k==2], then the 3
    output refs; coord refs (TB, K, Ls, 128), masks (TB, 1, Ls, 128)."""
    nin = {"add": 6, "madd": 5, "dbl": 3,
           "padd": 6, "pmadd": 5, "pdbl": 3}[op]
    nmask = 1 if op in ("madd", "pmadd") else 0
    ins = refs[:nin]
    masks = refs[nin:nin + nmask]
    pos = nin + nmask
    one_ref = None
    if op in ("add", "madd"):
        one_ref = refs[pos]
        pos += 1
    if k == 2:
        b3_ref = refs[pos]
        pos += 1
        kf.const_overrides = {
            b3_host: tuple(b3_ref[i * n:(i + 1) * n] for i in range(2))}
    outs = refs[pos:pos + 3]
    sp = ins[0].shape[-2:]                            # (Ls, 128)
    K = k * n

    for s in range(TB):
        cs = [_split(k, n, r[s]) for r in ins]
        if op == "dbl":
            X3, Y3, Z3 = fml.jacobian_dbl(kf, *cs, None)
        elif op == "pdbl":
            X3, Y3, Z3 = fml.rcb_dbl_a0(kf, *cs, b3_host)
        elif op == "padd":
            X3, Y3, Z3 = fml.rcb_add_a0(kf, *cs, b3_host)
        elif op == "pmadd":
            q_inf = masks[0][s, 0] != 0
            x3, y3, z3 = fml.rcb_madd_a0(kf, *cs, b3_host)
            X3 = _sel(k, q_inf, cs[0], x3)
            Y3 = _sel(k, q_inf, cs[1], y3)
            Z3 = _sel(k, q_inf, cs[2], z3)
        elif op in ("add", "madd"):
            if op == "add":
                x3, y3, z3, h, r = fml.jacobian_add_raw(kf, *cs)
                q_zero = _is_zero(k, cs[5])
            else:
                x3, y3, z3, h, r = fml.jacobian_madd_raw(kf, *cs)
                q_zero = masks[0][s, 0] != 0
            xd, yd, zd = fml.jacobian_dbl(kf, cs[0], cs[1], cs[2], None)
            p_zero = _is_zero(k, cs[2])
            h_zero = _is_zero(k, h)
            r_zero = _is_zero(k, r)
            both_live = (~p_zero) if op == "madd" else (
                (~p_zero) & (~q_zero))
            dbl_case = h_zero & r_zero & both_live
            inf_case = h_zero & (~r_zero) & both_live
            X3 = _sel(k, dbl_case, xd, x3)
            Y3 = _sel(k, dbl_case, yd, y3)
            Z3 = _sel(k, dbl_case, zd, z3)
            # infinity result: (0, 1, 0)
            one = one_ref[:, 0]                       # (K,)
            onev = _split(k, n, jnp.broadcast_to(one[:, None, None],
                                                 (K,) + sp))
            zerov = _split(k, n, jnp.zeros((K,) + sp, jnp.uint32))
            X3 = _sel(k, inf_case, zerov, X3)
            Y3 = _sel(k, inf_case, onev, Y3)
            Z3 = _sel(k, inf_case, zerov, Z3)
            # P == 0 -> Q (as Jacobian); Q == 0 / inf -> P
            if op == "add":
                qx, qy, qz = cs[3], cs[4], cs[5]
            else:
                # affine Q -> Jacobian (x, y, 1); its inf lanes are
                # overridden by the q_zero select below
                qx, qy, qz = cs[3], cs[4], onev
            X3 = _sel(k, p_zero, qx, X3)
            Y3 = _sel(k, p_zero, qy, Y3)
            Z3 = _sel(k, p_zero, qz, Z3)
            X3 = _sel(k, q_zero, cs[0], X3)
            Y3 = _sel(k, q_zero, cs[1], Y3)
            Z3 = _sel(k, q_zero, cs[2], Z3)
        else:
            raise ValueError(op)
        outs[0][s] = _join(k, X3)
        outs[1][s] = _join(k, Y3)
        outs[2][s] = _join(k, Z3)


def kernel_op_eligible(G, batch_shape) -> bool:
    """Layout + size gate: the batch axes are flattened to one tile axis
    (free — they trail the element axes), so any batch whose total size
    is a large multiple of one (8, 128) vreg qualifies."""
    from ..msm.pallas_insert3 import kernel_eligible

    if not (getattr(G, "a_is_zero", False) and kernel_eligible(G.F)):
        return False
    N = int(np.prod(batch_shape)) if batch_shape else 1
    return N % (LS * LANES) == 0 and N >= (1 << 13)


def group_op_pallas(G, op, coords, masks=(), *, kmul="cios",
                    interpret=False):
    """Run one batched group op as a Pallas kernel.

    coords: list of field coordinate arrays (el..., N); masks: list of
    (N,) bool arrays (q_inf for the mixed adds).  Returns three coordinate
    arrays (el..., N).  Bit-identical to the VM executors (same formulas,
    same CIOS multiplier)."""
    F = G.F
    if F.el_ndim == 1:
        k, n = 1, F.n
        kf = _KernelField(F, kmul)
        one_host = np.asarray(F._one_mont, dtype=np.uint32)
    else:
        k, n = 2, F.B.n
        kf = _KernelField2(F, kmul)
        one_host = np.concatenate([
            np.asarray(F.B._one_mont, dtype=np.uint32),
            np.zeros((n,), dtype=np.uint32)])
    K = k * n
    N = coords[0].shape[-1]
    assert N % (LS * LANES) == 0, N
    T = N // (LS * LANES)
    # tb = 1: the per-step body (one whole formula on a (K, 8, 128) tile)
    # already amortizes the grid overhead, and Mosaic compile time scales
    # with the tb-unrolled body (the insert-kernel lesson)
    tb = 1
    el_shape = coords[0].shape[:-1]

    def tile(a):
        return a.reshape((K, T, LS, LANES)).transpose(1, 0, 2, 3)

    inputs = [tile(c) for c in coords]
    coord_spec = pl.BlockSpec((tb, K, LS, LANES), lambda t: (t, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [coord_spec] * len(coords)
    for m in masks:
        inputs.append(m.astype(jnp.int32).reshape(T, 1, LS, LANES))
        in_specs.append(pl.BlockSpec((tb, 1, LS, LANES),
                                     lambda t: (t, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
    # the Montgomery one (for the add/madd infinity select)
    if op in ("add", "madd"):
        inputs.append(jnp.asarray(one_host).reshape(K, 1))
        in_specs.append(pl.BlockSpec((K, 1), lambda t: (0, 0),
                                     memory_space=pltpu.VMEM))
    if k == 2:
        from ..host import mont as hm

        b3_limbs = np.concatenate([
            np.array(hm.int_to_limbs(hm.to_mont(F.B.mp, c), n),
                     dtype=np.uint32) for c in G._b3_host])
        inputs.append(jnp.asarray(np.broadcast_to(
            b3_limbs.reshape(K, 1, 1), (K, LS, LANES)).copy()))
        in_specs.append(pl.BlockSpec((K, LS, LANES), lambda t: (0, 0, 0),
                                     memory_space=pltpu.VMEM))

    kernel = functools.partial(_op_kernel, kf, k, n, op, G._b3_host, tb)
    out_shape = [jax.ShapeDtypeStruct((T, K, LS, LANES), jnp.uint32)
                 for _ in range(3)]
    if interpret == "reference":
        # pure-JAX execution of the same kernel body (CPU CI; Mosaic's
        # interpret emulation stalls on this CPU backend — see pallas_ref)
        import sys

        from ..msm.pallas_ref import reference_pallas_call

        res = reference_pallas_call(
            sys.modules[__name__], kernel, (T // tb,), in_specs,
            [coord_spec] * 3, out_shape, inputs)
    else:
        res = pl.pallas_call(
            kernel,
            grid=(T // tb,),
            in_specs=in_specs,
            out_specs=[coord_spec] * 3,
            out_shape=out_shape,
            interpret=interpret,
        )(*inputs)
    return [r.transpose(1, 0, 2, 3).reshape(el_shape + (N,)) for r in res]
