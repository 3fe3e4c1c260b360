"""Batched group-op Pallas kernels vs the scan VM (curves/pallas_ops.py).

Runs the kernel bodies through the deterministic pure-JAX reference
executor (msm/pallas_ref.py; Mosaic's interpret emulation stalls on this
CPU backend), with special-case lanes mixed in: P == Q (doubling), P ==
-Q (infinity), zero/infinity operands.  Bounded: one Jacobian op and one
complete op per group (the full 5-op x 2-group sweep ran once in the
development log; each eager reference execution costs ~30 s CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from libff_tpu.curves.device import device_curve
from libff_tpu.curves.group import AffinePoint
from libff_tpu.curves import pallas_ops as po

N = 1024


@pytest.fixture(scope="module")
def dc():
    return device_curve("alt_bn128")


def _setup(G, gd):
    E, gen = gd.curve, gd.generator
    ps = [E.mul(i + 2, gen) for i in range(16)]
    qs = [E.mul(2 * i + 3, gen) for i in range(16)]
    qs[0] = ps[0]                                  # dbl lane
    qs[1] = (ps[1][0], E.F.neg(ps[1][1]))          # inf lane
    rep = np.arange(N) % 16
    load = (G.F.from_ints if G.F.degree == 1 else G.F.from_host_batch)
    px = np.asarray(load([p[0] for p in ps]))[..., rep]
    py = np.asarray(load([p[1] for p in ps]))[..., rep]
    qx = np.asarray(load([q[0] for q in qs]))[..., rep]
    qy = np.asarray(load([q[1] for q in qs]))[..., rep]
    pinf = np.zeros(N, bool)
    pinf[2] = True
    qinf = np.zeros(N, bool)
    qinf[3] = True
    A = AffinePoint(jnp.asarray(px), jnp.asarray(py), jnp.asarray(pinf))
    Qa = AffinePoint(jnp.asarray(qx), jnp.asarray(qy), jnp.asarray(qinf))
    return A, Qa


def _assert_equal(want, got, tag):
    for a, b in zip(want, got):
        assert np.array_equal(np.asarray(a), np.asarray(b)), tag


@pytest.mark.parametrize("gname,op", [("g1", "madd"), ("g1", "pdbl"),
                                      ("g2", "pmadd")])
def test_kernel_matches_scan(dc, gname, op):
    G = getattr(dc, gname)
    gd = getattr(dc.cd, gname)
    A, Qa = _setup(G, gd)
    P = G.from_affine(A)
    PP = G.proj_from_affine(A)
    old = G.vm_engine
    try:
        G.vm_engine = "scan"
        if op == "madd":
            want = G.mixed_add(P, Qa)
            got = po.group_op_pallas(G, "madd", [P.x, P.y, P.z, Qa.x, Qa.y],
                                     [Qa.inf], interpret="reference")
        elif op == "pdbl":
            want = G.pdbl(PP)
            got = po.group_op_pallas(G, "pdbl", [PP.x, PP.y, PP.z],
                                     interpret="reference")
        else:
            want = G.pmadd(PP, Qa)
            got = po.group_op_pallas(G, "pmadd",
                                     [PP.x, PP.y, PP.z, Qa.x, Qa.y],
                                     [Qa.inf], interpret="reference")
    finally:
        G.vm_engine = old
    _assert_equal(want, got, (gname, op))
