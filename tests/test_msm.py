"""MSM cross-method equality and oracle parity (alt_bn128 G1).

Mirrors libff's multiexp tests (scalar_multiplication/tests/
test_multiexp.cpp:205-283): all methods must agree with the naive method
on sizes including the awkward ones {1..5, 256, 257}, with repeated points
(the profiler repeats 32 distinct points, profile_multiexp.cpp:36-45),
zero scalars, and points at infinity.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libff_tpu.curves.device import device_curve
from libff_tpu.curves.group import AffinePoint
from libff_tpu.host import field as hf
from libff_tpu.msm import digits
from libff_tpu.msm.naive import msm_naive
from libff_tpu.msm.pippenger import MsmConfig, msm_pippenger


@pytest.fixture(scope="module")
def ctx():
    dc = device_curve("alt_bn128")
    E = dc.cd.g1.curve
    gen = dc.cd.g1.generator
    base = [E.mul(hf.sha512_rng(dc.cd.fq.mp, 1000 + i) % 0xFFFFFF + 1, gen)
            for i in range(32)]
    return dc, E, gen, base


def make_inputs(dc, E, base, n, with_inf=False, with_zero_scalar=True):
    pts = [base[i % len(base)] for i in range(n)]
    ks = [hf.sha512_rng(dc.cd.fr.mp, i) for i in range(n)]
    if with_zero_scalar and n > 2:
        ks[1] = 0
        ks[2] = 1
    if with_inf and n > 3:
        pts[3] = None
    return ks, pts


def to_device(dc, ks, pts):
    G = dc.g1
    xs = [p[0] if p else 0 for p in pts]
    ys = [p[1] if p else 1 for p in pts]
    inf = np.array([p is None for p in pts])
    A = AffinePoint(G.F.from_ints(xs), G.F.from_ints(ys), jnp.asarray(inf))
    limbs = dc.fr.plain_from_ints(ks)
    return limbs, A


def result_affine(dc, P):
    G = dc.g1
    A = G.to_affine(jax.tree.map(lambda a: a[..., None], P))
    x = G.F.to_ints(A.x)[0]
    y = G.F.to_ints(A.y)[0]
    return None if bool(np.asarray(A.inf).reshape(-1)[0]) else (x, y)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 31, 64, 257])
def test_naive_msm_vs_oracle(ctx, n):
    dc, E, gen, base = ctx
    ks, pts = make_inputs(dc, E, base, n, with_inf=True)
    limbs, A = to_device(dc, ks, pts)
    got = result_affine(dc, msm_naive(dc.g1, limbs, A, dc.cd.fr.mp.bits))
    want = E.msm(ks, pts)
    assert got == want


@pytest.mark.parametrize("n,cfg", [
    (1, None), (2, None), (3, None), (5, None),
    (64, None), (100, None), (257, None),
    (256, MsmConfig(c=8, lanes=16)),
    (1024, MsmConfig(c=6, lanes=128)),
])
def test_pippenger_vs_oracle(ctx, n, cfg):
    dc, E, gen, base = ctx
    ks, pts = make_inputs(dc, E, base, n, with_inf=True)
    limbs, A = to_device(dc, ks, pts)
    fn = jax.jit(lambda l, a: msm_pippenger(
        dc.g1, l, a, dc.cd.fr.mp.bits, config=cfg))
    got = result_affine(dc, fn(limbs, A))
    want = E.msm(ks, pts)
    assert got == want


def test_direct_rounds_engine_matches_vm(ctx):
    """curves/direct.py (the TPU hot-path rounds engine) must agree with
    the VM-executed RCB15 formulas on random projective points.  The
    full-MSM direct path is validated on-TPU (bench.py cross-checks the
    result against the host oracle); here we pin the formula semantics
    with one compile per primitive, which is all CPU can afford (each
    unrolled-CIOS subgraph costs ~12s of XLA CPU compile time)."""
    from libff_tpu.curves import direct as dr
    from libff_tpu.curves.group import ProjectivePoint

    dc, E, gen, base = ctx
    G = dc.g1
    F = G.F
    n = 8
    ks = [hf.sha512_rng(dc.cd.fr.mp, 500 + i) for i in range(2 * n)]
    pts = [E.mul(k % 0xFFFFF + 1, gen) for k in ks]
    P = G.from_affine(AffinePoint(
        F.from_ints([p[0] for p in pts[:n]]),
        F.from_ints([p[1] for p in pts[:n]]),
        jnp.zeros((n,), bool)))
    P = ProjectivePoint(P.x, P.y, P.z)   # Z==1: valid projective too
    qx = F.from_ints([p[0] for p in pts[n:]])
    qy = F.from_ints([p[1] for p in pts[n:]])
    Q = ProjectivePoint(qx, qy, F.one((n,)))

    got = dr.padd(F, P.x, P.y, P.z, Q.x, Q.y, Q.z, G._b3_host)
    want = G.padd(P, Q)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    got = dr.madd(F, P.x, P.y, P.z, qx, qy, G._b3_host)
    want = G.pmadd(P, AffinePoint(qx, qy, jnp.zeros((n,), bool)))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    got = dr.pdbl(F, P.x, P.y, P.z, G._b3_host)
    want = G.pdbl(P)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_pippenger_all_zero_scalars(ctx):
    dc, E, gen, base = ctx
    ks = [0] * 8
    pts = [base[i] for i in range(8)]
    limbs, A = to_device(dc, ks, pts)
    got = result_affine(dc, msm_pippenger(dc.g1, limbs, A, dc.cd.fr.mp.bits))
    assert got is None


def test_signed_digits_roundtrip(ctx):
    """sum_i d_i 2^(ci) == v (test_fields.cpp:348-398 property)."""
    dc, _, _, _ = ctx
    for c in (2, 4, 8, 12, 16):
        vals = [0, 1, dc.r - 1, dc.r // 2, hf.sha512_rng(dc.cd.fr.mp, 3)]
        limbs = dc.fr.plain_from_ints(vals)
        W = digits.num_signed_digits(dc.r, dc.cd.fr.mp.bits, c)
        d = np.asarray(digits.signed_digits(limbs, c, W)).astype(np.int64)
        for j, v in enumerate(vals):
            rec = sum(int(d[i, j]) << (c * i) for i in range(W))
            assert rec == v, (c, j)
            assert all(abs(int(d[i, j])) <= (1 << (c - 1)) for i in range(W))


def test_signed_digits_golden_minus_one():
    """Digit decomposition golden values for Fr(-1) at widths 2/12/16
    (libff test_fields.cpp:283-346 pins these)."""
    dc = device_curve("alt_bn128")
    v = dc.r - 1
    for c in (2, 12, 16):
        W = digits.num_signed_digits(dc.r, 254, c)
        limbs = dc.fr.plain_from_ints([v])
        d = np.asarray(digits.signed_digits(limbs, c, W)).astype(np.int64)
        rec = sum(int(d[i, 0]) << (c * i) for i in range(W))
        assert rec == v


def test_horner_scan_matches_vm_for_towers(ctx):
    """_horner_complete(direct="scan") — the TPU tower path that replaces
    the batch-free VM Horner program (measured as the dominant cost of G2
    MSM at 2^16: ~1.5 s of 2.33 s, results/g2_phases_r04b.log) with a
    window-parallel masked-doubling scan over the batched VM pdbl — must
    be bit-identical to the VM Horner and to the host oracle
    sum_w 2^(c*w) * P_w (multiexp.tcc:613-629 semantics)."""
    from libff_tpu.curves.group import ProjectivePoint
    from libff_tpu.msm.pippenger import _horner_complete

    dc, _, _, _ = ctx
    G = dc.g2
    F2 = G.F
    E2, gen2 = dc.cd.g2.curve, dc.cd.g2.generator
    W, c = 5, 4
    ks = [hf.sha512_rng(dc.cd.fr.mp, 900 + i) % (1 << 40) + 1
          for i in range(W)]
    pts = [E2.mul(k, gen2) for k in ks]
    T = ProjectivePoint(
        jnp.asarray(F2.from_host_batch([p[0] for p in pts])),
        jnp.asarray(F2.from_host_batch([p[1] for p in pts])),
        F2.one((W,)))

    outs = []
    for mode in (False, "scan"):
        R = _horner_complete(G, T, c, direct=mode)
        A = G.to_affine(G.proj_to_jacobian(R))
        outs.append((F2.to_host(np.asarray(A.x)),
                     F2.to_host(np.asarray(A.y))))
    assert outs[0] == outs[1]

    total = None
    for w, p in enumerate(pts):
        q = E2.mul(1 << (c * w), p)
        total = q if total is None else E2.add(total, q)
    assert outs[1] == (total[0], total[1])
