"""BLS12-377 endomorphism fast paths: psi-based G2 cofactor multiplication,
psi-based G2 subgroup membership, and G1 proof_of_safe_subgroup — mirroring
the reference's test_bls12_377 (curves/tests/test_groups.cpp:300-320) plus
fast-vs-generic equality checks the reference asserts implicitly.
"""

import jax
import numpy as np
import pytest

from libff_tpu.curves import bls12_377 as b
from libff_tpu.curves.device import device_curve
from libff_tpu.curves.group import JacobianPoint


@pytest.fixture(scope="module")
def dc():
    return device_curve("bls12_377")


def _dev_points(G, E, ks, gen):
    pts = [E.mul(k, gen) for k in ks]
    if G.F.degree == 1:
        return pts, JacobianPoint(G.F.from_ints([p[0] for p in pts]),
                                  G.F.from_ints([p[1] for p in pts]),
                                  G.F.one((len(ks),)))
    return pts, JacobianPoint(
        G.F.from_host_batch([p[0] for p in pts]),
        G.F.from_host_batch([p[1] for p in pts]),
        G.F.one((len(ks),)))


def _affine_host(G, P):
    A = G.to_affine(P)
    if G.F.degree == 1:
        return list(zip(G.F.to_ints(A.x), G.F.to_ints(A.y)))
    return list(zip(G.F.to_host_batch(A.x), G.F.to_host_batch(A.y)))


def test_sigma_is_mul_by_lambda(dc):
    """sigma(P) == [lambda]P, lambda = c1 - 1 (test_groups.cpp:304-308)."""
    G, E, gen = dc.g1, dc.cd.g1.curve, dc.cd.g1.generator
    lam = b.G1_SAFE_SUBGROUP_C1 - 1
    pts, P = _dev_points(G, E, [1, 7, 123456789], gen)
    got = _affine_host(G, jax.jit(G.sigma)(P))
    assert got == [E.mul(lam, p) for p in pts]


def test_psi_char_poly(dc):
    """psi^2(P) - [t] psi(P) + [q] P == 0 (test_groups.cpp:310-318).

    psi (the device op under test) runs on device; the two long scalar
    ladders of the characteristic polynomial run on the exact host curve
    (device scalar_mul_int is covered elsewhere) — compiling two ~380-bit
    VM ladders here cost 200+ s of pure XLA compile for no extra
    coverage."""
    G, E, gen = dc.g2, dc.cd.g2.curve, dc.cd.g2.generator
    pts, P = _dev_points(G, E, [1, 9, 987654321], gen)
    psi_p = jax.jit(G.psi)(P)
    psi2_p = jax.jit(G.psi)(psi_p)
    for p, a1, a2 in zip(pts, _affine_host(G, psi_p),
                         _affine_host(G, psi2_p)):
        t_psi = E.mul(b.TRACE_OF_FROBENIUS, a1)
        q_p = E.mul(b.Q, p)
        assert E.add(E.add(a2, E.neg(t_psi)), q_p) is None


def test_psi_is_mul_by_q_on_subgroup(dc):
    G, E, gen = dc.g2, dc.cd.g2.curve, dc.cd.g2.generator
    pts, P = _dev_points(G, E, [5, 31], gen)
    got = _affine_host(G, jax.jit(G.psi)(P))
    assert got == [E.mul(b.Q % b.R, p) for p in pts]


def test_g2_fast_cofactor_mul_matches_generic(dc):
    """psi-decomposed [h2]P == plain double-and-add [h2]P
    (bls12_377_g2.cpp:423-432)."""
    G, E = dc.g2, dc.cd.g2.curve
    # points on the twist but outside the subgroup: hash-to-curve style,
    # use x-search from small x values
    pts = []
    x0 = 1
    while len(pts) < 2:
        x0 += 1
        try:
            y = E.y_at_x((x0, 0))
            pts.append(((x0, 0), y))
        except ValueError:
            continue
    P = JacobianPoint(G.F.from_host_batch([p[0] for p in pts]),
                      G.F.from_host_batch([p[1] for p in pts]),
                      G.F.one((len(pts),)))
    fast = _affine_host(G, jax.jit(G.mul_by_cofactor)(P))
    want = [E.mul(b.G2_COFACTOR, p) for p in pts]
    assert fast == want
    # and the result is in the safe subgroup per the psi fast check
    out = jax.jit(G.mul_by_cofactor)(P)
    assert np.asarray(jax.jit(G.is_in_safe_subgroup)(out)).all()


def test_g2_subgroup_check_negative(dc):
    """A curve point NOT in the order-r subgroup fails the psi check."""
    G, E = dc.g2, dc.cd.g2.curve
    x0 = 1
    pt = None
    while pt is None:
        x0 += 1
        try:
            y = E.y_at_x((x0, 0))
            pt = ((x0, 0), y)
        except ValueError:
            continue
    # confirm it's truly outside (order does not divide r)
    assert E.mul(b.R, pt) is not None
    P = JacobianPoint(G.F.from_host_batch([pt[0]]),
                      G.F.from_host_batch([pt[1]]), G.F.one((1,)))
    assert not np.asarray(jax.jit(G.is_in_safe_subgroup)(P)).any()


def test_g1_proof_of_safe_subgroup(dc):
    """[h] proof_of_safe_subgroup(P) == P (bls12_377_g1.cpp:399-409;
    w * h == 1 mod r and the non-member point has order dividing h)."""
    G, E, gen = dc.g1, dc.cd.g1.curve, dc.cd.g1.generator
    assert (b.G1_PROOF_OF_SUBGROUP_W * b.G1_COFACTOR) % b.R == 1
    pts, P = _dev_points(G, E, [3, 777], gen)
    W = jax.jit(G.proof_of_safe_subgroup)(P)
    back = _affine_host(G, jax.jit(G.mul_by_cofactor)(W))
    assert back == pts
