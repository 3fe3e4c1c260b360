"""Device Jacobian group ops vs the host affine oracle (alt_bn128 G1).

Mirrors libff's group tests (curves/tests/test_groups.cpp:25-129):
mixed-add special cases, group laws, scalar mul, cofactor, curve
membership — checked bit-exactly against Python-int ground truth.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libff_tpu.curves.device import device_curve
from libff_tpu.curves.group import AffinePoint
from libff_tpu.host import field as hf
from libff_tpu.msm import digits


@pytest.fixture(scope="module")
def ctx():
    dc = device_curve("alt_bn128")
    cd = dc.cd
    E = cd.g1.curve
    gen = cd.g1.generator
    # a spread of points: k*G for deterministic scalars
    ks = [1, 2, 3, 7, 12345,
          hf.sha512_rng(cd.fr.mp, 0), hf.sha512_rng(cd.fr.mp, 1), cd.r - 1]
    pts = [E.mul(k, gen) for k in ks]
    return dc, E, gen, ks, pts


def to_device_affine(G, E, pts):
    xs = [p[0] if p else 0 for p in pts]
    ys = [p[1] if p else 1 for p in pts]
    inf = [p is None for p in pts]
    return AffinePoint(G.F.from_ints(xs), G.F.from_ints(ys),
                       jnp.asarray(np.array(inf)))


def affine_of(G, P):
    """Device jacobian point -> list of host affine tuples/None."""
    A = G.to_affine(P)
    xs = G.F.to_ints(A.x)
    ys = G.F.to_ints(A.y)
    inf = np.asarray(A.inf).reshape(-1)
    return [None if i else (x, y) for x, y, i in zip(xs, ys, inf)]


def test_from_to_affine_roundtrip(ctx):
    dc, E, gen, ks, pts = ctx
    G = dc.g1
    A = to_device_affine(G, E, pts + [None])
    P = G.from_affine(A)
    assert affine_of(G, P) == pts + [None]


def test_dbl_add_vs_oracle(ctx):
    dc, E, gen, ks, pts = ctx
    G = dc.g1
    A = to_device_affine(G, E, pts)
    P = G.from_affine(A)
    got = affine_of(G, jax.jit(G.dbl)(P))
    assert got == [E.dbl(p) for p in pts]
    # add shifted pairs
    A2 = to_device_affine(G, E, pts[1:] + pts[:1])
    Q = G.from_affine(A2)
    got = affine_of(G, jax.jit(G.add)(P, Q))
    assert got == [E.add(p, q) for p, q in zip(pts, pts[1:] + pts[:1])]


def test_add_special_cases(ctx):
    dc, E, gen, ks, pts = ctx
    G = dc.g1
    g = pts[0]
    cases_p = [None, g, g, g, None]
    cases_q = [g, None, g, E.neg(g), None]
    P = G.from_affine(to_device_affine(G, E, cases_p))
    Q = G.from_affine(to_device_affine(G, E, cases_q))
    got = affine_of(G, G.add(P, Q))
    want = [E.add(p, q) for p, q in zip(cases_p, cases_q)]
    assert got == want


def test_mixed_add_matches_add(ctx):
    dc, E, gen, ks, pts = ctx
    G = dc.g1
    # include special cases: P zero, Q inf, P == Q, P == -Q
    base = pts + [None, pts[0], pts[2], pts[3]]
    other = pts[::-1] + [pts[1], None, pts[2], E.neg(pts[3])]
    P = G.from_affine(to_device_affine(G, E, base))
    # make P non-affine Z by doubling then adding the negation (keeps value,
    # changes representation)
    P = G.add(G.dbl(P), G.neg(P))
    Q = to_device_affine(G, E, other)
    got = affine_of(G, jax.jit(G.mixed_add)(P, Q))
    want = [E.add(p, q) for p, q in zip(base, other)]
    assert got == want


def test_scalar_mul(ctx):
    dc, E, gen, ks, pts = ctx
    G = dc.g1
    scalars = [0, 1, 2, dc.r - 1, 0xDEADBEEF, hf.sha512_rng(dc.cd.fr.mp, 7),
               dc.r - 2, 5]
    limbs = dc.fr.plain_from_ints(scalars)
    bits = digits.bits_msb_first(limbs, dc.cd.fr.mp.bits)
    P = G.from_affine(to_device_affine(G, E, pts))
    got = affine_of(G, jax.jit(G.scalar_mul_bits)(bits, P))
    want = [E.mul(k, p) for k, p in zip(scalars, pts)]
    assert got == want


def test_sum_tree(ctx):
    dc, E, gen, ks, pts = ctx
    G = dc.g1
    P = G.from_affine(to_device_affine(G, E, pts))
    got = affine_of(G, jax.tree.map(lambda a: a[..., None], G.sum_tree(P)))
    want = None
    for p in pts:
        want = E.add(want, p)
    assert got == [want]


def test_is_well_formed(ctx):
    dc, E, gen, ks, pts = ctx
    G = dc.g1
    P = G.from_affine(to_device_affine(G, E, pts + [None]))
    assert bool(np.all(np.asarray(G.is_well_formed(P))))
    # corrupt a coordinate
    bad = P._replace(x=G.F.add(P.x, G.F.one(P.z.shape[1:])))
    wf = np.asarray(G.is_well_formed(bad))
    assert not wf[0]


def test_eq(ctx):
    dc, E, gen, ks, pts = ctx
    G = dc.g1
    P = G.from_affine(to_device_affine(G, E, pts))
    P2 = G.add(G.dbl(P), G.neg(P))  # same value, different Z
    assert bool(np.all(np.asarray(G.eq(P, P2))))
    assert not bool(np.any(np.asarray(G.eq(P, G.dbl(P)))))
