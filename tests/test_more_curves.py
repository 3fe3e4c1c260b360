"""MNT4/MNT6, Edwards-181 and BW6-761 curve families: host pairing
bilinearity, generator/cofactor sanity, wNAF parity, and device group ops
for the Weierstrass curves (mirrors libff's per-curve instantiations of
test_groups.cpp / test_bilinearity.cpp)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libff_tpu.curves.curvedef import get_curve
from libff_tpu.host import pairing_bw6 as pb
from libff_tpu.host import pairing_edwards as pe
from libff_tpu.host import pairing_mnt as pm
from libff_tpu.msm import wnaf_host as wnaf


@pytest.mark.parametrize("name", ["mnt4", "mnt6", "edwards", "bw6_761"])
def test_generators_and_orders(name):
    cd = get_curve(name)
    E1, E2 = cd.g1.curve, cd.g2.curve
    P, Q = cd.g1.generator, cd.g2.generator
    assert E1.is_on_curve(P) and E2.is_on_curve(Q)
    if name == "edwards":
        assert E1.is_zero(E1.mul(cd.r, P))
        assert E2.is_zero(E2.mul(cd.r, Q))
    else:
        assert E1.mul(cd.r, P) is None
        assert E2.mul(cd.r, Q) is None


@pytest.mark.parametrize("name", ["mnt4", "mnt6"])
def test_mnt_pairing_bilinear(name):
    cd = get_curve(name)
    ap = pm.MntParams(cd)
    gt = cd.gt
    E1, E2 = cd.g1.curve, cd.g2.curve
    P, Q = cd.g1.generator, cd.g2.generator
    e = pm.reduced_pairing(ap, P, Q)
    assert not gt.eq(e, gt.one())
    assert gt.eq(gt.pow(e, cd.r), gt.one())
    assert gt.eq(pm.reduced_pairing(ap, E1.mul(5, P), Q), gt.pow(e, 5))
    assert gt.eq(pm.reduced_pairing(ap, P, E2.mul(5, Q)), gt.pow(e, 5))
    # affine-ate: bilinear; for mnt4 it equals the projective ate pairing
    # (mnt6's affine variant omits the negative-loop inversion upstream,
    # mnt6_pairing.cpp TODO — we reproduce that behavior)
    ea = pm.affine_reduced_pairing(ap, P, Q)
    assert gt.eq(pm.affine_reduced_pairing(ap, E1.mul(3, P), Q),
                 gt.pow(ea, 3))
    if name == "mnt4":
        assert gt.eq(ea, e)


def test_edwards_pairings_bilinear():
    cd = get_curve("edwards")
    ap = pe.EdwardsParams(cd)
    gt = cd.gt
    E1, E2 = cd.g1.curve, cd.g2.curve
    P, Q = cd.g1.generator, cd.g2.generator
    et = pe.tate_reduced_pairing(ap, P, Q)
    assert not gt.eq(et, gt.one())
    assert gt.eq(pe.tate_reduced_pairing(ap, E1.mul(7, P), Q),
                 gt.pow(et, 7))
    assert gt.eq(pe.tate_reduced_pairing(ap, P, E2.mul(7, Q)),
                 gt.pow(et, 7))
    ea = pe.ate_reduced_pairing(ap, P, Q)
    assert gt.eq(pe.ate_reduced_pairing(ap, E1.mul(3, P), Q), gt.pow(ea, 3))


def test_bw6_pairing_bilinear():
    cd = get_curve("bw6_761")
    ap = pb.Bw6Params(cd)
    gt = cd.gt
    E1, E2 = cd.g1.curve, cd.g2.curve
    P, Q = cd.g1.generator, cd.g2.generator
    e = pb.reduced_pairing(ap, P, Q)
    assert not gt.eq(e, gt.one())
    assert gt.eq(gt.pow(e, cd.r), gt.one())
    assert gt.eq(pb.reduced_pairing(ap, E1.mul(3, P), Q), gt.pow(e, 3))
    assert gt.eq(pb.reduced_pairing(ap, P, E2.mul(3, Q)), gt.pow(e, 3))


def test_mnt_cycle_property():
    m4, m6 = get_curve("mnt4"), get_curve("mnt6")
    assert m4.q == m6.r and m4.r == m6.q


def test_wnaf_parity():
    """wNAF digits reconstruct the scalar and drive correct scalar mul
    (wnaf.tcc semantics; test against plain double-and-add)."""
    cd = get_curve("mnt4")
    E = cd.g1.curve
    P = cd.g1.generator
    for w in (1, 2, 3, 4):
        for k in (1, 2, 7, 12345, cd.r - 1, 0x123456789ABCDEF):
            naf = wnaf.find_wnaf(w, k)
            assert sum(d << i for i, d in enumerate(naf)) == k
            assert all(d == 0 or d % 2 for d in naf)
            got = wnaf.fixed_window_wnaf_exp(E, w, P, k)
            assert got == E.mul(k, P)
    got = wnaf.opt_window_wnaf_exp(E, cd.g1.wnaf_window_table, P, 987654321,
                                   30)
    assert got == E.mul(987654321, P)


@pytest.mark.parametrize("name", ["bls12_377", "bls12_381", "mnt4", "mnt6",
                                  "bw6_761"])
def test_msm_every_curve(name):
    """Full signed Pippenger MSM against the host oracle on every curve
    family's G1 — covers both the complete-RCB path (a == 0: the BLS12s)
    and the masked-Jacobian path (a != 0: MNT4/6, BW6) with full-width
    scalars, including BW6's 761-bit base field / 377-bit scalar field."""
    from libff_tpu.curves.device import device_curve
    from libff_tpu.curves.group import AffinePoint
    from libff_tpu.host import field as hf
    from libff_tpu.msm.pippenger import MsmConfig, msm_pippenger

    dc = device_curve(name)
    cd = dc.cd
    G = dc.g1
    E = cd.g1.curve
    gen = cd.g1.generator
    n = 33
    ks = [hf.sha512_rng(cd.fr.mp, i) for i in range(n)]
    ks[1] = 0
    pts = [E.mul((i % 8) + 1, gen) for i in range(n)]
    want = E.msm(ks, pts)
    limbs = dc.fr.plain_from_ints(ks)
    A = AffinePoint(G.F.from_ints([p[0] for p in pts]),
                    G.F.from_ints([p[1] for p in pts]),
                    jnp.zeros((n,), bool))
    out = msm_pippenger(G, limbs, A, cd.fr.mp.bits,
                        config=MsmConfig(c=4, lanes=8))
    Aff = G.to_affine(jax.tree.map(lambda a: a[..., None], out))
    got = (G.F.to_ints(Aff.x)[0], G.F.to_ints(Aff.y)[0])
    assert got == want


@pytest.mark.parametrize("name", ["mnt4", "mnt6", "bw6_761"])
def test_device_group_ops(name):
    """Masked-Jacobian device ops on a != 0 curves (and bw6's 761-bit
    field) against the host oracle."""
    from libff_tpu.curves.device import device_curve
    from libff_tpu.curves.group import JacobianPoint

    dc = device_curve(name)
    cd = dc.cd
    G = dc.g1
    E = cd.g1.curve
    gen = cd.g1.generator
    ks = [1, 2, 5, 31]
    pts = [E.mul(k, gen) for k in ks]
    P = JacobianPoint(G.F.from_ints([p[0] for p in pts]),
                      G.F.from_ints([p[1] for p in pts]),
                      G.F.one((len(ks),)))
    out = jax.jit(G.add)(P, P)
    A = G.to_affine(out)
    xs, ys = G.F.to_ints(A.x), G.F.to_ints(A.y)
    want = [E.dbl(p) for p in pts]
    assert list(zip(xs, ys)) == want
    assert bool(jnp.all(jax.jit(G.is_well_formed)(P)))


def test_bls12_377_subgroup_checks_device():
    """Fast sigma-based subgroup check: positives (generator multiples) and
    the upstream-pinned non-member point (bls12_377_init.cpp:373-382)."""
    import jax
    import numpy as np

    from libff_tpu.curves.device import device_curve
    from libff_tpu.curves.group import JacobianPoint

    dc = device_curve("bls12_377")
    cd = dc.cd
    G = dc.g1
    F = G.F
    E = cd.g1.curve
    gen = cd.g1.generator
    nx = cd.g1.extra["proof_of_subgroup_non_member_x"]
    ny = cd.g1.extra["proof_of_subgroup_non_member_y"]
    assert E.is_on_curve((nx, ny))
    pts = [gen, E.mul(7, gen), (nx, ny)]
    P = JacobianPoint(F.from_ints([p[0] for p in pts]),
                      F.from_ints([p[1] for p in pts]), F.one((3,)))
    res = np.asarray(jax.jit(G.is_in_safe_subgroup)(P))
    assert res.tolist() == [True, True, False]


def test_alt_bn128_g2_mul_by_q_device():
    """psi(Q) == [q mod r] Q on the device G2 (alt_bn128_g2.cpp:351-356)."""
    from libff_tpu.curves.device import device_curve
    from libff_tpu.curves.group import JacobianPoint
    from libff_tpu.curves.pairing import AtePairing

    dc = device_curve("alt_bn128")
    G2 = dc.g2
    E2 = dc.cd.g2.curve
    gen2 = dc.cd.g2.generator
    q2 = E2.mul(9, gen2)
    P2 = JacobianPoint(dc.fq2.from_host_batch([gen2[0], q2[0]]),
                       dc.fq2.from_host_batch([gen2[1], q2[1]]),
                       dc.fq2.one((2,)))
    pr = AtePairing(dc)
    A = G2.to_affine(pr.mul_by_q(P2))
    got = list(zip(dc.fq2.to_host_batch(A.x), dc.fq2.to_host_batch(A.y)))
    want = [E2.mul(dc.cd.q % dc.cd.r, p) for p in (gen2, q2)]
    assert got == want
