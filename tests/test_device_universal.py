"""Device pairings for MNT4/MNT6/Edwards/BW6-761 (host-oracle-traced VM
programs) and the Edwards device group / MSM path."""

import pytest

import jax
import jax.numpy as jnp

from libff_tpu.curves.device import device_curve
from libff_tpu.curves.group import AffinePoint, ProjectivePoint
from libff_tpu.curves.pairing_universal import VmPairing
from libff_tpu.host import field as hf
from libff_tpu.host import pairing_bw6 as pb
from libff_tpu.host import pairing_edwards as pe
from libff_tpu.host import pairing_mnt as pm
from libff_tpu.msm.pippenger import MsmConfig, msm_pippenger


def _device_pair_inputs(dc, pr, pairs):
    cd = dc.cd
    px = dc.fq.from_ints([p[0] for p, q in pairs])
    py = dc.fq.from_ints([p[1] for p, q in pairs])
    QF = pr._qfield_dev
    if QF is dc.fq:
        qx = dc.fq.from_ints([q[0] for p, q in pairs])
        qy = dc.fq.from_ints([q[1] for p, q in pairs])
    else:
        qx = QF.from_host_batch([q[0] for p, q in pairs])
        qy = QF.from_host_batch([q[1] for p, q in pairs])
    return (px, py), (qx, qy)


@pytest.mark.parametrize("name,host_fn", [
    ("mnt4", lambda cd, p, q: pm.reduced_pairing(pm.MntParams(cd), p, q)),
    ("mnt6", lambda cd, p, q: pm.reduced_pairing(pm.MntParams(cd), p, q)),
    ("edwards",
     lambda cd, p, q: pe.ate_reduced_pairing(pe.EdwardsParams(cd), p, q)),
    ("bw6_761", lambda cd, p, q: pb.reduced_pairing(pb.Bw6Params(cd), p, q)),
])
def test_device_reduced_pairing(name, host_fn):
    dc = device_curve(name)
    cd = dc.cd
    pr = VmPairing(dc)
    E1, E2 = cd.g1.curve, cd.g2.curve
    P0, Q0 = cd.g1.generator, cd.g2.generator
    pairs = [(P0, Q0), (E1.mul(3, P0), E2.mul(5, Q0))]
    P, Q = _device_pair_inputs(dc, pr, pairs)
    gt = pr.reduced_pairing(P, Q)
    got = dc.gt.to_host_batch(gt)
    want = [host_fn(cd, p, q) for p, q in pairs]
    assert got[0] == want[0] and got[1] == want[1]


@pytest.mark.parametrize("name", ["mnt4", "mnt6", "edwards", "bw6_761"])
def test_device_double_miller_loop(name):
    """final_exp(double_miller(P1,Q1,P2,Q2)) == e(P1,Q1)*e(P2,Q2), the
    shared-squaring identity (test_bilinearity.cpp:79-96)."""
    dc = device_curve(name)
    cd = dc.cd
    pr = VmPairing(dc)
    E1, E2 = cd.g1.curve, cd.g2.curve
    P0, Q0 = cd.g1.generator, cd.g2.generator
    P1h, Q1h = E1.mul(3, P0), E2.mul(5, Q0)
    Pa, Qa = _device_pair_inputs(dc, pr, [(P0, Q0)])
    Pb, Qb = _device_pair_inputs(dc, pr, [(P1h, Q1h)])
    gt = pr.final_exponentiation(pr.double_miller_loop(Pa, Qa, Pb, Qb))
    got = dc.gt.to_host_batch(gt)[0]
    if name == "bw6_761":
        ap = pb.Bw6Params(cd)
        e1 = pb.reduced_pairing(ap, P0, Q0)
        e2 = pb.reduced_pairing(ap, P1h, Q1h)
        want = cd.gt.mul(e1, e2)
    elif name == "edwards":
        ap = pe.EdwardsParams(cd)
        want = cd.gt.mul(pe.ate_reduced_pairing(ap, P0, Q0),
                         pe.ate_reduced_pairing(ap, P1h, Q1h))
    else:
        ap = pm.MntParams(cd)
        want = cd.gt.mul(pm.reduced_pairing(ap, P0, Q0),
                         pm.reduced_pairing(ap, P1h, Q1h))
    assert got == want


def test_device_edwards_tate():
    dc = device_curve("edwards")
    cd = dc.cd
    pr = VmPairing(dc)
    P0, Q0 = cd.g1.generator, cd.g2.generator
    P, Q = _device_pair_inputs(dc, pr, [(P0, Q0)])
    got = dc.gt.to_host_batch(pr.tate_reduced_pairing(P, Q))[0]
    want = pe.tate_reduced_pairing(pe.EdwardsParams(cd), P0, Q0)
    assert got == want


@pytest.mark.parametrize("name", ["mnt4", "mnt6"])
def test_device_mnt_affine_ate(name):
    """Device affine-ate for BOTH halves of the MNT cycle (mnt4_pairing.hpp
    / mnt6_pairing.hpp affine entry points; r03 gap: mnt6 was host-only)."""
    dc = device_curve(name)
    cd = dc.cd
    pr = VmPairing(dc)
    P0, Q0 = cd.g1.generator, cd.g2.generator
    P, Q = _device_pair_inputs(dc, pr, [(P0, Q0)])
    got = dc.gt.to_host_batch(pr.affine_reduced_pairing(P, Q))[0]
    want = pm.affine_reduced_pairing(pm.MntParams(cd), P0, Q0)
    assert got == want


def test_edwards_device_group_and_msm():
    dc = device_curve("edwards")
    cd = dc.cd
    G = dc.g1
    F = G.F
    E = cd.g1.curve
    gen = cd.g1.generator
    ks = [1, 2, 3, 7, 31337]
    pts = [E.mul(k, gen) for k in ks]
    P = ProjectivePoint(F.from_ints([p[0] for p in pts]),
                        F.from_ints([p[1] for p in pts]),
                        F.one((len(ks),)))
    A = G.to_affine(jax.jit(G.padd)(P, P))
    assert list(zip(F.to_ints(A.x), F.to_ints(A.y))) == \
        [E.dbl(p) for p in pts]
    assert bool(jnp.all(jax.jit(G.is_well_formed)(P)))
    # P + (-P) == identity; identity + Q == Q
    assert bool(jnp.all(G.proj_is_zero(G.padd(P, G.neg(P)))))

    # MSM with sign-crossing digits (-P flips x; a y-flip would add the
    # 2-torsion point for odd digits — regression for that exact bug)
    n = 32
    ks2 = [hf.sha512_rng(cd.fr.mp, i) for i in range(n)]
    pts2 = [E.mul(i + 1, gen) for i in range(n)]
    limbs = dc.fr.plain_from_ints(ks2)
    Aff = AffinePoint(F.from_ints([p[0] for p in pts2]),
                      F.from_ints([p[1] for p in pts2]),
                      jnp.zeros((n,), bool))
    res = jax.jit(lambda l, x, y, i: msm_pippenger(
        G, l, AffinePoint(x, y, i), cd.fr.mp.bits,
        config=MsmConfig(c=4, lanes=8)))(limbs, Aff.x, Aff.y, Aff.inf)
    Ar = G.to_affine(jax.tree.map(lambda a: a[..., None], res))
    got = (F.to_ints(Ar.x)[0], F.to_ints(Ar.y)[0])
    assert got == E.msm(ks2, pts2)
