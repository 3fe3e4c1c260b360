"""Host pairing oracle: bilinearity and consistency (alt_bn128).

Mirrors libff's bilinearity tests (curves/tests/test_bilinearity.cpp:23-96):
e([s]P, Q) == e(P, [s]Q) == e(P, Q)^s, plus non-degeneracy and the
GT-order property e(P,Q)^r == 1.
"""

import pytest

from libff_tpu.curves.alt_bn128 import curve
from libff_tpu.host import pairing as hp


@pytest.fixture(scope="module")
def ap():
    return hp.AteParams(curve)


def test_mul_by_q_constants(ap):
    # the derived psi constants equal libff's literals
    # (alt_bn128_init.cpp:273-282)
    assert ap.mul_by_q_x == (
        21575463638280843010398324269430826099269044274347216827212613867836435027261,
        10307601595873709700152284273816112264069230130616436755625194854815875713954)
    assert ap.mul_by_q_y == (
        2821565182194536844548159561693502659359617185244120367078079554186484126554,
        3505843767911556378687030309984248845540243509899259641013678093033130930403)


def test_psi_maps_into_curve(ap):
    E2 = curve.g2.curve
    Q = curve.g2.generator
    Q1 = hp.mul_by_q(ap, Q)
    assert E2.is_on_curve(Q1)
    # psi(Q) == [q]Q on the trace-zero subgroup
    assert Q1 == E2.mul(curve.q % curve.r, Q)


def test_miller_gt_order(ap):
    P = curve.g1.generator
    Q = curve.g2.generator
    gt = hp.reduced_pairing(ap, P, Q)
    F12 = ap.Fq12
    assert not F12.eq(gt, F12.one())           # non-degenerate
    assert F12.eq(F12.pow(gt, curve.r), F12.one())


def test_bilinearity(ap):
    E1, E2 = curve.g1.curve, curve.g2.curve
    P, Q = curve.g1.generator, curve.g2.generator
    s, t = 1234567, 987
    lhs = hp.reduced_pairing(ap, E1.mul(s, P), Q)
    mid = hp.reduced_pairing(ap, P, E2.mul(s, Q))
    rhs = ap.Fq12.pow(hp.reduced_pairing(ap, P, Q), s)
    assert ap.Fq12.eq(lhs, mid)
    assert ap.Fq12.eq(lhs, rhs)
    # e([s]P,[t]Q) == e(P,Q)^(st)
    lhs2 = hp.reduced_pairing(ap, E1.mul(s, P), E2.mul(t, Q))
    rhs2 = ap.Fq12.pow(hp.reduced_pairing(ap, P, Q), s * t)
    assert ap.Fq12.eq(lhs2, rhs2)
