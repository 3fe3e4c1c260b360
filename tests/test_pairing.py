"""Device ate pairing vs the host oracle (alt_bn128).

Checks the full stack — G2 precompute scan, Miller loop scan, final
exponentiation — produces exactly the host oracle's GT values (which are
in turn bilinearity-checked against pure group theory), batched over
multiple pairs at once.
"""

import pytest

import jax

from libff_tpu.curves.alt_bn128 import curve
from libff_tpu.curves.device import device_curve
from libff_tpu.curves.pairing import AtePairing, G1Precomp
from libff_tpu.host import pairing as hp


@pytest.fixture(scope="module")
def ctx():
    dc = device_curve("alt_bn128")
    pr = AtePairing(dc)
    ap = hp.AteParams(curve)
    return dc, pr, ap


def fq2_batch(F2, vals):
    return F2.from_host_batch(vals)


def test_reduced_pairing_matches_host(ctx):
    dc, pr, ap = ctx
    E1, E2 = curve.g1.curve, curve.g2.curve
    P0, Q0 = curve.g1.generator, curve.g2.generator
    pairs = [(P0, Q0),
             (E1.mul(2, P0), Q0),
             (E1.mul(12345, P0), E2.mul(777, Q0)),
             (P0, E2.mul(31337, Q0))]
    px = dc.fq.from_ints([p[0] for p, q in pairs])
    py = dc.fq.from_ints([p[1] for p, q in pairs])
    qx = dc.fq2.from_host_batch([q[0] for p, q in pairs])
    qy = dc.fq2.from_host_batch([q[1] for p, q in pairs])

    fn = jax.jit(lambda px, py, qx, qy: pr.final_exponentiation(
        pr.miller_loop(G1Precomp(px, py), pr.precompute_g2((qx, qy)))))
    gt = fn(px, py, qx, qy)
    got = dc.fq12.to_host_batch(gt)
    want = [hp.reduced_pairing(ap, p, q) for p, q in pairs]
    for g, w in zip(got, want):
        assert g == w


def test_miller_loop_matches_host(ctx):
    dc, pr, ap = ctx
    P0, Q0 = curve.g1.generator, curve.g2.generator
    precP = G1Precomp(dc.fq.from_ints([P0[0]]), dc.fq.from_ints([P0[1]]))
    precQ = pr.precompute_g2((dc.fq2.from_host_batch([Q0[0]]),
                              dc.fq2.from_host_batch([Q0[1]])))
    f = pr.miller_loop(precP, precQ)
    got = dc.fq12.to_host_batch(f)[0]
    want = hp.miller_loop(ap, P0, hp.precompute_g2(ap, Q0))
    assert got == want


def test_double_miller_loop(ctx):
    dc, pr, ap = ctx
    E1, E2 = curve.g1.curve, curve.g2.curve
    P0, Q0 = curve.g1.generator, curve.g2.generator
    P1, Q1 = E1.mul(5, P0), E2.mul(9, Q0)
    def prep(P, Q):
        return (G1Precomp(dc.fq.from_ints([P[0]]), dc.fq.from_ints([P[1]])),
                pr.precompute_g2((dc.fq2.from_host_batch([Q[0]]),
                                  dc.fq2.from_host_batch([Q[1]]))))
    pp0, pq0 = prep(P0, Q0)
    pp1, pq1 = prep(P1, Q1)
    f = pr.double_miller_loop(pp0, pq0, pp1, pq1)
    got = dc.fq12.to_host_batch(f)[0]
    w0 = hp.miller_loop(ap, P0, hp.precompute_g2(ap, Q0))
    w1 = hp.miller_loop(ap, P1, hp.precompute_g2(ap, Q1))
    assert got == ap.Fq12.mul(w0, w1)


def test_device_bilinearity(ctx):
    dc, pr, ap = ctx
    E1, E2 = curve.g1.curve, curve.g2.curve
    P0, Q0 = curve.g1.generator, curve.g2.generator
    s = 424242
    lhs = hp.reduced_pairing(ap, E1.mul(s, P0), Q0)
    # device: e(P, [s]Q)
    Qs = E2.mul(s, Q0)
    precP = G1Precomp(dc.fq.from_ints([P0[0]]), dc.fq.from_ints([P0[1]]))
    precQ = pr.precompute_g2((dc.fq2.from_host_batch([Qs[0]]),
                              dc.fq2.from_host_batch([Qs[1]])))
    gt = pr.final_exponentiation(pr.miller_loop(precP, precQ))
    got = dc.fq12.to_host_batch(gt)[0]
    assert got == lhs
