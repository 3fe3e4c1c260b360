"""Field parity nits from the reference test suite:

* Frobenius vs a^(q^i) property per tower  (test_fields.cpp:81-92)
* Toom-Cook-4 Fp4 multiplication identity  (test_fields.cpp:158-250)
* fp_from_fp safe widening                 (field_utils.hpp:96-103)
"""

import pytest

from libff_tpu.curves import alt_bn128 as bn
from libff_tpu.curves import bw6_761 as bw6
from libff_tpu.curves import mnt4
from libff_tpu.curves import mnt6
from libff_tpu.utils.field_utils import fp_from_fp


def _element(F, seed: int):
    """Deterministic pseudo-random tower element (coefficient ints from a
    simple LCG — any nonzero element exercises the identity)."""
    state = seed

    def nxt():
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) % 2**64
        return state

    def build(f):
        from libff_tpu.host.field import Fp

        if isinstance(f, Fp):
            return (nxt() * nxt() * nxt() * nxt()) % f.p
        return tuple(build(f.B) for _ in range(f.d))

    return build(F)


TOWERS = [
    ("alt_bn128_Fq2", bn.Fq2), ("alt_bn128_Fq6", bn.Fq6),
    ("alt_bn128_Fq12", bn.Fq12), ("mnt4_Fq2", mnt4.Fq2),
    ("mnt4_Fq4", mnt4.Fq4), ("mnt6_Fq3", mnt6.Fq3),
    ("mnt6_Fq6", mnt6.Fq6), ("bw6_Fq3", bw6.Fq3),
]


@pytest.mark.parametrize("name,F", TOWERS, ids=[t[0] for t in TOWERS])
def test_frobenius_is_power_map(name, F):
    """frobenius(a, i) == a^(q^i) — the reference checks 10 powers
    (test_fields.cpp:81-92); degree+1 powers already wrap the coefficient
    table and catch any indexing error."""
    q = F.p
    a = _element(F, 0xF0 + F.degree)
    assert F.frobenius(a, 0) == a
    a_qi = a
    for power in range(1, F.degree + 2):
        a_qi = F.pow(a_qi, q)
        assert F.frobenius(a, power) == a_qi, power


def test_fp4_toom_cook_identity():
    """The Toom-Cook-4 evaluation formula over base-field components equals
    Fq4 multiplication (test_fields.cpp:158-250).  mnt4's Fq4 viewed as
    Fq[V]/(V^4 - 17): a = a0 + a1 V + a2 V^2 + a3 V^3 with
    a2 = coeffs[0][1] (U = V^2), a3 = coeffs[1][1] (V*U = V^3)."""
    F4 = mnt4.Fq4
    F = mnt4.Fq
    beta = F.from_int(mnt4.FQ2_NON_RESIDUE)
    for trial in range(8):
        a = _element(F4, 10 + trial)
        b = _element(F4, 100 + trial)
        want = F4.mul(a, b)

        a0, a2 = a[0]
        a1, a3 = a[1]
        b0, b2 = b[0]
        b1, b3 = b[1]

        def lin(x0, x1, x2, x3, t):
            return (x0 + t * x1 + t * t * x2 + t ** 3 * x3) % F.p

        v0 = F.mul(a0, b0)
        v1 = F.mul(lin(a0, a1, a2, a3, 1), lin(b0, b1, b2, b3, 1))
        v2 = F.mul(lin(a0, -a1, a2, -a3, 1), lin(b0, -b1, b2, -b3, 1))
        v3 = F.mul(lin(a0, a1, a2, a3, 2), lin(b0, b1, b2, b3, 2))
        v4 = F.mul(lin(a0, -a1, a2, -a3, 2), lin(b0, -b1, b2, -b3, 2))
        v5 = F.mul(lin(a0, a1, a2, a3, 3), lin(b0, b1, b2, b3, 3))
        v6 = F.mul(a3, b3)

        def inv(k):
            return F.inv(F.from_int(k))

        def s(k):
            return F.from_int(k)

        c0 = (v0 + beta * (inv(4) * v0 - inv(6) * (v1 + v2)
                           + inv(24) * (v3 + v4) - s(5) * v6)) % F.p
        c1 = (-inv(3) * v0 + v1 - inv(2) * v2 - inv(4) * v3
              + inv(20) * v4 + inv(30) * v5 - s(12) * v6
              + beta * (-inv(12) * (v0 - v1) + inv(24) * (v2 - v3)
                        - inv(120) * (v4 - v5) - s(3) * v6)) % F.p
        c2 = (-(s(5) * inv(4)) * v0 + (s(2) * inv(3)) * (v1 + v2)
              - inv(24) * (v3 + v4) + s(4) * v6 + beta * v6) % F.p
        c3 = (inv(12) * (s(5) * v0 - s(7) * v1)
              - inv(24) * (v2 - s(7) * v3 + v4 + v5) + s(15) * v6) % F.p

        assert ((c0, c2), (c1, c3)) == want, trial


def test_fp_from_fp_widening():
    """Narrow -> wide embeds the plain integer value; narrowing raises
    (the reference asserts; we raise a checked error)."""
    val = mnt4.Fq.from_int(12345678901234567890)
    wide = fp_from_fp(bw6.Fq, mnt4.Fq, val)
    assert wide == val                      # plain value preserved
    assert fp_from_fp(bn.Fq, bn.Fq, 7) == 7
    with pytest.raises(ValueError):
        fp_from_fp(bn.Fr, bw6.Fq, 1)       # 254-bit target < 761-bit source
