"""Device prime-field kernels vs the host oracle.

Mirrors libff's algebraic-law property tests (fields/tests/test_fields.cpp:
26-71): distributivity, inverses, exponent laws, sqrt round-trips — plus
bit-exact agreement with Python-int ground truth on random batches.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libff_tpu.fields.fp import prime_field
from libff_tpu.host import field as hf

R_BN = 21888242871839275222246405745257275088548364400416034343698204186575808495617
Q_BN = 21888242871839275222246405745257275088696311157297823662689037894645226208583
Q_BLS377 = 258664426012969094010652733694893533536393512754914660539884262666720468348340822774968888139573360124440321458177
EDW_Q = 6210044120409721004947206240885978274523751269793792001


@pytest.fixture(scope="module", params=[("fr", R_BN, 254), ("fq", Q_BN, 254),
                                        ("bls377q", Q_BLS377, 377)],
                ids=["bn_fr", "bn_fq", "bls377_fq"])
def fld(request):
    name, p, bits = request.param
    F = prime_field(p, bits, name)
    rng = np.random.default_rng(42)
    vals = [int.from_bytes(rng.bytes(64), "little") % p for _ in range(33)]
    return F, vals


def test_roundtrip(fld):
    F, vals = fld
    x = F.from_ints(vals)
    assert x.shape == (F.n, len(vals))
    assert F.to_ints(x) == vals


def test_add_sub_neg(fld):
    F, vals = fld
    p = F.p
    a = F.from_ints(vals)
    b = F.from_ints(vals[::-1])
    got = F.to_ints(jax.jit(F.add)(a, b))
    assert got == [(x + y) % p for x, y in zip(vals, vals[::-1])]
    got = F.to_ints(jax.jit(F.sub)(a, b))
    assert got == [(x - y) % p for x, y in zip(vals, vals[::-1])]
    got = F.to_ints(jax.jit(F.neg)(a))
    assert got == [(-x) % p for x in vals]
    # edge: a + (p-1-a) etc with 0 and p-1
    edge = [0, 1, p - 1, p - 2, p // 2]
    e = F.from_ints(edge)
    assert F.to_ints(F.add(e, e)) == [(2 * x) % p for x in edge]
    assert F.to_ints(F.neg(e)) == [(-x) % p for x in edge]


def test_mul(fld):
    F, vals = fld
    p = F.p
    a = F.from_ints(vals)
    b = F.from_ints(vals[::-1])
    got = F.to_ints(jax.jit(F.mul)(a, b))
    assert got == [(x * y) % p for x, y in zip(vals, vals[::-1])]
    got = F.to_ints(jax.jit(F.sqr)(a))
    assert got == [(x * x) % p for x in vals]
    # edge cases incl. values that maximize carries
    edge = [0, 1, p - 1, p - 2, (1 << (16 * F.n)) % p - 0]
    e = F.from_ints(edge)
    assert F.to_ints(F.mul(e, e)) == [(x * x) % p for x in edge]


def test_mul_loop_matches_unrolled(fld):
    F, vals = fld
    if F.n > 16 and jax.default_backend() == "cpu":
        pytest.skip("24-limb unrolled CIOS takes >10 min of XLA *CPU* "
                    "compile (superlinear in unrolled carry-chain length); "
                    "the unrolled path is exercised at <=16 limbs here and "
                    "on TPU end-to-end")
    a = F.from_ints(vals)
    b = F.from_ints(vals[::-1])
    u = jax.jit(F.mul_unrolled)(a, b)
    l = jax.jit(F.mul_loop)(a, b)
    assert np.array_equal(np.asarray(u), np.asarray(l))


def test_mul_sos_matches(fld):
    """Deferred-carry SOS multiplier (mul_sos) is bit-identical to the
    CIOS paths, including the edge band near p (the conditional-subtract
    boundary).  Eager execution: the SOS graph is wide but shallow, so
    even the 48-limb field evaluates quickly without jit."""
    F, vals = fld
    edge = [0, 1, F.p - 1, F.p - 2, F.p // 2]
    vs = vals + edge
    a = F.from_ints(vs)
    b = F.from_ints(vs[::-1])
    m = np.asarray(F.mul(a, b))
    assert np.array_equal(np.asarray(F.mul_sos(a, b)), m)
    assert np.array_equal(np.asarray(F.mul_sos2(a, b)), m)


def test_mont_domain_conversion(fld):
    F, vals = fld
    a_plain = F.plain_from_ints(vals)
    a = F.to_mont(a_plain)
    assert F.to_ints(a) == [v % F.p for v in vals]
    back = F.from_mont(a)
    assert F.plain_to_ints(back) == [v % F.p for v in vals]


def test_pow_inv(fld):
    F, vals = fld
    p = F.p
    a = F.from_ints(vals)
    e = 0xDEADBEEFCAFEBABE1234567
    got = F.to_ints(jax.jit(lambda x: F.pow_static(x, e))(a))
    assert got == [pow(x, e, p) for x in vals]
    got = F.to_ints(jax.jit(F.inv)(a))
    assert got == [pow(x, -1, p) if x else 0 for x in vals]


def test_batch_inverse(fld):
    F, vals = fld
    p = F.p
    vals = list(vals)
    vals[3] = 0  # zero passes through
    a = F.from_ints(vals)
    got = F.to_ints(jax.jit(F.batch_inverse)(a))
    assert got == [pow(x, -1, p) if x else 0 for x in vals]


def test_distributivity_and_exponent_laws(fld):
    # (a+b)*c == a*c + b*c ;  a^(e1)*a^(e2) == a^(e1+e2)  (test_fields.cpp:26-62)
    F, vals = fld
    a = F.from_ints(vals[:8])
    b = F.from_ints(vals[8:16])
    c = F.from_ints(vals[16:24])
    lhs = F.mul(F.add(a, b), c)
    rhs = F.add(F.mul(a, c), F.mul(b, c))
    assert np.array_equal(np.asarray(lhs), np.asarray(rhs))
    e1, e2 = 12345, 99991
    lhs = F.mul(F.pow_static(a, e1), F.pow_static(a, e2))
    rhs = F.pow_static(a, e1 + e2)
    assert np.array_equal(np.asarray(lhs), np.asarray(rhs))


def test_sqrt(fld):
    F, vals = fld
    p = F.p
    squares = [(v * v) % p for v in vals[:16]]
    a = F.from_ints(squares)
    root, ok = jax.jit(F.sqrt)(a)
    assert bool(np.all(np.asarray(ok)))
    got = F.to_ints(root)
    for g, s in zip(got, squares):
        assert (g * g) % p == s
    # host oracle agrees on root-squared too
    H = hf.Fp(p)
    for s in squares[:4]:
        r = H.sqrt(s)
        assert (r * r) % p == s


def test_is_zero_eq_select(fld):
    F, vals = fld
    a = F.from_ints([0, 1, 0, 5])
    z = np.asarray(F.is_zero(a))
    assert z.tolist() == [True, False, True, False]
    b = F.from_ints([0, 1, 3, 5])
    assert np.asarray(F.eq(a, b)).tolist() == [True, True, False, True]
    sel = F.select(jnp.asarray([True, False, False, True]), a, b)
    assert F.to_ints(sel) == [0, 1, 3, 5]
