"""Native FFI (ffi/libff_tpu_ffi.so): C ABI G1 ops vs the host oracle.

Builds the shared library on demand (make -C ffi), mirroring the
reference's FFI coverage (libff/ffi/ffi.h for BLS12-377 / BW6-761)."""

import os
import subprocess

import pytest

from libff_tpu.curves.curvedef import get_curve
from libff_tpu.host import field as hf

FFI_DIR = os.path.join(os.path.dirname(__file__), "..", "ffi")


@pytest.fixture(scope="module", autouse=True)
def build_lib():
    subprocess.run(["make", "-C", FFI_DIR], check=True,
                   capture_output=True)


@pytest.mark.parametrize("tag", ["bls12_377", "bw6_761"])
def test_ffi_g1_ops(tag):
    from libff_tpu.ffi_bindings import FfiCurve

    cd = get_curve(tag)
    E = cd.g1.curve
    gen = cd.g1.generator
    c = FfiCurve(tag)
    assert c.generator() == gen
    assert c.is_on_curve(gen)
    assert not c.is_on_curve((1, 2))
    P, Q = E.mul(7, gen), E.mul(11, gen)
    assert c.add(P, Q) == E.add(P, Q)
    assert c.add(P, P) == E.dbl(P)
    assert c.add(P, E.neg(P)) is None
    assert c.add(None, P) == P and c.add(P, None) == P
    k = hf.sha512_rng(cd.fr.mp, 3)
    assert c.mul(k, gen) == E.mul(k, gen)
    assert c.mul(0, gen) is None
    assert c.mul(cd.r - 1, gen) == E.neg(gen)


@pytest.mark.parametrize("tag", ["bls12_377", "bw6_761"])
def test_ffi_pairing_product(tag):
    """Native 4-pair pairing-product check (reference ffi.h:37-53,79-95):
    cancelling pair products are 1, bilinearity holds, perturbed products
    are not 1, and identity pairs contribute the neutral factor."""
    from libff_tpu.ffi_bindings import FfiCurve

    cd = get_curve(tag)
    E, E2 = cd.g1.curve, cd.g2.curve
    P, Q = cd.g1.generator, cd.g2.generator
    negP = E.neg(P)
    P2, Q2 = E.mul(5, P), E2.mul(7, Q)
    c = FfiCurve(tag)
    assert c.pairing_product_is_one(
        [(P, Q), (negP, Q), (P2, Q2), (E.neg(P2), Q2)])
    a = hf.sha512_rng(cd.fr.mp, 9)
    assert c.pairing_product_is_one(
        [(E.mul(a, P), Q), (negP, E2.mul(a, Q)), (None, None), (None, None)])
    assert not c.pairing_product_is_one(
        [(P, Q), (P, Q), (P2, Q2), (E.neg(P2), Q2)])
    assert c.pairing_product_is_one(
        [(None, Q), (P, None), (None, None), (None, None)])
