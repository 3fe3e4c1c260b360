"""Serialization codecs: layout pins and round-trips (libff conventions).

Checks the exact byte layout rules of field_serialization.tcc /
curve_serialization.tcc: big-endian component bytes, Montgomery vs plain
forms, 2 flag bits in the top of the first component, compressed-point
parity from the *Montgomery* LSB, zero-point encodings.
"""

import pytest

from libff_tpu.curves.alt_bn128 import Fq, Fq2, curve
from libff_tpu.host import mont as hm
from libff_tpu.serialization.codec import (MONTGOMERY, PLAIN, FieldCodec,
                                           GroupCodec, read_point_vector,
                                           write_point_vector)


def test_field_binary_plain_layout():
    fc = FieldCodec(Fq)
    b = fc.write_binary(1, form=PLAIN)
    assert len(b) == 32
    assert b == (0).to_bytes(31, "big") + b"\x01"   # big-endian integer
    assert fc.read_binary(b, form=PLAIN) == 1


def test_field_binary_montgomery_layout():
    fc = FieldCodec(Fq)
    b = fc.write_binary(1, form=MONTGOMERY)
    # montgomery repr of 1 is R mod q
    assert int.from_bytes(b, "big") == Fq.mp.R % Fq.p
    assert fc.read_binary(b, form=MONTGOMERY) == 1


@pytest.mark.parametrize("form", [PLAIN, MONTGOMERY])
def test_field_roundtrip_all_forms(form):
    fc = FieldCodec(Fq)
    vals = [0, 1, Fq.p - 1, 12345678901234567890]
    for v in vals:
        assert fc.read_binary(fc.write_binary(v, form), form) == v
    # extension
    fc2 = FieldCodec(Fq2)
    el = (123, Fq.p - 7)
    data = fc2.write_binary(el, form)
    assert len(data) == 64
    assert fc2.read_binary(data, form) == el
    # component order: lowest first (field_serialization.tcc:130-137)
    assert data[:32] == FieldCodec(Fq).write_binary(123, form)


def test_flags_layout():
    fc = FieldCodec(Fq)
    for flags in range(4):
        data = fc.write_binary_with_flags(5, flags, form=PLAIN)
        # flags occupy the top 2 bits of the first byte
        assert data[0] >> 6 == flags
        el, f = fc.read_binary_with_flags(data, form=PLAIN)
        assert (el, f) == (5, flags)


def test_json_field():
    fc = FieldCodec(Fq)
    s = fc.write_json(1, form=PLAIN)
    assert s == '"0x' + "00" * 31 + '01"'
    assert fc.read_json(s, form=PLAIN) == 1
    fc2 = FieldCodec(Fq2)
    s = fc2.write_json((3, 4), form=PLAIN)
    # highest-order component first in JSON (field_serialization.tcc:38-48)
    assert s.startswith('["0x' + "00" * 31 + '04"')
    assert fc2.read_json(s, form=PLAIN) == (3, 4)


@pytest.mark.parametrize("form", [PLAIN, MONTGOMERY])
def test_group_uncompressed_roundtrip(form):
    gc = GroupCodec(curve.g1)
    E = curve.g1.curve
    G = curve.g1.generator
    pts = [G, E.dbl(G), E.mul(12345, G), None]
    for P in pts:
        data = gc.write_uncompressed(P, form)
        assert len(data) == 64
        assert gc.read_uncompressed(data, form) == P


@pytest.mark.parametrize("form", [PLAIN, MONTGOMERY])
def test_group_compressed_roundtrip(form):
    gc = GroupCodec(curve.g1)
    E = curve.g1.curve
    G = curve.g1.generator
    pts = [G, E.dbl(G), E.mul(987654321, G), E.neg(G), None]
    for P in pts:
        data = gc.write_compressed(P, form)
        assert len(data) == 32
        assert gc.read_compressed(data, form) == P


def test_compressed_zero_layout():
    # zero = all-zero payload with flag bit 1 set (curve_serialization.tcc:124-128)
    gc = GroupCodec(curve.g1)
    data = gc.write_compressed(None)
    assert data[0] == 0x80
    assert all(b == 0 for b in data[1:])


def test_compressed_parity_is_montgomery_lsb():
    # flag bit 0 == LSB of the Montgomery repr of Y (curve_serialization.tcc:120-121)
    gc = GroupCodec(curve.g1)
    G = curve.g1.generator
    data = gc.write_compressed(G, form=PLAIN)
    want = hm.to_mont(Fq.mp, G[1]) & 1
    assert data[0] >> 6 == want


def test_g2_group_roundtrip():
    gc = GroupCodec(curve.g2)
    E = curve.g2.curve
    G = curve.g2.generator
    pts = [G, E.dbl(G), E.mul(31337, G), None]
    for P in pts:
        u = gc.write_uncompressed(P)
        assert len(u) == 128
        assert gc.read_uncompressed(u) == P
        c = gc.write_compressed(P)
        assert len(c) == 64
        assert gc.read_compressed(c) == P
        s = gc.write_json(P, form=PLAIN)
        assert gc.read_json(s, form=PLAIN) == P


def test_point_vector_roundtrip():
    gc = GroupCodec(curve.g1)
    E = curve.g1.curve
    G = curve.g1.generator
    pts = [E.mul(k, G) for k in (1, 5, 7, 11)] + [None]
    blob = write_point_vector(gc, pts, compressed=True)
    assert read_point_vector(gc, blob, compressed=True) == pts
