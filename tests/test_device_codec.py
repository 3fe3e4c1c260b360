"""Bulk device-side point (de)serialization vs the host codec
(serialization/device_codec.py vs codec.py), and the generic batched
device Tonelli-Shanks it builds on.

The host codec is golden-tested against reference-built byte dumps
(test_serialization_golden.py); bit-identity with it transitively pins the
device bulk path to the reference conventions
(curve_serialization.tcc:110-166)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libff_tpu.curves.device import device_curve
from libff_tpu.serialization import codec as ser
from libff_tpu.serialization import device_codec as dser


@pytest.fixture(scope="module")
def dc():
    return device_curve("alt_bn128")


def _pts(gd, n):
    E, gen = gd.curve, gd.generator
    out = [E.mul(i + 1, gen) for i in range(n - 2)]
    return out + [None, E.mul(97, gen)]   # include infinity mid-stream


@pytest.mark.parametrize("gname", ["g1", "g2"])
@pytest.mark.parametrize("form", [ser.MONTGOMERY, ser.PLAIN])
@pytest.mark.parametrize("comp", [False, True])
def test_device_read_write_matches_host(dc, gname, form, comp):
    G = getattr(dc, gname)
    gd = getattr(dc.cd, gname)
    pts = _pts(gd, 20)
    gc = ser.GroupCodec(gd)
    blob = ser.write_point_vector(gc, pts, form=form, compressed=comp)

    A, bad = dser.read_point_vector_device(gc, G, blob, form=form,
                                           compressed=comp)
    assert not bool(np.asarray(bad).any())
    inf = np.asarray(A.inf)
    if G.F.degree == 1:
        xs, ys = G.F.to_ints(A.x), G.F.to_ints(A.y)
    else:
        xs, ys = G.F.to_host_batch(A.x), G.F.to_host_batch(A.y)
    for i, p in enumerate(pts):
        if p is None:
            assert inf[i]
        else:
            assert not inf[i] and (xs[i], ys[i]) == p

    # writer: byte-identical to the host writer
    blob2 = dser.write_point_vector_device(gc, G, A, form=form,
                                           compressed=comp)
    assert blob2 == blob


def test_bad_compressed_x_flagged(dc):
    """An x with no curve point must set the bad flag, not hang or decode
    garbage silently (the host codec raises; curve_serialization.tcc:150
    asserts)."""
    G, gd = dc.g1, dc.cd.g1
    E = gd.curve
    gc = ser.GroupCodec(gd)
    # find an x whose rhs is a non-residue
    x = 1
    while E.F.is_square(E.F.add(E.F.mul(E.F.mul(x, x), x), gd.curve.b)):
        x += 1
    blob = gc.fc.write_binary_with_flags(x, 0x0, ser.MONTGOMERY)
    good = gc.write_compressed(E.mul(5, gd.generator))
    A, bad = dser.read_point_vector_device(gc, G, blob + good,
                                           compressed=True)
    bad = np.asarray(bad)
    assert bad[0] and not bad[1]


@pytest.mark.parametrize("cname,gname", [("alt_bn128", "g2"),
                                         ("bls12_377", "g2")])
def test_ext_sqrt_matches_host(cname, gname):
    dc2 = device_curve(cname)
    G = getattr(dc2, gname)
    hostF = G.gdef.curve.F
    # squares of known elements -> sqrt must return +/- the original
    vals = [hostF.sqr(hostF.from_int(i + 2)) for i in range(6)]
    a = G.F.from_host_batch(vals)
    root, ok = jax.jit(G.F.sqrt)(a)
    assert bool(np.asarray(jnp.all(ok)))
    got = G.F.to_host_batch(root)
    for v, r in zip(vals, got):
        assert hostF.eq(hostF.sqr(r), v)
    # host and device agree exactly (same deterministic nqr)
    for v, r in zip(vals, got):
        assert r in (hostF.sqrt(v), hostF.neg(hostF.sqrt(v)))
