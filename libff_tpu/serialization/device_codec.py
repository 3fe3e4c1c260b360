"""Bulk DEVICE-side point deserialization.

The host codec (codec.py) is bit-exact but one-Python-int-at-a-time: a
compressed G2 point costs a host Tonelli-Shanks (~10 ms each; measured
0.099 Kpts/s in profile_groups).  The reference treats compressed streams
as a first-class MSM input (multiexp_stream.tcc:17-49), so bulk loading
must run at array speed.  This module:

  * parses a binary point-vector blob into device limb arrays with ONE
    numpy pass (no per-element Python ints),
  * recovers Y for compressed points with the batched device
    Tonelli-Shanks (fields/fp.py sqrt / fields/tower.py generic_sqrt),
  * resolves the parity/infinity flag bits with vector ops
    (curve_serialization.tcc:110-166 semantics).

Supported: short-Weierstrass groups, binary encoding.  Montgomery form is
a straight limb load (the device representation IS the Montgomery limbs);
plain form pays one batched to_mont multiply.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..curves.group import AffinePoint
from .codec import FLAG_SHIFT, MONTGOMERY, GroupCodec


def _comp_limbs_np(words_be: np.ndarray) -> np.ndarray:
    """(N, 4*n64) big-endian u16 words -> (n16, N) little-endian u32 limbs."""
    return words_be[:, ::-1].T.astype(np.uint32)


def _field_from_blob(fc, data: bytes, mask_flags: bool) -> tuple:
    """Blob of N field elements -> (limbs[ncomp] list of (n16, N) u32,
    flags (N,) u8 from the top bits of component 0)."""
    cb = fc.comp_bytes
    k = fc.num_components
    N = len(data) // (cb * k)
    raw = np.frombuffer(data, dtype=">u2").reshape(N, k, cb // 2)
    flags = (raw[:, 0, 0] >> (FLAG_SHIFT - 48)).astype(np.uint8)
    if mask_flags:
        raw = raw.copy()
        raw[:, 0, 0] &= (1 << (FLAG_SHIFT - 48)) - 1
    comps = [_comp_limbs_np(raw[:, i, :]) for i in range(k)]
    return comps, flags


def _to_device_field(Fdev, comps: list, form: str):
    """Component limb arrays -> one device field element batch, in the
    device (Montgomery) representation."""
    if len(comps) == 1:
        el = jnp.asarray(comps[0])
    else:
        # nested extension shape, lowest coefficient first (codec order)
        shape = []
        f = Fdev
        while hasattr(f, "B"):
            shape.append(f.d)
            f = f.B
        stacked = np.stack(comps, axis=0)
        el = jnp.asarray(stacked.reshape(tuple(shape) + stacked.shape[1:]))
    if form == MONTGOMERY:
        return el
    # plain form: one batched to_mont (multiply by R^2) on the bottom field
    fp = Fdev
    while hasattr(fp, "B"):
        fp = fp.B
    flat = el.reshape((-1,) + el.shape[-2:])
    out = jnp.stack([fp.to_mont(flat[i]) for i in range(flat.shape[0])])
    return out.reshape(el.shape)


def _rhs(G, x):
    """x^3 + a x + b over the device coordinate field."""
    F = G.F
    rhs = F.mul(F.sqr(x), x)
    if not G.a_is_zero:
        ca = jnp.broadcast_to(
            G.coeff_a.reshape(G.coeff_a.shape + (1,) * (x.ndim -
                                                        G.coeff_a.ndim)),
            x.shape)
        rhs = F.add(rhs, F.mul(ca, x))
    cb = jnp.broadcast_to(
        G.coeff_b.reshape(G.coeff_b.shape + (1,) * (x.ndim -
                                                    G.coeff_b.ndim)),
        x.shape)
    return F.add(rhs, cb)


def _mont_parity(G, y):
    """LSB of the Montgomery repr of component 0 (the device limbs ARE the
    Montgomery repr; curve_serialization.tcc:120-121)."""
    c0 = y
    for _ in range(G.F.el_ndim - 1):
        c0 = c0[0]
    return c0[0] & 1


def _batched_sqrt(F, a):
    """Bounded-iteration batched sqrt for any device field: the prime
    field's own sqrt uses a while_loop that diverges on non-residue lanes
    (malformed input bytes must yield a `bad` flag, not a hang)."""
    if hasattr(F, "B"):
        return F.sqrt(a)
    from ..fields.tower import generic_sqrt

    mp = F.mp
    nqr_to_t = F.const(F._host.pow(F._host.nqr(), mp.t))
    return generic_sqrt(F, a, mp.s, mp.t, nqr_to_t)


def read_point_vector_device(gc: GroupCodec, G, data: bytes,
                             form: str = MONTGOMERY,
                             compressed: bool = False):
    """Decode a binary point-vector blob (codec.write_point_vector layout)
    straight to a device AffinePoint batch.

    Returns (AffinePoint, bad) where `bad` is a per-lane bool marking
    compressed X values that are not on the curve (the host codec raises;
    the reference asserts, curve_serialization.tcc:150).

    Bit-exact vs the host codec path: same flag conventions, same
    deterministic square root (the host and device Tonelli-Shanks share
    the non-residue choice), same parity fix-up.
    """
    fc = gc.fc
    if not compressed:
        sz = gc.uncompressed_size
        N = len(data) // sz
        per = np.frombuffer(data, dtype=np.uint8).reshape(N, sz)
        xs = per[:, :sz // 2].tobytes()
        ys = per[:, sz // 2:].tobytes()
        xc, _ = _field_from_blob(fc, xs, mask_flags=False)
        yc, _ = _field_from_blob(fc, ys, mask_flags=False)
        x = _to_device_field(G.F, xc, form)
        y = _to_device_field(G.F, yc, form)
        # zero convention: (0, 1) encodes infinity
        inf = G.F.is_zero(x) & G.F.eq(
            y, jnp.broadcast_to(
                G.F.one().reshape(G.F.one().shape + (1,)), y.shape))
        return AffinePoint(x, y, inf), jnp.zeros_like(inf)

    comps, flags = _field_from_blob(fc, data, mask_flags=True)
    x = _to_device_field(G.F, comps, form)
    inf = jnp.asarray((flags & 0x2) != 0)
    parity = jnp.asarray((flags & 0x1).astype(np.uint32))
    y, ok = _batched_sqrt(G.F, _rhs(G, x))
    # non-infinity lanes must decode a curve point
    bad = (~ok) & (~inf)
    y = G.F.select(_mont_parity(G, y) != parity, G.F.neg(y), y)
    batch = inf.shape
    x = G.F.select(inf, G.F.zero(batch), x)
    y = G.F.select(inf, G.F.one(batch), y)
    return AffinePoint(x, y, inf), bad


def write_point_vector_device(gc: GroupCodec, G, A: AffinePoint,
                              form: str = MONTGOMERY,
                              compressed: bool = False) -> bytes:
    """Device AffinePoint batch -> binary blob (codec layout), bulk numpy."""
    fc = gc.fc

    def comp_bytes_np(el) -> np.ndarray:
        """Device element batch -> (N, k*cb/2) NATIVE u16 words in
        big-endian word order (callers .astype(">u2") at the end —
        np.concatenate silently converts non-native byte orders)."""
        arr = np.asarray(el)
        k = fc.num_components
        limbs = arr.reshape(k, fc.comp_bytes // 2, -1)
        words = limbs[:, ::-1, :].transpose(2, 0, 1)   # (N, k, words)
        return words.reshape(words.shape[0], -1).astype(np.uint16)

    if form != MONTGOMERY:
        fp = G.F
        while hasattr(fp, "B"):
            fp = fp.B
        conv = lambda el: _map_bottom(fp.from_mont, G.F, el)
    else:
        conv = lambda el: el
    inf = np.asarray(A.inf)
    batch = A.inf.shape
    x = G.F.select(A.inf, G.F.zero(batch), A.x)
    if compressed:
        par = np.asarray(_mont_parity(G, A.y)).astype(np.uint16) & 1
        words = comp_bytes_np(conv(x))
        flags = np.where(inf, np.uint16(2), par).astype(np.uint16)
        words[:, 0] |= flags << (FLAG_SHIFT - 48)
        return words.astype(">u2").tobytes()
    one = G.F.one(batch)
    y = G.F.select(A.inf, one, A.y)
    wx = comp_bytes_np(conv(x))
    wy = comp_bytes_np(conv(y))
    return np.concatenate([wx, wy], axis=1).astype(">u2").tobytes()


def _map_bottom(fn, Fdev, el):
    flat = el.reshape((-1,) + el.shape[-2:])
    out = jnp.stack([fn(flat[i]) for i in range(flat.shape[0])])
    return out.reshape(el.shape)
