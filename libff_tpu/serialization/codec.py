"""libff-bit-exact serialization codecs (host side).

Reimplements the encoding conventions of libff/algebra/fields/
field_serialization.tcc and libff/algebra/curves/curve_serialization.tcc:

  binary field element  : 8*n64 big-endian bytes per prime-field component
                          (plain value or Montgomery representative);
                          extension components lowest-order first
                          (field_serialization.tcc:130-147, 197-208).
  flag bits             : top NUM_FLAG_BITS=2 bits of the first component's
                          high 64-bit limb (field_serialization.tcc:186-241).
  binary group          : uncompressed = affine X then Y
                          (curve_serialization.tcc:79-101); compressed = X
                          with flags {bit0: Y parity of the *Montgomery*
                          repr of component 0, bit1: is-zero}
                          (curve_serialization.tcc:110-166).
  json                  : "0x..." big-endian hex strings, extension
                          components highest-order first
                          (field_serialization.tcc:27-99); groups as
                          [x, y] affine pairs (curve_serialization.tcc:31-76).

I/O is host-side by design: serialization feeds/drains the device in bulk
(numpy buffers), it is not a TPU kernel concern.
"""

from __future__ import annotations

import io

from ..host import field as hf
from ..host import mont as hm

PLAIN = "plain"
MONTGOMERY = "montgomery"

NUM_FLAG_BITS = 2
FLAG_SHIFT = 64 - NUM_FLAG_BITS


def _prime_fields(F):
    """Flatten the tower: list of (prime Fp host ctx) per component, lowest
    order first, plus the per-component coefficient accessors."""
    if isinstance(F, hf.Fp):
        return 1
    return F.d * _prime_fields(F.B)


def _flatten(F, el):
    """Extension element -> flat list of prime-field ints, lowest first."""
    if isinstance(F, hf.Fp):
        return [el]
    out = []
    for c in el:
        out.extend(_flatten(F.B, c))
    return out


def _unflatten(F, vals, i=0):
    if isinstance(F, hf.Fp):
        return vals[i], i + 1
    comps = []
    for _ in range(F.d):
        c, i = _unflatten(F.B, vals, i)
        comps.append(c)
    return tuple(comps), i


class FieldCodec:
    def __init__(self, F):
        """F: host field (Fp or Ext)."""
        self.F = F
        fp = F if isinstance(F, hf.Fp) else F.fp
        self.fp = fp
        self.mp = fp.mp
        self.comp_bytes = 8 * self.mp.n64
        self.num_components = _prime_fields(F)
        self.size = self.comp_bytes * self.num_components

    # -- binary -------------------------------------------------------------
    def _comp_value(self, v: int, form: str) -> int:
        return hm.to_mont(self.mp, v) if form == MONTGOMERY else v

    def _comp_unvalue(self, v: int, form: str) -> int:
        return hm.from_mont(self.mp, v) if form == MONTGOMERY else v

    def write_binary(self, el, form: str = MONTGOMERY) -> bytes:
        return b"".join(
            self._comp_value(c, form).to_bytes(self.comp_bytes, "big")
            for c in _flatten(self.F, el))

    def read_binary(self, data: bytes, form: str = MONTGOMERY):
        vals = []
        for k in range(self.num_components):
            raw = int.from_bytes(
                data[k * self.comp_bytes:(k + 1) * self.comp_bytes], "big")
            vals.append(self._comp_unvalue(raw, form))
        el, _ = _unflatten(self.F, vals)
        return el

    def write_binary_with_flags(self, el, flags: int,
                                form: str = MONTGOMERY) -> bytes:
        assert flags == flags & ((1 << NUM_FLAG_BITS) - 1)
        comps = _flatten(self.F, el)
        first = self._comp_value(comps[0], form)
        assert first >> (64 * (self.mp.n64 - 1) + FLAG_SHIFT) == 0, \
            "no flag capacity"
        first |= flags << (64 * (self.mp.n64 - 1) + FLAG_SHIFT)
        out = [first.to_bytes(self.comp_bytes, "big")]
        out += [self._comp_value(c, form).to_bytes(self.comp_bytes, "big")
                for c in comps[1:]]
        return b"".join(out)

    def read_binary_with_flags(self, data: bytes, form: str = MONTGOMERY):
        raw0 = int.from_bytes(data[:self.comp_bytes], "big")
        flags = raw0 >> (64 * (self.mp.n64 - 1) + FLAG_SHIFT)
        mask = (1 << (64 * (self.mp.n64 - 1) + FLAG_SHIFT)) - 1
        vals = [self._comp_unvalue(raw0 & mask, form)]
        for k in range(1, self.num_components):
            raw = int.from_bytes(
                data[k * self.comp_bytes:(k + 1) * self.comp_bytes], "big")
            vals.append(self._comp_unvalue(raw, form))
        el, _ = _unflatten(self.F, vals)
        return el, flags

    # -- json ---------------------------------------------------------------
    def _json_comp(self, F, el, form) -> str:
        if isinstance(F, hf.Fp):
            v = self._comp_value(el, form)
            return '"0x' + v.to_bytes(self.comp_bytes, "big").hex() + '"'
        # highest-order component first (field_serialization.tcc:38-48)
        parts = [self._json_comp(F.B, el[i], form)
                 for i in range(F.d - 1, -1, -1)]
        return "[" + ",".join(parts) + "]"

    def write_json(self, el, form: str = MONTGOMERY) -> str:
        return self._json_comp(self.F, el, form)

    def _parse_json(self, F, s: str, pos: int, form: str):
        if isinstance(F, hf.Fp):
            assert s[pos] == '"'
            end = s.index('"', pos + 1)
            hexstr = s[pos + 1:end]
            if hexstr.startswith("0x"):
                hexstr = hexstr[2:]
            v = int(hexstr, 16) if hexstr else 0
            return self._comp_unvalue(v, form), end + 1
        assert s[pos] == "["
        pos += 1
        comps = []
        for i in range(F.d):
            c, pos = self._parse_json(F.B, s, pos, form)
            comps.append(c)
            if i < F.d - 1:
                assert s[pos] == ","
                pos += 1
        assert s[pos] == "]"
        return tuple(reversed(comps)), pos + 1

    def read_json(self, s: str, form: str = MONTGOMERY):
        el, _ = self._parse_json(self.F, s.strip(), 0, form)
        return el


class GroupCodec:
    """Binary/JSON codecs for affine points (host tuples / None)."""

    def __init__(self, gdef):
        self.gdef = gdef
        self.E = gdef.curve
        self.F = gdef.curve.F
        self.fc = FieldCodec(self.F)

    # sizes
    @property
    def uncompressed_size(self):
        return 2 * self.fc.size

    @property
    def compressed_size(self):
        return self.fc.size

    def _y_parity(self, y) -> int:
        """LSB of the Montgomery repr of component 0 of Y
        (curve_serialization.tcc:120-121)."""
        c0 = self.F.component_0(y)
        return hm.to_mont(self.fc.mp, c0) & 1

    def write_uncompressed(self, P, form: str = MONTGOMERY) -> bytes:
        if P is None:
            # affine coords of zero are (0, 1) (to_affine_coordinates on zero)
            x, y = self.F.zero(), self.F.one()
        else:
            x, y = P
        return (self.fc.write_binary(x, form) + self.fc.write_binary(y, form))

    def read_uncompressed(self, data: bytes, form: str = MONTGOMERY):
        x = self.fc.read_binary(data[:self.fc.size], form)
        y = self.fc.read_binary(data[self.fc.size:], form)
        if self.F.is_zero(x) and self.F.eq(y, self.F.one()):
            return None
        return (x, y)

    def write_compressed(self, P, form: str = MONTGOMERY) -> bytes:
        if P is None:
            # zero: writes X of the zero representative in Montgomery form
            # with flag 0x2 (curve_serialization.tcc:124-128); X==0 so the
            # payload is all zero bytes regardless of form.
            return self.fc.write_binary_with_flags(
                self.F.zero(), 0x2, MONTGOMERY)
        x, y = P
        return self.fc.write_binary_with_flags(x, self._y_parity(y), form)

    def read_compressed(self, data: bytes, form: str = MONTGOMERY):
        x, flags = self.fc.read_binary_with_flags(data, form)
        if flags & 0x2:
            return None
        y = self.E.y_at_x(x)
        if (flags & 1) != self._y_parity(y):
            y = self.F.neg(y)
        return (x, y)

    # -- legacy per-class stream format ---------------------------------------
    # The reference's write_uncompressed / write_compressed
    # (alt_bn128_g1.cpp:374-434, alt_bn128_g2.cpp:405-466): one ASCII char
    # '0'+flags, then the coordinates through the macro-configured field
    # stream operator (field_write<DEFAULT_ENCODING, DEFAULT_FORM>).
    # flags: bit0 = is-zero; compressed adds bit1 = LSB of the PLAIN
    # (as_bigint) value of Y's component 0 — note this differs from the
    # runtime codec above, which uses the Montgomery repr's parity
    # (curve_serialization.tcc:120-121).  Byte goldens captured from the
    # built reference: tests/data/goldens_alt_bn128_*.txt.

    def _legacy_field_bytes(self, el, form: str, encoding: str) -> bytes:
        if encoding == "binary":
            return self.fc.write_binary(el, form)
        # text mode: the per-class methods stream each coordinate through
        # the tower's operator<<, which emits the prime components LOWEST
        # first, each as a bare field_write<json> quoted hex string with no
        # separator (fp2.tcc:239-243) — NOT the bracketed highest-first
        # field_write<json> array form.
        comps = _flatten(self.F, el)
        fp_codec = FieldCodec(self.fc.fp)
        return "".join(fp_codec.write_json(v, form)
                       for v in comps).encode()

    def _legacy_field_read(self, data: bytes, form: str, encoding: str):
        if encoding == "binary":
            return self.fc.read_binary(data[:self.fc.size], form), self.fc.size
        s = data.decode("latin-1")
        fp_codec = FieldCodec(self.fc.fp)
        vals = []
        pos = 0
        for _ in range(self.fc.num_components):
            assert s[pos] == '"', "malformed legacy json field"
            end = s.index('"', pos + 1)
            vals.append(fp_codec.read_json(s[pos:end + 1], form))
            pos = end + 1
        el, _ = _unflatten(self.F, vals)
        return el, pos

    def _plain_y_lsb(self, y) -> int:
        """LSB of the plain (as_bigint) value of Y's component 0
        (alt_bn128_g1.cpp:388, g2.cpp:420)."""
        return self.F.component_0(y) & 1

    def write_legacy(self, P, compressed: bool = False,
                     form: str = MONTGOMERY,
                     encoding: str = "binary",
                     style: str = "prefix_flags") -> bytes:
        """style 'prefix_flags': alt_bn128's layout — one '0'+flags char
        (bit0 zero, bit1 Y-parity when compressed) then X [then Y].
        style 'suffix_parity': bls12_377/bw6's layout — a '0'/'1' zero
        char, X, then for compressed a trailing '0'/'1' Y-parity char
        (bls12_377_g1.cpp:465-480)."""
        x, y = (self.F.zero(), self.F.one()) if P is None else P
        if style == "suffix_parity":
            out = bytes([ord("0") + (1 if P is None else 0)])
            out += self._legacy_field_bytes(x, form, encoding)
            if compressed:
                return out + bytes([ord("0") + self._plain_y_lsb(y)])
            return out + self._legacy_field_bytes(y, form, encoding)
        flags = 1 if P is None else 0
        if compressed:
            flags |= self._plain_y_lsb(y) << 1
            return (bytes([ord("0") + flags])
                    + self._legacy_field_bytes(x, form, encoding))
        return (bytes([ord("0") + flags])
                + self._legacy_field_bytes(x, form, encoding)
                + self._legacy_field_bytes(y, form, encoding))

    def read_legacy(self, data: bytes, compressed: bool = False,
                    form: str = MONTGOMERY, encoding: str = "binary",
                    style: str = "prefix_flags"):
        """Returns (point, bytes_consumed)."""
        flags = data[0] - ord("0")
        pos = 1
        x, used = self._legacy_field_read(data[pos:], form, encoding)
        pos += used
        if compressed:
            if style == "suffix_parity":
                parity = data[pos] - ord("0")
                pos += 1
            else:
                parity = (flags >> 1) & 1
            if flags & 1:
                return None, pos
            y = self.E.y_at_x(x)
            if self._plain_y_lsb(y) != parity:
                y = self.F.neg(y)
            return (x, y), pos
        y, used = self._legacy_field_read(data[pos:], form, encoding)
        pos += used
        return (None if flags & 1 else (x, y)), pos

    # -- json -----------------------------------------------------------------
    def write_json(self, P, form: str = MONTGOMERY) -> str:
        if P is None:
            x, y = self.F.zero(), self.F.one()
        else:
            x, y = P
        return ("[" + self.fc.write_json(x, form) + "," +
                self.fc.write_json(y, form) + "]")

    def read_json(self, s: str, form: str = MONTGOMERY):
        s = s.strip()
        assert s[0] == "[" and s[-1] == "]"
        # split at the top-level comma
        depth = 0
        for i, ch in enumerate(s[1:-1], start=1):
            if ch in "[":
                depth += 1
            elif ch == "]":
                depth -= 1
            elif ch == "," and depth == 0:
                xs, ys = s[1:i], s[i + 1:-1]
                break
        x = self.fc.read_json(xs, form)
        y = self.fc.read_json(ys, form)
        if self.F.is_zero(x) and self.F.eq(y, self.F.one()):
            return None
        return (x, y)


def write_point_vector(codec: GroupCodec, points, form=MONTGOMERY,
                       compressed=False) -> bytes:
    """Serialize a point vector (the profiler's base-element file layout,
    profile_multiexp.cpp:100-118)."""
    buf = io.BytesIO()
    w = codec.write_compressed if compressed else codec.write_uncompressed
    for P in points:
        buf.write(w(P, form))
    return buf.getvalue()


def read_point_vector(codec: GroupCodec, data: bytes, form=MONTGOMERY,
                      compressed=False):
    sz = codec.compressed_size if compressed else codec.uncompressed_size
    r = codec.read_compressed if compressed else codec.read_uncompressed
    return [r(data[i * sz:(i + 1) * sz], form)
            for i in range(len(data) // sz)]
