"""ctypes bindings for the native FFI library (ffi/libff_tpu_ffi.so).

The C ABI mirrors the reference's FFI surface (libff/ffi/ffi.h) for
BLS12-377 and BW6-761 G1; this module wraps it with host-int points for
tests and Python callers.  Build the library with `make -C ffi` first.
"""

from __future__ import annotations

import ctypes
import functools
import os


@functools.lru_cache(maxsize=None)
def load():
    path = os.path.join(os.path.dirname(__file__), "..", "ffi",
                        "libff_tpu_ffi.so")
    lib = ctypes.CDLL(os.path.abspath(path))
    lib.libff_tpu_init()
    for f in ("bls12_377_g1_size", "bls12_377_fr_size", "bw6_761_g1_size",
              "bw6_761_fr_size"):
        getattr(lib, f).restype = ctypes.c_size_t
    return lib


class FfiCurve:
    def __init__(self, tag: str):
        self.lib = load()
        self.tag = tag
        self.g1_size = getattr(self.lib, f"{tag}_g1_size")()
        self.fr_size = getattr(self.lib, f"{tag}_fr_size")()
        self.fq_size = self.g1_size // 2
        g2s = getattr(self.lib, f"{tag}_g2_size")
        g2s.restype = ctypes.c_size_t
        self.g2_size = g2s()

    # host affine tuple / None <-> byte buffer
    def encode(self, P) -> bytes:
        if P is None:
            return b"\x00" * self.g1_size
        return (P[0].to_bytes(self.fq_size, "big") +
                P[1].to_bytes(self.fq_size, "big"))

    def decode(self, buf: bytes):
        if not any(buf):
            return None
        return (int.from_bytes(buf[:self.fq_size], "big"),
                int.from_bytes(buf[self.fq_size:], "big"))

    def add(self, P, Q):
        out = ctypes.create_string_buffer(self.g1_size)
        assert getattr(self.lib, f"{self.tag}_g1_add")(
            self.encode(P), self.encode(Q), out)
        return self.decode(out.raw)

    def mul(self, k: int, P):
        out = ctypes.create_string_buffer(self.g1_size)
        assert getattr(self.lib, f"{self.tag}_g1_mul")(
            self.encode(P), k.to_bytes(self.fr_size, "big"), out)
        return self.decode(out.raw)

    def is_on_curve(self, P) -> bool:
        return bool(getattr(self.lib, f"{self.tag}_g1_is_on_curve")(
            self.encode(P)))

    def generator(self):
        out = ctypes.create_string_buffer(self.g1_size)
        assert getattr(self.lib, f"{self.tag}_g1_generator")(out)
        return self.decode(out.raw)

    def encode_g2(self, Q) -> bytes:
        """Host affine G2 point -> raw buffer.  Coordinates are Fq2 pairs
        for bls12_377 (layout x.c0 || x.c1 || y.c0 || y.c1) and plain Fq
        for bw6_761; None encodes the identity."""
        if Q is None:
            return b"\x00" * self.g2_size
        x, y = Q
        if isinstance(x, tuple):
            parts = list(x) + list(y)
        else:
            parts = [x, y]
        return b"".join(c.to_bytes(self.fq_size, "big") for c in parts)

    def pairing_product_is_one(self, pairs) -> bool:
        """e(P1,Q1) * e(P2,Q2) * e(P3,Q3) * e(P4,Q4) == 1 for 4 pairs of
        (host G1 affine, host G2 affine); mirrors the reference's
        bls12_377_pairing / bw6_761_pairing FFI check."""
        assert len(pairs) == 4
        args = []
        for P, Q in pairs:
            args.append(self.encode(P))
            args.append(self.encode_g2(Q))
        return bool(getattr(self.lib, f"{self.tag}_pairing")(*args))
