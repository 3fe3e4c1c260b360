"""Small utilities: log2, bitreverse, bit-vector (de)serialization.

Counterparts of libff/common/utils.{hpp,cpp}: ``log2`` rounds UP to the
exponent of the next power of two (utils.cpp:19-28), ``to_twos_complement``
/ ``from_twos_complement`` (:30-44), ``bitreverse`` (:46-55), and the
size-prefixed bit-vector byte serialization used by stream I/O
(:57-111).
"""

from __future__ import annotations


def log2(n: int) -> int:
    """ceil(log2(n)) as libff defines it: smallest k with 2^k >= n."""
    r = 0
    while (1 << r) < n:
        r += 1
    return r


def is_power_of_2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def to_twos_complement(i: int, w: int) -> int:
    assert -(1 << (w - 1)) <= i < (1 << (w - 1))
    return i if i >= 0 else i + (1 << w)


def from_twos_complement(i: int, w: int) -> int:
    return i if i < (1 << (w - 1)) else i - (1 << w)


def bitreverse(n: int, l: int) -> int:
    r = 0
    for _ in range(l):
        r = (r << 1) | (n & 1)
        n >>= 1
    return r


def serialize_bit_vector(bits) -> bytes:
    """8-byte little-endian length + packed bits, LSB-first per byte."""
    n = len(bits)
    out = bytearray(n.to_bytes(8, "little"))
    byte = 0
    for i, b in enumerate(bits):
        byte |= int(bool(b)) << (i % 8)
        if i % 8 == 7:
            out.append(byte)
            byte = 0
    if n % 8:
        out.append(byte)
    return bytes(out)


def deserialize_bit_vector(data: bytes):
    n = int.from_bytes(data[:8], "little")
    bits = []
    for i in range(n):
        bits.append((data[8 + i // 8] >> (i % 8)) & 1)
    return bits, data[8 + (n + 7) // 8:]
