"""wNAF scalar recoding and windowed-NAF exponentiation (host side).

Exact reimplementation of libff's wNAF utilities
(libff/algebra/scalar_multiplication/wnaf.{hpp,tcc}):

  find_wnaf(w, scalar)       — signed width-w NAF digits, little-endian
                               (wnaf.tcc:23-62: odd digits in
                               (-2^w, 2^w), at most one nonzero in any
                               w+1 consecutive positions).
  fixed_window_wnaf_exp      — scalar mul driven by those digits with an
                               odd-multiples table (wnaf.tcc:75-113).
  opt_window_wnaf_exp        — window size chosen from the per-curve
                               wnaf_window_table thresholds
                               (wnaf.tcc:64-73,115-125).

The host versions operate on the exact oracle curve (host/ec.py); they are
the semantic spec for the device implementations and are used directly by
the MNT NAF-driven pairing schedules and the BW6-761 Miller loops.
"""

from __future__ import annotations


def find_wnaf(window_size: int, scalar: int) -> list[int]:
    """Width-w NAF digits of `scalar`, least significant first
    (wnaf.tcc:23-62 semantics)."""
    assert scalar >= 0
    res = []
    c = scalar
    two_pow = 1 << (window_size + 1)
    while c != 0:
        if c & 1:
            u = c % two_pow
            if u > (two_pow >> 1):
                u -= two_pow
            c -= u
        else:
            u = 0
        res.append(u)
        c >>= 1
    return res


def update_wnaf(window_size: int, scalar: int, out_len: int) -> list[int]:
    """find_wnaf padded/truncated to a fixed length (update_wnaf writes
    into a caller-sized buffer in the reference)."""
    digits = find_wnaf(window_size, scalar)
    if len(digits) > out_len:
        raise ValueError("wNAF longer than output buffer")
    return digits + [0] * (out_len - len(digits))


def wnaf_window_size(scalar_bits: int, wnaf_window_table) -> int:
    """Per-curve empirical window choice (wnaf.tcc:64-73)."""
    window = 1
    for i, threshold in enumerate(wnaf_window_table):
        if scalar_bits >= threshold:
            window = i + 1
    return window


def fixed_window_wnaf_exp(E, window_size: int, base, scalar: int):
    """[scalar] base via width-w NAF with an odd-multiples table
    (wnaf.tcc:75-113).  E: host WeierstrassCurve; base: affine point."""
    naf = find_wnaf(window_size, scalar)
    # table[i] = (2i+1) * base
    table = []
    tmp = base
    dbl = E.dbl(base)
    for _ in range(1 << window_size):
        table.append(tmp)
        tmp = E.add(tmp, dbl)
    res = None
    found_nonzero = False
    for d in reversed(naf):
        if found_nonzero:
            res = E.dbl(res)
        if d != 0:
            found_nonzero = True
            if d > 0:
                res = E.add(res, table[(d - 1) // 2])
            else:
                res = E.add(res, E.neg(table[(-d - 1) // 2]))
    return res


def opt_window_wnaf_exp(E, wnaf_window_table, base, scalar: int,
                        scalar_bits: int):
    """Window size from the per-curve table, then fixed_window_wnaf_exp
    (wnaf.tcc:115-125)."""
    window = wnaf_window_size(scalar_bits, wnaf_window_table)
    return fixed_window_wnaf_exp(E, window, base, scalar)
