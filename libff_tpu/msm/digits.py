"""Scalar digit decomposition for MSM, bit-exact with libff.

Vectorized counterparts of libff's field_get_digit / field_get_signed_digit
/ field_get_signed_digits (field_utils.tcc:50-239): scalars are plain
(non-Montgomery) radix-2^16 limb arrays of shape (n, N); digit extraction
is static slicing + shifts, and the signed-digit overflow/carry chain runs
as a host loop over digit indices (static, ~tens of steps), vectorized
over all N scalars.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

LIMB_BITS = 16


def get_digit(limbs: jnp.ndarray, c: int, idx: int) -> jnp.ndarray:
    """Unsigned digit = bits [c*idx, c*(idx+1)) of the little-endian limb
    array (field_utils.tcc:50-100). Bits beyond the top limb read as 0.
    Requires c <= 16 so a digit spans at most two 16-bit limbs."""
    assert c <= 16
    n = limbs.shape[0]
    start = c * idx
    lo = start // LIMB_BITS
    sh = start - lo * LIMB_BITS
    mask = (1 << c) - 1
    v = (limbs[lo] >> sh) if lo < n else jnp.zeros_like(limbs[0])
    if sh + c > LIMB_BITS and lo + 1 < n:
        v = v | (limbs[lo + 1] << (LIMB_BITS - sh))
    return v & mask


def num_signed_digits(modulus: int, num_bits: int, c: int) -> int:
    """field_get_num_signed_digits (field_utils.tcc:102-165): number of
    signed c-bit digits needed for any value < modulus, accounting for the
    overflow cascade of -1 (the worst case)."""
    minus_one = modulus - 1
    naive = (num_bits + 1 + c - 1) // c
    sign_bit = 1 << (c - 1)
    max_signed = sign_bit - 1
    final_overflow = False
    for i in range(naive - 1, -1, -1):
        d = (minus_one >> (c * i)) & ((1 << c) - 1)
        if d & sign_bit:
            final_overflow = True
            break
        if d != max_signed:
            break
    return naive + 1 if final_overflow else naive


def signed_digits(limbs: jnp.ndarray, c: int, num_digits: int) -> jnp.ndarray:
    """field_get_signed_digits (field_utils.tcc:205-239), vectorized.

    limbs: (n, *batch) plain-form u32 16-bit limbs.
    Returns (num_digits, *batch) int32 digits in [-2^(c-1), 2^(c-1)],
    satisfying sum_i digits[i] * 2^(c*i) == value.
    """
    carry = jnp.zeros(limbs.shape[1:], dtype=jnp.uint32)
    overflow = jnp.zeros_like(carry)
    out = []
    for idx in range(num_digits):
        carry = overflow | carry
        raw = get_digit(limbs, c, idx)
        digit = raw + carry
        overflow = (digit >> c) & 1
        carry = (digit >> (c - 1)) & 1
        signed = digit.astype(jnp.int32) - (carry * (1 << c)).astype(jnp.int32)
        out.append(jnp.where(overflow == 1, 0, signed))
    return jnp.stack(out, axis=0)


def unsigned_digits(limbs: jnp.ndarray, c: int, num_digits: int
                    ) -> jnp.ndarray:
    """Plain c-bit windows (the BDLO12 unsigned method's digit view,
    multiexp.tcc:284-381): (num_digits, *batch) int32 in [0, 2^c)."""
    return jnp.stack([get_digit(limbs, c, i).astype(jnp.int32)
                      for i in range(num_digits)], axis=0)


def bits_msb_first(limbs: jnp.ndarray, num_bits: int | None = None):
    """(nbits, *batch) bit array, most-significant bit first."""
    n = limbs.shape[0]
    if num_bits is None:
        num_bits = n * LIMB_BITS
    shifts = np.arange(LIMB_BITS, dtype=np.uint32)
    # (n, 16, *batch): bit j of limb i
    bits = (limbs[:, None] >> shifts.reshape((1, LIMB_BITS) + (1,) * (limbs.ndim - 1))) & 1
    bits = bits.reshape((n * LIMB_BITS,) + limbs.shape[1:])
    bits = bits[:num_bits]
    return bits[::-1]  # MSB first
