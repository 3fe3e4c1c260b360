"""Field utilities: FFT roots of unity and bit/field packing.

Host-side counterparts of libff/algebra/field_utils/field_utils.{hpp,tcc}:

  get_root_of_unity / has_root_of_unity  — 2-adic roots for FFT domains
    (field_utils.hpp:21-37): omega = g^t where p - 1 = t * 2^s and the
    requested order n = 2^k with k <= s.
  pack_bit_vector_into_field_element_vector / unpack  — bit/field packing
    (field_utils.hpp:58-86 semantics: capacity = num_bits - 1 bits per
    element, little-endian within an element).
  batch_invert                           — the Montgomery trick on host
    ints (field_utils.tcc:419-439; device version lives on the field
    objects as batch_inverse).

Digit extraction (field_get_digit / signed digits) lives in
libff_tpu/msm/digits.py next to its consumer.
"""

from __future__ import annotations


def has_root_of_unity(F, n: int) -> bool:
    """True iff the field has a primitive n-th root of unity, n = 2^k."""
    if n <= 0 or n & (n - 1):
        return False
    return (n.bit_length() - 1) <= F.mp.s


def get_root_of_unity(F, n: int, multiplicative_generator: int):
    """omega with omega^n == 1, omega^(n/2) != 1 (field_utils.tcc
    get_root_of_unity): g^t squared down from the 2^s-th root."""
    assert has_root_of_unity(F, n), f"no 2^{n.bit_length()-1}-adic root"
    logn = n.bit_length() - 1
    omega = F.pow(multiplicative_generator, F.mp.t)   # order 2^s
    for _ in range(F.mp.s - logn):
        omega = F.sqr(omega)
    return omega


def pack_bit_vector_into_field_element_vector(F, bits, chunk_bits=None):
    """Bit list -> field elements, (num_bits - 1) bits per element
    little-endian (field_utils.tcc pack_bit_vector...)."""
    if chunk_bits is None:
        chunk_bits = F.mp.bits - 1
    out = []
    for i in range(0, len(bits), chunk_bits):
        v = 0
        for j, b in enumerate(bits[i:i + chunk_bits]):
            v |= (int(bool(b)) << j)
        out.append(F.from_int(v))
    return out


def unpack_field_element_vector_into_bit_vector(F, elems, chunk_bits=None,
                                                total_bits=None):
    if chunk_bits is None:
        chunk_bits = F.mp.bits - 1
    bits = []
    for e in elems:
        for j in range(chunk_bits):
            bits.append((e >> j) & 1)
    if total_bits is not None:
        bits = bits[:total_bits]
    return bits


def batch_invert(F, xs):
    """Montgomery-trick batched inversion of host elements; zero inputs
    are rejected like the reference's assert (field_utils.tcc:419-439)."""
    assert all(not F.is_zero(x) for x in xs), "batch_invert of zero"
    prefix = []
    acc = F.one()
    for x in xs:
        acc = F.mul(acc, x)
        prefix.append(acc)
    inv = F.inv(acc)
    out = [None] * len(xs)
    for i in range(len(xs) - 1, -1, -1):
        out[i] = F.mul(inv, prefix[i - 1]) if i else inv
        inv = F.mul(inv, xs[i])
    return out


def field_get_component_0(F, el):
    """Lowest prime-field component (field_utils.tcc:441-445)."""
    return F.component_0(el)


def fp_from_fp(wide_F, narrow_F, el: int) -> int:
    """Safe widening conversion between prime fields
    (field_utils.hpp:96-103, field_utils.tcc:447-463): reinterpret the
    plain integer value of a narrow-field element in the wider field.

    The reference asserts the limb-capacity proxy
    (wint.max_bits() >= nint.max_bits()); we assert the actual injectivity
    condition it documents — every narrow value must map to a distinct
    wide value, i.e. wide modulus >= narrow modulus."""
    if wide_F.p < narrow_F.p:
        raise ValueError(
            f"fp_from_fp: target modulus ({wide_F.p.bit_length()} bits) "
            f"smaller than source ({narrow_F.p.bit_length()} bits) — "
            "conversion would not be injective")
    return wide_F.from_int(el)


def inner_product(F, a, b):
    """sum_i a_i * b_i over host field elements (multiexp.tcc:760-768,
    where the reference routes it through multi_exp<T,T,naive_plain>)."""
    assert len(a) == len(b)
    acc = F.zero() if hasattr(F, "zero") else 0
    for x, y in zip(a, b):
        acc = F.add(acc, F.mul(x, y))
    return acc


def device_inner_product(F, a, b):
    """Batched device inner product: a, b are (..., N) element batches in
    Montgomery form; reduces the last batch axis with a log-depth tree so
    the result is bit-exact at any N."""
    import jax.numpy as jnp

    prod = F.mul(a, b)
    n = prod.shape[-1]
    while n > 1:
        half = n // 2
        lo = prod[..., :half]
        hi = prod[..., half:2 * half]
        s = F.add(lo, hi)
        if n % 2:
            s = jnp.concatenate([s, prod[..., 2 * half:]], axis=-1)
        prod = s
        n = prod.shape[-1]
    return prod[..., 0]
