"""Reference MSM: batched double-and-add plus log-depth tree sum.

The correctness baseline (libff's `naive_plain` method, multiexp.tcc) —
every scalar-point product computed independently with double-and-add,
fully batched over N, then a balanced tree reduction.  O(N * num_bits)
group ops, but embarrassingly parallel; used as the oracle for Pippenger
and for small inputs.
"""

from __future__ import annotations

from ..curves.group import AffinePoint, Group, JacobianPoint
from . import digits


def msm_naive(G: Group, scalar_limbs, points: AffinePoint,
              num_bits: int | None = None) -> JacobianPoint:
    """scalar_limbs: (n, N) plain-form limbs; points: affine batch (N,)."""
    bits = digits.bits_msb_first(scalar_limbs, num_bits)
    P = G.from_affine(points)
    per_point = G.scalar_mul_bits(bits, P)
    return G.sum_tree(per_point, axis=-1)
