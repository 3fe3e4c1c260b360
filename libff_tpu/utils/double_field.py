"""Complex-double mock field for FFT experimentation.

Counterpart of libff's ``Double`` (libff/common/double.{hpp,cpp}): a
complex-double type exposing the subset of the field interface FFT code
needs — add/sub/mul, squared, inverse, one/zero, power, and k-th roots of
unity from e^{2 pi i / 2^k}.  Device-friendly: ``batch_fft`` runs a
radix-2 Cooley-Tukey transform on complex64 jax arrays (the structural
analogue of an evaluation domain over this mock field).
"""

from __future__ import annotations

import cmath

import numpy as np


class Double:
    """Scalar complex-double element (value semantics, like libff)."""

    __slots__ = ("val",)

    def __init__(self, val=0.0):
        self.val = complex(val)

    def __add__(self, o):
        return Double(self.val + o.val)

    def __sub__(self, o):
        return Double(self.val - o.val)

    def __mul__(self, o):
        return Double(self.val * o.val)

    def __neg__(self):
        return Double(-self.val)

    def __eq__(self, o):
        return isinstance(o, Double) and self.val == o.val

    def squared(self):
        return Double(self.val * self.val)

    def inverse(self):
        return Double(1.0 / self.val)

    @staticmethod
    def zero():
        return Double(0.0)

    @staticmethod
    def one():
        return Double(1.0)

    @staticmethod
    def random_element():
        return Double(complex(np.random.rand(), 0.0))

    def power(self, e: int):
        return Double(self.val ** e)

    @staticmethod
    def get_root_of_unity(n: int):
        """Primitive n-th root of unity e^{2 pi i/n} (double.cpp)."""
        return Double(cmath.exp(2j * cmath.pi / n))


def batch_fft(x, inverse: bool = False):
    """Radix-2 FFT over complex64 jax arrays along the last axis — the
    device-side evaluation-domain analogue for the mock field."""
    import jax.numpy as jnp

    x = jnp.asarray(x, dtype=jnp.complex64)
    return jnp.fft.ifft(x) * x.shape[-1] if inverse else jnp.fft.fft(x)
