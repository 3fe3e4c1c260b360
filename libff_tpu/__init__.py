"""libff_tpu — a TPU-native finite-field and elliptic-curve algebra framework.

A from-scratch reimplementation of the capability surface of clearmatics/libff
(prime fields, tower extensions, pairing-friendly curve groups, Pippenger
multi-scalar multiplication, ate/Tate pairings, libff-compatible
serialization) designed for TPUs: field elements are batched arrays of
radix-2^16 limbs in uint32 lanes, every operation is a vectorized XLA/Pallas
kernel, and MSM shards point/scalar vectors across a `jax.sharding.Mesh`
with window partials combined over ICI collectives.
"""

__version__ = "0.1.0"

from .curves.curvedef import available_curves, get_curve  # noqa: F401

__all__ = ["available_curves", "get_curve"]
