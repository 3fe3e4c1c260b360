"""The multi_exp dispatcher: libff's method enum and chunked API.

Mirrors libff/algebra/scalar_multiplication/multiexp.hpp:21-73:

  Method.naive          — per-term wNAF exponentiation then sum
                          (multi_exp_inner<...,naive>, wnaf-based)
  Method.naive_plain    — per-term double-and-add then sum
  Method.bos_coster     — Bos-Coster max-heap algorithm (multiexp.tcc:
                          383-505); inherently sequential/data-dependent,
                          so host-oracle only (it exists for cross-method
                          answer checking, not speed)
  Method.BDLO12         — unsigned-window Pippenger (multiexp.tcc:276-381)
  Method.BDLO12_signed  — signed-digit Pippenger (the fast path,
                          multiexp.tcc:507-641)

`multi_exp(..., chunks=k)` reproduces the reference's chunked dispatcher
(multiexp.tcc:643-688): the input is split into k ranges whose partial
MSMs are summed in fixed order — on TPU the parallelism comes from the
batch and the mesh, so chunking exists for API/answer parity (and as the
seam the mesh version shards along).
"""

from __future__ import annotations

import enum
import heapq

import jax.numpy as jnp

from ..curves.group import AffinePoint
from . import wnaf_host
from .naive import msm_naive
from .pippenger import MsmConfig, msm_pippenger


class Method(enum.Enum):
    naive = "naive"
    naive_plain = "naive_plain"
    bos_coster = "bos_coster"
    BDLO12 = "BDLO12"
    BDLO12_signed = "BDLO12_signed"


# --- host-oracle methods ---------------------------------------------------

def host_multi_exp_naive(E, wnaf_table, scalars, points, scalar_bits):
    """Per-term wNAF then serial sum (multi_exp_inner<..., naive>)."""
    acc = None
    for k, P in zip(scalars, points):
        if k == 0 or P is None:
            continue
        term = wnaf_host.opt_window_wnaf_exp(E, wnaf_table, P, k, scalar_bits)
        acc = E.add(acc, term)
    return acc


def host_multi_exp_bos_coster(E, scalars, points):
    """Bos-Coster: repeatedly replace the two largest terms
    (x A + y B -> (x - y) A + y (A + B)); when the top scalar dwarfs the
    runner-up, halve it instead (k A = (k//2)(2A) [+ A]) — the same
    skew-escape idea as the reference's shift path (multiexp.tcc:383-505).
    Host-oracle cross-checking implementation."""
    heap = [(-k, i) for i, (k, P) in enumerate(zip(scalars, points))
            if k != 0 and P is not None]
    pts = list(points)
    heapq.heapify(heap)
    if not heap:
        return None
    while len(heap) > 1:
        nk1, i1 = heapq.heappop(heap)
        k1 = -nk1
        k2 = -heap[0][0]
        if k1 >= (k2 << 1):
            # halve: k1*A = (k1//2)*(2A) + (k1&1)*A
            if k1 & 1:
                pts.append(pts[i1])
                heapq.heappush(heap, (-1, len(pts) - 1))
            pts[i1] = E.dbl(pts[i1])
            heapq.heappush(heap, (-(k1 >> 1), i1))
        else:
            _, i2 = heap[0]
            k1 -= k2
            pts[i2] = E.add(pts[i2], pts[i1])
            if k1 > 0:
                heapq.heappush(heap, (-k1, i1))
    nk, i = heap[0]
    return E.mul(-nk, pts[i])


# --- device dispatcher -----------------------------------------------------

def multi_exp(G, scalar_limbs, points: AffinePoint, num_bits: int, *,
              method: Method = Method.BDLO12_signed, chunks: int = 1,
              config: MsmConfig | None = None):
    """Device MSM with libff's method/chunk surface.

    scalar_limbs: (n_limbs, N) plain-form u32 limbs; points: affine batch.
    Returns a Jacobian (or Edwards-projective) point.
    """
    if method is Method.bos_coster:
        raise ValueError("bos_coster is host-only: use "
                         "host_multi_exp_bos_coster (cross-check oracle)")

    def one_chunk(limbs, pts):
        if method in (Method.naive, Method.naive_plain):
            return msm_naive(G, limbs, pts, num_bits)
        signed = method is Method.BDLO12_signed
        return msm_pippenger(G, limbs, pts, num_bits, config=config,
                             signed=signed)

    N = scalar_limbs.shape[-1]
    if chunks <= 1 or N < 2 * chunks:
        return one_chunk(scalar_limbs, points)
    bounds = [round(i * N / chunks) for i in range(chunks + 1)]
    total = None
    for lo, hi in zip(bounds, bounds[1:]):
        part = one_chunk(
            scalar_limbs[:, lo:hi],
            AffinePoint(points.x[..., lo:hi], points.y[..., lo:hi],
                        points.inf[lo:hi]))
        # G.add == padd for EdwardsGroup; Jacobian masked add otherwise —
        # fixed summation order, so results are chunk-count-deterministic
        total = part if total is None else G.add(total, part)
    return total


def multi_exp_filter_one_zero(G, scalar_limbs, points: AffinePoint,
                              num_bits: int, *,
                              method: Method = Method.BDLO12_signed,
                              chunks: int = 1,
                              config: MsmConfig | None = None,
                              verbose: bool = False):
    """Pre-filtering MSM (multiexp.tcc:695-757): 0-scalars are skipped,
    1-scalars are accumulated with plain adds (one batched sum tree here),
    and only the remainder enters the bucket method.

    The filter itself runs on host limb values (a data-dependent compaction
    cannot live under jit); the two surviving batches are device work.
    """
    import numpy as np

    limbs = np.asarray(scalar_limbs)
    N = limbs.shape[-1]
    is_zero = ~np.any(limbs != 0, axis=0)
    one = np.zeros((limbs.shape[0],), dtype=limbs.dtype)
    one[0] = 1
    is_one = np.all(limbs == one[:, None], axis=0)
    other = ~(is_zero | is_one)
    if verbose:
        print(f"* Elements of w skipped: {int(is_zero.sum())} "
              f"({100 * is_zero.sum() / max(N, 1):.2f}%)")
        print(f"* Elements of w processed with special addition: "
              f"{int(is_one.sum())} ({100 * is_one.sum() / max(N, 1):.2f}%)")
        print(f"* Elements of w remaining: {int(other.sum())} "
              f"({100 * other.sum() / max(N, 1):.2f}%)")

    total = None
    if bool(is_one.any()):
        idx = np.nonzero(is_one)[0]
        ones = AffinePoint(points.x[..., idx], points.y[..., idx],
                           points.inf[idx])
        total = G.sum_tree(G.from_affine(ones), axis=-1)
    if bool(other.any()):
        idx = np.nonzero(other)[0]
        rest = multi_exp(
            G, jnp.asarray(limbs[:, idx]),
            AffinePoint(points.x[..., idx], points.y[..., idx],
                        points.inf[idx]),
            num_bits, method=method, chunks=chunks, config=config)
        total = rest if total is None else G.add(total, rest)
    return G.zero(()) if total is None else total
