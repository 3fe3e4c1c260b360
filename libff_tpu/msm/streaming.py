"""Streaming (out-of-core) MSM: the TPU-native multi_exp_stream.

The reference streams disk-resident points through a producer thread and a
lock-free SPSC fifo into a single-pass bucket accumulator
(libff/algebra/scalar_multiplication/multiexp_stream.{hpp,tcc}).  The
TPU-native shape of the same idea (SURVEY.md §2.6, §5):

  * points live on the host (a file of libff-encoded elements, a numpy
    memmap, or any chunk iterator) — the "disk" side;
  * chunks are uploaded and dispatched asynchronously: jax dispatch
    returns immediately, so while the device runs the Pippenger bucket
    phase for chunk i the host is already deserializing chunk i+1 — the
    double-buffering the reference builds manually with a thread + fifo;
  * per-chunk partial MSMs are summed on device in fixed chunk order
    (deterministic at any chunk size, like the serial partial sum at
    multiexp.tcc:681-687).

File format: the concatenation of group elements in a libff binary
encoding (multiexp_stream.hpp:30-37); `points_from_file` re-reads it with
the serialization codecs.
"""

from __future__ import annotations

import io
from typing import Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.group import AffinePoint
from ..serialization import codec as ser
from .pippenger import MsmConfig, msm_pippenger


def points_from_file(path: str, gcodec, *, compressed: bool = False,
                     form: str = ser.MONTGOMERY, chunk: int = 1 << 16
                     ) -> Iterator[list]:
    """Yield lists of host affine points from a libff-encoded element file
    (the multiexp_stream base-element file format)."""
    size = gcodec.compressed_size if compressed else gcodec.uncompressed_size
    read = (gcodec.read_compressed if compressed
            else gcodec.read_uncompressed)
    with open(path, "rb") as f:
        while True:
            data = f.read(size * chunk)
            if not data:
                return
            n = len(data) // size
            yield [read(data[i * size:(i + 1) * size], form=form)
                   for i in range(n)]


def msm_stream(G, scalars: Iterable[int],
               point_chunks: Iterator[list], num_bits: int, *,
               chunk_size: int = 1 << 16,
               config: MsmConfig | None = None):
    """MSM over host-streamed points: sum_i scalars[i] * points[i].

    scalars: host ints (consumed in chunk-sized bites, in order);
    point_chunks: iterator of host affine point lists (None = infinity).
    Returns the device point (Jacobian / Edwards-projective).

    The per-chunk device work is dispatched asynchronously; host-side
    deserialization of the next chunk overlaps it (multiexp_stream.tcc's
    producer/consumer overlap without the fifo).
    """
    F = G.F
    import libff_tpu.host.mont as hm

    scalars = iter(scalars)
    total = None
    fr_limbs = None
    for pts in point_chunks:
        n = len(pts)
        ks = [next(scalars) for _ in range(n)]
        # host -> device staging
        limbs = _scalar_limbs(G, ks)
        xs = [p[0] if p is not None else (0 if F.degree == 1 else
                                          G.gdef.curve.F.zero())
              for p in pts]
        ys = [p[1] if p is not None else (1 if F.degree == 1 else
                                          G.gdef.curve.F.one())
              for p in pts]
        load = F.from_ints if F.degree == 1 else F.from_host_batch
        A = AffinePoint(load(xs), load(ys),
                        jnp.asarray(np.array([p is None for p in pts])))
        part = msm_pippenger(G, limbs, A, num_bits, config=config)
        # fixed-order accumulation; dispatch is async so the next host
        # chunk deserializes while the device runs
        total = part if total is None else G.add(total, part)
    return total


def msm_stream_arrays(G, scalar_limbs: np.ndarray, x: np.ndarray,
                      y: np.ndarray, inf: np.ndarray, num_bits: int, *,
                      chunk_size: int = 1 << 20,
                      config: MsmConfig | None = None,
                      donate: bool = False, compact: bool = True):
    """MSM over HOST-RESIDENT limb arrays (numpy / np.memmap), streamed to
    the device chunk by chunk — the fast-path form of msm_stream for data
    that is already in the raw device layout (the reference's analogue:
    multi_exp_stream over its base-element files, multiexp_stream.tcc:
    164-223, whose producer thread overlaps IO with bucket work).

    scalar_limbs: (n_limbs, N) u32 plain-form scalars; x, y: (el..., N)
    coordinate limbs; inf: (N,) bool.  All may be np.memmap — slices are
    materialized per chunk, so device + host memory stay O(chunk_size).

    compact (default True): every limb value is canonically < 2^16, so
    the host->device transfer uploads uint16 and widens on device — half
    the wire volume for free.  Measured r04: the 2^24 stream through the
    tunneled TPU was transfer-bound (~8 MB/s tunnel; 3.2 GB/iteration
    dominated the 13 s of compute), so wire bytes ARE the metric.

    Overlap: jax.device_put of chunk i+1's arrays is issued while the
    device still runs chunk i's bucket phase (dispatch is async; the
    host-side slice copy of the next chunk runs under the device's
    compute).  Per-chunk partials sum in fixed chunk order, so the result
    is bit-identical to the all-resident MSM with the same chunking."""
    N = scalar_limbs.shape[-1]
    assert N % chunk_size == 0 or N < chunk_size, (N, chunk_size)
    total = None
    fn = None
    for c0 in range(0, N, chunk_size):
        dt = np.uint16 if compact else np.uint32
        sl = np.ascontiguousarray(
            scalar_limbs[:, c0:c0 + chunk_size]).astype(dt)
        xc = np.ascontiguousarray(x[..., c0:c0 + chunk_size]).astype(dt)
        yc = np.ascontiguousarray(y[..., c0:c0 + chunk_size]).astype(dt)
        ic = np.ascontiguousarray(inf[c0:c0 + chunk_size])
        if fn is None:
            import functools

            @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3)
                               if donate else ())
            def fn(sl, xc, yc, ic):
                sl, xc, yc = (a.astype(jnp.uint32) for a in (sl, xc, yc))
                return msm_pippenger(G, sl, AffinePoint(xc, yc, ic),
                                     num_bits, config=config)
        part = fn(jnp.asarray(sl), jnp.asarray(xc), jnp.asarray(yc),
                  jnp.asarray(ic))
        # async dispatch: the next chunk's host slice copy overlaps this
        # chunk's device bucket phase
        total = part if total is None else G.add(total, part)
    return total


def _scalar_limbs(G, ks):
    import libff_tpu.host.mont as hm

    # scalars live in Fr = Z/order, NOT in the coordinate field: limb
    # count must come from the group order (Fr and Fq differ, e.g. BW6)
    n16 = hm.derive(G.order).n16
    arr = np.zeros((n16, len(ks)), dtype=np.uint32)
    for j, k in enumerate(ks):
        arr[:, j] = hm.int_to_limbs(int(k), n16)
    return jnp.asarray(arr)


# ---------------------------------------------------------------------------
# Precomputed-multiples variant (multiexp_stream.tcc:124-223)
# ---------------------------------------------------------------------------

def num_precompute_digits(num_bits: int, c: int) -> int:
    """b = (num_bits + c - 1) / c (multiexp_stream.hpp:34-36)."""
    return -(-num_bits // c)


def write_precomputed_multiples(gcodec, points, c: int, num_bits: int,
                                *, form=ser.MONTGOMERY,
                                compressed: bool = False) -> bytes:
    """Serialize the stream-with-precompute file: for each base element e,
    the consecutive multiples e, [2^c]e, ..., [2^((b-1)c)]e
    (multiexp_stream.hpp:30-37).  points: host affine tuples / None."""
    E = gcodec.E
    b = num_precompute_digits(num_bits, c)
    w = gcodec.write_compressed if compressed else gcodec.write_uncompressed
    out = io.BytesIO()
    for P in points:
        m = P
        for _ in range(b):
            out.write(w(m, form))
            m = E.mul(1 << c, m) if m is not None else None
    return out.getvalue()


def multiples_from_file(path: str, gcodec, c: int, num_bits: int, *,
                        compressed: bool = False, form=ser.MONTGOMERY,
                        chunk: int = 1 << 14) -> Iterator[list]:
    """Yield per-chunk lists of per-element multiple lists
    ([[e, [2^c]e, ...], ...]) from a precompute file."""
    b = num_precompute_digits(num_bits, c)
    size = (gcodec.compressed_size if compressed
            else gcodec.uncompressed_size)
    read = (gcodec.read_compressed if compressed
            else gcodec.read_uncompressed)
    rec = size * b
    with open(path, "rb") as f:
        while True:
            data = f.read(rec * chunk)
            if not data:
                return
            n = len(data) // rec
            yield [[read(data[e * rec + i * size:e * rec + (i + 1) * size],
                         form=form) for i in range(b)] for e in range(n)]


def msm_stream_precomputed(G, scalars: Iterable[int],
                           multiple_chunks: Iterator[list],
                           c: int, num_bits: int, *,
                           lanes: int = 256):
    """MSM over host-streamed PRECOMPUTED multiples: with [2^(wc)]e_i
    available, every (element, digit) pair inserts into a single bucket
    array — one window, no Horner doublings
    (multi_exp_precompute_from_fifo, multiexp_stream.tcc:124-161).

    The TPU schedule flattens the (digit, element) pairs of each chunk into
    one batch of W*M independent single-window inserts.
    """
    from .pippenger import (MsmConfig, _prepare,
                            _window_totals, _window_totals_complete,
                            _use_direct)
    from . import digits as dig

    F = G.F
    W = num_precompute_digits(num_bits, c)
    # the signed decomposition may need one more digit than the multiples
    # file stores (dig.signed_digits zeroes the overflowed top digit — the
    # reference shares this layout, multiexp_stream.hpp:30-37); refuse the
    # silent-wrong-answer combinations instead of dropping the top carry
    need = dig.num_signed_digits(G.order, num_bits, c)
    if need > W:
        raise ValueError(
            f"msm_stream_precomputed: (num_bits={num_bits}, c={c}) needs "
            f"{need} signed digits but the precompute layout stores {W}; "
            "choose c so num_signed_digits <= num_precompute_digits")
    B = 1 << (c - 1)
    scalars = iter(scalars)
    total = None
    for chunk_multiples in multiple_chunks:
        M = len(chunk_multiples)
        ks = [next(scalars) for _ in range(M)]
        limbs = _scalar_limbs(G, ks)
        d = dig.signed_digits(limbs, c, W)               # (W, M)
        dflat = d.reshape(1, W * M)                      # window-major
        flat_pts = [chunk_multiples[e][w]
                    for w in range(W) for e in range(M)]
        load = F.from_ints if F.degree == 1 else F.from_host_batch
        zero_xy = ((0, 1) if F.degree == 1
                   else (G.gdef.curve.F.zero(), G.gdef.curve.F.one()))
        xs = [p[0] if p is not None else zero_xy[0] for p in flat_pts]
        ys = [p[1] if p is not None else zero_xy[1] for p in flat_pts]
        A = AffinePoint(load(xs), load(ys),
                        jnp.asarray(np.array([p is None for p in flat_pts])))
        cfg = MsmConfig(c=c, lanes=lanes)
        dpadded, pts, el, T, L = _prepare(G, dflat, A, cfg)
        dpad = dpadded.astype(jnp.int32).reshape(1, T, L)
        if G.supports_complete:
            eng = _use_direct(G, cfg)
            tot = _window_totals_complete(G, dpad, pts, el, B, eng)
            part = G.proj_to_jacobian(
                jax.tree.map(lambda a: a[..., 0], tot))
        else:
            tot = _window_totals(G, dpad, pts, el, B)
            part = jax.tree.map(lambda a: a[..., 0], tot)
        total = part if total is None else G.add(total, part)
    return total