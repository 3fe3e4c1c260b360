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

from typing import Iterable, Iterator, Tuple

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


def _scalar_limbs(G, ks):
    import libff_tpu.host.mont as hm

    # scalars live in Fr = Z/order, NOT in the coordinate field: limb
    # count must come from the group order (Fr and Fq differ, e.g. BW6)
    n16 = hm.derive(G.order).n16
    arr = np.zeros((n16, len(ks)), dtype=np.uint32)
    for j, k in enumerate(ks):
        arr[:, j] = hm.int_to_limbs(int(k), n16)
    return jnp.asarray(arr)