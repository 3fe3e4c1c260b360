"""Multi-chip / multi-host MSM over a jax.sharding.Mesh.

The TPU-native replacement for libff's OpenMP chunked multi_exp
(multiexp.tcc:643-688, the reference's only data-parallel mechanism):

  * the point/scalar vector is sharded over a 'points' mesh axis
    (data parallel).  Each device runs the full local Pippenger bucket
    phase — digits, bucket inserts, lane merge, suffix sums, window
    Horner — entirely locally; the only cross-device traffic is one
    all_gather of a single Jacobian point per device (a few KB), summed
    in a fixed tree order on every device.  Group arithmetic is exact
    integer math, so the computed group element — and therefore its
    unique AFFINE coordinates — is bit-identical at any device count
    (the Jacobian representative depends on the partial-sum grouping);
    at a fixed device count the whole output is deterministic
    (tests/test_mesh_msm.py).

  * optionally a second 'windows' axis splits Pippenger's digit windows
    across devices (the "model parallel" analogue): each device owns a
    contiguous window range, Horner-combines locally, scales by
    2^(c * window_offset) with a dynamic doubling loop, and the partials
    are gathered and summed.

Collective volume is O(devices) points regardless of N, so ICI/DCN cost is
negligible against the O(N * W) bucket work — the ≥80% multi-host scaling
target (BASELINE.md) is structural.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:                                    # jax >= 0.8
    from jax import shard_map as _shard_map
except ImportError:                     # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

# The replication-check kwarg was renamed check_rep -> check_vma; key on
# the actual signature, not on which module the symbol imports from (a
# version can expose jax.shard_map while still taking check_rep).  The
# MSM body's collectives are the only cross-device ops, so replication
# checking adds nothing either way.
import inspect as _inspect

try:
    _params = _inspect.signature(_shard_map).parameters
    _CHECK_KWARG = "check_vma" if "check_vma" in _params else (
        "check_rep" if "check_rep" in _params else None)
except (ValueError, TypeError):          # pragma: no cover - C accelerated
    _CHECK_KWARG = None


def shard_map(f, *, mesh, in_specs, out_specs):
    kw = {_CHECK_KWARG: False} if _CHECK_KWARG else {}
    return _shard_map(f, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, **kw)

from ..curves.group import AffinePoint, Group, JacobianPoint
from ..msm.pippenger import MsmConfig, msm_pippenger, msm_pippenger_windows


def _gather_and_sum(G: Group, part: JacobianPoint, axis_name: str):
    """all_gather single points over a mesh axis and tree-sum identically
    on every device (deterministic: device order)."""
    gathered = JacobianPoint(
        jax.lax.all_gather(part.x, axis_name, axis=part.x.ndim),
        jax.lax.all_gather(part.y, axis_name, axis=part.y.ndim),
        jax.lax.all_gather(part.z, axis_name, axis=part.z.ndim))
    return G.sum_tree(gathered, axis=-1)


def msm_sharded(G: Group, mesh: Mesh, scalar_limbs, points: AffinePoint,
                num_bits: int, *, config: MsmConfig | None = None,
                points_axis: str = "points", windows_axis: str | None = None):
    """MSM with the batch sharded over `points_axis` (and optionally the
    Pippenger windows over `windows_axis`)."""
    el = points.x.ndim - 1

    def local_fn(limbs, px, py, inf):
        pts = AffinePoint(px, py, inf)
        if windows_axis is None:
            part = msm_pippenger(G, limbs, pts, num_bits, config=config)
        else:
            widx = jax.lax.axis_index(windows_axis)
            nw = jax.lax.axis_size(windows_axis)
            part = msm_pippenger_windows(
                G, limbs, pts, num_bits, widx, nw, config=config)
            part = _gather_and_sum(G, part, windows_axis)
        return _gather_and_sum(G, part, points_axis)

    pspec_limbs = P(None, points_axis)
    pspec_coord = P(*([None] * el + [points_axis]))
    pspec_inf = P(points_axis)
    out_spec = JacobianPoint(P(), P(), P())
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(pspec_limbs, pspec_coord, pspec_coord, pspec_inf),
        out_specs=out_spec)
    return fn(scalar_limbs, points.x, points.y, points.inf)


def shard_msm_inputs(mesh: Mesh, scalar_limbs, points: AffinePoint,
                     points_axis: str = "points"):
    """Place MSM inputs with the batch axis sharded over the mesh."""
    el = points.x.ndim - 1
    s_limbs = jax.device_put(
        scalar_limbs, NamedSharding(mesh, P(None, points_axis)))
    coord = NamedSharding(mesh, P(*([None] * el + [points_axis])))
    pts = AffinePoint(
        jax.device_put(points.x, coord),
        jax.device_put(points.y, coord),
        jax.device_put(points.inf, NamedSharding(mesh, P(points_axis))))
    return s_limbs, pts
