"""Multi-host runtime: jax.distributed initialization + pod mesh builders.

The reference's only scaling mechanism is single-process OpenMP
(multiexp.tcc:667-679); the TPU-native story (SURVEY.md §2.6) is a device
mesh spanning a pod slice, with the MSM batch sharded over a 'points' axis
and (optionally) Pippenger windows over a 'windows' axis.  Layout rule:

  * the POINTS axis carries only one all_gather of a single partial point
    per shard (a few KB) — it tolerates slow links, so it maps to the
    HOST/DCN dimension;
  * the WINDOWS axis exchanges per-window partials that combine with
    dynamic doubling — cheap too, but scheduling it on ICI keeps the
    all_gather latency off the critical path (the collectives here are
    tiny either way; the design point is that ALL bucket work is local).

Usage (per host process):

    from libff_tpu.parallel import runtime
    runtime.initialize_distributed()          # no-op on a single host
    mesh = runtime.pod_mesh(windows_per_host=2)
    ... msm_sharded(g1, mesh, ...) ...
"""

from __future__ import annotations

import os

import numpy as np

import jax


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           local_device_ids=None) -> bool:
    """Initialize the JAX multi-host runtime (jax.distributed).

    With no arguments, resolves from the standard environment
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    cloud-TPU metadata JAX discovers natively).  Returns True if a
    multi-process runtime was initialized, False when running single-host
    (in which case nothing is touched and jax.devices() stays local).
    Safe to call twice (the second call is a no-op).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    try:
        already = bool(jax.distributed.is_initialized())
    except AttributeError:      # older JAX without the public predicate
        already = getattr(
            jax._src.distributed.global_state, "client", None) is not None
    if already:
        return jax.process_count() > 1
    if coordinator_address is None:
        # single-host run (or an environment without explicit coordination
        # config): stay local.  Pod launchers must set the JAX_* env vars
        # or pass arguments.
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    return jax.process_count() > 1


def pod_mesh(windows_per_host: int = 1,
             axis_names: tuple[str, str] = ("points", "windows"),
             devices=None) -> "jax.sharding.Mesh":
    """Mesh over all visible devices: ('points', 'windows') with the points
    axis spanning hosts (DCN-major) and the windows axis inside each host
    (ICI), per the layout rule above.

    windows_per_host: size of the windows axis; must divide the local
    device count.  1 = pure data-parallel points mesh.
    """
    from jax.sharding import Mesh

    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if windows_per_host == 1:
        return Mesh(np.array(devices), (axis_names[0],))
    assert n % windows_per_host == 0, (n, windows_per_host)
    # order devices host-major so the points axis strides across hosts
    # (process_index major, local order minor) — contiguous windows groups
    # then live on one host's ICI domain
    devices.sort(key=lambda d: (d.process_index, d.id))
    grid = np.array(devices).reshape(n // windows_per_host, windows_per_host)
    return Mesh(grid, axis_names)


def local_batch_slice(mesh, n_total: int, points_axis: str = "points"):
    """The [start, stop) rows of the global batch this PROCESS must supply
    when feeding per-host shards (jax.make_array_from_single_device_arrays
    style data loading).  Rows are split evenly over the points axis."""
    npts = mesh.shape[points_axis]
    assert n_total % npts == 0, (n_total, npts)
    per = n_total // npts
    # which point-shard indices live on this process?
    mine = sorted({
        dev_idx[list(mesh.axis_names).index(points_axis)]
        for dev_idx, dev in np.ndenumerate(mesh.devices)
        if dev.process_index == jax.process_index()})
    return [(i * per, (i + 1) * per) for i in mine]
