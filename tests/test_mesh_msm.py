"""Multi-device MSM tests on the 8-device virtual CPU mesh (SURVEY.md §4:
the deterministic single-host multi-device harness libff never had —
its only data-parallel mechanism is OpenMP chunking, multiexp.tcc:643-688).

Asserts, at devices ∈ {1, 2, 4, 8}:
  sharded MSM == unsharded MSM == host oracle   (affine, exact integers)
with the windows axis both off and on, plus unit tests for the pod mesh
layout helpers (parallel/runtime.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from libff_tpu.curves.device import device_curve
from libff_tpu.curves.group import AffinePoint
from libff_tpu.host import field as hf
from libff_tpu.msm.pippenger import MsmConfig
from libff_tpu.parallel.mesh_msm import msm_sharded, shard_msm_inputs
from libff_tpu.parallel import runtime


N = 64
CFG = MsmConfig(c=4, lanes=8)


@pytest.fixture(scope="module")
def ctx():
    dc = device_curve("alt_bn128")
    cd = dc.cd
    E = cd.g1.curve
    gen = cd.g1.generator
    # 32-bit scalars: the mesh logic (sharding, collectives, window
    # chunking, determinism) is scalar-width-independent, and W = 9
    # windows instead of 64 keeps the 8 per-device-count shard_map
    # compiles cheap enough for CI
    ks = [hf.sha512_rng(cd.fr.mp, i) % (1 << 32) for i in range(N)]
    ks[3] = 0
    pts = [E.mul((i % 16) + 1, gen) for i in range(N)]
    limbs = dc.fr.plain_from_ints(ks)
    G = dc.g1
    A = AffinePoint(G.F.from_ints([p[0] for p in pts]),
                    G.F.from_ints([p[1] for p in pts]),
                    jnp.zeros((N,), bool))
    want = E.msm(ks, pts)
    return dc, limbs, A, want


def _aff(dc, P):
    G = dc.g1
    A = G.to_affine(jax.tree.map(lambda a: a[..., None], P))
    return (G.F.to_ints(A.x)[0], G.F.to_ints(A.y)[0])


@pytest.mark.parametrize("ndev", [1, 2, 4, 8])
def test_sharded_matches_oracle_at_every_device_count(ctx, ndev):
    """sharded == host oracle at every device count; the affine result is
    bit-identical no matter how the batch is split (exact integer group
    arithmetic — the group element, hence its unique affine coordinates,
    cannot depend on the partial-sum grouping)."""
    dc, limbs, A, want = ctx
    devices = jax.devices()[:ndev]
    mesh = Mesh(np.array(devices), ("points",))
    limbs_s, pts_s = shard_msm_inputs(mesh, limbs, A)
    out = msm_sharded(dc.g1, mesh, limbs_s, pts_s, 32, config=CFG)
    assert _aff(dc, out) == want


@pytest.mark.parametrize("shape", [(1, 2), (2, 2), (2, 4), (4, 2)])
def test_sharded_windows_axis(ctx, shape):
    """points x windows meshes: each device owns a window chunk of its
    point shard; partials recombine with dynamic doubling + all_gather."""
    dc, limbs, A, want = ctx
    npts, nwin = shape
    devices = jax.devices()[: npts * nwin]
    mesh = Mesh(np.array(devices).reshape(npts, nwin),
                ("points", "windows"))
    limbs_s, pts_s = shard_msm_inputs(mesh, limbs, A)
    out = msm_sharded(dc.g1, mesh, limbs_s, pts_s, 32, config=CFG,
                      windows_axis="windows")
    assert _aff(dc, out) == want


def test_sharded_full_width_windows_axis():
    """FULL-WIDTH (254-bit) scalars across a 2x4 points x windows mesh vs
    the host oracle — closes the r03 gap between the 32-bit CI cases above
    and the tiny dryrun: all W = 64 signed windows (c=4) are computed,
    chunked 16-per-device, recombined through the dynamic-doubling +
    all_gather path.  One configuration only: the full-width shard_map
    program is the expensive compile in this file (~2 min on CPU)."""
    dc = device_curve("alt_bn128")
    cd = dc.cd
    E = cd.g1.curve
    gen = cd.g1.generator
    n = 256
    ks = [hf.sha512_rng(cd.fr.mp, i) for i in range(n)]   # full 254-bit
    ks[3] = 0
    pts = [E.mul((i % 16) + 1, gen) for i in range(n)]
    limbs = dc.fr.plain_from_ints(ks)
    G = dc.g1
    A = AffinePoint(G.F.from_ints([p[0] for p in pts]),
                    G.F.from_ints([p[1] for p in pts]),
                    jnp.zeros((n,), bool))
    want = E.msm(ks, pts)
    devices = jax.devices()[:8]
    mesh = Mesh(np.array(devices).reshape(2, 4), ("points", "windows"))
    limbs_s, pts_s = shard_msm_inputs(mesh, limbs, A)
    out = msm_sharded(G, mesh, limbs_s, pts_s, 254, config=CFG,
                      windows_axis="windows")
    assert _aff(dc, out) == want


def test_unsharded_reference_equality(ctx):
    """The single-device (mesh of 1) result equals the plain msm_pippenger
    call — the mesh wrapper adds no arithmetic."""
    from libff_tpu.msm.pippenger import msm_pippenger

    dc, limbs, A, want = ctx
    plain = msm_pippenger(dc.g1, limbs, A, 32, config=CFG)
    assert _aff(dc, plain) == want


class _FakeDev:
    def __init__(self, pid, did):
        self.process_index = pid
        self.id = did

    def __repr__(self):
        return f"d{self.process_index}.{self.id}"


def test_pod_mesh_layout():
    """pod_mesh: points axis strides across hosts (process-major device
    sort), windows groups stay within one host's ICI domain."""
    devs = [_FakeDev(pid, did) for did in (1, 0) for pid in (1, 0)]
    mesh = runtime.pod_mesh(windows_per_host=2, devices=devs)
    assert mesh.axis_names == ("points", "windows")
    grid = mesh.devices
    assert grid.shape == (2, 2)
    # each row (a windows group) must be a single process
    for row in grid:
        assert len({d.process_index for d in row}) == 1
    # process-major: row 0 = process 0, row 1 = process 1, ids ascending
    assert [[(d.process_index, d.id) for d in row] for row in grid] == \
        [[(0, 0), (0, 1)], [(1, 0), (1, 1)]]
    # windows_per_host=1: flat points-only mesh in given order
    flat = runtime.pod_mesh(windows_per_host=1, devices=devs)
    assert flat.axis_names == ("points",)
    assert flat.devices.shape == (4,)


def test_local_batch_slice():
    """Single-process: every point shard's [start, stop) range belongs to
    this process, evenly split."""
    devices = jax.devices()[:4]
    mesh = Mesh(np.array(devices), ("points",))
    sl = runtime.local_batch_slice(mesh, 64)
    assert sl == [(0, 16), (16, 32), (32, 48), (48, 64)]
    with pytest.raises(AssertionError):
        runtime.local_batch_slice(mesh, 63)


def test_initialize_distributed_single_host():
    """No coordinator configured -> stays local, returns False, touches
    nothing (jax.devices() unchanged)."""
    before = jax.devices()
    assert runtime.initialize_distributed() is False
    assert jax.devices() == before
