"""Levelized rounds executor (vm.run_program_rounds) vs the scan VM.

The rounds executor is the TPU hot path for batched group operations
(group.Group._run routes batches >= 2048 through it); these tests pin its
bit-exactness against the one-op-per-step scan executor on the same traced
programs.  The heavy mul="unrolled" variant is exercised once on a single
program (XLA:CPU compile time of the inlined CIOS is superlinear in call
sites); the leveling logic itself is validated across the full formula set
with the cheap fori-CIOS multiplier.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from libff_tpu import vm
from libff_tpu.curves.device import device_curve
from libff_tpu.curves.group import AffinePoint


@pytest.fixture(scope="module")
def dc():
    return device_curve("alt_bn128")


def _points(G, gd, n=8, seed=3):
    E, gen = gd.curve, gd.generator
    pts = [E.mul(seed + i, gen) for i in range(n)]
    if G.F.degree == 1:
        x = G.F.from_ints([p[0] for p in pts])
        y = G.F.from_ints([p[1] for p in pts])
    else:
        x = G.F.from_host_batch([p[0] for p in pts])
        y = G.F.from_host_batch([p[1] for p in pts])
    return AffinePoint(x, y, jnp.zeros((n,), bool))


def _run_both(G, key, build, elements, batch, mul):
    prog = G._program(key, build)
    inputs = []
    for e in elements:
        inputs.extend(vm.flatten_element(G.F, e))
    scan = vm.run_program(G._fp, prog, inputs, batch)
    rounds = vm.run_program_rounds(G._fp, prog, inputs, batch, mul=mul)
    assert len(scan) == len(rounds)
    for a, b in zip(scan, rounds):
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("gname", ["g1", "g2"])
@pytest.mark.parametrize("op", ["add", "madd", "dbl", "pmadd", "pdbl"])
def test_rounds_matches_scan(dc, gname, op):
    G = getattr(dc, gname)
    gd = getattr(dc.cd, gname)
    A = _points(G, gd)
    Qa = _points(G, gd, seed=11)
    P = G.from_affine(A)
    # reuse the exact programs the group traces for its public ops
    probes = {
        "add": (lambda: G.add(P, G.from_affine(Qa))),
        "madd": (lambda: G.mixed_add(P, Qa)),
        "dbl": (lambda: G.dbl(P)),
        "pmadd": (lambda: G.pmadd(G.proj_from_affine(A), Qa)),
        "pdbl": (lambda: G.pdbl(G.proj_from_affine(A))),
    }
    # run the op once under each executor and compare coordinates.
    # mul="loop" keeps the XLA:CPU compile cheap; the unrolled multiplier
    # itself is covered by test_fp / the dedicated case below.
    old, oldm = G.vm_engine, G.vm_rounds_mul
    try:
        G.vm_engine = "scan"
        want = probes[op]()
        G.vm_engine, G.vm_rounds_mul = "rounds", "loop"
        got = probes[op]()
    finally:
        G.vm_engine, G.vm_rounds_mul = old, oldm
    for a, b in zip(want, got):
        assert np.array_equal(np.asarray(a), np.asarray(b)), (gname, op)


def test_rounds_unrolled_once(dc):
    """One program through the default (unrolled-CIOS) rounds multiplier."""
    G = dc.g1
    A = _points(G, dc.cd.g1)
    P = G.proj_from_affine(A)
    old, oldm = G.vm_engine, G.vm_rounds_mul
    try:
        G.vm_engine = "scan"
        want = G.pdbl(P)
        G.vm_engine, G.vm_rounds_mul = "rounds", None
        got = G.pdbl(P)
    finally:
        G.vm_engine, G.vm_rounds_mul = old, oldm
    for a, b in zip(want, got):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_mul_levels_structure(dc):
    """Every instruction lands in exactly one level and operands of a
    level-k mul have depth < k."""
    G = dc.g1
    P = G.from_affine(_points(G, dc.cd.g1))
    G.add(P, P)  # ensure the program is traced
    prog = G._progs["add"]
    levels = vm.mul_levels(prog)
    seen = set()
    for instrs in levels:
        for i in instrs:
            assert i not in seen
            seen.add(i)
    muls = [i for i, row in enumerate(prog.ssa_instr) if row[0] == vm.MUL]
    assert sorted(seen) == muls
