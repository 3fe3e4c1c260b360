"""Reference executor for the Pallas bucket-insert kernels.

Runs the EXACT kernel bodies (pallas_insert._insert_kernel /
pallas_insert3._insert_kernel) as plain JAX: the grid loop becomes a
Python loop, refs become functional array wrappers, and the few Pallas
primitives the kernels use (program_id / num_programs / when / roll) are
shimmed.  Purpose: deterministic CPU CI coverage of the kernel logic
(tests/test_pallas_interpret.py) — `pl.pallas_call(interpret=True)`'s
Mosaic emulation hangs nondeterministically on this CPU backend, and a
broken kernel otherwise ships untested (the round-2 merge=True
regression).  Mosaic *compile* behavior is still only covered on real
TPU (profile/check_pallas_engines.py).

The executor reproduces pallas_call's block semantics for the subset the
kernels use: static block shapes, index_map(*grid_idx) block offsets,
row-major grid iteration (last axis fastest), and output blocks that
persist across grid steps (the VMEM-resident accumulator pattern — the
bucket specs' index_map ignores the t axis, so re-visiting a block sees
the previous step's writes).
"""

from __future__ import annotations

import contextlib
import itertools

import jax.numpy as jnp


class _PallasShim:
    """Stand-in for the `pl` / `pltpu` modules inside a kernel body."""

    def __init__(self, grid):
        self._grid = grid
        self._idx = (0,) * len(grid)

    def program_id(self, axis: int) -> int:
        return self._idx[axis]

    def num_programs(self, axis: int) -> int:
        return self._grid[axis]

    def when(self, cond):
        def deco(fn):
            if cond:
                fn()
            return fn
        return deco

    def roll(self, a, shift, axis):
        # pltpu.roll: out[..., i, ...] = in[..., (i - shift) % size, ...]
        return jnp.roll(a, shift, axis)


class _Ref:
    """Functional ref: reads slice the current value, writes rebind it."""

    def __init__(self, arr):
        self._a = jnp.asarray(arr)

    @property
    def shape(self):
        return self._a.shape

    @property
    def dtype(self):
        return self._a.dtype

    def __getitem__(self, key):
        return self._a[key]

    def __setitem__(self, key, val):
        self._a = self._a.at[key].set(val)

    def __jax_array__(self):
        # lets jnp.zeros_like(ref) etc. see the underlying array
        return self._a


def _block_slices(spec, grid_idx):
    bidx = spec.index_map(*grid_idx)
    return tuple(slice(i * b, (i + 1) * b)
                 for i, b in zip(bidx, spec.block_shape))


@contextlib.contextmanager
def _patched(module, shim):
    old_pl, old_pltpu = module.pl, module.pltpu
    module.pl = shim
    module.pltpu = shim
    try:
        yield
    finally:
        module.pl, module.pltpu = old_pl, old_pltpu


def reference_pallas_call(module, kernel, grid, in_specs, out_specs,
                          out_shape, inputs):
    """Execute `kernel` over `grid` with pallas block semantics, purely in
    JAX.  `module` is the module whose globals the kernel body resolves
    `pl` / `pltpu` from (its defining module)."""
    outs = [jnp.zeros(s.shape, s.dtype) for s in out_shape]
    shim = _PallasShim(grid)
    with _patched(module, shim):
        for grid_idx in itertools.product(*[range(g) for g in grid]):
            shim._idx = grid_idx
            in_refs = [_Ref(a[_block_slices(s, grid_idx)])
                       for s, a in zip(in_specs, inputs)]
            osl = [_block_slices(s, grid_idx) for s in out_specs]
            out_refs = [_Ref(o[sl]) for o, sl in zip(outs, osl)]
            kernel(*in_refs, *out_refs)
            outs = [o.at[sl].set(r._a)
                    for o, sl, r in zip(outs, osl, out_refs)]
    return outs
