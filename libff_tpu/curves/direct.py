"""Direct-rounds formula engine: RCB15 complete formulas scheduled as a
few big batched Montgomery multiplications.

The formula VM (vm.py) executes one field op per scan step — ideal compile
time, but on the TPU the sequential instruction stream leaves the VPU idle
between dependent ops, and a fully inlined formula (one mul_unrolled
subgraph per field mul) takes minutes of XLA compile time for large scan
bodies (measured ~15 min for one madd body).

This engine is the middle point: each formula's multiplications are
levelled into dependency *rounds*, and every round executes as ONE
`mul_unrolled` call on operands stacked along a new axis after the limb
axis.  An RCB15 mixed add is exactly 2 rounds (5 + 6 muls); the full add
is 2 rounds (6 + 6); the doubling is 2 rounds (4 + 4).  Compile cost is
two multiplier subgraphs per formula; runtime gets full unrolled-CIOS
speed with better lane occupancy than per-mul dispatch.

Semantics are identical to formulas.rcb_*_a0 (complete for odd-order
subgroups of y^2 = x^3 + b; reference formulas at alt_bn128_g1.cpp:149-326
use the incomplete Jacobian versions — completeness is what removes the
per-lane case analysis on a vector machine).

Only prime fields (el_ndim == 1); towers keep the VM path.
"""

from __future__ import annotations

import jax.numpy as jnp


# Multiplier used for the rounds: "unrolled" (fully inlined CIOS — fastest
# at runtime but each distinct shape costs minutes of XLA compile time) or
# "loop" (fori_loop CIOS — small trace, near-identical vector width).
MUL = "unrolled"


def _r(F, a_list, b_list):
    """One round: elementwise Montgomery mul of stacked operand lists."""
    s1 = jnp.stack(a_list, axis=1)
    s2 = jnp.stack(b_list, axis=1)
    r = F.mul_unrolled(s1, s2) if MUL == "unrolled" else F.mul_loop(s1, s2)
    return [r[:, i] for i in range(len(a_list))]


def madd(F, X1, Y1, Z1, x2, y2, b3_host):
    """Complete mixed add (RCB15 Alg 8, a=0) in 2 mul rounds (5 + 6)."""
    t0, t1, a, b, t3 = _r(F,
                          [X1, Y1, Z1, Z1, F.add(X1, Y1)],
                          [x2, y2, x2, y2, F.add(x2, y2)])
    t3 = F.sub(t3, F.add(t0, t1))
    t4 = F.add(a, X1)                     # X1 + x2*Z1
    t5 = F.add(b, Y1)                     # Y1 + y2*Z1
    t0_3 = F.add(F.double(t0), t0)
    t2 = F.mul_small_const(Z1, b3_host)
    Z3 = F.add(t1, t2)
    t1m = F.sub(t1, t2)
    Y3b = F.mul_small_const(t4, b3_host)
    xa, xb, ya, yb, za, zb = _r(F,
                                [t3, t5, t1m, Y3b, Z3, t0_3],
                                [t1m, Y3b, Z3, t0_3, t5, t3])
    return F.sub(xa, xb), F.add(ya, yb), F.add(za, zb)


def padd(F, X1, Y1, Z1, X2, Y2, Z2, b3_host):
    """Complete add (RCB15 Alg 7, a=0) in 2 mul rounds (6 + 6)."""
    t0, t1, t2, t3, t4, t5 = _r(
        F,
        [X1, Y1, Z1, F.add(X1, Y1), F.add(Y1, Z1), F.add(X1, Z1)],
        [X2, Y2, Z2, F.add(X2, Y2), F.add(Y2, Z2), F.add(X2, Z2)])
    t3 = F.sub(t3, F.add(t0, t1))
    t4 = F.sub(t4, F.add(t1, t2))
    t5 = F.sub(t5, F.add(t0, t2))
    t0_3 = F.add(F.double(t0), t0)
    t2b = F.mul_small_const(t2, b3_host)
    Z3 = F.add(t1, t2b)
    t1m = F.sub(t1, t2b)
    Y3b = F.mul_small_const(t5, b3_host)
    xa, xb, ya, yb, za, zb = _r(F,
                                [t3, t4, t1m, Y3b, Z3, t0_3],
                                [t1m, Y3b, Z3, t0_3, t4, t3])
    return F.sub(xa, xb), F.add(ya, yb), F.add(za, zb)


def pdbl(F, X, Y, Z, b3_host):
    """Complete doubling (RCB15 Alg 9, a=0) in 2 mul rounds (4 + 4)."""
    t0, t1, zz, xy = _r(F, [Y, Y, Z, X], [Y, Z, Z, Y])
    Z3a = F.double(F.double(F.double(t0)))           # 8*Y^2
    t2 = F.mul_small_const(zz, b3_host)
    Y3m = F.add(t0, t2)
    t2_3 = F.add(F.double(t2), t2)
    t0m = F.sub(t0, t2_3)
    x3a, z3, y3a, y3b = _r(F, [t2, t1, t0m, t0m], [Z3a, Z3a, Y3m, xy])
    return F.double(y3b), F.add(y3a, x3a), z3
