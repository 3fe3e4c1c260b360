"""Batched short-Weierstrass group arithmetic in Jacobian coordinates.

The device-side counterpart of libff's per-curve G1/G2 classes (e.g.
alt_bn128_g1.cpp:149-326).  Same formula choices as the reference —
add-2007-bl, madd-2007-bl, dbl-2009-l from the EFD (generalized to
coeff_a != 0 with E = 3*X1^2 + a*Z1^4) — but expressed branchlessly over
batches: special cases (either operand zero, P == Q, P == -Q) are resolved
with lane masks and `select`, never Python control flow, so everything
stays inside one XLA computation.

A Jacobian point is a pytree of three field arrays (X, Y, Z); zero is any
point with Z == 0 (canonically (0, 1, 0), matching alt_bn128_init.cpp:287).
Affine (libff "special") points carry an explicit infinity mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class JacobianPoint(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


class AffinePoint(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    inf: jnp.ndarray  # bool mask, batch-shaped


class Group:
    def __init__(self, F, gdef, name: str | None = None):
        """F: device field object; gdef: host GroupDef."""
        self.F = F
        self.gdef = gdef
        self.name = name or gdef.name
        self.order = gdef.order
        self.cofactor = gdef.cofactor
        self._a_host = gdef.curve.a
        self._b_host = gdef.curve.b
        self.a_is_zero = gdef.curve.F.is_zero(gdef.curve.a)
        self.coeff_a = F.from_host(gdef.curve.a)
        self.coeff_b = F.from_host(gdef.curve.b)
        gx, gy = gdef.generator
        self.gen_x = F.from_host(gx)
        self.gen_y = F.from_host(gy)

    # -- constructors --------------------------------------------------------
    def _bcast(self, c, batch):
        F = self.F
        return jnp.broadcast_to(
            c.reshape(c.shape + (1,) * len(batch)), c.shape + tuple(batch))

    def zero(self, batch=()) -> JacobianPoint:
        F = self.F
        return JacobianPoint(F.zero(batch), F.one(batch), F.zero(batch))

    def generator(self, batch=()) -> JacobianPoint:
        F = self.F
        return JacobianPoint(self._bcast(self.gen_x, batch),
                             self._bcast(self.gen_y, batch),
                             F.one(batch))

    def generator_affine(self, batch=()) -> AffinePoint:
        return AffinePoint(self._bcast(self.gen_x, batch),
                           self._bcast(self.gen_y, batch),
                           jnp.zeros(batch, dtype=jnp.bool_))

    # -- predicates ------------------------------------------------------------
    def is_zero(self, P: JacobianPoint):
        return self.F.is_zero(P.z)

    def eq(self, P: JacobianPoint, Q: JacobianPoint):
        """Projective equality (alt_bn128_g1.cpp operator==): compare
        X/Z^2 and Y/Z^3 cross-multiplied."""
        F = self.F
        pz, qz = self.is_zero(P), self.is_zero(Q)
        z1s, z2s = F.sqr(P.z), F.sqr(Q.z)
        x_eq = F.eq(F.mul(P.x, z2s), F.mul(Q.x, z1s))
        y_eq = F.eq(F.mul(P.y, F.mul(Q.z, z2s)), F.mul(Q.y, F.mul(P.z, z1s)))
        both_zero = pz & qz
        neither = (~pz) & (~qz)
        return both_zero | (neither & x_eq & y_eq)

    def is_well_formed(self, P: JacobianPoint):
        """Curve membership y^2 = x^3 + a x z^4 + b z^6 (alt_bn128_g1.cpp
        is_well_formed); zero is well-formed."""
        F = self.F
        x2 = F.sqr(P.x)
        x3 = F.mul(x2, P.x)
        z2 = F.sqr(P.z)
        z3 = F.mul(z2, P.z)
        z6 = F.sqr(z3)
        rhs = F.add(x3, F.mul(self.coeff_b, z6))
        if not self.a_is_zero:
            z4 = F.sqr(z2)
            rhs = F.add(rhs, F.mul(self.coeff_a, F.mul(P.x, z4)))
        return self.is_zero(P) | F.eq(F.sqr(P.y), rhs)

    # -- basic maps --------------------------------------------------------------
    def neg(self, P: JacobianPoint) -> JacobianPoint:
        return JacobianPoint(P.x, self.F.neg(P.y), P.z)

    def select(self, mask, P, Q):
        out = []
        for a, b in zip(P, Q):
            if a.ndim == mask.ndim:      # bool mask component (AffinePoint.inf)
                out.append(jnp.where(mask, a, b))
            else:
                out.append(self.F.select(mask, a, b))
        return type(P)(*out)

    def from_affine(self, A: AffinePoint) -> JacobianPoint:
        F = self.F
        batch = A.inf.shape
        one = F.one(batch)
        z = F.select(A.inf, F.zero(batch), one)
        y = F.select(A.inf, one, A.y)
        x = F.select(A.inf, F.zero(batch), A.x)
        return JacobianPoint(x, y, z)

    def to_affine(self, P: JacobianPoint) -> AffinePoint:
        """Batch affine conversion via Montgomery-trick inversion
        (batch_to_special_all_non_zeros, alt_bn128_g1.cpp:456-477).
        Zero maps to (0, 1, inf=True)."""
        F = self.F
        inf = self.is_zero(P)
        if P.z.ndim == F.el_ndim:           # single element: Fermat inverse
            zinv = F.inv(P.z)
        else:
            zinv = F.batch_inverse(P.z, axis=-1)
        zinv2 = F.sqr(zinv)
        x = F.mul(P.x, zinv2)
        y = F.mul(P.y, F.mul(zinv, zinv2))
        batch = inf.shape
        x = F.select(inf, F.zero(batch), x)
        y = F.select(inf, F.one(batch), y)
        return AffinePoint(x, y, inf)

    # -- core formulas ----------------------------------------------------------
    def dbl(self, P: JacobianPoint) -> JacobianPoint:
        """dbl-2009-l (alt_bn128_g1.cpp:299-326), generalized for a != 0.

        Zero-safe: Z = 0 in gives Z3 = 0 out."""
        F = self.F
        A = F.sqr(P.x)
        B = F.sqr(P.y)
        C = F.sqr(B)
        t = F.sub(F.sqr(F.add(P.x, B)), F.add(A, C))
        D = F.double(t)
        E = F.add(F.double(A), A)
        if not self.a_is_zero:
            z2 = F.sqr(P.z)
            E = F.add(E, F.mul(self.coeff_a, F.sqr(z2)))
        FF = F.sqr(E)
        x3 = F.sub(FF, F.double(D))
        c8 = F.double(F.double(F.double(C)))
        y3 = F.sub(F.mul(E, F.sub(D, x3)), c8)
        z3 = F.double(F.mul(P.y, P.z))
        return JacobianPoint(x3, y3, z3)

    def add(self, P: JacobianPoint, Q: JacobianPoint) -> JacobianPoint:
        """add-2007-bl (alt_bn128_g1.cpp:172-257) with masked special cases."""
        F = self.F
        z1z1 = F.sqr(P.z)
        z2z2 = F.sqr(Q.z)
        u1 = F.mul(P.x, z2z2)
        u2 = F.mul(Q.x, z1z1)
        s1 = F.mul(P.y, F.mul(Q.z, z2z2))
        s2 = F.mul(Q.y, F.mul(P.z, z1z1))
        h = F.sub(u2, u1)
        r = F.double(F.sub(s2, s1))
        i = F.sqr(F.double(h))
        j = F.mul(h, i)
        v = F.mul(u1, i)
        x3 = F.sub(F.sub(F.sqr(r), j), F.double(v))
        s1j = F.mul(s1, j)
        y3 = F.sub(F.mul(r, F.sub(v, x3)), F.double(s1j))
        z3 = F.mul(F.sub(F.sqr(F.add(P.z, Q.z)), F.add(z1z1, z2z2)), h)
        cand = JacobianPoint(x3, y3, z3)

        h_zero = F.is_zero(h)
        r_zero = F.is_zero(r)
        p_zero = self.is_zero(P)
        q_zero = self.is_zero(Q)
        # same point -> double; inverse point -> zero
        dbl_case = h_zero & r_zero & (~p_zero) & (~q_zero)
        inf_case = h_zero & (~r_zero) & (~p_zero) & (~q_zero)
        out = self.select(dbl_case, self.dbl(P), cand)
        out = self.select(inf_case, self.zero(h_zero.shape), out)
        out = self.select(p_zero, Q, out)
        out = self.select(q_zero, P, out)
        return out

    def mixed_add(self, P: JacobianPoint, Q: AffinePoint) -> JacobianPoint:
        """madd-2007-bl (alt_bn128_g1.cpp:259-297) with masked special cases;
        Q may be infinity via its mask."""
        F = self.F
        z1z1 = F.sqr(P.z)
        u2 = F.mul(Q.x, z1z1)
        s2 = F.mul(Q.y, F.mul(P.z, z1z1))
        h = F.sub(u2, P.x)
        hh = F.sqr(h)
        i = F.double(F.double(hh))
        j = F.mul(h, i)
        r = F.double(F.sub(s2, P.y))
        v = F.mul(P.x, i)
        x3 = F.sub(F.sub(F.sqr(r), j), F.double(v))
        y3 = F.sub(F.mul(r, F.sub(v, x3)), F.double(F.mul(P.y, j)))
        z3 = F.sub(F.sqr(F.add(P.z, h)), F.add(z1z1, hh))
        cand = JacobianPoint(x3, y3, z3)

        h_zero = F.is_zero(h)
        r_zero = F.is_zero(r)
        p_zero = self.is_zero(P)
        dbl_case = h_zero & r_zero & (~p_zero)
        inf_case = h_zero & (~r_zero) & (~p_zero)
        out = self.select(dbl_case, self.dbl(P), cand)
        out = self.select(inf_case, self.zero(h_zero.shape), out)
        out = self.select(p_zero, self.from_affine(Q), out)
        out = self.select(Q.inf, P, out)
        return out

    # -- scalar multiplication ------------------------------------------------------
    def scalar_mul_bits(self, bits, P: JacobianPoint) -> JacobianPoint:
        """Double-and-add over an MSB-first bit array (curve_utils.tcc:14-32).

        bits: (nbits, *batch) uint32/bool — one scalar per batch element.
        """
        import jax

        def step(acc, bit):
            acc = self.dbl(acc)
            added = self.add(acc, P)
            acc = self.select(bit.astype(jnp.bool_), added, acc)
            return acc, None

        acc0 = self.zero(P.z.shape[self.F.el_ndim:])
        acc, _ = jax.lax.scan(step, acc0, bits)
        return acc

    def scalar_mul_int(self, k: int, P: JacobianPoint) -> JacobianPoint:
        """Multiply by a static host integer (e.g. cofactor)."""
        import jax

        if k < 0:
            return self.scalar_mul_int(-k, self.neg(P))
        if k == 0:
            return self.zero(P.z.shape[self.F.el_ndim:])
        bits = np.array([int(c) for c in bin(k)[2:]], dtype=np.uint32)

        def step(acc, bit):
            acc = self.dbl(acc)
            added = self.add(acc, P)
            acc = self.select((bit == 1), added, acc)
            return acc, None

        acc0 = self.zero(P.z.shape[self.F.el_ndim:])
        acc, _ = jax.lax.scan(step, acc0, jnp.asarray(bits))
        return acc

    def mul_by_cofactor(self, P: JacobianPoint) -> JacobianPoint:
        return self.scalar_mul_int(self.cofactor, P)

    # -- reductions -------------------------------------------------------------------
    def sum_tree(self, P: JacobianPoint, axis: int = -1) -> JacobianPoint:
        """Associative tree-sum of points along a batch axis (log-depth,
        fully batched) — the reduction the reference does serially
        (multiexp.tcc:681-687)."""
        F = self.F
        batch_axis = axis % P.z.ndim
        n = P.z.shape[batch_axis]
        # pad to a power of two with zeros
        m = 1 << max(1, (n - 1).bit_length()) if n > 1 else 1
        if m != n:
            pads = [(0, 0)] * P.z.ndim
            pads[batch_axis] = (0, m - n)
            zpt = self.zero(())
            P = JacobianPoint(
                jnp.pad(P.x, pads), jnp.pad(P.y, pads), jnp.pad(P.z, pads))
            # padded entries are (0,0,0): Z=0 so they act as zero, but Y=0;
            # add() treats any Z==0 as zero so this is safe.
            del zpt
        while P.z.shape[batch_axis] > 1:
            sz = P.z.shape[batch_axis]
            lo = _take(P, slice(0, sz // 2), batch_axis)
            hi = _take(P, slice(sz // 2, sz), batch_axis)
            P = self.add(lo, hi)
        return JacobianPoint(
            jnp.squeeze(P.x, batch_axis), jnp.squeeze(P.y, batch_axis),
            jnp.squeeze(P.z, batch_axis))


def _take(P: JacobianPoint, sl, axis: int) -> JacobianPoint:
    idx = [slice(None)] * P.z.ndim
    idx[axis] = sl
    idx = tuple(idx)
    return JacobianPoint(P.x[idx], P.y[idx], P.z[idx])
