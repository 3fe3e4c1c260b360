"""Batched twisted-Edwards group arithmetic on device.

Device counterpart of libff's edwards G1/G2 classes (inverted-Edwards
coordinates, edwards_g1.cpp:165-273).  We use standard PROJECTIVE twisted
Edwards coordinates with the complete add-2008-bbjlp / dbl-2008-bbjlp
formulas instead: they represent the same group (values are compared
affinely), need no special-case lane masks (the identity is the ordinary
point (0 : 1 : 1)), and so keep every reduction straight-line — the same
design choice as the RCB15 complete formulas on the Weierstrass side.

Exposes the same "complete projective" protocol as curves/group.py's
Group (proj_zero / padd / pmadd / pdbl / proj_sum_tree / sym_padd /
sym_pdbl), which is all the Pippenger MSM pipeline needs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import vm
from .group import AffinePoint, ProjectivePoint


def edwards_padd(F, X1, Y1, Z1, X2, Y2, Z2, a_host, d_host):
    """add-2008-bbjlp: complete projective twisted-Edwards addition."""
    A = F.mul(Z1, Z2)
    B = F.sqr(A)
    C = F.mul(X1, X2)
    D = F.mul(Y1, Y2)
    E = F.mul_small_const(F.mul(C, D), d_host)
    Fv = F.sub(B, E)
    G = F.add(B, E)
    t = F.sub(F.sub(F.mul(F.add(X1, Y1), F.add(X2, Y2)), C), D)
    X3 = F.mul(F.mul(A, Fv), t)
    Y3 = F.mul(F.mul(A, G), F.sub(D, F.mul_small_const(C, a_host)))
    Z3 = F.mul(Fv, G)
    return X3, Y3, Z3


def edwards_pmadd(F, X1, Y1, Z1, x2, y2, a_host, d_host):
    """mmadd variant (Z2 = 1) of add-2008-bbjlp."""
    B = F.sqr(Z1)
    C = F.mul(X1, x2)
    D = F.mul(Y1, y2)
    E = F.mul_small_const(F.mul(C, D), d_host)
    Fv = F.sub(B, E)
    G = F.add(B, E)
    t = F.sub(F.sub(F.mul(F.add(X1, Y1), F.add(x2, y2)), C), D)
    X3 = F.mul(F.mul(Z1, Fv), t)
    Y3 = F.mul(F.mul(Z1, G), F.sub(D, F.mul_small_const(C, a_host)))
    Z3 = F.mul(Fv, G)
    return X3, Y3, Z3


def edwards_pdbl(F, X1, Y1, Z1, a_host):
    """dbl-2008-bbjlp: complete projective twisted-Edwards doubling."""
    B = F.sqr(F.add(X1, Y1))
    C = F.sqr(X1)
    D = F.sqr(Y1)
    E = F.mul_small_const(C, a_host)
    Fv = F.add(E, D)
    H = F.sqr(Z1)
    J = F.sub(Fv, F.double(H))
    X3 = F.mul(F.sub(F.sub(B, C), D), J)
    Y3 = F.mul(Fv, F.sub(E, D))
    Z3 = F.mul(Fv, J)
    return X3, Y3, Z3


class EdwardsGroup:
    def __init__(self, F, gdef, name: str | None = None):
        self.F = F
        self.gdef = gdef
        self.name = name or gdef.name
        self.order = gdef.order
        self.cofactor = gdef.cofactor
        self._a_host = gdef.curve.a
        self._d_host = gdef.curve.d
        gx, gy = gdef.generator
        self.gen_x = F.from_host(gx)
        self.gen_y = F.from_host(gy)
        fp = F
        while hasattr(fp, "B"):
            fp = fp.B
        self._fp = fp
        self._host_field = gdef.curve.F
        self._progs: dict[str, vm.Program] = {}

    supports_complete = True
    # -P = (-x, y): the signed-digit MSM must negate the x coordinate
    # (negating y instead adds the 2-torsion point (0,-1) for odd digits)
    affine_neg_axis = "x"

    # -- VM plumbing (same shape as group.Group) ------------------------------
    def _program(self, key, build):
        if key not in self._progs:
            self._progs[key] = vm.trace_general(self._fp, build)
        return self._progs[key]

    vm_mul = "loop"                      # see group.Group.vm_mul
    vm_engine = "auto"                   # see group.Group.vm_engine
    vm_rounds_mul = None
    _ROUNDS_MIN_BATCH = 2048

    def _run(self, prog, elements, batch):
        inputs = []
        for e in elements:
            inputs.extend(vm.flatten_element(self.F, e))
        eng = self.vm_engine
        if eng == "auto":
            nb = int(np.prod(batch, dtype=np.int64)) if batch else 1
            if (jax.default_backend() == "tpu"
                    and nb >= self._ROUNDS_MIN_BATCH):
                eng = "rounds"
        if eng == "rounds":
            return vm.run_program_rounds(self._fp, prog, inputs, batch,
                                         mul=self.vm_rounds_mul)
        return vm.run_program(self._fp, prog, inputs, batch,
                              mul=self.vm_mul)

    @property
    def _ncomp(self):
        return self.F.degree

    def _el(self, outs, i):
        k = self._ncomp
        return vm.unflatten_element(self.F, outs[i * k:(i + 1) * k])

    def _batch_of(self, *arrays):
        el = self.F.el_ndim
        shapes = [a.shape[el:] for a in arrays]
        m = max(len(s) for s in shapes)
        return tuple(np.broadcast_shapes(
            *[tuple(s) + (1,) * (m - len(s)) for s in shapes]))

    def _sym(self, fp, mksym):
        from ..host import field as hf

        return fp if isinstance(self._host_field, hf.Fp) else mksym(
            self._host_field)

    # -- symbolic formula protocol (consumed by msm/pippenger) ----------------
    def sym_padd(self, s, P, Q):
        return edwards_padd(s, *P, *Q, self._a_host, self._d_host)

    def sym_pmadd(self, s, P, Q):
        return edwards_pmadd(s, *P, *Q, self._a_host, self._d_host)

    def sym_pdbl(self, s, P):
        return edwards_pdbl(s, *P, self._a_host)

    # -- constructors ---------------------------------------------------------
    def _bcast(self, c, batch):
        return jnp.broadcast_to(
            c.reshape(c.shape + (1,) * len(batch)), c.shape + tuple(batch))

    def proj_zero(self, batch=()) -> ProjectivePoint:
        F = self.F
        return ProjectivePoint(F.zero(batch), F.one(batch), F.one(batch))

    zero = proj_zero

    def generator(self, batch=()) -> ProjectivePoint:
        return ProjectivePoint(self._bcast(self.gen_x, batch),
                               self._bcast(self.gen_y, batch),
                               self.F.one(batch))

    def generator_affine(self, batch=()) -> AffinePoint:
        return AffinePoint(self._bcast(self.gen_x, batch),
                           self._bcast(self.gen_y, batch),
                           jnp.zeros(batch, dtype=jnp.bool_))

    def proj_from_affine(self, A: AffinePoint) -> ProjectivePoint:
        """The affine infinity mask maps to the identity (0, 1, 1)."""
        F = self.F
        batch = A.inf.shape
        one = F.one(batch)
        return ProjectivePoint(
            F.select(A.inf, F.zero(batch), A.x),
            F.select(A.inf, one, A.y),
            one)

    from_affine = proj_from_affine

    # -- predicates -----------------------------------------------------------
    def proj_is_zero(self, P: ProjectivePoint):
        """Identity (0 : Z : Z)."""
        return self.F.is_zero(P.x) & self.F.eq(P.y, P.z)

    is_zero = proj_is_zero

    def eq(self, P: ProjectivePoint, Q: ProjectivePoint):
        F = self.F
        x_eq = F.eq(F.mul(P.x, Q.z), F.mul(Q.x, P.z))
        y_eq = F.eq(F.mul(P.y, Q.z), F.mul(Q.y, P.z))
        return x_eq & y_eq

    def is_well_formed(self, P: ProjectivePoint):
        """(a X^2 + Y^2) Z^2 == Z^4 + d X^2 Y^2 (projective curve eq)."""
        F = self.F
        x2, y2, z2 = F.sqr(P.x), F.sqr(P.y), F.sqr(P.z)
        lhs = F.mul(F.add(F.mul_small_const(x2, self._a_host), y2), z2)
        rhs = F.add(F.sqr(z2), F.mul_small_const(F.mul(x2, y2), self._d_host))
        return F.eq(lhs, rhs)

    def neg(self, P: ProjectivePoint) -> ProjectivePoint:
        return ProjectivePoint(self.F.neg(P.x), P.y, P.z)

    def select(self, mask, P, Q):
        out = []
        for a, b in zip(P, Q):
            if a.ndim == mask.ndim:
                out.append(jnp.where(mask, a, b))
            else:
                out.append(self.F.select(mask, a, b))
        return type(P)(*out)

    def _bc_point(self, P, batch):
        el = self.F.el_ndim

        def bc(a):
            cur = a.shape[el:]
            a = a.reshape(a.shape + (1,) * (len(batch) - len(cur)))
            return jnp.broadcast_to(a, a.shape[:el] + tuple(batch))

        return type(P)(*[bc(c) if c.ndim > len(batch) or True else c
                         for c in (P.x, P.y, P.z)])

    # -- core ops -------------------------------------------------------------
    def padd(self, P: ProjectivePoint, Q: ProjectivePoint) -> ProjectivePoint:
        def build(fp, mksym, inp):
            s = self._sym(fp, mksym)
            Pv = (inp(s), inp(s), inp(s))
            Qv = (inp(s), inp(s), inp(s))
            return list(self.sym_padd(s, Pv, Qv))

        prog = self._program("padd", build)
        batch = self._batch_of(P.z, Q.z)
        outs = self._run(prog, [P.x, P.y, P.z, Q.x, Q.y, Q.z], batch)
        return ProjectivePoint(*(self._el(outs, i) for i in range(3)))

    add = padd

    def pmadd(self, P: ProjectivePoint, Q: AffinePoint) -> ProjectivePoint:
        def build(fp, mksym, inp):
            s = self._sym(fp, mksym)
            Pv = (inp(s), inp(s), inp(s))
            Qv = (inp(s), inp(s))
            return list(self.sym_pmadd(s, Pv, Qv))

        prog = self._program("pmadd", build)
        batch = self._batch_of(P.z, Q.x)
        outs = self._run(prog, [P.x, P.y, P.z, Q.x, Q.y], batch)
        cand = ProjectivePoint(*(self._el(outs, i) for i in range(3)))
        q_inf = jnp.broadcast_to(Q.inf, batch)
        return self.select(q_inf, self._bc_point(P, batch), cand)

    mixed_add = pmadd

    def pdbl(self, P: ProjectivePoint) -> ProjectivePoint:
        def build(fp, mksym, inp):
            s = self._sym(fp, mksym)
            Pv = (inp(s), inp(s), inp(s))
            return list(self.sym_pdbl(s, Pv))

        prog = self._program("pdbl", build)
        batch = self._batch_of(P.z)
        outs = self._run(prog, [P.x, P.y, P.z], batch)
        return ProjectivePoint(*(self._el(outs, i) for i in range(3)))

    dbl = pdbl

    def proj_to_jacobian(self, P: ProjectivePoint) -> ProjectivePoint:
        """Edwards points have no Jacobian form; the MSM pipeline calls
        this as its final conversion — identity here."""
        return P

    # -- conversions / reductions --------------------------------------------
    def to_affine(self, P: ProjectivePoint) -> AffinePoint:
        F = self.F
        if P.z.ndim == F.el_ndim:
            zinv = F.inv(P.z)
        else:
            zinv = F.batch_inverse(P.z, axis=-1)
        x = F.mul(P.x, zinv)
        y = F.mul(P.y, zinv)
        inf = self.proj_is_zero(P)
        batch = inf.shape
        x = F.select(inf, F.zero(batch), x)
        y = F.select(inf, F.one(batch), y)
        return AffinePoint(x, y, inf)

    def proj_sum_tree(self, P: ProjectivePoint, axis: int = -1,
                      padd=None) -> ProjectivePoint:
        if padd is None:
            padd = self.padd
        batch_axis = axis % P.z.ndim
        n = P.z.shape[batch_axis]
        m = 1 << max(1, (n - 1).bit_length()) if n > 1 else 1
        if m != n:
            pad_batch = list(P.z.shape[self.F.el_ndim:])
            pad_batch[batch_axis - self.F.el_ndim] = m - n
            zero = self.proj_zero(tuple(pad_batch))
            P = ProjectivePoint(
                jnp.concatenate([P.x, zero.x], axis=batch_axis),
                jnp.concatenate([P.y, zero.y], axis=batch_axis),
                jnp.concatenate([P.z, zero.z], axis=batch_axis))
        while P.z.shape[batch_axis] > 1:
            sz = P.z.shape[batch_axis]
            idx_lo = [slice(None)] * P.z.ndim
            idx_lo[batch_axis] = slice(0, sz // 2)
            idx_hi = [slice(None)] * P.z.ndim
            idx_hi[batch_axis] = slice(sz // 2, sz)
            lo = ProjectivePoint(P.x[tuple(idx_lo)], P.y[tuple(idx_lo)],
                                 P.z[tuple(idx_lo)])
            hi = ProjectivePoint(P.x[tuple(idx_hi)], P.y[tuple(idx_hi)],
                                 P.z[tuple(idx_hi)])
            P = padd(lo, hi)
        return ProjectivePoint(
            jnp.squeeze(P.x, batch_axis), jnp.squeeze(P.y, batch_axis),
            jnp.squeeze(P.z, batch_axis))

    sum_tree = proj_sum_tree

    # -- scalar multiplication ------------------------------------------------
    def scalar_mul_bits(self, bits, P: ProjectivePoint) -> ProjectivePoint:
        import jax

        def step(acc, bit):
            acc = self.pdbl(acc)
            added = self.padd(acc, P)
            acc = self.select(bit.astype(jnp.bool_), added, acc)
            return acc, None

        acc0 = self.proj_zero(P.z.shape[self.F.el_ndim:])
        acc, _ = jax.lax.scan(step, acc0, bits)
        return acc

    def scalar_mul_int(self, k: int, P: ProjectivePoint) -> ProjectivePoint:
        import jax

        if k < 0:
            return self.scalar_mul_int(-k, self.neg(P))
        if k == 0:
            return self.proj_zero(P.z.shape[self.F.el_ndim:])
        bits = np.array([int(c) for c in bin(k)[2:]], dtype=np.uint32)

        def step(acc, bit):
            acc = self.pdbl(acc)
            added = self.padd(acc, P)
            acc = self.select((bit == 1), added, acc)
            return acc, None

        acc0 = self.proj_zero(P.z.shape[self.F.el_ndim:])
        acc, _ = jax.lax.scan(step, acc0, jnp.asarray(bits))
        return acc

    def mul_by_cofactor(self, P: ProjectivePoint) -> ProjectivePoint:
        return self.scalar_mul_int(self.cofactor, P)
