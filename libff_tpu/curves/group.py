"""Batched short-Weierstrass group arithmetic in Jacobian coordinates.

The device-side counterpart of libff's per-curve G1/G2 classes (e.g.
alt_bn128_g1.cpp:149-326).  Same formula choices as the reference —
add-2007-bl, madd-2007-bl, dbl-2009-l from the EFD (generalized to
coeff_a != 0 with E = 3*X1^2 + a*Z1^4) — but expressed branchlessly over
batches: special cases (either operand zero, P == Q, P == -Q) are resolved
with lane masks and `select`, never Python control flow.

Execution goes through the formula VM (libff_tpu/vm.py): each group
operation is traced once into a straight-line instruction table over
prime-field registers and executed as a single `lax.scan` containing one
Montgomery multiplier — compile time is O(1) in formula size, which is
what makes large jitted MSM/pairing graphs tractable (see vm.py docstring
for the measurements motivating this design).

A Jacobian point is a pytree of three field arrays (X, Y, Z); zero is any
point with Z == 0 (canonically (0, 1, 0), matching alt_bn128_init.cpp:287).
Affine (libff "special") points carry an explicit infinity mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import vm
from . import formulas as fml


class JacobianPoint(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


class ProjectivePoint(NamedTuple):
    """Homogeneous projective (X : Y : Z), affine = (X/Z, Y/Z); identity is
    (0 : 1 : 0).  Used with the complete RCB15 formulas on the MSM
    reduction path (no special-case masks)."""
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
        # prime field at the bottom of the tower (the VM register field)
        fp = F
        while hasattr(fp, "B"):
            fp = fp.B
        self._fp = fp
        self._host_field = gdef.curve.F
        self._progs: dict[str, vm.Program] = {}

    # -- VM plumbing ---------------------------------------------------------
    def _program(self, key: str, build) -> vm.Program:
        if key not in self._progs:
            self._progs[key] = vm.trace_general(self._fp, build)
        return self._progs[key]

    def _sym(self, mksym):
        """Sym view of the coordinate field."""
        from ..host import field as hf

        if isinstance(self._host_field, hf.Fp):
            return None  # signals prime field; caller uses fp sym
        return self._host_field

    # Montgomery multiplier used by the VM execution of this group's
    # formula programs: "loop" (fori_loop CIOS, small trace — the default),
    # "unrolled", or "sos" (deferred-carry, fields/fp.py mul_sos).
    # Mutable for sweeps: `G.vm_mul = "sos"`.
    vm_mul = "loop"

    # Program executor: "auto" (the scan VM for small batches; levelized
    # mul-ROUNDS — vm.run_program_rounds — on TPU at batch >= 2048, where
    # the one-op-per-step scan is dispatch/latency-bound: measured
    # ~0.3 Mop/s for a batched Jacobian add while the MSM insert kernel
    # proves 62 ns per G2 madd on the same chip), "scan", or "rounds".
    vm_engine = "auto"
    vm_rounds_mul = None          # None = unrolled for <=16 limbs else loop
    _ROUNDS_MIN_BATCH = 2048

    def _run(self, prog: vm.Program, elements, batch):
        """elements: list of coordinate arrays; returns flat output list."""
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
        return vm.run_program(self._fp, prog, inputs, batch, mul=self.vm_mul)

    def _use_kernel_op(self, batch) -> bool:
        """Route a public batched op through the Pallas formula kernel
        (curves/pallas_ops.py): TPU, eligible layout, big 1-D batch.
        Bit-identical results (same formulas, same CIOS multiplier);
        measured ~23 ns/mul for an XLA-scheduled unrolled mul vs ~1.4 ns
        inside a Pallas kernel on v5e — group-op throughput is set by
        which engine runs the muls."""
        if self.vm_engine != "auto" or jax.default_backend() != "tpu":
            return False
        from . import pallas_ops as po

        return po.kernel_op_eligible(self, tuple(batch))

    def _kernel_op(self, op, batch, points, affine=None):
        """Flatten the batch axes, run the Pallas formula kernel, reshape
        back.  points: list of (Jacobian/Projective) points; affine: an
        optional trailing AffinePoint operand (mask passed separately)."""
        from . import pallas_ops as po

        el = self.F.el_ndim
        N = int(np.prod(batch, dtype=np.int64))

        def flat(a):
            return a.reshape(a.shape[:el] + (N,))

        coords, masks = [], []
        for P in points:
            P = self._bc_point(P, batch)
            coords += [flat(P.x), flat(P.y), flat(P.z)]
        if affine is not None:
            A = self._bc_point(affine, batch)
            coords += [flat(A.x), flat(A.y)]
            masks = [A.inf.reshape(N)]
        outs = po.group_op_pallas(self, op, coords, masks)
        return [o.reshape(o.shape[:el] + tuple(batch)) for o in outs]

    def _el(self, outs, i):
        """i-th element from a flat VM output list."""
        k = self._ncomp
        return vm.unflatten_element(self.F, outs[i * k:(i + 1) * k])

    @property
    def _ncomp(self) -> int:
        return self.F.degree

    def _batch_of(self, *arrays):
        """Common (broadcast) batch of element arrays."""
        el = self.F.el_ndim
        shapes = [a.shape[el:] for a in arrays]
        m = max(len(s) for s in shapes)
        # batch dims trail; pad on the right (align_batch convention)
        padded = [tuple(s) + (1,) * (m - len(s)) for s in shapes]
        return tuple(np.broadcast_shapes(*padded))

    # -- constructors --------------------------------------------------------
    def _bcast(self, c, batch):
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

        def build(fp, mksym, inp):
            s = mksym(self._host_field) if self._ncomp > 1 else fp
            x1, y1, z1 = inp(s), inp(s), inp(s)
            x2, y2, z2 = inp(s), inp(s), inp(s)
            z1s = s.sqr(z1)
            z2s = s.sqr(z2)
            lx = s.mul(x1, z2s)
            rx = s.mul(x2, z1s)
            ly = s.mul(y1, s.mul(z2, z2s))
            ry = s.mul(y2, s.mul(z1, z1s))
            return [lx, rx, ly, ry]

        prog = self._program("eq", build)
        batch = self._batch_of(P.z, Q.z)
        outs = self._run(prog, [P.x, P.y, P.z, Q.x, Q.y, Q.z], batch)
        lx, rx, ly, ry = (self._el(outs, i) for i in range(4))
        pz, qz = self.is_zero(P), self.is_zero(Q)
        x_eq = F.eq(lx, rx)
        y_eq = F.eq(ly, ry)
        both_zero = pz & qz
        neither = (~pz) & (~qz)
        return both_zero | (neither & x_eq & y_eq)

    def is_well_formed(self, P: JacobianPoint):
        """Curve membership y^2 = x^3 + a x z^4 + b z^6 (alt_bn128_g1.cpp
        is_well_formed); zero is well-formed."""
        F = self.F
        a_host = None if self.a_is_zero else self._a_host

        def build(fp, mksym, inp):
            s = mksym(self._host_field) if self._ncomp > 1 else fp
            x, y, z = inp(s), inp(s), inp(s)
            rhs = fml.curve_rhs(s, x, z, a_host, self._b_host)
            return [s.sqr(y), rhs]

        prog = self._program("iwf", build)
        batch = self._batch_of(P.z)
        outs = self._run(prog, [P.x, P.y, P.z], batch)
        lhs, rhs = self._el(outs, 0), self._el(outs, 1)
        return self.is_zero(P) | F.eq(lhs, rhs)

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
        a_host = None if self.a_is_zero else self._a_host

        def build(fp, mksym, inp):
            s = mksym(self._host_field) if self._ncomp > 1 else fp
            x, y, z = inp(s), inp(s), inp(s)
            return list(fml.jacobian_dbl(s, x, y, z, a_host))

        prog = self._program("dbl", build)
        batch = self._batch_of(P.z)
        if self._use_kernel_op(batch):
            return JacobianPoint(*self._kernel_op("dbl", batch, [P]))
        outs = self._run(prog, [P.x, P.y, P.z], batch)
        return JacobianPoint(*(self._el(outs, i) for i in range(3)))

    def add(self, P: JacobianPoint, Q: JacobianPoint) -> JacobianPoint:
        """add-2007-bl (alt_bn128_g1.cpp:172-257) with masked special cases.

        One VM program computes the addition candidate AND dbl(P) (for the
        P == Q lane) in a single scan."""
        F = self.F
        a_host = None if self.a_is_zero else self._a_host

        def build(fp, mksym, inp):
            s = mksym(self._host_field) if self._ncomp > 1 else fp
            x1, y1, z1 = inp(s), inp(s), inp(s)
            x2, y2, z2 = inp(s), inp(s), inp(s)
            x3, y3, z3, h, r = fml.jacobian_add_raw(s, x1, y1, z1, x2, y2, z2)
            xd, yd, zd = fml.jacobian_dbl(s, x1, y1, z1, a_host)
            return [x3, y3, z3, xd, yd, zd, h, r]

        prog = self._program("add", build)
        batch = self._batch_of(P.z, Q.z)
        if self._use_kernel_op(batch):
            return JacobianPoint(*self._kernel_op("add", batch, [P, Q]))
        outs = self._run(prog, [P.x, P.y, P.z, Q.x, Q.y, Q.z], batch)
        cand = JacobianPoint(*(self._el(outs, i) for i in range(3)))
        dblP = JacobianPoint(*(self._el(outs, i) for i in range(3, 6)))
        h, r = self._el(outs, 6), self._el(outs, 7)

        h_zero = F.is_zero(h)
        r_zero = F.is_zero(r)
        p_zero = jnp.broadcast_to(self.is_zero(P), batch)
        q_zero = jnp.broadcast_to(self.is_zero(Q), batch)
        dbl_case = h_zero & r_zero & (~p_zero) & (~q_zero)
        inf_case = h_zero & (~r_zero) & (~p_zero) & (~q_zero)
        out = self.select(dbl_case, dblP, cand)
        out = self.select(inf_case, self.zero(batch), out)
        out = self.select(p_zero, self._bc_point(Q, batch), out)
        out = self.select(q_zero, self._bc_point(P, batch), out)
        return out

    def mixed_add(self, P: JacobianPoint, Q: AffinePoint) -> JacobianPoint:
        """madd-2007-bl (alt_bn128_g1.cpp:259-297) with masked special cases;
        Q may be infinity via its mask."""
        F = self.F
        a_host = None if self.a_is_zero else self._a_host

        def build(fp, mksym, inp):
            s = mksym(self._host_field) if self._ncomp > 1 else fp
            x1, y1, z1 = inp(s), inp(s), inp(s)
            x2, y2 = inp(s), inp(s)
            x3, y3, z3, h, r = fml.jacobian_madd_raw(s, x1, y1, z1, x2, y2)
            xd, yd, zd = fml.jacobian_dbl(s, x1, y1, z1, a_host)
            return [x3, y3, z3, xd, yd, zd, h, r]

        prog = self._program("madd", build)
        batch = self._batch_of(P.z, Q.x)
        if self._use_kernel_op(batch):
            return JacobianPoint(*self._kernel_op("madd", batch, [P],
                                                  affine=Q))
        outs = self._run(prog, [P.x, P.y, P.z, Q.x, Q.y], batch)
        cand = JacobianPoint(*(self._el(outs, i) for i in range(3)))
        dblP = JacobianPoint(*(self._el(outs, i) for i in range(3, 6)))
        h, r = self._el(outs, 6), self._el(outs, 7)

        h_zero = F.is_zero(h)
        r_zero = F.is_zero(r)
        p_zero = jnp.broadcast_to(self.is_zero(P), batch)
        q_inf = jnp.broadcast_to(Q.inf, batch)
        dbl_case = h_zero & r_zero & (~p_zero)
        inf_case = h_zero & (~r_zero) & (~p_zero)
        out = self.select(dbl_case, dblP, cand)
        out = self.select(inf_case, self.zero(batch), out)
        out = self.select(p_zero, self._bc_point(self.from_affine(Q), batch),
                          out)
        out = self.select(q_inf, self._bc_point(P, batch), out)
        return out

    def _bc_point(self, P, batch):
        """Broadcast a point's batch dims (trailing) up to `batch`."""
        el = self.F.el_ndim

        def bc(a):
            cur = a.shape[el:]
            need = len(batch) - len(cur)
            a = a.reshape(a.shape + (1,) * need)
            return jnp.broadcast_to(a, a.shape[:el] + tuple(batch))

        if isinstance(P, AffinePoint):
            inf = P.inf.reshape(P.inf.shape + (1,) * (len(batch) - P.inf.ndim))
            return AffinePoint(bc(P.x), bc(P.y),
                               jnp.broadcast_to(inf, batch))
        return JacobianPoint(bc(P.x), bc(P.y), bc(P.z))

    # -- complete projective ops (RCB15; require coeff_a == 0) ----------------
    @property
    def supports_complete(self) -> bool:
        return self.a_is_zero

    # symbolic formula protocol shared with group_edwards.EdwardsGroup,
    # consumed by the MSM window recombination (msm/pippenger.py)
    def sym_padd(self, s, P, Q):
        return fml.rcb_add_a0(s, *P, *Q, self._b3_host)

    def sym_pmadd(self, s, P, Q):
        return fml.rcb_madd_a0(s, *P, *Q, self._b3_host)

    def sym_pdbl(self, s, P):
        return fml.rcb_dbl_a0(s, *P, self._b3_host)

    @property
    def _b3_host(self):
        hf = self.gdef.curve.F
        return hf.mul_scalar_int(self._b_host, 3)

    def proj_zero(self, batch=()) -> ProjectivePoint:
        F = self.F
        return ProjectivePoint(F.zero(batch), F.one(batch), F.zero(batch))

    def proj_from_affine(self, A: AffinePoint) -> ProjectivePoint:
        F = self.F
        batch = A.inf.shape
        one = F.one(batch)
        return ProjectivePoint(
            F.select(A.inf, F.zero(batch), A.x),
            F.select(A.inf, one, A.y),
            F.select(A.inf, F.zero(batch), one))

    def proj_to_jacobian(self, P: ProjectivePoint) -> JacobianPoint:
        """Same group element in Jacobian coords: (XZ, YZ^2, Z)."""
        F = self.F

        def build(fp, mksym, inp):
            s = mksym(self._host_field) if self._ncomp > 1 else fp
            x, y, z = inp(s), inp(s), inp(s)
            z2 = s.sqr(z)
            return [s.mul(x, z), s.mul(y, z2), z]

        prog = self._program("proj2jac", build)
        batch = self._batch_of(P.z)
        outs = self._run(prog, [P.x, P.y, P.z], batch)
        return JacobianPoint(*(self._el(outs, i) for i in range(3)))

    def proj_is_zero(self, P: ProjectivePoint):
        return self.F.is_zero(P.z)

    def padd(self, P: ProjectivePoint, Q: ProjectivePoint) -> ProjectivePoint:
        """Complete projective addition (formulas.rcb_add_a0) — no masks."""
        assert self.a_is_zero, "complete formulas require a == 0"
        b3 = self._b3_host

        def build(fp, mksym, inp):
            s = mksym(self._host_field) if self._ncomp > 1 else fp
            ins = [inp(s) for _ in range(6)]
            return list(fml.rcb_add_a0(s, *ins, b3))

        prog = self._program("padd", build)
        batch = self._batch_of(P.z, Q.z)
        if self._use_kernel_op(batch):
            return ProjectivePoint(*self._kernel_op("padd", batch, [P, Q]))
        outs = self._run(prog, [P.x, P.y, P.z, Q.x, Q.y, Q.z], batch)
        return ProjectivePoint(*(self._el(outs, i) for i in range(3)))

    def pmadd(self, P: ProjectivePoint, Q: AffinePoint) -> ProjectivePoint:
        """Complete mixed addition (formulas.rcb_madd_a0); Q's infinity
        handled with a single outside select."""
        assert self.a_is_zero, "complete formulas require a == 0"
        b3 = self._b3_host

        def build(fp, mksym, inp):
            s = mksym(self._host_field) if self._ncomp > 1 else fp
            ins = [inp(s) for _ in range(5)]
            return list(fml.rcb_madd_a0(s, *ins, b3))

        prog = self._program("pmadd", build)
        batch = self._batch_of(P.z, Q.x)
        if self._use_kernel_op(batch):
            return ProjectivePoint(*self._kernel_op("pmadd", batch, [P],
                                                    affine=Q))
        outs = self._run(prog, [P.x, P.y, P.z, Q.x, Q.y], batch)
        cand = ProjectivePoint(*(self._el(outs, i) for i in range(3)))
        q_inf = jnp.broadcast_to(Q.inf, batch)
        return self.select(q_inf, self._bc_point(P, batch), cand)

    def pdbl(self, P: ProjectivePoint) -> ProjectivePoint:
        assert self.a_is_zero, "complete formulas require a == 0"
        b3 = self._b3_host

        def build(fp, mksym, inp):
            s = mksym(self._host_field) if self._ncomp > 1 else fp
            ins = [inp(s) for _ in range(3)]
            return list(fml.rcb_dbl_a0(s, *ins, b3))

        prog = self._program("pdbl", build)
        batch = self._batch_of(P.z)
        if self._use_kernel_op(batch):
            return ProjectivePoint(*self._kernel_op("pdbl", batch, [P]))
        outs = self._run(prog, [P.x, P.y, P.z], batch)
        return ProjectivePoint(*(self._el(outs, i) for i in range(3)))

    # -- direct-rounds engine (TPU hot paths; see curves/direct.py) ----------
    @property
    def supports_direct(self) -> bool:
        """Complete-formula prime-field groups can use the direct rounds
        engine (stacked-operand unrolled Montgomery muls, curves/direct.py)
        instead of the formula VM on latency-sensitive device paths."""
        return self.a_is_zero and self.F.el_ndim == 1

    def pmadd_direct(self, P: ProjectivePoint, Q: AffinePoint
                     ) -> ProjectivePoint:
        """pmadd via the direct rounds engine (same semantics)."""
        from . import direct

        X3, Y3, Z3 = direct.madd(self.F, P.x, P.y, P.z, Q.x, Q.y,
                                 self._b3_host)
        cand = ProjectivePoint(X3, Y3, Z3)
        batch = self._batch_of(P.z, Q.x)
        q_inf = jnp.broadcast_to(Q.inf, batch)
        return self.select(q_inf, self._bc_point(P, batch), cand)

    def padd_direct(self, P: ProjectivePoint, Q: ProjectivePoint
                    ) -> ProjectivePoint:
        from . import direct

        return ProjectivePoint(*direct.padd(
            self.F, P.x, P.y, P.z, Q.x, Q.y, Q.z, self._b3_host))

    def pdbl_direct(self, P: ProjectivePoint) -> ProjectivePoint:
        from . import direct

        return ProjectivePoint(*direct.pdbl(self.F, P.x, P.y, P.z,
                                            self._b3_host))

    def proj_sum_tree(self, P: ProjectivePoint, axis: int = -1,
                      padd=None) -> ProjectivePoint:
        """Tree-sum along a batch axis with complete adds: static halving
        (work-optimal, log2(n) adder instances, no special-case masks).
        padd: adder to use (default self.padd; pass self.padd_direct for
        the rounds engine)."""
        if padd is None:
            padd = self.padd
        batch_axis = axis % P.z.ndim
        n = P.z.shape[batch_axis]
        m = 1 << max(1, (n - 1).bit_length()) if n > 1 else 1
        if m != n:
            # pad with true identities (0, 1, 0) — (0,0,0) is not a point
            pad_batch = list(P.z.shape[self.F.el_ndim:])
            pad_batch[batch_axis - self.F.el_ndim] = m - n
            zero = self.proj_zero(tuple(pad_batch))
            P = ProjectivePoint(
                jnp.concatenate([P.x, zero.x], axis=batch_axis),
                jnp.concatenate([P.y, zero.y], axis=batch_axis),
                jnp.concatenate([P.z, zero.z], axis=batch_axis))
        while P.z.shape[batch_axis] > 1:
            sz = P.z.shape[batch_axis]
            lo = _ptake(P, slice(0, sz // 2), batch_axis)
            hi = _ptake(P, slice(sz // 2, sz), batch_axis)
            P = padd(lo, hi)
        return ProjectivePoint(
            jnp.squeeze(P.x, batch_axis), jnp.squeeze(P.y, batch_axis),
            jnp.squeeze(P.z, batch_axis))

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
        """[h] P.  When the group carries untwist-Frobenius-twist constants
        (BLS12-377 G2), uses the psi-endomorphism decomposition
        [h2]P = [h2_0]P + [h2_1]([t] psi(P) - psi^2(P))
        (bls12_377_g2.cpp:423-432) — two short ladders instead of one
        cofactor-length (508-bit) ladder."""
        ex = self.gdef.extra
        if "cofactor_h2_0" in ex:
            psi_p = self.psi(P)
            psi2_p = self.psi(psi_p)
            t_psi_minus_psi2 = self.add(
                self.scalar_mul_int(ex["trace_of_frobenius"], psi_p),
                self.neg(psi2_p))
            return self.add(
                self.scalar_mul_int(ex["cofactor_h2_0"], P),
                self.scalar_mul_int(ex["cofactor_h2_1"], t_psi_minus_psi2))
        return self.scalar_mul_int(self.cofactor, P)

    # -- subgroup membership ----------------------------------------------------
    def psi(self, P: JacobianPoint) -> JacobianPoint:
        """Untwist-Frobenius-twist endomorphism on a twist group
        (bls12_377_g2.cpp:378-421): psi(X, Y, Z) =
        (c_x * X^q, c_y * Y^q, Z^q); satisfies psi(Q) == [q] Q on the
        order-r subgroup and psi^2 - [t] psi + [q] == 0 on the whole twist."""
        F = self.F
        cx = F.from_host(self.gdef.extra["psi_x"])
        cy = F.from_host(self.gdef.extra["psi_y"])
        bx = jnp.broadcast_to(
            cx.reshape(cx.shape + (1,) * (P.x.ndim - cx.ndim)), P.x.shape)
        by = jnp.broadcast_to(
            cy.reshape(cy.shape + (1,) * (P.y.ndim - cy.ndim)), P.y.shape)
        return JacobianPoint(
            F.mul(bx, F.frobenius(P.x, 1)),
            F.mul(by, F.frobenius(P.y, 1)),
            F.frobenius(P.z, 1))
    def sigma(self, P: JacobianPoint) -> JacobianPoint:
        """GLV-style endomorphism (x, y) -> (beta*x, y), beta a primitive
        cube root of unity (bls12_377_g1.cpp:359-365); Jacobian-compatible
        since X/Z^2 scales linearly in X."""
        beta = self.F.from_host(self.gdef.extra["endo_beta"])
        b = jnp.broadcast_to(
            beta.reshape(beta.shape + (1,) * (P.x.ndim - beta.ndim)),
            P.x.shape)
        return JacobianPoint(self.F.mul(b, P.x), P.y, P.z)

    def is_in_safe_subgroup(self, P: JacobianPoint):
        """Batched prime-order-subgroup membership.

        * cofactor 1: trivially true (alt_bn128_g1.cpp:359-363);
        * curves with a sigma fast check: [c1] sigma(P) + P == 0
          (bls12_377_g1.cpp:387-397);
        * otherwise the generic [r] P == 0.
        Zero is always a member."""
        batch = P.z.shape[self.F.el_ndim:]
        ex = self.gdef.extra
        if "safe_subgroup_c1" in ex:
            c1 = ex["safe_subgroup_c1"]
            chk = self.add(self.scalar_mul_int(c1, self.sigma(P)), P)
            return self.is_zero(chk)
        if "psi_x" in ex:
            # [h1.r]P == 0 as P + [t](psi(P) - P) - psi^2(P) == 0
            # (bls12_377_g2.cpp:462-474)
            psi_p = self.psi(P)
            psi2_p = self.psi(psi_p)
            chk = self.add(
                P, self.add(
                    self.scalar_mul_int(ex["trace_of_frobenius"],
                                        self.add(psi_p, self.neg(P))),
                    self.neg(psi2_p)))
            return self.is_zero(chk)
        if self.cofactor == 1:
            return jnp.ones(batch, dtype=jnp.bool_)
        return self.is_zero(self.scalar_mul_int(self.order, P))

    def proof_of_safe_subgroup(self, P: JacobianPoint) -> JacobianPoint:
        """A point W with [h] W == P, proving P lies in the safe subgroup:
        W = [w] P + non_member (bls12_377_g1.cpp:399-409)."""
        ex = self.gdef.extra
        w = ex["proof_of_subgroup_w"]
        nm_x = self.F.from_host(ex["proof_of_subgroup_non_member_x"])
        nm_y = self.F.from_host(ex["proof_of_subgroup_non_member_y"])
        batch = P.z.shape[self.F.el_ndim:]
        one = self.F.one(batch)
        nm = JacobianPoint(
            jnp.broadcast_to(nm_x.reshape(
                nm_x.shape + (1,) * len(batch)), one.shape),
            jnp.broadcast_to(nm_y.reshape(
                nm_y.shape + (1,) * len(batch)), one.shape),
            one)
        return self.add(self.scalar_mul_int(w, P), nm)

    # -- reductions -------------------------------------------------------------------
    def sum_tree(self, P: JacobianPoint, axis: int = -1) -> JacobianPoint:
        """Associative tree-sum of points along a batch axis (log-depth,
        fully batched) — the reduction the reference does serially
        (multiexp.tcc:681-687).

        Implemented as ONE adder instance inside a fori_loop over levels
        (stride-roll pairing), so compile cost is O(1) in the axis length;
        lanes beyond the live stride compute garbage that is never read."""
        import jax

        batch_axis = axis % P.z.ndim
        n = P.z.shape[batch_axis]
        m = 1 << max(1, (n - 1).bit_length()) if n > 1 else 1
        if m != n:
            pads = [(0, 0)] * P.z.ndim
            pads[batch_axis] = (0, m - n)
            # padded entries have Z == 0, so add() treats them as zero
            P = JacobianPoint(
                jnp.pad(P.x, pads), jnp.pad(P.y, pads), jnp.pad(P.z, pads))
        levels = m.bit_length() - 1

        def body(l, P):
            shift = jnp.int32(m) >> (l + 1)
            Q = JacobianPoint(
                jnp.roll(P.x, -shift, axis=batch_axis),
                jnp.roll(P.y, -shift, axis=batch_axis),
                jnp.roll(P.z, -shift, axis=batch_axis))
            return self.add(P, Q)

        if levels:
            P = jax.lax.fori_loop(0, levels, body, P)
        return _take(P, 0, batch_axis)


def _take(P: JacobianPoint, sl, axis: int) -> JacobianPoint:
    idx = [slice(None)] * P.z.ndim
    idx[axis] = sl
    idx = tuple(idx)
    return JacobianPoint(P.x[idx], P.y[idx], P.z[idx])


def _ptake(P: ProjectivePoint, sl, axis: int) -> ProjectivePoint:
    idx = [slice(None)] * P.z.ndim
    idx[axis] = sl
    idx = tuple(idx)
    return ProjectivePoint(P.x[idx], P.y[idx], P.z[idx])
