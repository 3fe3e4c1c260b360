"""Optimal-ate pairing on device (BN / BLS12 families over Fq12 towers).

Device counterpart of libff's per-curve pairing files
(alt_bn128_pairing.cpp:246-543, bls12_377_pairing.cpp, bls12_381_pairing.cpp).

Execution model (see vm.py): every pairing phase is a formula-VM program —
a straight-line instruction table over prime-field registers executed by a
single lax.scan — so the jitted graph contains O(1) Montgomery-multiplier
instances regardless of formula size:

  * G2 precompute: lax.scan over the static ate-loop bits; the scan body is
    ONE VM program computing the doubling step AND the (masked) addition
    step (alt_bn128_pairing.cpp:246-323 / bls12_381_pairing.cpp:226-307,
    D- and M-twist line-coefficient conventions).
  * Miller loop: lax.scan over the aligned coefficient slots; body = one VM
    program computing f^2 * line_dbl [* line_add].
  * Final exponentiation: one VM program (easy chunk incl. the Fq12 tower
    inversion bottoming out in a Fermat ladder, plus the family-specific
    hard-part chain with z-exponentiation ladders).

Everything is batched: P/Q may carry arbitrary batch dims, so a batch of
pairings costs barely more than one (pairings on TPU are throughput-, not
latency-oriented).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import vm
from ..host import pairing as hp
from .group import JacobianPoint


def _b(F, c, like):
    """Broadcast an unbatched element constant against a batched element."""
    return jnp.broadcast_to(
        c.reshape(c.shape + (1,) * (like.ndim - c.ndim)), like.shape)


class EllCoeffs(NamedTuple):
    """Line coefficients per Miller step: slot 0 = doubling step, slot 1 =
    (masked) addition step.  Arrays shaped (steps, 2, *fq2, *batch)."""
    ell_0: jnp.ndarray
    ell_VW: jnp.ndarray
    ell_VV: jnp.ndarray


class G1Precomp(NamedTuple):
    px: jnp.ndarray
    py: jnp.ndarray


class G2Precomp(NamedTuple):
    coeffs: EllCoeffs            # scan steps
    final: EllCoeffs | None      # BN: 2 extra coefficients (steps axis = 2)


class AtePairing:
    def __init__(self, dc):
        self.dc = dc
        cd = dc.cd
        self.kind = cd.pairing.kind
        self.hp = hp.AteParams(cd)
        self.Fq, self.F2 = dc.fq, dc.fq2
        self.F6, self.F12 = dc.fq6, dc.fq12
        self.twist_type = cd.pairing.twist_type
        self.loop_bits = np.array(
            [int(b) for b in bin(cd.pairing.ate_loop_count)[3:]],
            dtype=np.bool_)
        self.loop_neg = cd.pairing.ate_is_loop_count_neg
        self.z = cd.pairing.final_exponent_z
        self.z_neg = cd.pairing.final_exponent_is_z_neg
        self.mul_by_q_x_const = dc.fq2.from_host(self.hp.mul_by_q_x)
        self.mul_by_q_y_const = dc.fq2.from_host(self.hp.mul_by_q_y)
        self._fp = dc.fq            # VM register field = Fq
        self._progs: dict[str, vm.Program] = {}
        self._h2 = cd.fq2           # host tower levels (for Sym views)
        self._h12 = cd.fq12

    # -- VM plumbing ---------------------------------------------------------
    def _program(self, key, build):
        if key not in self._progs:
            self._progs[key] = vm.trace_general(self._fp, build)
        return self._progs[key]

    def _flat(self, pairs):
        """pairs: list of (device_field, array) -> flat component list."""
        out = []
        for F, arr in pairs:
            out.extend(vm.flatten_element(F, arr))
        return out

    def _batch_of(self, pairs):
        shapes = [arr.shape[F.el_ndim:] for F, arr in pairs]
        m = max(len(s) for s in shapes)
        padded = [tuple(s) + (1,) * (m - len(s)) for s in shapes]
        return tuple(np.broadcast_shapes(*padded))

    # -- symbolic step formulas (shared with host/pairing.py semantics) -------
    def _sym_dbl_step(self, s2, sfp, R):
        h = self.hp
        X, Y, Z = R
        two_inv = sfp.const(h.two_inv)
        A = s2.mul_base(s2.mul(X, Y), two_inv)
        B = s2.sqr(Y)
        C = s2.sqr(Z)
        D = s2.add(C, s2.add(C, C))
        E = s2.mul(s2.const(h.twist_coeff_b), D)
        Fv = s2.add(E, s2.add(E, E))
        G = s2.mul_base(s2.add(B, Fv), two_inv)
        H = s2.sub(s2.sqr(s2.add(Y, Z)), s2.add(B, C))
        I = s2.sub(E, B)
        J = s2.sqr(X)
        E2 = s2.sqr(E)
        X3 = s2.mul(A, s2.sub(B, Fv))
        Y3 = s2.sub(s2.sqr(G), s2.add(E2, s2.add(E2, E2)))
        Z3 = s2.mul(B, H)
        ell_VV = s2.add(J, s2.add(J, J))
        tw = s2.const(h.twist)
        if self.twist_type == "D":
            c = (s2.mul(tw, I), s2.neg(H), ell_VV)
        else:
            c = (I, s2.neg(s2.mul(tw, H)), ell_VV)
        return (X3, Y3, Z3), c

    def _sym_add_step(self, s2, base, R):
        h = self.hp
        X1, Y1, Z1 = R
        x2, y2 = base
        D = s2.sub(X1, s2.mul(x2, Z1))
        E = s2.sub(Y1, s2.mul(y2, Z1))
        Fv = s2.sqr(D)
        G = s2.sqr(E)
        H = s2.mul(D, Fv)
        I = s2.mul(X1, Fv)
        J = s2.sub(s2.add(H, s2.mul(Z1, G)), s2.add(I, I))
        X3 = s2.mul(D, J)
        Y3 = s2.sub(s2.mul(E, s2.sub(I, J)), s2.mul(H, Y1))
        Z3 = s2.mul(Z1, H)
        ell_J = s2.sub(s2.mul(E, x2), s2.mul(D, y2))
        tw = s2.const(h.twist)
        if self.twist_type == "D":
            c = (s2.mul(tw, ell_J), D, s2.neg(E))
        else:
            c = (ell_J, s2.mul(tw, D), s2.neg(E))
        return (X3, Y3, Z3), c

    def _sym_sparse_mul(self, s2, s12, f, c, px, py):
        """f * line(c; P): D twist -> mul_by_024, M -> mul_by_045 — the
        13-Fq2-mul sparse products (fp12_2over3over2.tcc:280-406)."""
        from ..fields import gt_ops

        ell_0, ell_VW, ell_VV = c
        vw = s2.mul_base(ell_VW, py)
        vv = s2.mul_base(ell_VV, px)
        if self.twist_type == "D":
            return gt_ops.fq12_mul_by_024(s12, f, ell_0, vw, vv)
        return gt_ops.fq12_mul_by_045(s12, f, ell_0, vw, vv)

    # -- G2 Frobenius endomorphism ---------------------------------------------
    def mul_by_q(self, Q: JacobianPoint) -> JacobianPoint:
        """psi(Q) = (c_X * X^q, c_Y * Y^q, Z^q) on G2 — the
        untwist-Frobenius-twist map (alt_bn128_g2.cpp:351-356); satisfies
        psi(Q) == [q] Q on the r-order subgroup."""
        F2 = self.F2
        cx = _b(F2, self.mul_by_q_x_const, Q.x)
        cy = _b(F2, self.mul_by_q_y_const, Q.y)
        return JacobianPoint(
            F2.mul(cx, F2.frobenius(Q.x, 1)),
            F2.mul(cy, F2.frobenius(Q.y, 1)),
            F2.frobenius(Q.z, 1))

    # -- precompute --------------------------------------------------------------
    def precompute_g1(self, P) -> G1Precomp:
        """P: JacobianPoint over Fq (or (x, y) affine pair)."""
        if isinstance(P, JacobianPoint):
            A = self.dc.g1.to_affine(P)
            return G1Precomp(A.x, A.y)
        return G1Precomp(P[0], P[1])

    def precompute_g2(self, Q) -> G2Precomp:
        """Q: JacobianPoint over Fq2 (or affine pair).  Runs the line-
        coefficient schedule (alt_bn128_pairing.cpp:340-399)."""
        F2 = self.F2
        if isinstance(Q, JacobianPoint):
            A = self.dc.g2.to_affine(Q)
            qx, qy = A.x, A.y
        else:
            qx, qy = Q

        def build(fp, mksym, inp):
            s2 = mksym(self._h2)
            R = (inp(s2), inp(s2), inp(s2))
            base = (inp(s2), inp(s2))
            Rd, cd = self._sym_dbl_step(s2, fp, R)
            Ra, ca = self._sym_add_step(s2, base, Rd)
            return [*Rd, *cd, *Ra, *ca]

        prog = self._program("step", build)
        batch = self._batch_of([(F2, qx)])
        one = F2.one(batch)
        R0 = (jnp.broadcast_to(
                  qx.reshape(qx.shape + (1,) * (one.ndim - qx.ndim)), one.shape),
              jnp.broadcast_to(
                  qy.reshape(qy.shape + (1,) * (one.ndim - qy.ndim)), one.shape),
              one)

        def step(R, bit):
            outs = vm.run_program(
                self._fp, prog,
                self._flat([(F2, R[0]), (F2, R[1]), (F2, R[2]),
                            (F2, qx), (F2, qy)]),
                batch)
            el = [vm.unflatten_element(F2, outs[i * 2:(i + 1) * 2])
                  for i in range(12)]
            Rd, cd, Ra, ca = el[0:3], el[3:6], el[6:9], el[9:12]
            mask = jnp.broadcast_to(bit, batch)
            R = tuple(F2.select(mask, a, d) for a, d in zip(Ra, Rd))
            coeffs = EllCoeffs(*(jnp.stack([d, a], axis=0)
                                 for d, a in zip(cd, ca)))
            return R, coeffs

        R, coeffs = jax.lax.scan(step, R0, jnp.asarray(self.loop_bits))

        final = None
        if self.kind == "bn":
            def build_fin(fp, mksym, inp):
                s2 = mksym(self._h2)
                R = (inp(s2), inp(s2), inp(s2))
                qx_s, qy_s = inp(s2), inp(s2)
                mqx = s2.const(self.hp.mul_by_q_x)
                mqy = s2.const(self.hp.mul_by_q_y)
                q1 = (s2.mul(mqx, s2.frobenius(qx_s, 1)),
                      s2.mul(mqy, s2.frobenius(qy_s, 1)))
                q2 = (s2.mul(mqx, s2.frobenius(q1[0], 1)),
                      s2.neg(s2.mul(mqy, s2.frobenius(q1[1], 1))))
                if self.loop_neg:
                    R = (R[0], s2.neg(R[1]), R[2])
                R, c1 = self._sym_add_step(s2, q1, R)
                R, c2 = self._sym_add_step(s2, q2, R)
                return [*c1, *c2]

            progf = self._program("bn_final", build_fin)
            outs = vm.run_program(
                self._fp, progf,
                self._flat([(F2, R[0]), (F2, R[1]), (F2, R[2]),
                            (F2, qx), (F2, qy)]),
                batch)
            el = [vm.unflatten_element(F2, outs[i * 2:(i + 1) * 2])
                  for i in range(6)]
            final = EllCoeffs(*(jnp.stack([u, v], axis=0)
                                for u, v in zip(el[0:3], el[3:6])))
        return G2Precomp(coeffs, final)

    # -- Miller loop -------------------------------------------------------------------
    def miller_loop(self, precP: G1Precomp, precQ: G2Precomp):
        F2, F12, Fq = self.F2, self.F12, self.Fq
        px, py = precP.px, precP.py
        batch = self._batch_of([(Fq, px), (F2, precQ.coeffs.ell_0[0][0])])
        f0 = F12.one(batch)

        def build(fp, mksym, inp):
            s2 = mksym(self._h2)
            s12 = mksym(self._h12)
            f = inp(s12)
            cd = (inp(s2), inp(s2), inp(s2))
            ca = (inp(s2), inp(s2), inp(s2))
            px_s, py_s = inp(fp), inp(fp)
            f1 = self._sym_sparse_mul(s2, s12, s12.sqr(f), cd, px_s, py_s)
            f2 = self._sym_sparse_mul(s2, s12, f1, ca, px_s, py_s)
            return [f1, f2]

        prog = self._program("miller_step", build)

        def step(f, xs):
            coeffs, bit = xs
            outs = vm.run_program(
                self._fp, prog,
                self._flat([(F12, f),
                            (F2, coeffs.ell_0[0]), (F2, coeffs.ell_VW[0]),
                            (F2, coeffs.ell_VV[0]),
                            (F2, coeffs.ell_0[1]), (F2, coeffs.ell_VW[1]),
                            (F2, coeffs.ell_VV[1]),
                            (Fq, px), (Fq, py)]),
                batch)
            f1 = vm.unflatten_element(F12, outs[0:12])
            f2 = vm.unflatten_element(F12, outs[12:24])
            return F12.select(jnp.broadcast_to(bit, batch), f2, f1), None

        f, _ = jax.lax.scan(step, f0,
                            (precQ.coeffs, jnp.asarray(self.loop_bits)))
        if self.loop_neg:
            f = self._run_f12("inv12", lambda s12, x: s12.inv(x), f, batch)
        if precQ.final is not None:
            def build_tail(fp, mksym, inp):
                s2 = mksym(self._h2)
                s12 = mksym(self._h12)
                f = inp(s12)
                c1 = (inp(s2), inp(s2), inp(s2))
                c2 = (inp(s2), inp(s2), inp(s2))
                px_s, py_s = inp(fp), inp(fp)
                f = self._sym_sparse_mul(s2, s12, f, c1, px_s, py_s)
                f = self._sym_sparse_mul(s2, s12, f, c2, px_s, py_s)
                return [f]

            prog_t = self._program("sparse_tail", build_tail)
            fin = precQ.final
            outs = vm.run_program(
                self._fp, prog_t,
                self._flat([(F12, f),
                            (F2, fin.ell_0[0]), (F2, fin.ell_VW[0]),
                            (F2, fin.ell_VV[0]),
                            (F2, fin.ell_0[1]), (F2, fin.ell_VW[1]),
                            (F2, fin.ell_VV[1]),
                            (Fq, px), (Fq, py)]),
                batch)
            f = vm.unflatten_element(F12, outs[0:12])
        return f

    def double_miller_loop(self, precP1, precQ1, precP2, precQ2):
        """Two Miller loops sharing the f^2 per bit — ONE scan whose body
        multiplies both pairs' lines into the same accumulator
        (alt_bn128_pairing.cpp:453-522); yields exactly
        miller(P1,Q1) * miller(P2,Q2) with half the Fq12 squarings."""
        F2, F12, Fq = self.F2, self.F12, self.Fq
        batch = self._batch_of([(Fq, precP1.px),
                                (F2, precQ1.coeffs.ell_0[0][0])])
        f0 = F12.one(batch)

        def build(fp, mksym, inp):
            s2 = mksym(self._h2)
            s12 = mksym(self._h12)
            f = inp(s12)
            cd1 = (inp(s2), inp(s2), inp(s2))
            ca1 = (inp(s2), inp(s2), inp(s2))
            cd2 = (inp(s2), inp(s2), inp(s2))
            ca2 = (inp(s2), inp(s2), inp(s2))
            px1, py1, px2, py2 = inp(fp), inp(fp), inp(fp), inp(fp)
            f1 = self._sym_sparse_mul(s2, s12, s12.sqr(f), cd1, px1, py1)
            f1 = self._sym_sparse_mul(s2, s12, f1, cd2, px2, py2)
            f2 = self._sym_sparse_mul(s2, s12, f1, ca1, px1, py1)
            f2 = self._sym_sparse_mul(s2, s12, f2, ca2, px2, py2)
            return [f1, f2]

        prog = self._program("double_miller_step", build)

        def step(f, xs):
            c1, c2, bit = xs
            outs = vm.run_program(
                self._fp, prog,
                self._flat([(F12, f),
                            (F2, c1.ell_0[0]), (F2, c1.ell_VW[0]),
                            (F2, c1.ell_VV[0]),
                            (F2, c1.ell_0[1]), (F2, c1.ell_VW[1]),
                            (F2, c1.ell_VV[1]),
                            (F2, c2.ell_0[0]), (F2, c2.ell_VW[0]),
                            (F2, c2.ell_VV[0]),
                            (F2, c2.ell_0[1]), (F2, c2.ell_VW[1]),
                            (F2, c2.ell_VV[1]),
                            (Fq, precP1.px), (Fq, precP1.py),
                            (Fq, precP2.px), (Fq, precP2.py)]),
                batch)
            f1 = vm.unflatten_element(F12, outs[0:12])
            f2 = vm.unflatten_element(F12, outs[12:24])
            return F12.select(jnp.broadcast_to(bit, batch), f2, f1), None

        f, _ = jax.lax.scan(
            step, f0,
            (precQ1.coeffs, precQ2.coeffs, jnp.asarray(self.loop_bits)))
        if self.loop_neg:
            f = self._run_f12("inv12", lambda s12, x: s12.inv(x), f, batch)
        if precQ1.final is not None:
            def build_tail(fp, mksym, inp):
                s2 = mksym(self._h2)
                s12 = mksym(self._h12)
                f = inp(s12)
                cs = [(inp(s2), inp(s2), inp(s2)) for _ in range(4)]
                px1, py1, px2, py2 = inp(fp), inp(fp), inp(fp), inp(fp)
                # order: pair1 extra1, pair2 extra1, pair1 extra2, pair2
                # extra2 (alt_bn128_pairing.cpp:508-519)
                f = self._sym_sparse_mul(s2, s12, f, cs[0], px1, py1)
                f = self._sym_sparse_mul(s2, s12, f, cs[2], px2, py2)
                f = self._sym_sparse_mul(s2, s12, f, cs[1], px1, py1)
                f = self._sym_sparse_mul(s2, s12, f, cs[3], px2, py2)
                return [f]

            prog_t = self._program("double_sparse_tail", build_tail)
            f1n, f2n = precQ1.final, precQ2.final
            outs = vm.run_program(
                self._fp, prog_t,
                self._flat([(F12, f),
                            (F2, f1n.ell_0[0]), (F2, f1n.ell_VW[0]),
                            (F2, f1n.ell_VV[0]),
                            (F2, f1n.ell_0[1]), (F2, f1n.ell_VW[1]),
                            (F2, f1n.ell_VV[1]),
                            (F2, f2n.ell_0[0]), (F2, f2n.ell_VW[0]),
                            (F2, f2n.ell_VV[0]),
                            (F2, f2n.ell_0[1]), (F2, f2n.ell_VW[1]),
                            (F2, f2n.ell_VV[1]),
                            (Fq, precP1.px), (Fq, precP1.py),
                            (Fq, precP2.px), (Fq, precP2.py)]),
                batch)
            f = vm.unflatten_element(F12, outs[0:12])
        return f

    # -- final exponentiation --------------------------------------------------------
    def _run_f12(self, key, fn, f, batch):
        """Run a single-input/single-output Fq12 VM program."""
        def build(fp, mksym, inp):
            s12 = mksym(self._h12)
            return [fn(s12, inp(s12))]

        prog = self._program(key, build)
        outs = vm.run_program(self._fp, prog,
                              self._flat([(self.F12, f)]), batch)
        return vm.unflatten_element(self.F12, outs[0:12])

    def _sym_exp_by_neg_z(self, s12, f):
        from ..fields import gt_ops
        r = gt_ops.cyclotomic_exp(s12, f, self.z, naf=False)
        if not self.z_neg:
            r = s12.conjugate(r)
        return r

    def _sym_exp_by_z(self, s12, f):
        from ..fields import gt_ops
        r = gt_ops.cyclotomic_exp(s12, f, self.z, naf=False)
        if self.z_neg:
            r = s12.conjugate(r)
        return r

    def _sym_final_exp(self, s12, f):
        # easy chunk: f^((q^6-1)(q^2+1))  (alt_bn128_pairing.cpp:113-139)
        A = s12.conjugate(f)
        B = s12.inv(f)
        C = s12.mul(A, B)
        D = s12.frobenius(C, 2)
        g = s12.mul(D, C)
        if self.kind == "bn":
            return self._sym_final_exp_hard_bn(s12, g)
        if self.kind == "bls12":
            return self._sym_final_exp_hard_bls12(s12, g)
        raise NotImplementedError(self.kind)

    def _sym_final_exp_hard_bn(self, s12, elt):
        """Fuentes-Castaneda chain with cyclotomic squarings
        (alt_bn128_pairing.cpp:155-229)."""
        from ..fields import gt_ops
        csq = lambda x: gt_ops.fq12_cyclotomic_squared(s12, x)
        A = self._sym_exp_by_neg_z(s12, elt)
        B = csq(A)
        C = csq(B)
        D = s12.mul(C, B)
        E = self._sym_exp_by_neg_z(s12, D)
        Fv = csq(E)
        G = self._sym_exp_by_neg_z(s12, Fv)
        H = s12.conjugate(D)
        I = s12.conjugate(G)
        J = s12.mul(I, E)
        K = s12.mul(J, H)
        L = s12.mul(K, B)
        M = s12.mul(K, E)
        N = s12.mul(M, elt)
        O = s12.frobenius(L, 1)
        P = s12.mul(O, N)
        Q = s12.frobenius(K, 2)
        R = s12.mul(Q, P)
        S = s12.conjugate(elt)
        T = s12.mul(S, L)
        U = s12.frobenius(T, 3)
        return s12.mul(U, R)

    def _sym_final_exp_hard_bls12(self, s12, elt):
        """BLS12 hard part — Algorithm 1 of eprint 2016/130, the chain of
        bls12_377_pairing.cpp:151-215 / bls12_381_pairing.cpp:157-212."""
        from ..fields import gt_ops
        csq = lambda x: gt_ops.fq12_cyclotomic_squared(s12, x)
        A = s12.conjugate(csq(elt))
        B = self._sym_exp_by_z(s12, elt)
        C = csq(B)
        D = s12.mul(A, B)
        E = self._sym_exp_by_z(s12, D)
        Fv = self._sym_exp_by_z(s12, E)
        G = self._sym_exp_by_z(s12, Fv)
        H = s12.mul(G, C)
        I = self._sym_exp_by_z(s12, H)
        J = s12.conjugate(D)
        K = s12.mul(I, J)
        L = s12.mul(K, elt)
        M = s12.conjugate(elt)
        N = s12.mul(E, elt)
        O = s12.frobenius(N, 3)
        P = s12.mul(H, M)
        Q = s12.frobenius(P, 1)
        R = s12.mul(B, Fv)
        S = s12.frobenius(R, 2)
        T = s12.mul(O, S)
        U = s12.mul(T, Q)
        return s12.mul(U, L)

    def final_exponentiation(self, f):
        batch = f.shape[self.F12.el_ndim:]
        return self._run_f12("final_exp", self._sym_final_exp, f, batch)

    # -- top level ----------------------------------------------------------------------
    def pairing(self, P, Q):
        return self.miller_loop(self.precompute_g1(P), self.precompute_g2(Q))

    def reduced_pairing(self, P, Q):
        return self.final_exponentiation(self.pairing(P, Q))
