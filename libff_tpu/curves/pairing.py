"""Optimal-ate pairing on device (BN / BLS12 families over Fq12 towers).

Device counterpart of libff's per-curve pairing files
(alt_bn128_pairing.cpp:246-543, bls12_377_pairing.cpp): G2 precompute runs
the doubling/addition line-coefficient schedule as one `lax.scan` over the
static loop-count bits (both step kinds computed each iteration, the
addition masked by the bit — XLA-friendly, no data-dependent control
flow); the Miller loop is a second scan consuming the aligned coefficient
slots; the final exponentiation is the easy chunk plus the family-specific
hard-part addition chain.

Everything is batched: P/Q may carry arbitrary batch dims, so a batch of
pairings costs barely more than one (pairings on TPU are throughput-, not
latency-oriented).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..host import pairing as hp
from .group import JacobianPoint


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
        F2 = dc.fq2
        Fq = dc.fq
        self.Fq, self.F2, self.F6, self.F12 = Fq, F2, dc.fq6, dc.fq12
        self.twist = F2.from_host(cd.pairing.twist)
        self.twist_type = cd.pairing.twist_type
        self.twist_coeff_b = F2.from_host(cd.g2.curve.b)
        self.two_inv = Fq.from_host(self.hp.two_inv)
        self.mul_by_q_x = F2.from_host(self.hp.mul_by_q_x)
        self.mul_by_q_y = F2.from_host(self.hp.mul_by_q_y)
        self.loop_bits = np.array(
            [int(b) for b in bin(cd.pairing.ate_loop_count)[3:]],
            dtype=np.bool_)
        self.loop_neg = cd.pairing.ate_is_loop_count_neg
        self.z = cd.pairing.final_exponent_z
        self.z_neg = cd.pairing.final_exponent_is_z_neg

    # -- steps (formulas of alt_bn128_pairing.cpp:246-323) --------------------
    def _dbl_step(self, R):
        F2 = self.F2
        X, Y, Z = R
        A = F2.mul_base(F2.mul(X, Y), self.two_inv)
        B = F2.sqr(Y)
        C = F2.sqr(Z)
        D = F2.add(C, F2.add(C, C))
        E = F2.mul(self.twist_coeff_b, D)
        Fv = F2.add(E, F2.add(E, E))
        G = F2.mul_base(F2.add(B, Fv), self.two_inv)
        H = F2.sub(F2.sqr(F2.add(Y, Z)), F2.add(B, C))
        I = F2.sub(E, B)
        J = F2.sqr(X)
        E2 = F2.sqr(E)
        X3 = F2.mul(A, F2.sub(B, Fv))
        Y3 = F2.sub(F2.sqr(G), F2.add(E2, F2.add(E2, E2)))
        Z3 = F2.mul(B, H)
        c = (F2.mul(self.twist, I), F2.neg(H), F2.add(J, F2.add(J, J)))
        return (X3, Y3, Z3), c

    def _add_step(self, base, R):
        F2 = self.F2
        X1, Y1, Z1 = R
        x2, y2 = base
        D = F2.sub(X1, F2.mul(x2, Z1))
        E = F2.sub(Y1, F2.mul(y2, Z1))
        Fv = F2.sqr(D)
        G = F2.sqr(E)
        H = F2.mul(D, Fv)
        I = F2.mul(X1, Fv)
        J = F2.sub(F2.add(H, F2.mul(Z1, G)), F2.add(I, I))
        X3 = F2.mul(D, J)
        Y3 = F2.sub(F2.mul(E, F2.sub(I, J)), F2.mul(H, Y1))
        Z3 = F2.mul(Z1, H)
        c = (F2.mul(self.twist, F2.sub(F2.mul(E, x2), F2.mul(D, y2))),
             D, F2.neg(E))
        return (X3, Y3, Z3), c

    # -- precompute --------------------------------------------------------------
    def precompute_g1(self, P) -> G1Precomp:
        """P: JacobianPoint over Fq (or (x, y) affine pair)."""
        if isinstance(P, JacobianPoint):
            A = self.dc.g1.to_affine(P)
            return G1Precomp(A.x, A.y)
        return G1Precomp(P[0], P[1])

    def precompute_g2(self, Q) -> G2Precomp:
        """Q: JacobianPoint over Fq2 (or affine pair)."""
        F2 = self.F2
        if isinstance(Q, JacobianPoint):
            A = self.dc.g2.to_affine(Q)
            qx, qy = A.x, A.y
        else:
            qx, qy = Q
        batch = qx.shape[F2.el_ndim:]
        one = F2.one(batch)
        R0 = (qx, qy, one)

        def step(R, bit):
            R, cd = self._dbl_step(R)
            Ra, ca = self._add_step((qx, qy), R)
            mask = jnp.broadcast_to(bit, batch)
            R = tuple(F2.select(mask, a, b) for a, b in zip(Ra, R))
            coeffs = EllCoeffs(*(jnp.stack([d, a], axis=0)
                                 for d, a in zip(cd, ca)))
            return R, coeffs

        R, coeffs = jax.lax.scan(step, R0, jnp.asarray(self.loop_bits))

        final = None
        if self.kind == "bn":
            q1 = (F2.mul(_b(F2, self.mul_by_q_x, qx), F2.frobenius(qx, 1)),
                  F2.mul(_b(F2, self.mul_by_q_y, qy), F2.frobenius(qy, 1)))
            q2x = F2.mul(_b(F2, self.mul_by_q_x, qx), F2.frobenius(q1[0], 1))
            q2y = F2.mul(_b(F2, self.mul_by_q_y, qy), F2.frobenius(q1[1], 1))
            q2 = (q2x, F2.neg(q2y))
            if self.loop_neg:
                R = (R[0], F2.neg(R[1]), R[2])
            R, c1 = self._add_step(q1, R)
            R, c2 = self._add_step(q2, R)
            final = EllCoeffs(*(jnp.stack([u, v], axis=0)
                                for u, v in zip(c1, c2)))
        return G2Precomp(coeffs, final)

    # -- sparse multiplication ------------------------------------------------------
    def _sparse_mul(self, f, c, px, py):
        """f * line(c; P).  D twist: mul_by_024; M twist: mul_by_045
        (fp12_2over3over2.tcc sparse muls, via their dense equivalents)."""
        F2 = self.F2
        ell_0, ell_VW, ell_VV = c
        vw = F2.mul_base(ell_VW, py)
        vv = F2.mul_base(ell_VV, px)
        z2 = jnp.zeros_like(ell_0)
        if self.twist_type == "D":
            sparse = jnp.stack([jnp.stack([ell_0, z2, vv], 0),
                                jnp.stack([z2, vw, z2], 0)], 0)
        else:
            sparse = jnp.stack([jnp.stack([vw, z2, z2], 0),
                                jnp.stack([z2, ell_0, vv], 0)], 0)
        return self.F12.mul(f, sparse)

    # -- Miller loop -------------------------------------------------------------------
    def miller_loop(self, precP: G1Precomp, precQ: G2Precomp):
        F12 = self.F12
        px, py = precP.px, precP.py
        batch = px.shape[self.Fq.el_ndim:]
        f0 = F12.one(batch)

        def step(f, xs):
            coeffs, bit = xs
            f = F12.sqr(f)
            f = self._sparse_mul(f, (coeffs.ell_0[0], coeffs.ell_VW[0],
                                     coeffs.ell_VV[0]), px, py)
            fa = self._sparse_mul(f, (coeffs.ell_0[1], coeffs.ell_VW[1],
                                      coeffs.ell_VV[1]), px, py)
            f = F12.select(jnp.broadcast_to(bit, batch), fa, f)
            return f, None

        f, _ = jax.lax.scan(step, f0,
                            (precQ.coeffs, jnp.asarray(self.loop_bits)))
        if self.loop_neg:
            f = F12.inv(f)         # true inverse, as the reference (:439-441)
        if precQ.final is not None:
            for k in range(2):
                f = self._sparse_mul(
                    f, (precQ.final.ell_0[k], precQ.final.ell_VW[k],
                        precQ.final.ell_VV[k]), px, py)
        return f

    def double_miller_loop(self, precP1, precQ1, precP2, precQ2):
        """Product of two Miller loops (alt_bn128_pairing.cpp:453-522); the
        shared-squaring trick yields exactly miller(P1,Q1)*miller(P2,Q2)."""
        f1 = self.miller_loop(precP1, precQ1)
        f2 = self.miller_loop(precP2, precQ2)
        return self.F12.mul(f1, f2)

    # -- final exponentiation --------------------------------------------------------
    def _exp_by_neg_z(self, f):
        r = self.F12.pow_static(f, self.z)  # TODO: cyclotomic_exp fast path
        if not self.z_neg:
            r = self.F12.conjugate(r)
        return r

    def final_exponentiation(self, f):
        F12 = self.F12
        # easy chunk: f^((q^6-1)(q^2+1))  (alt_bn128_pairing.cpp:113-139)
        A = F12.conjugate(f)
        B = F12.inv(f)
        C = F12.mul(A, B)
        D = F12.frobenius(C, 2)
        g = F12.mul(D, C)
        if self.kind == "bn":
            return self._final_exp_hard_bn(g)
        if self.kind == "bls12":
            return self._final_exp_hard_bls12(g)
        raise NotImplementedError(self.kind)

    def _final_exp_hard_bn(self, elt):
        """Fuentes-Castaneda chain (alt_bn128_pairing.cpp:155-229)."""
        F12 = self.F12
        A = self._exp_by_neg_z(elt)
        B = F12.sqr(A)
        C = F12.sqr(B)
        D = F12.mul(C, B)
        E = self._exp_by_neg_z(D)
        Fv = F12.sqr(E)
        G = self._exp_by_neg_z(Fv)
        H = F12.conjugate(D)
        I = F12.conjugate(G)
        J = F12.mul(I, E)
        K = F12.mul(J, H)
        L = F12.mul(K, B)
        M = F12.mul(K, E)
        N = F12.mul(M, elt)
        O = F12.frobenius(L, 1)
        P = F12.mul(O, N)
        Q = F12.frobenius(K, 2)
        R = F12.mul(Q, P)
        S = F12.conjugate(elt)
        T = F12.mul(S, L)
        U = F12.frobenius(T, 3)
        return F12.mul(U, R)

    def _final_exp_hard_bls12(self, elt):
        """BLS12 hard part f^((q^4-q^2+1)/r); wired with the exact chain of
        bls12_377_pairing.cpp when the BLS12 curves land."""
        raise NotImplementedError("bls12 final exp lands with bls12_377")

    # -- top level ----------------------------------------------------------------------
    def pairing(self, P, Q):
        return self.miller_loop(self.precompute_g1(P), self.precompute_g2(Q))

    def reduced_pairing(self, P, Q):
        return self.final_exponentiation(self.pairing(P, Q))


def _b(F2, c, like):
    """Broadcast an unbatched Fq2 constant against a batched element."""
    return jnp.broadcast_to(
        c.reshape(c.shape + (1,) * (like.ndim - c.ndim)), like.shape)
