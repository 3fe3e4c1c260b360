"""Host-side BW6-761 ate pairing oracle.

Exact reimplementation of libff's BW6-761 pairing
(libff/algebra/curves/bw6_761/bw6_761_pairing.cpp): two NAF-driven Miller
loops over loop counts u+1 and u^3-u^2-u whose line coefficients live in
Fq itself (G2 is defined over Fq; the sextic M-twist by -4 sends lines
into Fq6 via the mul_by_045 slot layout x0=ell_VW, x4=ell_0, x5=ell_VV,
fp6_2over3.tcc:106-128), combined as f1 * Frobenius(f2)
(bw6_761_pairing.cpp:423-505), followed by the (q^3-1)(q+1) easy chunk and
the Algorithm-6 (eprint 2020/351) hard chunk (:131-256).
"""

from __future__ import annotations

from ..msm.wnaf_host import find_wnaf


class Bw6Params:
    def __init__(self, cd):
        self.cd = cd
        self.Fq = cd.fq
        self.Fq3 = cd.fq3
        self.Fq6 = cd.gt
        self.twist = cd.pairing.twist            # -4 in Fq
        self.twist_coeff_b = cd.g2.curve.b       # 4
        self.loop1 = cd.pairing.extra["ate_loop_count1"]
        self.loop2 = cd.pairing.extra["ate_loop_count2"]
        self.z = cd.pairing.final_exponent_z
        self.z_neg = cd.pairing.final_exponent_is_z_neg


def _dbl_step(ap, R):
    """Homogeneous projective doubling (bw6_761_pairing.cpp:274-317)."""
    F = ap.Fq
    X, Y, Z = R
    A = F.mul(X, Y)
    B = F.sqr(Y)
    B4 = F.add(F.add(B, B), F.add(B, B))
    C = F.sqr(Z)
    D = F.add(F.add(C, C), C)
    E = F.mul(ap.twist_coeff_b, D)
    Fv = F.add(F.add(E, E), E)
    G = F.add(B, Fv)
    H = F.sub(F.sqr(F.add(Y, Z)), F.add(B, C))
    I = F.sub(E, B)
    J = F.sqr(X)
    E2sq = F.sqr(F.add(E, E))
    X3 = F.mul(F.add(A, A), F.sub(B, Fv))
    Y3 = F.sub(F.sqr(G), F.add(F.add(E2sq, E2sq), E2sq))
    Z3 = F.mul(B4, H)
    ell_0 = I
    ell_VW = F.neg(F.mul(ap.twist, H))
    ell_VV = F.add(F.add(J, J), J)
    return (X3, Y3, Z3), (ell_0, ell_VW, ell_VV)


def _add_step(ap, base, R):
    """Mixed addition (bw6_761_pairing.cpp:319-352)."""
    F = ap.Fq
    X1, Y1, Z1 = R
    x2, y2 = base
    D = F.sub(X1, F.mul(x2, Z1))
    E = F.sub(Y1, F.mul(y2, Z1))
    Fv = F.sqr(D)
    G = F.sqr(E)
    H = F.mul(D, Fv)
    I = F.mul(X1, Fv)
    J = F.sub(F.add(H, F.mul(Z1, G)), F.add(I, I))
    X3 = F.mul(D, J)
    Y3 = F.sub(F.mul(E, F.sub(I, J)), F.mul(H, Y1))
    Z3 = F.mul(Z1, H)
    ell_0 = F.sub(F.mul(E, x2), F.mul(D, y2))
    ell_VV = F.neg(E)
    ell_VW = F.mul(ap.twist, D)
    return (X3, Y3, Z3), (ell_0, ell_VW, ell_VV)


def _precompute_iteration(ap, Q, loop_count):
    """NAF-driven coefficient schedule
    (bw6_761_pairing.cpp:369-411)."""
    F = ap.Fq
    qx, qy = Q
    qneg = (qx, F.neg(qy))
    R = (qx, qy, F.one())
    coeffs = []
    naf = find_wnaf(1, loop_count)
    seen = False
    for i in range(len(naf) - 1, -1, -1):
        if not seen:
            seen = naf[i] != 0
            continue
        R, c = _dbl_step(ap, R)
        coeffs.append(c)
        if naf[i] != 0:
            R, c = _add_step(ap, (qx, qy) if naf[i] > 0 else qneg, R)
            coeffs.append(c)
    return coeffs


def precompute_g1(ap: Bw6Params, P):
    return P  # affine (x, y)


def precompute_g2(ap: Bw6Params, Q):
    return {"c1": _precompute_iteration(ap, Q, ap.loop1),
            "c2": _precompute_iteration(ap, Q, ap.loop2)}


def _mul_by_045(ap, f, ell_0, vw, vv):
    """f * sparse(x0=vw, x4=ell_0, x5=vv) — the 18-Fp-mul sparse product
    (fp6_2over3.tcc:106-145)."""
    from ..fields import gt_ops

    return gt_ops.fq6_2over3_mul_by_045(ap.Fq6, f, ell_0, vw, vv)


def _miller(ap, P, coeffs, loop_count, f=None, pairs_extra=()):
    """One NAF Miller loop; with pairs_extra, additional (P, coeffs) pairs
    share each f^2 (bw6_761_pairing.cpp double_miller_loop structure)."""
    F = ap.Fq
    all_pairs = [(P, coeffs)] + list(pairs_extra)
    f = ap.Fq6.one() if f is None else f
    naf = find_wnaf(1, loop_count)
    idx = 0
    seen = False
    for i in range(len(naf) - 1, -1, -1):
        if not seen:
            seen = naf[i] != 0
            continue
        f = ap.Fq6.sqr(f)
        for (px, py), cs in all_pairs:
            c = cs[idx]
            f = _mul_by_045(ap, f, c[0], F.mul(py, c[1]), F.mul(px, c[2]))
        idx += 1
        if naf[i] != 0:
            for (px, py), cs in all_pairs:
                c = cs[idx]
                f = _mul_by_045(ap, f, c[0], F.mul(py, c[1]),
                                F.mul(px, c[2]))
            idx += 1
    return f


def ate_miller_loop(ap: Bw6Params, P, prec_Q):
    f1 = _miller(ap, P, prec_Q["c1"], ap.loop1)
    f2 = _miller(ap, P, prec_Q["c2"], ap.loop2)
    return ap.Fq6.mul(f1, ap.Fq6.frobenius(f2, 1))


def ate_double_miller_loop(ap: Bw6Params, P1, prec_Q1, P2, prec_Q2):
    """Both pairs share the squarings in BOTH NAF loops
    (bw6_761_pairing.cpp:423-521); equals miller(P1,Q1)*miller(P2,Q2)."""
    f1 = _miller(ap, P1, prec_Q1["c1"], ap.loop1,
                 pairs_extra=[(P2, prec_Q2["c1"])])
    f2 = _miller(ap, P1, prec_Q1["c2"], ap.loop2,
                 pairs_extra=[(P2, prec_Q2["c2"])])
    return ap.Fq6.mul(f1, ap.Fq6.frobenius(f2, 1))


def _exp_by_z(ap, f):
    """NAF cyclotomic_exp then unitary inverse (bw6_761_pairing.cpp:149-160)."""
    r = ap.Fq6.cyclotomic_exp(f, ap.z)
    if ap.z_neg:
        r = ap.Fq6.conjugate(r)
    return r


def final_exponentiation(ap: Bw6Params, f):
    F6 = ap.Fq6
    # easy chunk (q^3-1)(q+1) (bw6_761_pairing.cpp:131-147)
    A = F6.frobenius(f, 3)
    B = F6.mul(A, F6.inv(f))
    D = F6.frobenius(B, 1)
    elt = F6.mul(D, B)

    # hard chunk: Algorithm 6 of eprint 2020/351 (:172-256)
    f0 = elt
    f0p = F6.frobenius(f0, 1)
    f1 = _exp_by_z(ap, f0)
    f1p = F6.frobenius(f1, 1)
    f2 = _exp_by_z(ap, f1)
    f2p = F6.frobenius(f2, 1)
    f3 = _exp_by_z(ap, f2)
    f3p = F6.frobenius(f3, 1)
    f4 = _exp_by_z(ap, f3)
    f4p = F6.frobenius(f4, 1)
    f5 = _exp_by_z(ap, f4)
    f5p = F6.frobenius(f5, 1)
    f6 = _exp_by_z(ap, f5)
    f6p = F6.frobenius(f6, 1)
    f7 = _exp_by_z(ap, f6)
    f7p = F6.frobenius(f7, 1)
    f8p = _exp_by_z(ap, f7p)
    f9p = _exp_by_z(ap, f8p)

    r1 = F6.mul(F6.mul(f3p, f6p), F6.frobenius(f5p, 3))
    r2 = F6.sqr(r1)
    f4_2p = F6.mul(f4, f2p)
    r3 = F6.mul(F6.mul(F6.mul(r2, f5), f0p),
                F6.frobenius(
                    F6.mul(F6.mul(F6.mul(F6.mul(f0, f1), f3), f4_2p), f8p), 3))
    r4 = F6.sqr(r3)
    r5 = F6.mul(F6.mul(r4, f9p), F6.frobenius(f7, 3))
    r6 = F6.sqr(r5)
    f2_4p = F6.mul(f2, f4p)
    f4_2p_5p = F6.mul(f4_2p, f5p)
    r7 = F6.mul(
        F6.mul(F6.mul(F6.mul(r6, f4_2p_5p), f6), f7p),
        F6.frobenius(F6.mul(F6.mul(f2_4p, f3), f3p), 3))
    r8 = F6.sqr(r7)
    r9 = F6.mul(F6.mul(F6.mul(r8, f0), f7),
                F6.mul(f1p, F6.frobenius(F6.mul(f0p, f9p), 3)))
    r10 = F6.sqr(r9)
    f6p_8p = F6.mul(f6p, f8p)
    f5_7p = F6.mul(f5, f7p)
    r11 = F6.mul(F6.mul(F6.mul(r10, f5_7p), f2p),
                 F6.frobenius(f6p_8p, 3))
    r12 = F6.sqr(r11)
    f3_6 = F6.mul(f3, f6)
    f1_7 = F6.mul(f1, f7)
    r13 = F6.mul(F6.mul(F6.mul(r12, f3_6), f9p),
                 F6.frobenius(F6.mul(f1_7, f2), 3))
    r14 = F6.sqr(r13)
    r15 = F6.mul(
        F6.mul(F6.mul(F6.mul(F6.mul(r14, f0), f0p), f3p), f5p),
        F6.frobenius(F6.mul(F6.mul(f4_2p, f5_7p), f6p_8p), 3))
    r16 = F6.sqr(r15)
    r17 = F6.mul(F6.mul(r16, f1p), F6.frobenius(f3_6, 3))
    r18 = F6.sqr(r17)
    r19 = F6.mul(
        F6.mul(F6.mul(F6.mul(r18, f1_7), f5_7p), f0p),
        F6.frobenius(F6.mul(F6.mul(f2_4p, f4_2p_5p), f9p), 3))
    return r19


def reduced_pairing(ap: Bw6Params, P, Q):
    return final_exponentiation(
        ap, ate_miller_loop(ap, P, precompute_g2(ap, Q)))
