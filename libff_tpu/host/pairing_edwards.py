"""Host-side Edwards-181 Tate and ate pairing oracle.

Exact reimplementation of libff's edwards pairing semantics
(libff/algebra/curves/edwards/edwards_pairing.cpp): extended Edwards
projective coordinates (X, Y, Z, T) with invariant T*Z == X*Y, conic
line coefficients (c_ZZ, c_XY, c_XZ) per doubling/addition step, the
Tate Miller loop over the bits of r with G2 reduced to (y0, eta)
(edwards_pairing.cpp:234-247, 267-462), the flipped ate Miller loop over
the bits of the ate loop count (:471-720), and the
(q^3-1)(q+1)-then-(w1*q + w0) final exponentiation (:155-230).
"""

from __future__ import annotations


class EdwardsParams:
    def __init__(self, cd):
        self.cd = cd
        self.Fq = cd.fq
        self.Fq3 = cd.fq3
        self.Fq6 = cd.gt
        self.r = cd.r
        self.loop_count = cd.pairing.ate_loop_count
        ex = cd.pairing.extra
        self.w0 = ex["final_exponent_last_chunk_abs_of_w0"]
        self.w0_neg = ex["final_exponent_last_chunk_is_w0_neg"]
        self.w1 = ex["final_exponent_last_chunk_w1"]
        self.coeff_a = cd.g1.curve.a          # 1
        self.coeff_d = cd.g1.curve.d
        self.twist = cd.pairing.twist         # U in Fq3
        self.twist_coeff_a = cd.g2.curve.a
        self.nr = cd.fq3.nr                   # 61

    def g2_mul_by_a(self, elt):
        """edwards_G2::mul_by_a (edwards_g2.cpp:31-44): multiply an Fq3
        element by the twist coefficient a' = U: (nr*c2, c0, c1)."""
        F = self.Fq
        return (F.mul(self.nr, elt[2]), elt[0], elt[1])


# --- Tate pairing (G1 side in Fq) -----------------------------------------

def _tate_dbl_step(ap, R):
    """edwards_pairing.cpp:267-300 (a = 1)."""
    F = ap.Fq
    X, Y, Z, T = R
    A = F.sqr(X)
    B = F.sqr(Y)
    C = F.sqr(Z)
    D = F.sqr(F.add(X, Y))
    E = F.sqr(F.add(Y, Z))
    Fv = F.sub(D, F.add(A, B))
    G = F.sub(E, F.add(B, C))
    H = A
    I = F.add(H, B)
    J = F.sub(C, I)
    K = F.add(J, C)
    c_ZZ = F.mul(Y, F.sub(T, X))
    c_ZZ = F.add(c_ZZ, c_ZZ)
    c_XY = F.add(F.add(J, J), G)
    c_XZ = F.sub(F.mul(X, T), B)
    c_XZ = F.add(c_XZ, c_XZ)
    R3 = (F.mul(Fv, K), F.mul(I, F.sub(B, H)), F.mul(I, K),
          F.mul(Fv, F.sub(B, H)))
    return R3, (c_ZZ, c_XY, c_XZ)


def _tate_madd_step(ap, base, R):
    """edwards_pairing.cpp:334-365 (mixed, Z2 = 1)."""
    F = ap.Fq
    X1, Y1, Z1, T1 = R
    X2, Y2, T2 = base
    A = F.mul(X1, X2)
    B = F.mul(Y1, Y2)
    C = F.mul(Z1, T2)
    D = T1
    E = F.add(D, C)
    Fv = F.add(F.sub(F.mul(F.sub(X1, Y1), F.add(X2, Y2)), A), B)
    G = F.add(B, A)
    H = F.sub(D, C)
    I = F.mul(T1, T2)
    c_ZZ = F.add(F.sub(F.mul(F.sub(T1, X1), F.add(T2, X2)), I), A)
    c_XY = F.add(F.sub(X1, F.mul(X2, Z1)), Fv)
    c_XZ = F.sub(F.add(F.sub(F.mul(F.sub(Y1, T1), F.add(Y2, T2)), B), I), H)
    R3 = (F.mul(E, Fv), F.mul(G, H), F.mul(Fv, G), F.mul(E, H))
    return R3, (c_ZZ, c_XY, c_XZ)


def tate_precompute_g1(ap: EdwardsParams, P):
    """Conic-coefficient schedule over the bits of r
    (edwards_pairing.cpp:367-407)."""
    F = ap.Fq
    x, y = P
    P_ext = (x, y, F.one(), F.mul(x, y))
    R = P_ext
    base = (x, y, P_ext[3])
    coeffs = []
    for bit in bin(ap.r)[3:]:
        R, cc = _tate_dbl_step(ap, R)
        coeffs.append(cc)
        if bit == "1":
            R, cc = _tate_madd_step(ap, base, R)
            coeffs.append(cc)
    return coeffs


def tate_precompute_g2(ap: EdwardsParams, Q):
    """(y0, eta) = (Y/Z, (Z+Y)/(U*X)) (edwards_pairing.cpp:234-247)."""
    F3, F6 = ap.Fq3, ap.Fq6
    qx, qy = Q
    # affine: Z = 1; eta = (Z+Y) / (U * X) where U*X is Fq6's
    # mul_by_non_residue acting on an Fq3 element (the U shift)
    y0 = qy
    eta = F3.mul(F3.add(F3.one(), qy), F3.inv(F6.mul_by_nr(qx)))
    return {"y0": y0, "eta": eta}


def tate_miller_loop(ap: EdwardsParams, prec_P, prec_Q):
    F, F3, F6 = ap.Fq, ap.Fq3, ap.Fq6
    f = F6.one()
    idx = 0
    for bit in bin(ap.r)[3:]:
        cc = prec_P[idx]
        idx += 1
        g = (F3.add((cc[2], 0, 0), F3.mul_base(prec_Q["y0"], cc[1])),
             F3.mul_base(prec_Q["eta"], cc[0]))
        f = F6.mul(F6.sqr(f), g)
        if bit == "1":
            cc = prec_P[idx]
            idx += 1
            g = (F3.add((cc[2], 0, 0), F3.mul_base(prec_Q["y0"], cc[1])),
                 F3.mul_base(prec_Q["eta"], cc[0]))
            f = F6.mul(f, g)
    return f


# --- ate pairing (flipped, G2 side in Fq3) --------------------------------

def _ate_dbl_step(ap, R):
    """edwards_pairing.cpp:489-528 over Fq3 with a' = U."""
    F = ap.Fq3
    X, Y, Z, T = R
    A = F.sqr(X)
    B = F.sqr(Y)
    C = F.sqr(Z)
    D = F.sqr(F.add(X, Y))
    E = F.sqr(F.add(Y, Z))
    Fv = F.sub(D, F.add(A, B))
    G = F.sub(E, F.add(B, C))
    H = ap.g2_mul_by_a(A)
    I = F.add(H, B)
    J = F.sub(C, I)
    K = F.add(J, C)
    c_ZZ = F.mul(Y, F.sub(T, X))
    c_ZZ = F.add(c_ZZ, c_ZZ)
    c_XY = F.sub(F.sub(C, ap.g2_mul_by_a(A)), B)
    c_XY = F.add(F.add(c_XY, c_XY), G)
    c_XZ = F.sub(ap.g2_mul_by_a(F.mul(X, T)), B)
    c_XZ = F.add(c_XZ, c_XZ)
    R3 = (F.mul(Fv, K), F.mul(I, F.sub(B, H)), F.mul(I, K),
          F.mul(Fv, F.sub(B, H)))
    return R3, (c_ZZ, c_XY, c_XZ)


def _ate_madd_step(ap, base, R):
    """edwards_pairing.cpp:570-607 (mixed, Z2 = 1)."""
    F = ap.Fq3
    X1, Y1, Z1, T1 = R
    X2, Y2, T2 = base
    A = F.mul(X1, X2)
    B = F.mul(Y1, Y2)
    C = F.mul(Z1, T2)
    E = F.add(T1, C)
    Fv = F.add(F.sub(F.mul(F.sub(X1, Y1), F.add(X2, Y2)), A), B)
    G = F.add(B, ap.g2_mul_by_a(A))
    H = F.sub(T1, C)
    I = F.mul(T1, T2)
    c_ZZ = ap.g2_mul_by_a(
        F.add(F.sub(F.mul(F.sub(T1, X1), F.add(T2, X2)), I), A))
    c_XY = F.add(F.sub(X1, F.mul(X2, Z1)), Fv)
    c_XZ = F.sub(F.add(F.sub(F.mul(F.sub(Y1, T1), F.add(Y2, T2)), B), I), H)
    R3 = (F.mul(E, Fv), F.mul(G, H), F.mul(Fv, G), F.mul(E, H))
    return R3, (c_ZZ, c_XY, c_XZ)


def ate_precompute_g1(ap: EdwardsParams, P):
    F = ap.Fq
    x, y = P
    return {"P_XY": F.mul(x, y), "P_XZ": x,
            "P_ZZplusYZ": F.add(F.one(), y)}


def ate_precompute_g2(ap: EdwardsParams, Q):
    F3 = ap.Fq3
    qx, qy = Q
    Q_ext = (qx, qy, F3.one(), F3.mul(qx, qy))
    base = (qx, qy, Q_ext[3])
    R = Q_ext
    coeffs = []
    for bit in bin(ap.loop_count)[3:]:
        R, cc = _ate_dbl_step(ap, R)
        coeffs.append(cc)
        if bit == "1":
            R, cc = _ate_madd_step(ap, base, R)
            coeffs.append(cc)
    return coeffs


def ate_miller_loop(ap: EdwardsParams, prec_P, prec_Q):
    F3, F6 = ap.Fq3, ap.Fq6
    f = F6.one()
    idx = 0
    for bit in bin(ap.loop_count)[3:]:
        cc = prec_Q[idx]
        idx += 1
        g_RR = (F3.add(F3.mul_base(cc[1], prec_P["P_XY"]),
                       F3.mul_base(cc[2], prec_P["P_XZ"])),
                F3.mul_base(cc[0], prec_P["P_ZZplusYZ"]))
        f = F6.mul(F6.sqr(f), g_RR)
        if bit == "1":
            cc = prec_Q[idx]
            idx += 1
            g_RQ = (F3.mul_base(cc[0], prec_P["P_ZZplusYZ"]),
                    F3.add(F3.mul_base(cc[1], prec_P["P_XY"]),
                           F3.mul_base(cc[2], prec_P["P_XZ"])))
            f = F6.mul(f, g_RQ)
    return f


def ate_double_miller_loop(ap: EdwardsParams, prec_P1, prec_Q1,
                           prec_P2, prec_Q2):
    """Two ate Miller loops sharing the f^2 per bit
    (edwards_pairing.cpp ate_double_miller_loop)."""
    F3, F6 = ap.Fq3, ap.Fq6
    pairs = [(prec_P1, prec_Q1), (prec_P2, prec_Q2)]
    f = F6.one()
    idx = 0
    for bit in bin(ap.loop_count)[3:]:
        f = F6.sqr(f)
        for p, q in pairs:
            cc = q[idx]
            f = F6.mul(f, (F3.add(F3.mul_base(cc[1], p["P_XY"]),
                                  F3.mul_base(cc[2], p["P_XZ"])),
                           F3.mul_base(cc[0], p["P_ZZplusYZ"])))
        idx += 1
        if bit == "1":
            for p, q in pairs:
                cc = q[idx]
                f = F6.mul(f, (F3.mul_base(cc[0], p["P_ZZplusYZ"]),
                               F3.add(F3.mul_base(cc[1], p["P_XY"]),
                                      F3.mul_base(cc[2], p["P_XZ"]))))
            idx += 1
    return f


# --- final exponentiation --------------------------------------------------

def final_exponentiation(ap: EdwardsParams, f):
    F6 = ap.Fq6
    f_inv = F6.inv(f)

    def first(e, e_inv):
        t = F6.mul(F6.frobenius(e, 3), e_inv)
        return F6.mul(F6.frobenius(t, 1), t)

    elt = first(f, f_inv)
    elt_inv = first(f_inv, f)
    # NAF cyclotomic_exp (edwards_pairing.cpp:181-196)
    w1_part = F6.cyclotomic_exp(F6.frobenius(elt, 1), ap.w1)
    w0_part = F6.cyclotomic_exp(elt_inv if ap.w0_neg else elt, ap.w0)
    return F6.mul(w1_part, w0_part)


def tate_reduced_pairing(ap: EdwardsParams, P, Q):
    f = tate_miller_loop(ap, tate_precompute_g1(ap, P),
                         tate_precompute_g2(ap, Q))
    return final_exponentiation(ap, f)


def ate_reduced_pairing(ap: EdwardsParams, P, Q):
    f = ate_miller_loop(ap, ate_precompute_g1(ap, P),
                        ate_precompute_g2(ap, Q))
    return final_exponentiation(ap, f)
