"""Host-side optimal-ate pairing oracle (BN and BLS12 families).

Same algorithm as the device pairing (curves/pairing.py) over host fields:
homogeneous-projective doubling/addition steps producing line coefficients
(alt_bn128_pairing.cpp:246-323), a Miller loop driven by the static loop
count (:401-451), and the family-specific final exponentiation
(:113-229 for BN; bls12_377_pairing.cpp for BLS12).  Used as the oracle in
pairing tests and for deriving GT golden values.
"""

from __future__ import annotations

class AteParams:
    """Everything the ate pairing needs, host-side."""

    def __init__(self, cd):
        self.cd = cd
        self.kind = cd.pairing.kind
        self.Fq = cd.fq
        self.Fq2 = cd.fq2
        self.Fq6 = cd.fq6
        self.Fq12 = cd.fq12
        self.twist = cd.pairing.twist           # xi in Fq2
        self.twist_type = cd.pairing.twist_type
        self.loop_count = cd.pairing.ate_loop_count
        self.loop_neg = cd.pairing.ate_is_loop_count_neg
        self.z = cd.pairing.final_exponent_z
        self.z_neg = cd.pairing.final_exponent_is_z_neg
        self.two_inv = self.Fq.inv(2)
        # G2 curve coefficient b' (twist_coeff_b)
        self.twist_coeff_b = cd.g2.curve.b
        # untwist-Frobenius-twist constants: psi(x, y) =
        # (x^q * xi^((q-1)/3), y^q * xi^((q-1)/2))
        q = cd.q
        self.mul_by_q_x = self.Fq2.pow(self.twist, (q - 1) // 3)
        self.mul_by_q_y = self.Fq2.pow(self.twist, (q - 1) // 2)


def dbl_step(ap: AteParams, R):
    """Projective doubling step; returns (R', (ell_0, ell_VW, ell_VV)).

    Formulas of alt_bn128_pairing.cpp:246-288 / bls12_377_pairing.cpp:
    240-299 (D-type twists: ell_0 carries xi) and bls12_381_pairing.cpp:
    226-272 (M-type: ell_VW carries xi instead)."""
    F2 = ap.Fq2
    X, Y, Z = R
    A = F2.mul_base(F2.mul(X, Y), ap.two_inv)
    B = F2.sqr(Y)
    C = F2.sqr(Z)
    D = F2.add(C, F2.add(C, C))
    E = F2.mul(ap.twist_coeff_b, D)
    Fv = F2.add(E, F2.add(E, E))
    G = F2.mul_base(F2.add(B, Fv), ap.two_inv)
    H = F2.sub(F2.sqr(F2.add(Y, Z)), F2.add(B, C))
    I = F2.sub(E, B)
    J = F2.sqr(X)
    E2 = F2.sqr(E)
    X3 = F2.mul(A, F2.sub(B, Fv))
    Y3 = F2.sub(F2.sqr(G), F2.add(E2, F2.add(E2, E2)))
    Z3 = F2.mul(B, H)
    ell_VV = F2.add(J, F2.add(J, J))
    if ap.twist_type == "D":
        ell_0 = F2.mul(ap.twist, I)
        ell_VW = F2.neg(H)
    else:
        ell_0 = I
        ell_VW = F2.neg(F2.mul(ap.twist, H))
    return (X3, Y3, Z3), (ell_0, ell_VW, ell_VV)


def add_step(ap: AteParams, base, R):
    """Projective mixed-addition step (alt_bn128_pairing.cpp:290-323 /
    bls12_381_pairing.cpp:274-307)."""
    F2 = ap.Fq2
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
    ell_J = F2.sub(F2.mul(E, x2), F2.mul(D, y2))
    ell_VV = F2.neg(E)
    if ap.twist_type == "D":
        ell_0 = F2.mul(ap.twist, ell_J)
        ell_VW = D
    else:
        ell_0 = ell_J
        ell_VW = F2.mul(ap.twist, D)
    return (X3, Y3, Z3), (ell_0, ell_VW, ell_VV)


def mul_by_q(ap: AteParams, Q):
    """G2 Frobenius endomorphism psi (alt_bn128_g2.cpp:351-356)."""
    F2 = ap.Fq2
    x, y = Q
    return (F2.mul(ap.mul_by_q_x, F2.frobenius(x, 1)),
            F2.mul(ap.mul_by_q_y, F2.frobenius(y, 1)))


def precompute_g2(ap: AteParams, Q):
    """Line-coefficient schedule for affine Q (alt_bn128_pairing.cpp:340-399)."""
    coeffs = []
    R = (Q[0], Q[1], ap.Fq2.one())
    bits = bin(ap.loop_count)[3:]  # skip MSB
    for bit in bits:
        R, c = dbl_step(ap, R)
        coeffs.append(c)
        if bit == "1":
            R, c = add_step(ap, Q, R)
            coeffs.append(c)
    if ap.kind == "bn":
        Q1 = mul_by_q(ap, Q)
        Q2 = mul_by_q(ap, Q1)
        Q2 = (Q2[0], ap.Fq2.neg(Q2[1]))
        if ap.loop_neg:
            R = (R[0], ap.Fq2.neg(R[1]), R[2])
        R, c = add_step(ap, Q1, R)
        coeffs.append(c)
        R, c = add_step(ap, Q2, R)
        coeffs.append(c)
    return coeffs


def mul_by_024(ap: AteParams, f, ell_0, ell_VW, ell_VV):
    """f * Fq12( Fq6(ell_0, 0, ell_VV), Fq6(0, ell_VW, 0) ) via the sparse
    13-Fq2-mul formula (fp12_2over3over2.tcc:315-406)."""
    return ap.Fq12.mul_by_024(f, ell_0, ell_VW, ell_VV)


def mul_by_045(ap: AteParams, f, ell_0, ell_VW, ell_VV):
    """f * Fq12( Fq6(ell_VW, 0, 0), Fq6(0, ell_0, ell_VV) ) via the sparse
    formula (fp12_2over3over2.tcc:280-313) — used by M-type twists."""
    return ap.Fq12.mul_by_045(f, ell_0, ell_VW, ell_VV)


def _sparse_mul(ap: AteParams, f, c, px, py):
    F2 = ap.Fq2
    ell_0, ell_VW, ell_VV = c
    vw = F2.mul_base(ell_VW, py)
    vv = F2.mul_base(ell_VV, px)
    if ap.twist_type == "D":
        return mul_by_024(ap, f, ell_0, vw, vv)
    return mul_by_045(ap, f, ell_0, vw, vv)


def miller_loop(ap: AteParams, P, coeffs):
    """P: affine G1 (host ints). coeffs from precompute_g2."""
    F12 = ap.Fq12
    px, py = P
    f = F12.one()
    idx = 0
    bits = bin(ap.loop_count)[3:]
    for bit in bits:
        f = F12.sqr(f)
        f = _sparse_mul(ap, f, coeffs[idx], px, py)
        idx += 1
        if bit == "1":
            f = _sparse_mul(ap, f, coeffs[idx], px, py)
            idx += 1
    if ap.loop_neg:
        f = F12.inv(f)
    if ap.kind == "bn":
        f = _sparse_mul(ap, f, coeffs[idx], px, py)
        idx += 1
        f = _sparse_mul(ap, f, coeffs[idx], px, py)
        idx += 1
    return f


def double_miller_loop(ap: AteParams, P1, coeffs1, P2, coeffs2):
    """Two Miller loops sharing the f^2 per bit
    (alt_bn128_ate_double_miller_loop, alt_bn128_pairing.cpp:453-522) —
    exactly miller(P1, coeffs1) * miller(P2, coeffs2)."""
    F12 = ap.Fq12
    pairs = [(P1, coeffs1), (P2, coeffs2)]
    f = F12.one()
    idx = 0
    bits = bin(ap.loop_count)[3:]
    for bit in bits:
        f = F12.sqr(f)
        for (px, py), cs in pairs:
            f = _sparse_mul(ap, f, cs[idx], px, py)
        idx += 1
        if bit == "1":
            for (px, py), cs in pairs:
                f = _sparse_mul(ap, f, cs[idx], px, py)
            idx += 1
    if ap.loop_neg:
        f = F12.inv(f)
    if ap.kind == "bn":
        for _ in range(2):
            for (px, py), cs in pairs:
                f = _sparse_mul(ap, f, cs[idx], px, py)
            idx += 1
    return f


def exp_by_neg_z(ap: AteParams, f):
    """f^(-z) in the cyclotomic subgroup: cyclotomic_exp then unitary
    inverse (alt_bn128_pairing.cpp:141-153)."""
    r = ap.Fq12.cyclotomic_exp(f, ap.z)
    if not ap.z_neg:
        r = ap.Fq12.conjugate(r)
    return r


def final_exp_first_chunk(ap: AteParams, f):
    """f^((q^6-1)(q^2+1)) (alt_bn128_pairing.cpp:113-139)."""
    F12 = ap.Fq12
    A = F12.conjugate(f)
    B = F12.inv(f)
    C = F12.mul(A, B)
    D = F12.frobenius(C, 2)
    return F12.mul(D, C)


def final_exp_last_chunk_bn(ap: AteParams, f):
    """Fuentes-Castaneda addition chain with cyclotomic squarings
    (alt_bn128_pairing.cpp:155-229)."""
    F12 = ap.Fq12
    A = exp_by_neg_z(ap, f)
    B = F12.cyclotomic_squared(A)
    C = F12.cyclotomic_squared(B)
    D = F12.mul(C, B)
    E = exp_by_neg_z(ap, D)
    Fv = F12.cyclotomic_squared(E)
    G = exp_by_neg_z(ap, Fv)
    H = F12.conjugate(D)
    I = F12.conjugate(G)
    J = F12.mul(I, E)
    K = F12.mul(J, H)
    L = F12.mul(K, B)
    M = F12.mul(K, E)
    N = F12.mul(M, f)
    O = F12.frobenius(L, 1)
    P = F12.mul(O, N)
    Q = F12.frobenius(K, 2)
    R = F12.mul(Q, P)
    S = F12.conjugate(f)
    T = F12.mul(S, L)
    U = F12.frobenius(T, 3)
    return F12.mul(U, R)


def exp_by_z(ap: AteParams, f):
    r = ap.Fq12.cyclotomic_exp(f, ap.z)
    if ap.z_neg:
        r = ap.Fq12.conjugate(r)
    return r


def final_exp_last_chunk_bls12(ap: AteParams, elt):
    """BLS12 hard part, Algorithm 1 of eprint 2016/130 — the exact chain of
    bls12_377_pairing.cpp:151-215 / bls12_381_pairing.cpp:157-212."""
    F12 = ap.Fq12
    A = F12.conjugate(F12.cyclotomic_squared(elt))  # elt^(-2)
    B = exp_by_z(ap, elt)                      # elt^z
    C = F12.cyclotomic_squared(B)              # elt^(2z)
    D = F12.mul(A, B)                          # elt^(z-2)
    E = exp_by_z(ap, D)                        # elt^(z^2-2z)
    Fv = exp_by_z(ap, E)                       # elt^(z^3-2z^2)
    G = exp_by_z(ap, Fv)                       # elt^(z^4-2z^3)
    H = F12.mul(G, C)                          # elt^(z^4-2z^3+2z)
    I = exp_by_z(ap, H)                        # elt^(z^5-2z^4+2z^2)
    J = F12.conjugate(D)                       # elt^(-z+2)
    K = F12.mul(I, J)
    L = F12.mul(K, elt)
    M = F12.conjugate(elt)
    N = F12.mul(E, elt)
    O = F12.frobenius(N, 3)
    P = F12.mul(H, M)
    Q = F12.frobenius(P, 1)
    R = F12.mul(B, Fv)
    S = F12.frobenius(R, 2)
    T = F12.mul(O, S)
    U = F12.mul(T, Q)
    return F12.mul(U, L)


def final_exponentiation(ap: AteParams, f):
    g = final_exp_first_chunk(ap, f)
    if ap.kind == "bn":
        return final_exp_last_chunk_bn(ap, g)
    if ap.kind == "bls12":
        return final_exp_last_chunk_bls12(ap, g)
    # generic (slow) fallback: g^((q^4-q^2+1)/r)
    q = ap.cd.q
    e = (q**4 - q**2 + 1) // ap.cd.r
    return ap.Fq12.pow(g, e)


def reduced_pairing(ap: AteParams, P, Q):
    """e(P, Q) for affine host points (None not allowed)."""
    coeffs = precompute_g2(ap, Q)
    f = miller_loop(ap, P, coeffs)
    return final_exponentiation(ap, f)
