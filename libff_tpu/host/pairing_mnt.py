"""Host-side MNT4/MNT6 ate + affine-ate pairing oracle.

Exact reimplementation of the reference semantics over host fields:
extended-Jacobian (X, Y, Z, T=Z^2) doubling/addition coefficient schedule
(mnt4_pairing.cpp:400-462 / mnt6_pairing.cpp, identical formulas over the
twist field), the flipped Miller loop with g_RR / g_RQ line values
assembled in GT = twist_field[W]/(W^2 - twist) (mnt4_pairing.cpp:545-603),
the affine-ate variant over NAF digits (mnt4_pairing.cpp:222-380), and the
(q^k/2 - 1)-style final exponentiation with last chunk elt^(w1*q) *
elt^(+-w0) (mnt4_pairing.cpp:113-175; mnt6's first chunk is
(q^3-1)(q+1), mnt6_pairing.cpp:70-110).
"""

from __future__ import annotations

from ..msm.wnaf_host import find_wnaf


class MntParams:
    def __init__(self, cd):
        self.cd = cd
        self.kind = cd.pairing.kind              # 'mnt4' | 'mnt6'
        self.Fq = cd.fq
        self.Ft = cd.fq2 if self.kind == "mnt4" else cd.fq3   # twist field
        self.Fgt = cd.gt                          # Ft[W]/(W^2 - twist-ish)
        self.twist = cd.pairing.twist             # Ft element (U or U-vec)
        self.twist_coeff_a = cd.g2.curve.a
        self.twist_coeff_b = cd.g2.curve.b
        self.coeff_a = cd.g1.curve.a
        self.loop_count = cd.pairing.ate_loop_count
        self.loop_neg = cd.pairing.ate_is_loop_count_neg
        ex = cd.pairing.extra
        self.w0 = ex["final_exponent_last_chunk_abs_of_w0"]
        self.w0_neg = ex["final_exponent_last_chunk_is_w0_neg"]
        self.w1 = ex["final_exponent_last_chunk_w1"]
        self.embed = cd.pairing.embedding_degree


def _emb(Ft, v):
    """Fq element -> Ft element (v, 0, ...)."""
    return (v,) + tuple(0 for _ in range(Ft.d - 1))


# --- ate (projective coefficient schedule) ---------------------------------

def dbl_step(ap: MntParams, R):
    """Extended-Jacobian doubling; returns (R', (c_H, c_4C, c_J, c_L))
    (mnt4_pairing.cpp:400-427)."""
    Ft = ap.Ft
    X, Y, Z, T = R
    A = Ft.sqr(T)
    B = Ft.sqr(X)
    C = Ft.sqr(Y)
    D = Ft.sqr(C)
    E = Ft.sub(Ft.sub(Ft.sqr(Ft.add(X, C)), B), D)
    Fv = Ft.add(Ft.add(Ft.add(B, B), B), Ft.mul(ap.twist_coeff_a, A))
    G = Ft.sqr(Fv)
    X3 = Ft.add(Ft.neg(Ft.add(Ft.add(E, E), Ft.add(E, E))), G)
    Y3 = Ft.add(Ft.neg(Ft.mul_scalar_int(D, 8)),
                Ft.mul(Fv, Ft.sub(Ft.add(E, E), X3)))
    Z3 = Ft.sub(Ft.sub(Ft.sqr(Ft.add(Y, Z)), C), Ft.sqr(Z))
    T3 = Ft.sqr(Z3)
    c_H = Ft.sub(Ft.sub(Ft.sqr(Ft.add(Z3, T)), T3), A)
    c_4C = Ft.add(Ft.add(C, C), Ft.add(C, C))
    c_J = Ft.sub(Ft.sub(Ft.sqr(Ft.add(Fv, T)), G), A)
    c_L = Ft.sub(Ft.sub(Ft.sqr(Ft.add(Fv, X)), G), B)
    return (X3, Y3, Z3, T3), (c_H, c_4C, c_J, c_L)


def add_step(ap: MntParams, base, R):
    """Extended-Jacobian mixed addition; base = (x2, y2, y2^2); returns
    (R', (c_L1, c_RZ)) (mnt4_pairing.cpp:429-462)."""
    Ft = ap.Ft
    X1, Y1, Z1, T1 = R
    x2, y2, y2sq = base
    B = Ft.mul(x2, T1)
    D = Ft.mul(Ft.sub(Ft.sub(Ft.sqr(Ft.add(y2, Z1)), y2sq), T1), T1)
    H = Ft.sub(B, X1)
    I = Ft.sqr(H)
    E = Ft.add(Ft.add(I, I), Ft.add(I, I))
    J = Ft.mul(H, E)
    V = Ft.mul(X1, E)
    L1 = Ft.sub(D, Ft.add(Y1, Y1))
    X3 = Ft.sub(Ft.sub(Ft.sqr(L1), J), Ft.add(V, V))
    Y3 = Ft.sub(Ft.mul(L1, Ft.sub(V, X3)), Ft.mul(Ft.add(Y1, Y1), J))
    Z3 = Ft.sub(Ft.sub(Ft.sqr(Ft.add(Z1, H)), T1), I)
    T3 = Ft.sqr(Z3)
    return (X3, Y3, Z3, T3), (L1, Z3)


def precompute_g1(ap: MntParams, P):
    px, py = P
    return {
        "PX": px, "PY": py,
        "PX_twist": ap.Ft.mul_base(ap.twist, px),
        "PY_twist": ap.Ft.mul_base(ap.twist, py),
    }


def precompute_g2(ap: MntParams, Q):
    Ft = ap.Ft
    qx, qy = Q
    tw_inv = Ft.inv(ap.twist)
    prec = {
        "QX": qx, "QY": qy, "QY2": Ft.sqr(qy),
        "QX_over_twist": Ft.mul(qx, tw_inv),
        "QY_over_twist": Ft.mul(qy, tw_inv),
        "dbl_coeffs": [], "add_coeffs": [],
    }
    R = (qx, qy, Ft.one(), Ft.one())
    base = (qx, qy, prec["QY2"])
    for bit in bin(ap.loop_count)[3:]:
        R, dc = dbl_step(ap, R)
        prec["dbl_coeffs"].append(dc)
        if bit == "1":
            R, ac = add_step(ap, base, R)
            prec["add_coeffs"].append(ac)
    if ap.loop_neg:
        RZ_inv = Ft.inv(R[2])
        RZ2_inv = Ft.sqr(RZ_inv)
        RZ3_inv = Ft.mul(RZ2_inv, RZ_inv)
        mX = Ft.mul(R[0], RZ2_inv)
        mY = Ft.neg(Ft.mul(R[1], RZ3_inv))
        R, ac = add_step(ap, (mX, mY, Ft.sqr(mY)), R)
        prec["add_coeffs"].append(ac)
    return prec


def ate_miller_loop(ap: MntParams, prec_P, prec_Q):
    """Flipped Miller loop (mnt4_pairing.cpp:545-603)."""
    Ft, Fgt = ap.Ft, ap.Fgt
    L1_coeff = Ft.sub(_emb(Ft, prec_P["PX"]), prec_Q["QX_over_twist"])
    f = Fgt.one()
    dbl_idx = add_idx = 0
    for bit in bin(ap.loop_count)[3:]:
        dc = prec_Q["dbl_coeffs"][dbl_idx]
        dbl_idx += 1
        g_RR = (Ft.add(Ft.sub(Ft.neg(dc[1]),
                              Ft.mul(dc[2], prec_P["PX_twist"])), dc[3]),
                Ft.mul(dc[0], prec_P["PY_twist"]))
        f = Fgt.mul(Fgt.sqr(f), g_RR)
        if bit == "1":
            ac = prec_Q["add_coeffs"][add_idx]
            add_idx += 1
            g_RQ = (Ft.mul(ac[1], prec_P["PY_twist"]),
                    Ft.neg(Ft.add(Ft.mul(prec_Q["QY_over_twist"], ac[1]),
                                  Ft.mul(L1_coeff, ac[0]))))
            f = Fgt.mul(f, g_RQ)
    if ap.loop_neg:
        ac = prec_Q["add_coeffs"][add_idx]
        g_RnegR = (Ft.mul(ac[1], prec_P["PY_twist"]),
                   Ft.neg(Ft.add(Ft.mul(prec_Q["QY_over_twist"], ac[1]),
                                 Ft.mul(L1_coeff, ac[0]))))
        f = Fgt.inv(Fgt.mul(f, g_RnegR))
    return f


def ate_double_miller_loop(ap: MntParams, prec_P1, prec_Q1, prec_P2, prec_Q2):
    """Two Miller loops sharing the f^2 per bit
    (mnt4_pairing.cpp:595-672 / mnt6 analogue): exactly
    miller(P1,Q1) * miller(P2,Q2) with half the GT squarings."""
    Ft, Fgt = ap.Ft, ap.Fgt
    pairs = [(prec_P1, prec_Q1), (prec_P2, prec_Q2)]
    L1 = [Ft.sub(_emb(Ft, p["PX"]), q["QX_over_twist"]) for p, q in pairs]
    f = Fgt.one()
    dbl_idx = add_idx = 0
    for bit in bin(ap.loop_count)[3:]:
        gs = []
        for (p, q) in pairs:
            dc = q["dbl_coeffs"][dbl_idx]
            gs.append((Ft.add(Ft.sub(Ft.neg(dc[1]),
                                     Ft.mul(dc[2], p["PX_twist"])), dc[3]),
                       Ft.mul(dc[0], p["PY_twist"])))
        dbl_idx += 1
        f = Fgt.sqr(f)
        for g in gs:
            f = Fgt.mul(f, g)
        if bit == "1":
            for k, (p, q) in enumerate(pairs):
                ac = q["add_coeffs"][add_idx]
                g = (Ft.mul(ac[1], p["PY_twist"]),
                     Ft.neg(Ft.add(Ft.mul(q["QY_over_twist"], ac[1]),
                                   Ft.mul(L1[k], ac[0]))))
                f = Fgt.mul(f, g)
            add_idx += 1
    if ap.loop_neg:
        for k, (p, q) in enumerate(pairs):
            ac = q["add_coeffs"][add_idx]
            g = (Ft.mul(ac[1], p["PY_twist"]),
                 Ft.neg(Ft.add(Ft.mul(q["QY_over_twist"], ac[1]),
                               Ft.mul(L1[k], ac[0]))))
            f = Fgt.mul(f, g)
        f = Fgt.inv(f)
    return f


# --- affine ate ------------------------------------------------------------

def affine_ate_precompute_g1(ap: MntParams, P):
    px, py = P
    return {
        "PX": px, "PY": py,
        "PY_twist_squared": ap.Ft.mul_base(ap.Ft.sqr(ap.twist), py),
    }


def affine_ate_precompute_g2(ap: MntParams, Q):
    Ft = ap.Ft
    qx, qy = Q
    prec = {"QX": qx, "QY": qy, "coeffs": []}
    RX, RY = qx, qy
    naf = find_wnaf(1, ap.loop_count)
    seen = False
    for i in range(len(naf) - 1, -1, -1):
        if not seen:
            seen = naf[i] != 0
            continue
        oRX, oRY = RX, RY
        rx2 = Ft.sqr(oRX)
        gamma = Ft.mul(
            Ft.add(Ft.add(Ft.add(rx2, rx2), rx2), ap.twist_coeff_a),
            Ft.inv(Ft.add(oRY, oRY)))
        prec["coeffs"].append({
            "old_RX": oRX, "old_RY": oRY, "gamma": gamma,
            "gamma_twist": Ft.mul(gamma, ap.twist),
            "gamma_X": Ft.mul(gamma, oRX)})
        RX = Ft.sub(Ft.sqr(gamma), Ft.add(oRX, oRX))
        RY = Ft.sub(Ft.mul(gamma, Ft.sub(oRX, RX)), oRY)
        if naf[i] != 0:
            oRX, oRY = RX, RY
            if naf[i] > 0:
                gamma = Ft.mul(Ft.sub(oRY, qy), Ft.inv(Ft.sub(oRX, qx)))
            else:
                gamma = Ft.mul(Ft.add(oRY, qy), Ft.inv(Ft.sub(oRX, qx)))
            prec["coeffs"].append({
                "old_RX": oRX, "old_RY": oRY, "gamma": gamma,
                "gamma_twist": Ft.mul(gamma, ap.twist),
                "gamma_X": Ft.mul(gamma, qx)})
            RX = Ft.sub(Ft.sqr(gamma), Ft.add(oRX, qx))
            RY = Ft.sub(Ft.mul(gamma, Ft.sub(oRX, RX)), oRY)
    return prec


def affine_ate_miller_loop(ap: MntParams, prec_P, prec_Q):
    """NAF-driven affine-ate loop with the sparse line multiplications:
    mul_by_023 for MNT4 (mnt4_pairing.cpp:344-361), mul_by_2345 for MNT6
    (mnt6_pairing.cpp:349-366) — the line's GT c0 component is structurally
    sparse (PY * twist^2 has only one nonzero base coefficient)."""
    Ft, Fgt = ap.Ft, ap.Fgt
    sparse_mul = Fgt.mul_by_023 if ap.kind == "mnt4" else Fgt.mul_by_2345
    f = Fgt.one()
    naf = find_wnaf(1, ap.loop_count)
    idx = 0
    seen = False
    for i in range(len(naf) - 1, -1, -1):
        if not seen:
            seen = naf[i] != 0
            continue
        c = prec_Q["coeffs"][idx]
        idx += 1
        g_RR = (prec_P["PY_twist_squared"],
                Ft.sub(Ft.add(Ft.neg(Ft.mul_base(c["gamma_twist"],
                                                 prec_P["PX"])),
                              c["gamma_X"]), c["old_RY"]))
        f = sparse_mul(Fgt.sqr(f), g_RR)
        if naf[i] != 0:
            c = prec_Q["coeffs"][idx]
            idx += 1
            qy_term = prec_Q["QY"] if naf[i] > 0 else Ft.neg(prec_Q["QY"])
            g_RQ = (prec_P["PY_twist_squared"],
                    Ft.sub(Ft.add(Ft.neg(Ft.mul_base(c["gamma_twist"],
                                                     prec_P["PX"])),
                                  c["gamma_X"]), qy_term))
            f = sparse_mul(f, g_RQ)
    return f


# --- final exponentiation --------------------------------------------------

def final_exponentiation(ap: MntParams, f):
    Fgt = ap.Fgt
    f_inv = Fgt.inv(f)
    if ap.kind == "mnt4":
        # first chunk: elt^(q^2 - 1) (mnt4_pairing.cpp:113-130)
        def first(e, e_inv):
            return Fgt.mul(Fgt.frobenius(e, 2), e_inv)
    else:
        # first chunk: elt^((q^3 - 1)(q + 1)) (mnt6_pairing.cpp:70-96)
        def first(e, e_inv):
            t = Fgt.mul(Fgt.frobenius(e, 3), e_inv)
            return Fgt.mul(Fgt.frobenius(t, 1), t)

    elt = first(f, f_inv)
    elt_inv = first(f_inv, f)
    # last chunk: elt^(w1*q) * elt^(+-w0), via NAF cyclotomic_exp
    # (mnt4_pairing.cpp:173-186 / mnt6_pairing.cpp:174-187)
    w1_part = Fgt.cyclotomic_exp(Fgt.frobenius(elt, 1), ap.w1)
    w0_base = elt_inv if ap.w0_neg else elt
    w0_part = Fgt.cyclotomic_exp(w0_base, ap.w0)
    return Fgt.mul(w1_part, w0_part)


def reduced_pairing(ap: MntParams, P, Q):
    f = ate_miller_loop(ap, precompute_g1(ap, P), precompute_g2(ap, Q))
    return final_exponentiation(ap, f)


def affine_reduced_pairing(ap: MntParams, P, Q):
    f = affine_ate_miller_loop(
        ap, affine_ate_precompute_g1(ap, P), affine_ate_precompute_g2(ap, Q))
    return final_exponentiation(ap, f)
