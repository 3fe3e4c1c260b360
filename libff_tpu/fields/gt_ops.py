"""Cyclotomic-subgroup and sparse GT multiplications, written once against
the generic tower-field API.

These are the hand-tuned formulas the reference keeps per tower class:

  * Fq12 Granger-Scott cyclotomic squaring
        /root/reference/libff/algebra/fields/fp12_2over3over2.tcc:209-278
  * Fq12 sparse mul_by_024 / mul_by_045 (Miller-loop line multiplications)
        fp12_2over3over2.tcc:280-406
  * Fq4  mul_by_023, cyclotomic squaring      fp4.tcc:113-231
  * Fq6_2over3 mul_by_2345, cyclotomic squaring   fp6_2over3.tcc:115-300
  * cyclotomic_exp: plain bits for Fq12 (fp12...tcc:408-425), NAF with the
    unitary inverse for Fq4/Fq6_2over3 (fp4.tcc:197-224)

Every function takes the *field object* as its first argument and works for
all three interpreters of the tower API (the same trick as curves/formulas.py):

  * host oracle fields      (host/field.py Ext; elements = nested tuples)
  * formula-VM symbolic     (vm.ExtSym; elements = nested register tuples)
  * device array fields     (fields/tower.py ExtField; elements = arrays,
                             which support the same [i] coefficient indexing)

Elements of the cyclotomic subgroup satisfy f^(q^(k/2)+1) == 1 (after the
easy chunk of the final exponentiation), where the inverse is the cheap
conjugate and squaring has the special structure these formulas exploit.
"""

from __future__ import annotations


# ---------------------------------------------------------------------------
# Fq12 = Fq6_3over2[w]/(w^2 - v)   (BN / BLS12 GT)
# ---------------------------------------------------------------------------

def fq12_cyclotomic_squared(F12, el):
    """Granger-Scott squaring in the cyclotomic subgroup of Fq12
    (fp12_2over3over2.tcc:209-278).  ~3 Fq4 squarings instead of a full
    Fq12 square."""
    F6 = F12.B
    F2 = F6.B
    nr = F6.mul_by_nr                    # x -> xi * x  (my_Fp6::non_residue)

    z0, z4, z3 = el[0][0], el[0][1], el[0][2]
    z2, z1, z5 = el[1][0], el[1][1], el[1][2]

    def fp4_sq(a, b):
        # (a + b*y)^2 with y^2 = xi: complex squaring over Fq2
        tmp = F2.mul(a, b)
        t0 = F2.sub(
            F2.sub(F2.mul(F2.add(a, b), F2.add(a, nr(b))), tmp), nr(tmp))
        t1 = F2.add(tmp, tmp)
        return t0, t1

    t0, t1 = fp4_sq(z0, z1)
    t2, t3 = fp4_sq(z2, z3)
    t4, t5 = fp4_sq(z4, z5)

    # z0 = 3*t0 - 2*z0 ; z1 = 3*t1 + 2*z1 ; ...
    z0 = F2.add(F2.double(F2.sub(t0, z0)), t0)
    z1 = F2.add(F2.double(F2.add(t1, z1)), t1)
    tmp = nr(t5)
    z2 = F2.add(F2.double(F2.add(tmp, z2)), tmp)
    z3 = F2.add(F2.double(F2.sub(t4, z3)), t4)
    z4 = F2.add(F2.double(F2.sub(t2, z4)), t2)
    z5 = F2.add(F2.double(F2.add(t3, z5)), t3)

    return F12.from_coeffs([F6.from_coeffs([z0, z4, z3]),
                            F6.from_coeffs([z2, z1, z5])])


def fq12_mul_by_024(F12, el, ell_0, ell_VW, ell_VV):
    """this * Fq12( Fq6(x0, 0, x2), Fq6(0, x4, 0) ) with x0 = ell_0,
    x2 = ell_VV, x4 = ell_VW (fp12_2over3over2.tcc:315-406) — the sparse
    line multiplication of D-twist Miller loops.  13 Fq2 muls."""
    F6 = F12.B
    F2 = F6.B
    nr = F6.mul_by_nr

    z0, z1, z2 = el[0][0], el[0][1], el[0][2]
    z3, z4, z5 = el[1][0], el[1][1], el[1][2]
    x0, x2, x4 = ell_0, ell_VV, ell_VW

    z0_x0 = F2.mul(z0, x0)
    z1_x2 = F2.mul(z1, x2)
    z4_x4 = F2.mul(z4, x4)
    out_z0 = F2.add(nr(F2.add(z1_x2, z4_x4)), z0_x0)
    S = z1_x2

    z2_x2 = F2.mul(z2, x2)
    z5_x4 = F2.mul(z5, x4)
    z1_x0 = F2.mul(z1, x0)
    out_z1 = F2.add(nr(F2.add(z5_x4, z2_x2)), z1_x0)
    S = F2.add(F2.add(S, z1_x0), z5_x4)

    z0_x2_plus_z2_x0 = F2.sub(
        F2.sub(F2.mul(F2.add(z0, z2), F2.add(x0, x2)), z0_x0), z2_x2)
    z3_x4 = F2.mul(z3, x4)
    out_z2 = F2.add(z0_x2_plus_z2_x0, z3_x4)
    S = F2.add(S, z3_x4)

    z2_x4_plus_z4_x2 = F2.sub(
        F2.sub(F2.mul(F2.add(z2, z4), F2.add(x2, x4)), z2_x2), z4_x4)
    z3_x0 = F2.mul(z3, x0)
    out_z3 = F2.add(nr(z2_x4_plus_z4_x2), z3_x0)
    S = F2.add(S, z3_x0)

    z0_x4_plus_z4_x0 = F2.sub(
        F2.sub(F2.mul(F2.add(z0, z4), F2.add(x0, x4)), z0_x0), z4_x4)
    z5_x2 = F2.mul(z5, x2)
    out_z4 = F2.add(nr(z5_x2), z0_x4_plus_z4_x0)
    S = F2.add(S, z5_x2)

    out_z5 = F2.sub(
        F2.mul(F2.add(F2.add(z1, z3), z5), F2.add(F2.add(x0, x2), x4)), S)

    return F12.from_coeffs([F6.from_coeffs([out_z0, out_z1, out_z2]),
                            F6.from_coeffs([out_z3, out_z4, out_z5])])


def fq12_mul_by_045(F12, el, ell_0, ell_VW, ell_VV):
    """this * Fq12( Fq6(x0, 0, 0), Fq6(0, x4, x5) ) with x0 = ell_VW,
    x4 = ell_0, x5 = ell_VV (fp12_2over3over2.tcc:280-313) — the sparse
    line multiplication of M-twist Miller loops."""
    F6 = F12.B
    F2 = F6.B
    nr = F6.mul_by_nr

    z0, z1, z2 = el[0][0], el[0][1], el[0][2]
    z3, z4, z5 = el[1][0], el[1][1], el[1][2]
    x0, x4, x5 = ell_VW, ell_0, ell_VV

    tmp1 = nr(x4)
    tmp2 = nr(x5)

    t0 = F2.add(F2.add(F2.mul(x0, z0), F2.mul(tmp1, z4)), F2.mul(tmp2, z3))
    t1 = F2.add(F2.add(F2.mul(x0, z1), F2.mul(tmp1, z5)), F2.mul(tmp2, z4))
    t2 = F2.add(F2.add(F2.mul(x0, z2), F2.mul(x4, z3)), F2.mul(tmp2, z5))
    t3 = F2.add(F2.add(F2.mul(x0, z3), F2.mul(tmp1, z2)), F2.mul(tmp2, z1))
    t4 = F2.add(F2.add(F2.mul(x0, z4), F2.mul(x4, z0)), F2.mul(tmp2, z2))
    t5 = F2.add(F2.add(F2.mul(x0, z5), F2.mul(x4, z1)), F2.mul(x5, z0))

    return F12.from_coeffs([F6.from_coeffs([t0, t1, t2]),
                            F6.from_coeffs([t3, t4, t5])])


# ---------------------------------------------------------------------------
# Fq4 = Fq2[y]/(y^2 - X)   (MNT4 GT); the non-residue is the Fq2 element X
# ---------------------------------------------------------------------------

def fq4_mul_by_023(F4, el, other):
    """this * other where other.coeffs[0].coeffs[1] == 0 (fp4.tcc:113-128):
    Karatsuba with the degenerate a*A product done as two base muls."""
    F2 = F4.B
    Fp = F2.B
    a, b = el[0], el[1]
    A, Bc = other[0], other[1]
    aA = F2.from_coeffs([Fp.mul(a[0], A[0]), Fp.mul(a[1], A[0])])
    bB = F2.mul(b, Bc)
    beta_bB = F4.mul_by_nr(bB)
    c0 = F2.add(aA, beta_bB)
    c1 = F2.sub(F2.sub(F2.mul(F2.add(a, b), F2.add(A, Bc)), aA), bB)
    return F4.from_coeffs([c0, c1])


def fq4_cyclotomic_squared(F4, el):
    """fp4.tcc:181-195."""
    F2 = F4.B
    a, b = el[0], el[1]
    A = F2.sqr(b)
    Bv = F2.add(b, a)
    C = F2.sub(F2.sqr(Bv), A)
    D = F4.mul_by_nr(A)
    E = F2.sub(C, D)
    one = F2.one()
    Fv = F2.add(F2.add(D, D), one)
    G = F2.sub(E, one)
    return F4.from_coeffs([Fv, G])


# ---------------------------------------------------------------------------
# Fq6_2over3 = Fq3[y]/(y^2 - X)   (MNT6 / Edwards / BW6-761 GT)
# ---------------------------------------------------------------------------

def fq6_2over3_mul_by_2345(F6, el, other):
    """this * other where other.coeffs[0].coeffs[0] == 0 and
    other.coeffs[0].coeffs[1] == 0 (fp6_2over3.tcc:146-166)."""
    F3 = F6.B
    Fp = F3.B
    a, b = el[0], el[1]
    A, Bc = other[0], other[1]
    # a * A with A = (0, 0, A2):  nr * (a1*A2, a2*A2), a0*A2
    aA = F3.from_coeffs([F3.mul_by_nr(Fp.mul(a[1], A[2])),
                         F3.mul_by_nr(Fp.mul(a[2], A[2])),
                         Fp.mul(a[0], A[2])])
    bB = F3.mul(b, Bc)
    beta_bB = F6.mul_by_nr(bB)
    c0 = F3.add(aA, beta_bB)
    c1 = F3.sub(F3.sub(F3.mul(F3.add(a, b), F3.add(A, Bc)), aA), bB)
    return F6.from_coeffs([c0, c1])


def fq6_2over3_mul_by_045(F6, el, ell_0, ell_VW, ell_VV):
    """this * Fq6( Fq3(x0, 0, 0), Fq3(0, x4, x5) ) with x0 = ell_VW,
    x4 = ell_0, x5 = ell_VV — all Fp scalars (fp6_2over3.tcc:106-145);
    the sparse line multiplication of the BW6-761 Miller loops."""
    F3 = F6.B
    Fp = F3.B
    nr = F3.mul_by_nr

    z0, z1, z2 = el[0][0], el[0][1], el[0][2]
    z3, z4, z5 = el[1][0], el[1][1], el[1][2]
    x0, x4, x5 = ell_VW, ell_0, ell_VV

    tmp1 = nr(x4)
    tmp2 = nr(x5)

    t0 = Fp.add(Fp.add(Fp.mul(x0, z0), Fp.mul(tmp1, z4)), Fp.mul(tmp2, z3))
    t1 = Fp.add(Fp.add(Fp.mul(x0, z1), Fp.mul(tmp1, z5)), Fp.mul(tmp2, z4))
    t2 = Fp.add(Fp.add(Fp.mul(x0, z2), Fp.mul(x4, z3)), Fp.mul(tmp2, z5))
    t3 = Fp.add(Fp.add(Fp.mul(x0, z3), Fp.mul(tmp1, z2)), Fp.mul(tmp2, z1))
    t4 = Fp.add(Fp.add(Fp.mul(x0, z4), Fp.mul(x4, z0)), Fp.mul(tmp2, z2))
    t5 = Fp.add(Fp.add(Fp.mul(x0, z5), Fp.mul(x4, z1)), Fp.mul(x5, z0))

    return F6.from_coeffs([F3.from_coeffs([t0, t1, t2]),
                           F3.from_coeffs([t3, t4, t5])])


def fq6_2over3_cyclotomic_squared(F6, el):
    """fp6_2over3.tcc:220-275: the element is viewed through three virtual
    Fq2 = Fp[i]/(i^2 - nr3) pieces (nr3 = the Fq3 non-residue, which the
    reference assigns to my_Fp2::non_residue, mnt6_init.cpp:189)."""
    F3 = F6.B
    Fp = F3.B
    nr = F3.mul_by_nr                  # Fp scalar -> nr3 * scalar

    a_a, a_b = el[0][0], el[1][1]
    b_a, b_b = el[1][0], el[0][2]
    c_a, c_b = el[0][1], el[1][2]

    def sq2(x, y):
        # complex Fq2 squaring over (Fp, nr3)
        xy = Fp.mul(x, y)
        c0 = Fp.sub(Fp.sub(Fp.mul(Fp.add(x, y), Fp.add(x, nr(y))), xy),
                    nr(xy))
        c1 = Fp.add(xy, xy)
        return c0, c1

    asq_a, asq_b = sq2(a_a, a_b)
    bsq_a, bsq_b = sq2(b_a, b_b)
    csq_a, csq_b = sq2(c_a, c_b)

    # A = 3*a^2 - 2*conj(a), etc.
    A_a = Fp.add(Fp.double(Fp.sub(asq_a, a_a)), asq_a)
    A_b = Fp.add(Fp.double(Fp.add(asq_b, a_b)), asq_b)
    B_tmp = nr(csq_b)
    B_a = Fp.add(Fp.double(Fp.add(B_tmp, b_a)), B_tmp)
    B_b = Fp.add(Fp.double(Fp.sub(csq_a, b_b)), csq_a)
    C_a = Fp.add(Fp.double(Fp.sub(bsq_a, c_a)), bsq_a)
    C_b = Fp.add(Fp.double(Fp.add(bsq_b, c_b)), bsq_b)

    return F6.from_coeffs([F3.from_coeffs([A_a, C_a, B_b]),
                           F3.from_coeffs([B_a, A_b, C_b])])


# ---------------------------------------------------------------------------
# dispatch + cyclotomic exponentiation
# ---------------------------------------------------------------------------

def _tower_shape(F):
    """(d, base_degree) of the top extension."""
    return F.d, F.degree // F.d


def cyclotomic_squared(F, el):
    """Shape-dispatching cyclotomic squaring for any even GT tower."""
    d, bdeg = _tower_shape(F)
    assert d == 2, "cyclotomic subgroup needs a quadratic top extension"
    if bdeg == 6 and F.B.d == 3 and F.B.B.d == 2:
        return fq12_cyclotomic_squared(F, el)
    if bdeg == 2:
        return fq4_cyclotomic_squared(F, el)
    if bdeg == 3:
        return fq6_2over3_cyclotomic_squared(F, el)
    return F.sqr(el)                   # fallback: plain squaring


def unitary_inverse(F, el):
    """Conjugate — the inverse on the cyclotomic subgroup
    (fp12_2over3over2.tcc:200-206)."""
    return F.from_coeffs([el[0], F.B.neg(el[1])])


def cyclotomic_exp(F, el, e: int, *, naf: bool = None):
    """el^e using cyclotomic squarings.  e is a static host integer.

    naf=False (Fq12 reference semantics, fp12...tcc:408-425): plain
    square-and-multiply over the bits of |e|.
    naf=True (Fq4/Fq6_2over3 semantics, fp4.tcc:197-224): signed NAF digits
    with the unitary inverse for negative digits.
    Negative e maps to the conjugate of el^|e| (the elements are unitary).
    """
    if naf is None:
        naf = F.degree != 12
    neg = e < 0
    e = abs(e)
    if e == 0:
        return F.one()
    if naf:
        digs = _naf(e)
        inv = unitary_inverse(F, el)
        acc = None
        for d in reversed(digs):
            if acc is not None:
                acc = cyclotomic_squared(F, acc)
            if d == 1:
                acc = el if acc is None else F.mul(acc, el)
            elif d == -1:
                acc = inv if acc is None else F.mul(acc, inv)
        res = acc
    else:
        res = el
        for bit in bin(e)[3:]:
            res = cyclotomic_squared(F, res)
            if bit == "1":
                res = F.mul(res, el)
    return unitary_inverse(F, res) if neg else res


def _naf(e: int):
    """Non-adjacent form, lowest digit first (wnaf.tcc:23-62, w = 1)."""
    digs = []
    while e:
        if e & 1:
            d = 2 - (e & 3)
            e -= d
        else:
            d = 0
        digs.append(d)
        e >>= 1
    return digs
