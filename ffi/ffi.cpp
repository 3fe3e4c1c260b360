/* Native exact curve arithmetic backing ffi.h.
 *
 * From-scratch C++17: fixed-capacity little-endian 64-bit-limb big
 * integers with __int128 products, CIOS Montgomery multiplication (the
 * same algorithm family as the portable spec in the reference's
 * fp.tcc:204-227, independently implemented), Jacobian short-Weierstrass
 * group law with general coeff_a, and double-and-add scalar
 * multiplication.  Curve constants come from ffi_params.h, generated from
 * the test-verified Python curve definitions.
 */

#include "ffi.h"
#include "ffi_params.h"

#include <cstring>

namespace {

constexpr int MAXL = 12; /* 768 bits */

struct FpCtx {
    int n;
    uint64_t mod[MAXL];
    uint64_t r2[MAXL];
    uint64_t inv; /* -mod^-1 mod 2^64 */
};

typedef uint64_t fe[MAXL]; /* field element, Montgomery form */

void fe_zero(const FpCtx &C, fe r) {
    for (int i = 0; i < C.n; i++) r[i] = 0;
}

bool fe_is_zero(const FpCtx &C, const fe a) {
    uint64_t acc = 0;
    for (int i = 0; i < C.n; i++) acc |= a[i];
    return acc == 0;
}

bool fe_eq(const FpCtx &C, const fe a, const fe b) {
    uint64_t acc = 0;
    for (int i = 0; i < C.n; i++) acc |= a[i] ^ b[i];
    return acc == 0;
}

void fe_copy(const FpCtx &C, fe r, const fe a) {
    for (int i = 0; i < C.n; i++) r[i] = a[i];
}

/* r = a + b mod p */
void fe_add(const FpCtx &C, fe r, const fe a, const fe b) {
    unsigned __int128 c = 0;
    uint64_t t[MAXL];
    for (int i = 0; i < C.n; i++) {
        c += (unsigned __int128)a[i] + b[i];
        t[i] = (uint64_t)c;
        c >>= 64;
    }
    /* conditional subtract p */
    uint64_t borrow = 0;
    uint64_t s[MAXL];
    for (int i = 0; i < C.n; i++) {
        unsigned __int128 d =
            (unsigned __int128)t[i] - C.mod[i] - borrow;
        s[i] = (uint64_t)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    bool keep_sub = (c != 0) || (borrow == 0);
    for (int i = 0; i < C.n; i++) r[i] = keep_sub ? s[i] : t[i];
}

/* r = a - b mod p */
void fe_sub(const FpCtx &C, fe r, const fe a, const fe b) {
    uint64_t borrow = 0;
    uint64_t t[MAXL];
    for (int i = 0; i < C.n; i++) {
        unsigned __int128 d = (unsigned __int128)a[i] - b[i] - borrow;
        t[i] = (uint64_t)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    if (borrow) {
        unsigned __int128 c = 0;
        for (int i = 0; i < C.n; i++) {
            c += (unsigned __int128)t[i] + C.mod[i];
            t[i] = (uint64_t)c;
            c >>= 64;
        }
    }
    for (int i = 0; i < C.n; i++) r[i] = t[i];
}

/* CIOS Montgomery multiply: r = a * b * R^-1 mod p */
void fe_mul(const FpCtx &C, fe r, const fe a, const fe b) {
    uint64_t t[MAXL + 2] = {0};
    const int n = C.n;
    for (int i = 0; i < n; i++) {
        unsigned __int128 c = 0;
        for (int j = 0; j < n; j++) {
            c += (unsigned __int128)a[i] * b[j] + t[j];
            t[j] = (uint64_t)c;
            c >>= 64;
        }
        c += t[n];
        t[n] = (uint64_t)c;
        t[n + 1] = (uint64_t)(c >> 64);

        uint64_t m = t[0] * C.inv;
        c = (unsigned __int128)m * C.mod[0] + t[0];
        c >>= 64;
        for (int j = 1; j < n; j++) {
            c += (unsigned __int128)m * C.mod[j] + t[j];
            t[j - 1] = (uint64_t)c;
            c >>= 64;
        }
        c += t[n];
        t[n - 1] = (uint64_t)c;
        t[n] = t[n + 1] + (uint64_t)(c >> 64);
        t[n + 1] = 0;
    }
    /* conditional subtract */
    uint64_t borrow = 0;
    uint64_t s[MAXL];
    for (int i = 0; i < n; i++) {
        unsigned __int128 d = (unsigned __int128)t[i] - C.mod[i] - borrow;
        s[i] = (uint64_t)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    bool keep_sub = t[n] || !borrow;
    for (int i = 0; i < n; i++) r[i] = keep_sub ? s[i] : t[i];
}

void fe_sqr(const FpCtx &C, fe r, const fe a) { fe_mul(C, r, a, a); }

/* plain (non-Montgomery) <-> Montgomery */
void fe_to_mont(const FpCtx &C, fe r, const fe plain) {
    fe_mul(C, r, plain, C.r2);
}

void fe_from_mont(const FpCtx &C, fe r, const fe a) {
    fe one = {0};
    one[0] = 1;
    fe_mul(C, r, a, one);
}

/* Fermat inverse via square-and-multiply over p - 2 */
void fe_inv(const FpCtx &C, fe r, const fe a) {
    /* exponent = p - 2 */
    uint64_t e[MAXL];
    uint64_t borrow = 0;
    for (int i = 0; i < C.n; i++) {
        unsigned __int128 d =
            (unsigned __int128)C.mod[i] - (i == 0 ? 2 : 0) - borrow;
        e[i] = (uint64_t)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    /* acc = 1 in Montgomery form = R mod p = to_mont(1) */
    fe acc, base, one_plain = {0};
    one_plain[0] = 1;
    fe_to_mont(C, acc, one_plain);
    fe_copy(C, base, a);
    for (int i = 0; i < C.n * 64; i++) {
        if ((e[i / 64] >> (i % 64)) & 1) fe_mul(C, acc, acc, base);
        fe_sqr(C, base, base);
    }
    fe_copy(C, r, acc);
}

/* ---- curve context -------------------------------------------------- */

struct CurveCtx {
    FpCtx fq;
    int fr_limbs;
    fe a;      /* Montgomery */
    fe b;      /* Montgomery */
    fe gx, gy; /* Montgomery affine generator */
    bool a_is_zero;
};

struct Jac {
    fe X, Y, Z;
};

void jac_zero(const CurveCtx &E, Jac &P) {
    fe_zero(E.fq, P.X);
    fe_zero(E.fq, P.Z);
    fe one = {0};
    one[0] = 1;
    fe_to_mont(E.fq, P.Y, one);
}

bool jac_is_zero(const CurveCtx &E, const Jac &P) {
    return fe_is_zero(E.fq, P.Z);
}

/* dbl-2009-l generalized for a != 0 (same formula family the TPU side
 * uses; see curves/formulas.py) */
void jac_dbl(const CurveCtx &E, Jac &R, const Jac &P) {
    const FpCtx &C = E.fq;
    if (jac_is_zero(E, P)) { R = P; return; }
    fe A, B, Cc, D, Ee, F, t, z2;
    fe_sqr(C, A, P.X);
    fe_sqr(C, B, P.Y);
    fe_sqr(C, Cc, B);
    fe_add(C, t, P.X, B);
    fe_sqr(C, t, t);
    fe_sub(C, t, t, A);
    fe_sub(C, t, t, Cc);
    fe_add(C, D, t, t);
    fe_add(C, Ee, A, A);
    fe_add(C, Ee, Ee, A);
    if (!E.a_is_zero) {
        fe z4;
        fe_sqr(C, z2, P.Z);
        fe_sqr(C, z4, z2);
        fe_mul(C, z4, z4, E.a);
        fe_add(C, Ee, Ee, z4);
    }
    fe_sqr(C, F, Ee);
    Jac O;
    fe_add(C, t, D, D);
    fe_sub(C, O.X, F, t);
    fe_sub(C, t, D, O.X);
    fe_mul(C, t, Ee, t);
    fe c8;
    fe_add(C, c8, Cc, Cc);
    fe_add(C, c8, c8, c8);
    fe_add(C, c8, c8, c8);
    fe_sub(C, O.Y, t, c8);
    fe_mul(C, t, P.Y, P.Z);
    fe_add(C, O.Z, t, t);
    R = O;
}

/* add-2007-bl with special-case handling */
void jac_add(const CurveCtx &E, Jac &R, const Jac &P, const Jac &Q) {
    const FpCtx &C = E.fq;
    if (jac_is_zero(E, P)) { R = Q; return; }
    if (jac_is_zero(E, Q)) { R = P; return; }
    fe z1z1, z2z2, u1, u2, s1, s2, t;
    fe_sqr(C, z1z1, P.Z);
    fe_sqr(C, z2z2, Q.Z);
    fe_mul(C, u1, P.X, z2z2);
    fe_mul(C, u2, Q.X, z1z1);
    fe_mul(C, t, Q.Z, z2z2);
    fe_mul(C, s1, P.Y, t);
    fe_mul(C, t, P.Z, z1z1);
    fe_mul(C, s2, Q.Y, t);
    fe h, rr;
    fe_sub(C, h, u2, u1);
    fe_sub(C, rr, s2, s1);
    if (fe_is_zero(C, h)) {
        if (fe_is_zero(C, rr)) { jac_dbl(E, R, P); return; }
        jac_zero(E, R);
        return;
    }
    fe_add(C, rr, rr, rr);
    fe i, j, v;
    fe_add(C, i, h, h);
    fe_sqr(C, i, i);
    fe_mul(C, j, h, i);
    fe_mul(C, v, u1, i);
    Jac O;
    fe_sqr(C, t, rr);
    fe_sub(C, t, t, j);
    fe_sub(C, t, t, v);
    fe_sub(C, O.X, t, v);
    fe_sub(C, t, v, O.X);
    fe_mul(C, t, rr, t);
    fe s1j;
    fe_mul(C, s1j, s1, j);
    fe_add(C, s1j, s1j, s1j);
    fe_sub(C, O.Y, t, s1j);
    fe_add(C, t, P.Z, Q.Z);
    fe_sqr(C, t, t);
    fe_sub(C, t, t, z1z1);
    fe_sub(C, t, t, z2z2);
    fe_mul(C, O.Z, t, h);
    R = O;
}

void jac_scalar_mul(const CurveCtx &E, Jac &R, const Jac &P,
                    const uint8_t *scalar_be, int scalar_bytes) {
    Jac acc;
    jac_zero(E, acc);
    for (int i = 0; i < scalar_bytes * 8; i++) {
        jac_dbl(E, acc, acc);
        int byte = i / 8, bit = 7 - (i % 8);
        if ((scalar_be[byte] >> bit) & 1) jac_add(E, acc, acc, P);
    }
    R = acc;
}

void jac_to_affine(const CurveCtx &E, fe x, fe y, const Jac &P) {
    const FpCtx &C = E.fq;
    if (jac_is_zero(E, P)) { fe_zero(C, x); fe_zero(C, y); return; }
    fe zi, zi2, zi3;
    fe_inv(C, zi, P.Z);
    fe_sqr(C, zi2, zi);
    fe_mul(C, zi3, zi2, zi);
    fe_mul(C, x, P.X, zi2);
    fe_mul(C, y, P.Y, zi3);
}

/* ---- buffer codecs (big-endian plain bytes <-> Montgomery fe) ------- */

void fe_from_be(const FpCtx &C, fe r, const uint8_t *be) {
    fe plain;
    fe_zero(C, plain);
    for (int i = 0; i < C.n * 8; i++)
        plain[i / 8] |= (uint64_t)be[C.n * 8 - 1 - i] << (8 * (i % 8));
    fe_to_mont(C, r, plain);
}

void fe_to_be(const FpCtx &C, uint8_t *be, const fe a) {
    fe plain;
    fe_from_mont(C, plain, a);
    for (int i = 0; i < C.n * 8; i++)
        be[C.n * 8 - 1 - i] = (uint8_t)(plain[i / 8] >> (8 * (i % 8)));
}

bool buf_is_zero(const uint8_t *p, size_t n) {
    uint8_t acc = 0;
    for (size_t i = 0; i < n; i++) acc |= p[i];
    return acc == 0;
}

/* affine buffer -> Jacobian; (0,0) encodes identity */
void point_from_buf(const CurveCtx &E, Jac &P, const uint8_t *buf) {
    size_t fqb = (size_t)E.fq.n * 8;
    if (buf_is_zero(buf, 2 * fqb)) { jac_zero(E, P); return; }
    fe_from_be(E.fq, P.X, buf);
    fe_from_be(E.fq, P.Y, buf + fqb);
    fe one = {0};
    one[0] = 1;
    fe_to_mont(E.fq, P.Z, one);
}

void point_to_buf(const CurveCtx &E, uint8_t *buf, const Jac &P) {
    size_t fqb = (size_t)E.fq.n * 8;
    if (jac_is_zero(E, P)) { memset(buf, 0, 2 * fqb); return; }
    fe x, y;
    jac_to_affine(E, x, y, P);
    fe_to_be(E.fq, buf, x);
    fe_to_be(E.fq, buf + fqb, y);
}

bool point_on_curve(const CurveCtx &E, const uint8_t *buf) {
    size_t fqb = (size_t)E.fq.n * 8;
    if (buf_is_zero(buf, 2 * fqb)) return true;
    const FpCtx &C = E.fq;
    fe x, y, lhs, rhs, t;
    fe_from_be(C, x, buf);
    fe_from_be(C, y, buf + fqb);
    fe_sqr(C, lhs, y);
    fe_sqr(C, rhs, x);
    fe_mul(C, rhs, rhs, x);
    if (!E.a_is_zero) {
        fe_mul(C, t, E.a, x);
        fe_add(C, rhs, rhs, t);
    }
    fe_add(C, rhs, rhs, E.b);
    return fe_eq(C, lhs, rhs);
}

/* ---- contexts ------------------------------------------------------- */

CurveCtx g_bls377, g_bw6;
bool g_init = false;

void load_fp(FpCtx &C, int n, const uint64_t *mod, const uint64_t *r2,
             uint64_t inv) {
    C.n = n;
    for (int i = 0; i < n; i++) { C.mod[i] = mod[i]; C.r2[i] = r2[i]; }
    C.inv = inv;
}

void load_curve(CurveCtx &E, int nq, const uint64_t *mod,
                const uint64_t *r2, uint64_t inv, int nr,
                const uint64_t *ca, const uint64_t *cb,
                const uint64_t *gx, const uint64_t *gy) {
    load_fp(E.fq, nq, mod, r2, inv);
    E.fr_limbs = nr;
    fe pa, pb, px, py;
    for (int i = 0; i < MAXL; i++) pa[i] = pb[i] = px[i] = py[i] = 0;
    for (int i = 0; i < nq; i++) {
        pa[i] = ca[i]; pb[i] = cb[i]; px[i] = gx[i]; py[i] = gy[i];
    }
    fe_to_mont(E.fq, E.a, pa);
    fe_to_mont(E.fq, E.b, pb);
    fe_to_mont(E.fq, E.gx, px);
    fe_to_mont(E.fq, E.gy, py);
    E.a_is_zero = fe_is_zero(E.fq, E.a);
}

/* ==== pairings ========================================================
 *
 * Native 4-pair pairing-product checks mirroring the reference FFI
 * surface (ffi/ffi.h:37-53,79-95: bls12_377_pairing / bw6_761_pairing).
 * Algorithms follow this repo's test-verified host oracles
 * (libff_tpu/host/pairing.py, pairing_bw6.py): homogeneous-projective
 * Miller doubling/addition steps with dense sparse-line multiplication.
 * The final exponentiation is one generic square-and-multiply by
 * (q^k - 1)/r (generated into ffi_params.h) — for a product == 1 check
 * this is exactly the reduced pairing's exponent, with no Frobenius
 * machinery needed beyond BW6's single f1 * f2^q combine.
 */

/* ---- BLS12-377 tower: Fq2 = Fq[u]/(u^2 - nqr), Fq6 = Fq2[v]/(v^3 - u),
 * Fq12 = Fq6[w]/(w^2 - v) ---- */

struct Fe2 { fe c0, c1; };
struct Fe6 { Fe2 c0, c1, c2; };
struct Fe12 { Fe6 c0, c1; };

struct Bls377PairCtx {
    const FpCtx *C;
    fe nqr;        /* Fq2 non-residue, Montgomery */
    Fe2 twist_b;   /* G2 curve coefficient b' */
    Fe2 xi;        /* twist */
    fe two_inv;
    fe one;        /* Montgomery 1 */
};

Bls377PairCtx g_pair377;
bool g_pair377_init = false;

void f2_add(const FpCtx &C, Fe2 &r, const Fe2 &a, const Fe2 &b) {
    fe_add(C, r.c0, a.c0, b.c0);
    fe_add(C, r.c1, a.c1, b.c1);
}

void f2_sub(const FpCtx &C, Fe2 &r, const Fe2 &a, const Fe2 &b) {
    fe_sub(C, r.c0, a.c0, b.c0);
    fe_sub(C, r.c1, a.c1, b.c1);
}

void f2_neg(const FpCtx &C, Fe2 &r, const Fe2 &a) {
    fe z;
    fe_zero(C, z);
    fe_sub(C, r.c0, z, a.c0);
    fe_sub(C, r.c1, z, a.c1);
}

/* Karatsuba, as host Ext.mul d == 2 */
void f2_mul(const Bls377PairCtx &P, Fe2 &r, const Fe2 &a, const Fe2 &b) {
    const FpCtx &C = *P.C;
    fe v0, v1, t, s0, s1;
    fe_mul(C, v0, a.c0, b.c0);
    fe_mul(C, v1, a.c1, b.c1);
    fe_add(C, s0, a.c0, a.c1);
    fe_add(C, s1, b.c0, b.c1);
    fe_mul(C, t, s0, s1);
    fe_sub(C, t, t, v0);
    fe_sub(C, t, t, v1);
    fe nv1;
    fe_mul(C, nv1, P.nqr, v1);
    fe_add(C, r.c0, v0, nv1);
    fe_copy(C, r.c1, t);
}

void f2_sqr(const Bls377PairCtx &P, Fe2 &r, const Fe2 &a) {
    f2_mul(P, r, a, a);
}

void f2_mul_base(const Bls377PairCtx &P, Fe2 &r, const Fe2 &a, const fe s) {
    fe_mul(*P.C, r.c0, a.c0, s);
    fe_mul(*P.C, r.c1, a.c1, s);
}

void f2_zero(const FpCtx &C, Fe2 &r) {
    fe_zero(C, r.c0);
    fe_zero(C, r.c1);
}

bool f2_is_zero(const FpCtx &C, const Fe2 &a) {
    return fe_is_zero(C, a.c0) && fe_is_zero(C, a.c1);
}

/* x * u for x in Fq2: (a0 + a1 u) u = nqr*a1 + a0 u */
void f2_mul_by_u(const Bls377PairCtx &P, Fe2 &r, const Fe2 &a) {
    fe t;
    fe_mul(*P.C, t, P.nqr, a.c1);
    fe_copy(*P.C, r.c1, a.c0);
    fe_copy(*P.C, r.c0, t);
}

void f6_add(const FpCtx &C, Fe6 &r, const Fe6 &a, const Fe6 &b) {
    f2_add(C, r.c0, a.c0, b.c0);
    f2_add(C, r.c1, a.c1, b.c1);
    f2_add(C, r.c2, a.c2, b.c2);
}

void f6_sub(const FpCtx &C, Fe6 &r, const Fe6 &a, const Fe6 &b) {
    f2_sub(C, r.c0, a.c0, b.c0);
    f2_sub(C, r.c1, a.c1, b.c1);
    f2_sub(C, r.c2, a.c2, b.c2);
}

/* host Ext.mul d == 3 over Fq2 with non-residue u */
void f6_mul(const Bls377PairCtx &P, Fe6 &r, const Fe6 &a, const Fe6 &b) {
    const FpCtx &C = *P.C;
    Fe2 v0, v1, v2, t0, t1, t2, s;
    f2_mul(P, v0, a.c0, b.c0);
    f2_mul(P, v1, a.c1, b.c1);
    f2_mul(P, v2, a.c2, b.c2);
    /* c0 = v0 + u*((a1+a2)(b1+b2) - v1 - v2) */
    f2_add(C, t0, a.c1, a.c2);
    f2_add(C, t1, b.c1, b.c2);
    f2_mul(P, t2, t0, t1);
    f2_sub(C, t2, t2, v1);
    f2_sub(C, t2, t2, v2);
    f2_mul_by_u(P, t2, t2);
    Fe2 c0;
    f2_add(C, c0, v0, t2);
    /* c1 = (a0+a1)(b0+b1) - v0 - v1 + u*v2 */
    f2_add(C, t0, a.c0, a.c1);
    f2_add(C, t1, b.c0, b.c1);
    f2_mul(P, t2, t0, t1);
    f2_sub(C, t2, t2, v0);
    f2_sub(C, t2, t2, v1);
    f2_mul_by_u(P, s, v2);
    Fe2 c1;
    f2_add(C, c1, t2, s);
    /* c2 = (a0+a2)(b0+b2) - v0 - v2 + v1 */
    f2_add(C, t0, a.c0, a.c2);
    f2_add(C, t1, b.c0, b.c2);
    f2_mul(P, t2, t0, t1);
    f2_sub(C, t2, t2, v0);
    f2_sub(C, t2, t2, v2);
    f2_add(C, r.c2, t2, v1);
    r.c0 = c0;
    r.c1 = c1;
}

/* x * v for x in Fq6: (a0 + a1 v + a2 v^2) v = u*a2 + a0 v + a1 v^2 */
void f6_mul_by_v(const Bls377PairCtx &P, Fe6 &r, const Fe6 &a) {
    Fe2 t;
    f2_mul_by_u(P, t, a.c2);
    r.c2 = a.c1;
    r.c1 = a.c0;
    r.c0 = t;
}

void f12_mul(const Bls377PairCtx &P, Fe12 &r, const Fe12 &a,
             const Fe12 &b) {
    const FpCtx &C = *P.C;
    Fe6 v0, v1, t0, t1, t2;
    f6_mul(P, v0, a.c0, b.c0);
    f6_mul(P, v1, a.c1, b.c1);
    f6_add(C, t0, a.c0, a.c1);
    f6_add(C, t1, b.c0, b.c1);
    f6_mul(P, t2, t0, t1);
    f6_sub(C, t2, t2, v0);
    f6_sub(C, t2, t2, v1);
    Fe6 nv1;
    f6_mul_by_v(P, nv1, v1);
    f6_add(C, r.c0, v0, nv1);
    r.c1 = t2;
}

void f12_one(const Bls377PairCtx &P, Fe12 &r) {
    const FpCtx &C = *P.C;
    f2_zero(C, r.c0.c0);
    f2_zero(C, r.c0.c1);
    f2_zero(C, r.c0.c2);
    f2_zero(C, r.c1.c0);
    f2_zero(C, r.c1.c1);
    f2_zero(C, r.c1.c2);
    fe_copy(C, r.c0.c0.c0, P.one);
}

bool f12_is_one(const Bls377PairCtx &P, const Fe12 &a) {
    const FpCtx &C = *P.C;
    return fe_eq(C, a.c0.c0.c0, P.one) && fe_is_zero(C, a.c0.c0.c1) &&
           f2_is_zero(C, a.c0.c1) && f2_is_zero(C, a.c0.c2) &&
           f2_is_zero(C, a.c1.c0) && f2_is_zero(C, a.c1.c1) &&
           f2_is_zero(C, a.c1.c2);
}

/* ---- BLS12-377 Miller loop (host/pairing.py dbl_step/add_step,
 * D-type twist -> mul_by_024 sparse layout) ---- */

struct G2Proj { Fe2 X, Y, Z; };

void bls377_dbl_step(const Bls377PairCtx &P, G2Proj &R, Fe2 &ell_0,
                     Fe2 &ell_VW, Fe2 &ell_VV) {
    const FpCtx &C = *P.C;
    Fe2 A, B, Cc, D, E, F, G, H, I, J, E2, t;
    f2_mul(P, t, R.X, R.Y);
    f2_mul_base(P, A, t, P.two_inv);
    f2_sqr(P, B, R.Y);
    f2_sqr(P, Cc, R.Z);
    f2_add(C, D, Cc, Cc);
    f2_add(C, D, D, Cc);
    f2_mul(P, E, P.twist_b, D);
    f2_add(C, F, E, E);
    f2_add(C, F, F, E);
    f2_add(C, t, B, F);
    f2_mul_base(P, G, t, P.two_inv);
    f2_add(C, t, R.Y, R.Z);
    f2_sqr(P, H, t);
    f2_add(C, t, B, Cc);
    f2_sub(C, H, H, t);
    f2_sub(C, I, E, B);
    f2_sqr(P, J, R.X);
    f2_sqr(P, E2, E);
    f2_sub(C, t, B, F);
    f2_mul(P, R.X, A, t);
    f2_sqr(P, t, G);
    Fe2 e23;
    f2_add(C, e23, E2, E2);
    f2_add(C, e23, e23, E2);
    f2_sub(C, R.Y, t, e23);
    f2_mul(P, R.Z, B, H);
    f2_add(C, ell_VV, J, J);
    f2_add(C, ell_VV, ell_VV, J);
    /* D-type: ell_0 = xi * I; ell_VW = -H */
    f2_mul(P, ell_0, P.xi, I);
    f2_neg(C, ell_VW, H);
}

void bls377_add_step(const Bls377PairCtx &P, const Fe2 &x2, const Fe2 &y2,
                     G2Proj &R, Fe2 &ell_0, Fe2 &ell_VW, Fe2 &ell_VV) {
    const FpCtx &C = *P.C;
    Fe2 D, E, F, G, H, I, J, t, t2;
    f2_mul(P, t, x2, R.Z);
    f2_sub(C, D, R.X, t);
    f2_mul(P, t, y2, R.Z);
    f2_sub(C, E, R.Y, t);
    f2_sqr(P, F, D);
    f2_sqr(P, G, E);
    f2_mul(P, H, D, F);
    f2_mul(P, I, R.X, F);
    f2_mul(P, t, R.Z, G);
    f2_add(C, t, H, t);
    f2_add(C, t2, I, I);
    f2_sub(C, J, t, t2);
    f2_mul(P, R.X, D, J);
    f2_sub(C, t, I, J);
    f2_mul(P, t, E, t);
    f2_mul(P, t2, H, R.Y);
    f2_sub(C, R.Y, t, t2);
    Fe2 z3;
    f2_mul(P, z3, R.Z, H);
    R.Z = z3;
    f2_mul(P, t, E, x2);
    f2_mul(P, t2, D, y2);
    f2_sub(C, t, t, t2);              /* ell_J */
    f2_neg(C, ell_VV, E);
    /* D-type: ell_0 = xi * ell_J; ell_VW = D */
    f2_mul(P, ell_0, P.xi, t);
    ell_VW = D;
}

/* f *= sparse line: Fq12( Fq6(ell_0, 0, vv), Fq6(0, vw, 0) )
 * (mul_by_024 layout; dense product, bit-identical values) */
void bls377_sparse_mul(const Bls377PairCtx &P, Fe12 &f, const Fe2 &ell_0,
                       const Fe2 &vw, const Fe2 &vv) {
    const FpCtx &C = *P.C;
    Fe12 s;
    s.c0.c0 = ell_0;
    f2_zero(C, s.c0.c1);
    s.c0.c2 = vv;
    f2_zero(C, s.c1.c0);
    s.c1.c1 = vw;
    f2_zero(C, s.c1.c2);
    Fe12 t;
    f12_mul(P, t, f, s);
    f = t;
}

/* Miller loop for one (P, Q) pair; P affine Montgomery Fq coords,
 * Q affine Montgomery Fq2 coords.  f is multiplied in. */
void bls377_miller(const Bls377PairCtx &P, Fe12 &f, const fe px,
                   const fe py, const Fe2 &qx, const Fe2 &qy) {
    G2Proj R;
    R.X = qx;
    R.Y = qy;
    f2_zero(*P.C, R.Z);
    fe_copy(*P.C, R.Z.c0, P.one);
    uint64_t lc = bls377_ate_loop;
    int top = 63;
    while (!((lc >> top) & 1)) top--;
    Fe12 g;
    f12_one(P, g);
    Fe2 e0, evw, evv, vw, vv;
    for (int i = top - 1; i >= 0; i--) {
        Fe12 g2;
        f12_mul(P, g2, g, g);
        g = g2;
        bls377_dbl_step(P, R, e0, evw, evv);
        f2_mul_base(P, vw, evw, py);
        f2_mul_base(P, vv, evv, px);
        bls377_sparse_mul(P, g, e0, vw, vv);
        if ((lc >> i) & 1) {
            bls377_add_step(P, qx, qy, R, e0, evw, evv);
            f2_mul_base(P, vw, evw, py);
            f2_mul_base(P, vv, evv, px);
            bls377_sparse_mul(P, g, e0, vw, vv);
        }
    }
    Fe12 t;
    f12_mul(P, t, f, g);
    f = t;
}

/* r = f^e for a multi-limb exponent (little-endian u64 limbs) */
void f12_pow(const Bls377PairCtx &P, Fe12 &r, const Fe12 &f,
             const uint64_t *e, int nlimbs) {
    int top = nlimbs * 64 - 1;
    while (top >= 0 && !((e[top / 64] >> (top % 64)) & 1)) top--;
    f12_one(P, r);
    for (int i = top; i >= 0; i--) {
        Fe12 t;
        f12_mul(P, t, r, r);
        r = t;
        if ((e[i / 64] >> (i % 64)) & 1) {
            f12_mul(P, t, r, f);
            r = t;
        }
    }
}

void bls377_pair_init() {
    if (g_pair377_init) return;
    libff_tpu_init();
    Bls377PairCtx &P = g_pair377;
    P.C = &g_bls377.fq;
    const FpCtx &C = *P.C;
    fe plain;
    fe_zero(C, plain);
    for (int i = 0; i < C.n; i++) plain[i] = bls377_fq2_nqr[i];
    fe_to_mont(C, P.nqr, plain);
    fe one_plain = {0};
    one_plain[0] = 1;
    fe_to_mont(C, P.one, one_plain);
    fe two_plain = {0};
    two_plain[0] = 2;
    fe two_m;
    fe_to_mont(C, two_m, two_plain);
    fe_inv(C, P.two_inv, two_m);
    auto load2 = [&](Fe2 &r, const uint64_t *a0, const uint64_t *a1) {
        fe p0, p1;
        fe_zero(C, p0);
        fe_zero(C, p1);
        for (int i = 0; i < C.n; i++) { p0[i] = a0[i]; p1[i] = a1[i]; }
        fe_to_mont(C, r.c0, p0);
        fe_to_mont(C, r.c1, p1);
    };
    load2(P.twist_b, bls377_twist_b_c0, bls377_twist_b_c1);
    load2(P.xi, bls377_xi_c0, bls377_xi_c1);
    g_pair377_init = true;
}

/* ---- BW6-761 tower: Fq3 = Fq[v]/(v^3 - beta), Fq6 = Fq3[w]/(w^2 - v),
 * G2 over Fq itself ---- */

struct Fe3 { fe c0, c1, c2; };
struct Fe6b { Fe3 c0, c1; };

struct Bw6PairCtx {
    const FpCtx *C;
    fe beta;        /* Fq3 non-residue, Montgomery */
    fe twist;       /* -4 */
    fe twist_b;     /* 4 */
    fe frob[6];     /* Frobenius^1 diagonal, Montgomery */
    fe one;
};

Bw6PairCtx g_pairbw6;
bool g_pairbw6_init = false;

void f3_add(const FpCtx &C, Fe3 &r, const Fe3 &a, const Fe3 &b) {
    fe_add(C, r.c0, a.c0, b.c0);
    fe_add(C, r.c1, a.c1, b.c1);
    fe_add(C, r.c2, a.c2, b.c2);
}

void f3_sub(const FpCtx &C, Fe3 &r, const Fe3 &a, const Fe3 &b) {
    fe_sub(C, r.c0, a.c0, b.c0);
    fe_sub(C, r.c1, a.c1, b.c1);
    fe_sub(C, r.c2, a.c2, b.c2);
}

void f3_zero(const FpCtx &C, Fe3 &r) {
    fe_zero(C, r.c0);
    fe_zero(C, r.c1);
    fe_zero(C, r.c2);
}

bool f3_is_zero(const FpCtx &C, const Fe3 &a) {
    return fe_is_zero(C, a.c0) && fe_is_zero(C, a.c1) &&
           fe_is_zero(C, a.c2);
}

/* host Ext.mul d == 3 over Fq with non-residue beta */
void f3_mul(const Bw6PairCtx &P, Fe3 &r, const Fe3 &a, const Fe3 &b) {
    const FpCtx &C = *P.C;
    fe v0, v1, v2, t0, t1, t2, s;
    fe_mul(C, v0, a.c0, b.c0);
    fe_mul(C, v1, a.c1, b.c1);
    fe_mul(C, v2, a.c2, b.c2);
    fe_add(C, t0, a.c1, a.c2);
    fe_add(C, t1, b.c1, b.c2);
    fe_mul(C, t2, t0, t1);
    fe_sub(C, t2, t2, v1);
    fe_sub(C, t2, t2, v2);
    fe_mul(C, t2, t2, P.beta);
    fe c0;
    fe_add(C, c0, v0, t2);
    fe_add(C, t0, a.c0, a.c1);
    fe_add(C, t1, b.c0, b.c1);
    fe_mul(C, t2, t0, t1);
    fe_sub(C, t2, t2, v0);
    fe_sub(C, t2, t2, v1);
    fe_mul(C, s, v2, P.beta);
    fe c1;
    fe_add(C, c1, t2, s);
    fe_add(C, t0, a.c0, a.c2);
    fe_add(C, t1, b.c0, b.c2);
    fe_mul(C, t2, t0, t1);
    fe_sub(C, t2, t2, v0);
    fe_sub(C, t2, t2, v2);
    fe_add(C, r.c2, t2, v1);
    fe_copy(C, r.c0, c0);
    fe_copy(C, r.c1, c1);
}

/* x * v for x in Fq3 */
void f3_mul_by_v(const Bw6PairCtx &P, Fe3 &r, const Fe3 &a) {
    const FpCtx &C = *P.C;
    fe t;
    fe_mul(C, t, P.beta, a.c2);
    fe_copy(C, r.c2, a.c1);
    fe_copy(C, r.c1, a.c0);
    fe_copy(C, r.c0, t);
}

void f6b_mul(const Bw6PairCtx &P, Fe6b &r, const Fe6b &a, const Fe6b &b) {
    const FpCtx &C = *P.C;
    Fe3 v0, v1, t0, t1, t2, nv1;
    f3_mul(P, v0, a.c0, b.c0);
    f3_mul(P, v1, a.c1, b.c1);
    f3_add(C, t0, a.c0, a.c1);
    f3_add(C, t1, b.c0, b.c1);
    f3_mul(P, t2, t0, t1);
    f3_sub(C, t2, t2, v0);
    f3_sub(C, t2, t2, v1);
    f3_mul_by_v(P, nv1, v1);
    f3_add(C, r.c0, v0, nv1);
    r.c1 = t2;
}

void f6b_one(const Bw6PairCtx &P, Fe6b &r) {
    const FpCtx &C = *P.C;
    f3_zero(C, r.c0);
    f3_zero(C, r.c1);
    fe_copy(C, r.c0.c0, P.one);
}

bool f6b_is_one(const Bw6PairCtx &P, const Fe6b &a) {
    const FpCtx &C = *P.C;
    return fe_eq(C, a.c0.c0, P.one) && fe_is_zero(C, a.c0.c1) &&
           fe_is_zero(C, a.c0.c2) && f3_is_zero(C, a.c1);
}

/* Frobenius^1: diagonal on the 6 Fq coordinates (coords in Fq are fixed
 * by x -> x^q; the basis elements pick up the generated constants) */
void f6b_frob1(const Bw6PairCtx &P, Fe6b &r, const Fe6b &a) {
    const FpCtx &C = *P.C;
    fe_mul(C, r.c0.c0, a.c0.c0, P.frob[0]);
    fe_mul(C, r.c0.c1, a.c0.c1, P.frob[1]);
    fe_mul(C, r.c0.c2, a.c0.c2, P.frob[2]);
    fe_mul(C, r.c1.c0, a.c1.c0, P.frob[3]);
    fe_mul(C, r.c1.c1, a.c1.c1, P.frob[4]);
    fe_mul(C, r.c1.c2, a.c1.c2, P.frob[5]);
}

/* f *= sparse line Fq6( Fq3(vw, 0, 0), Fq3(0, ell_0, vv) )
 * (mul_by_045 layout of host/pairing_bw6.py; dense product) */
void bw6_sparse_mul(const Bw6PairCtx &P, Fe6b &f, const fe ell_0,
                    const fe vw, const fe vv) {
    const FpCtx &C = *P.C;
    Fe6b s;
    f3_zero(C, s.c0);
    f3_zero(C, s.c1);
    fe_copy(C, s.c0.c0, vw);
    fe_copy(C, s.c1.c1, ell_0);
    fe_copy(C, s.c1.c2, vv);
    Fe6b t;
    f6b_mul(P, t, f, s);
    f = t;
}

struct G2ProjBw6 { fe X, Y, Z; };

void bw6_dbl_step(const Bw6PairCtx &P, G2ProjBw6 &R, fe ell_0, fe ell_VW,
                  fe ell_VV) {
    const FpCtx &C = *P.C;
    fe A, B, B4, Cc, D, E, F, G, H, I, J, E2sq, t, t2;
    fe_mul(C, A, R.X, R.Y);
    fe_sqr(C, B, R.Y);
    fe_add(C, B4, B, B);
    fe_add(C, B4, B4, B4);
    fe_sqr(C, Cc, R.Z);
    fe_add(C, D, Cc, Cc);
    fe_add(C, D, D, Cc);
    fe_mul(C, E, P.twist_b, D);
    fe_add(C, F, E, E);
    fe_add(C, F, F, E);
    fe_add(C, G, B, F);
    fe_add(C, t, R.Y, R.Z);
    fe_sqr(C, H, t);
    fe_add(C, t, B, Cc);
    fe_sub(C, H, H, t);
    fe_sub(C, I, E, B);
    fe_sqr(C, J, R.X);
    fe_add(C, t, E, E);
    fe_sqr(C, E2sq, t);
    fe_add(C, t, A, A);
    fe_sub(C, t2, B, F);
    fe_mul(C, R.X, t, t2);
    fe_sqr(C, t, G);
    fe_add(C, t2, E2sq, E2sq);
    fe_add(C, t2, t2, E2sq);
    fe_sub(C, R.Y, t, t2);
    fe_mul(C, R.Z, B4, H);
    fe_copy(C, ell_0, I);
    fe_mul(C, t, P.twist, H);
    fe z;
    fe_zero(C, z);
    fe_sub(C, ell_VW, z, t);
    fe_add(C, t, J, J);
    fe_add(C, ell_VV, t, J);
}

void bw6_add_step(const Bw6PairCtx &P, const fe x2, const fe y2,
                  G2ProjBw6 &R, fe ell_0, fe ell_VW, fe ell_VV) {
    const FpCtx &C = *P.C;
    fe D, E, F, G, H, I, J, t, t2, z;
    fe_mul(C, t, x2, R.Z);
    fe_sub(C, D, R.X, t);
    fe_mul(C, t, y2, R.Z);
    fe_sub(C, E, R.Y, t);
    fe_sqr(C, F, D);
    fe_sqr(C, G, E);
    fe_mul(C, H, D, F);
    fe_mul(C, I, R.X, F);
    fe_mul(C, t, R.Z, G);
    fe_add(C, t, H, t);
    fe_add(C, t2, I, I);
    fe_sub(C, J, t, t2);
    fe_mul(C, R.X, D, J);
    fe_sub(C, t, I, J);
    fe_mul(C, t, E, t);
    fe_mul(C, t2, H, R.Y);
    fe_sub(C, R.Y, t, t2);
    fe zt;
    fe_mul(C, zt, R.Z, H);
    fe_copy(C, R.Z, zt);
    fe_mul(C, t, E, x2);
    fe_mul(C, t2, D, y2);
    fe_sub(C, ell_0, t, t2);
    fe_zero(C, z);
    fe_sub(C, ell_VV, z, E);
    fe_mul(C, ell_VW, P.twist, D);
}

/* one NAF-driven Miller iteration (host _precompute_iteration+_miller
 * fused: coefficients are consumed as they are produced) */
void bw6_miller_naf(const Bw6PairCtx &P, Fe6b &f, const fe px, const fe py,
                    const fe qx, const fe qy, const int8_t *naf, int len) {
    const FpCtx &C = *P.C;
    fe qny, z;
    fe_zero(C, z);
    fe_sub(C, qny, z, qy);
    G2ProjBw6 R;
    fe_copy(C, R.X, qx);
    fe_copy(C, R.Y, qy);
    fe_copy(C, R.Z, P.one);
    f6b_one(P, f);
    fe e0, evw, evv, vw, vv;
    bool seen = false;
    for (int i = len - 1; i >= 0; i--) {
        if (!seen) {
            seen = naf[i] != 0;
            continue;
        }
        Fe6b f2;
        f6b_mul(P, f2, f, f);
        f = f2;
        bw6_dbl_step(P, R, e0, evw, evv);
        fe_mul(C, vw, py, evw);
        fe_mul(C, vv, px, evv);
        bw6_sparse_mul(P, f, e0, vw, vv);
        if (naf[i] != 0) {
            bw6_add_step(P, qx, naf[i] > 0 ? qy : qny, R, e0, evw, evv);
            fe_mul(C, vw, py, evw);
            fe_mul(C, vv, px, evv);
            bw6_sparse_mul(P, f, e0, vw, vv);
        }
    }
}

/* full BW6 ate Miller: f = f1 * frob1(f2), multiplied into acc */
void bw6_miller(const Bw6PairCtx &P, Fe6b &acc, const fe px, const fe py,
                const fe qx, const fe qy) {
    Fe6b f1, f2, f2p, f, t;
    bw6_miller_naf(P, f1, px, py, qx, qy, bw6_naf1, bw6_naf1_len);
    bw6_miller_naf(P, f2, px, py, qx, qy, bw6_naf2, bw6_naf2_len);
    f6b_frob1(P, f2p, f2);
    f6b_mul(P, f, f1, f2p);
    f6b_mul(P, t, acc, f);
    acc = t;
}

void f6b_pow(const Bw6PairCtx &P, Fe6b &r, const Fe6b &f,
             const uint64_t *e, int nlimbs) {
    int top = nlimbs * 64 - 1;
    while (top >= 0 && !((e[top / 64] >> (top % 64)) & 1)) top--;
    f6b_one(P, r);
    for (int i = top; i >= 0; i--) {
        Fe6b t;
        f6b_mul(P, t, r, r);
        r = t;
        if ((e[i / 64] >> (i % 64)) & 1) {
            f6b_mul(P, t, r, f);
            r = t;
        }
    }
}

void bw6_pair_init() {
    if (g_pairbw6_init) return;
    libff_tpu_init();
    Bw6PairCtx &P = g_pairbw6;
    P.C = &g_bw6.fq;
    const FpCtx &C = *P.C;
    auto load = [&](fe r, const uint64_t *a) {
        fe p;
        fe_zero(C, p);
        for (int i = 0; i < C.n; i++) p[i] = a[i];
        fe_to_mont(C, r, p);
    };
    load(P.beta, bw6_fq3_nqr);
    load(P.twist, bw6_twist);
    load(P.twist_b, bw6_twist_b);
    load(P.frob[0], bw6_frob_diag_0);
    load(P.frob[1], bw6_frob_diag_1);
    load(P.frob[2], bw6_frob_diag_2);
    load(P.frob[3], bw6_frob_diag_3);
    load(P.frob[4], bw6_frob_diag_4);
    load(P.frob[5], bw6_frob_diag_5);
    fe one_plain = {0};
    one_plain[0] = 1;
    fe_to_mont(C, P.one, one_plain);
    g_pairbw6_init = true;
}

} // namespace

extern "C" {

void libff_tpu_init(void) {
    if (g_init) return;
    load_curve(g_bls377, bls377_q_limbs, bls377_q_mod, bls377_q_r2,
               bls377_q_inv, bls377_r_limbs, bls377_coeff_a,
               bls377_coeff_b, bls377_g1_x, bls377_g1_y);
    load_curve(g_bw6, bw6_q_limbs, bw6_q_mod, bw6_q_r2, bw6_q_inv,
               bw6_r_limbs, bw6_coeff_a, bw6_coeff_b, bw6_g1_x, bw6_g1_y);
    g_init = true;
}

size_t bls12_377_g1_size(void) { return 2 * 8 * bls377_q_limbs; }
size_t bls12_377_fr_size(void) { return 8 * bls377_r_limbs; }
size_t bw6_761_g1_size(void) { return 2 * 8 * bw6_q_limbs; }
size_t bw6_761_fr_size(void) { return 8 * bw6_r_limbs; }

static int g1_add_impl(const CurveCtx &E, const uint8_t *a,
                       const uint8_t *b, uint8_t *out) {
    Jac P, Q, R;
    point_from_buf(E, P, a);
    point_from_buf(E, Q, b);
    jac_add(E, R, P, Q);
    point_to_buf(E, out, R);
    return 1;
}

static int g1_mul_impl(const CurveCtx &E, const uint8_t *a,
                       const uint8_t *scalar, uint8_t *out) {
    Jac P, R;
    point_from_buf(E, P, a);
    jac_scalar_mul(E, R, P, scalar, E.fr_limbs * 8);
    point_to_buf(E, out, R);
    return 1;
}

int bls12_377_g1_add(const uint8_t *a, const uint8_t *b, uint8_t *out) {
    libff_tpu_init();
    return g1_add_impl(g_bls377, a, b, out);
}

int bw6_761_g1_add(const uint8_t *a, const uint8_t *b, uint8_t *out) {
    libff_tpu_init();
    return g1_add_impl(g_bw6, a, b, out);
}

int bls12_377_g1_mul(const uint8_t *a, const uint8_t *s, uint8_t *out) {
    libff_tpu_init();
    return g1_mul_impl(g_bls377, a, s, out);
}

int bw6_761_g1_mul(const uint8_t *a, const uint8_t *s, uint8_t *out) {
    libff_tpu_init();
    return g1_mul_impl(g_bw6, a, s, out);
}

int bls12_377_g1_is_on_curve(const uint8_t *a) {
    libff_tpu_init();
    return point_on_curve(g_bls377, a) ? 1 : 0;
}

int bw6_761_g1_is_on_curve(const uint8_t *a) {
    libff_tpu_init();
    return point_on_curve(g_bw6, a) ? 1 : 0;
}

int bls12_377_g1_generator(uint8_t *out) {
    libff_tpu_init();
    size_t fqb = 8 * (size_t)bls377_q_limbs;
    fe_to_be(g_bls377.fq, out, g_bls377.gx);
    fe_to_be(g_bls377.fq, out + fqb, g_bls377.gy);
    return 1;
}

int bw6_761_g1_generator(uint8_t *out) {
    libff_tpu_init();
    size_t fqb = 8 * (size_t)bw6_q_limbs;
    fe_to_be(g_bw6.fq, out, g_bw6.gx);
    fe_to_be(g_bw6.fq, out + fqb, g_bw6.gy);
    return 1;
}

size_t bls12_377_g2_size(void) { return 4 * 8 * bls377_q_limbs; }
size_t bw6_761_g2_size(void) { return 2 * 8 * bw6_q_limbs; }

/* 4-pair pairing-product check: returns 1 iff
 * e(a,b) * e(c,d) * e(e,f) * e(g,h) == 1 (reference ffi.cpp:56-116
 * semantics).  Points are big-endian plain affine; (0,...,0) encodes the
 * identity, whose pair contributes 1 and is skipped. */
int bls12_377_pairing(const uint8_t *a_g1, const uint8_t *b_g2,
                      const uint8_t *c_g1, const uint8_t *d_g2,
                      const uint8_t *e_g1, const uint8_t *f_g2,
                      const uint8_t *g_g1, const uint8_t *h_g2) {
    libff_tpu_init();
    bls377_pair_init();
    const Bls377PairCtx &P = g_pair377;
    const FpCtx &C = *P.C;
    size_t fqb = 8 * (size_t)bls377_q_limbs;
    Fe12 f;
    f12_one(P, f);
    const uint8_t *g1s[4] = {a_g1, c_g1, e_g1, g_g1};
    const uint8_t *g2s[4] = {b_g2, d_g2, f_g2, h_g2};
    for (int i = 0; i < 4; i++) {
        if (buf_is_zero(g1s[i], 2 * fqb) || buf_is_zero(g2s[i], 4 * fqb))
            continue;
        fe px, py;
        fe_from_be(C, px, g1s[i]);
        fe_from_be(C, py, g1s[i] + fqb);
        Fe2 qx, qy;
        fe_from_be(C, qx.c0, g2s[i]);
        fe_from_be(C, qx.c1, g2s[i] + fqb);
        fe_from_be(C, qy.c0, g2s[i] + 2 * fqb);
        fe_from_be(C, qy.c1, g2s[i] + 3 * fqb);
        bls377_miller(P, f, px, py, qx, qy);
    }
    Fe12 r;
    f12_pow(P, r, f, bls377_final_exp, bls377_final_exp_limbs);
    return f12_is_one(P, r) ? 1 : 0;
}

int bw6_761_pairing(const uint8_t *a_g1, const uint8_t *b_g2,
                    const uint8_t *c_g1, const uint8_t *d_g2,
                    const uint8_t *e_g1, const uint8_t *f_g2,
                    const uint8_t *g_g1, const uint8_t *h_g2) {
    libff_tpu_init();
    bw6_pair_init();
    const Bw6PairCtx &P = g_pairbw6;
    const FpCtx &C = *P.C;
    size_t fqb = 8 * (size_t)bw6_q_limbs;
    Fe6b f;
    f6b_one(P, f);
    const uint8_t *g1s[4] = {a_g1, c_g1, e_g1, g_g1};
    const uint8_t *g2s[4] = {b_g2, d_g2, f_g2, h_g2};
    for (int i = 0; i < 4; i++) {
        if (buf_is_zero(g1s[i], 2 * fqb) || buf_is_zero(g2s[i], 2 * fqb))
            continue;
        fe px, py, qx, qy;
        fe_from_be(C, px, g1s[i]);
        fe_from_be(C, py, g1s[i] + fqb);
        fe_from_be(C, qx, g2s[i]);
        fe_from_be(C, qy, g2s[i] + fqb);
        bw6_miller(P, f, px, py, qx, qy);
    }
    Fe6b r;
    f6b_pow(P, r, f, bw6_final_exp, bw6_final_exp_limbs);
    return f6b_is_one(P, r) ? 1 : 0;
}

} // extern "C"
