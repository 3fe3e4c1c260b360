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

} // extern "C"
