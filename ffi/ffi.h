/* C ABI for host-side exact curve operations (native runtime layer).
 *
 * The TPU-native counterpart of the reference's FFI surface
 * (libff/ffi/ffi.h:13-95): latency-oriented single-element operations for
 * non-Python callers — BLS12-377 and BW6-761 G1 add / scalar-mul plus
 * raw-buffer (de)serialization.  Bulk/batch work (MSM, batched pairings)
 * belongs on the TPU path; these C entry points serve verifiers and
 * bindings that need one exact operation without a Python runtime.
 *
 * Buffer conventions (ffi_serialization.tcc semantics): affine points as
 * two big-endian plain-form field elements of the curve's Fq byte size
 * (48 bytes for BLS12-377, 96 for BW6-761); scalars big-endian of the Fr
 * byte size.  The identity is encoded as (0, 0) — not a curve point, so
 * unambiguous.  All functions return true (1) on success.
 */

#ifndef LIBFF_TPU_FFI_H
#define LIBFF_TPU_FFI_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* one-time init (precomputes Montgomery constants; idempotent) */
void libff_tpu_init(void);

/* sizes in bytes */
size_t bls12_377_g1_size(void);   /* 96  = 2 x 48 */
size_t bls12_377_fr_size(void);   /* 32 */
size_t bw6_761_g1_size(void);     /* 192 = 2 x 96 */
size_t bw6_761_fr_size(void);     /* 48 */

/* out = a + b (affine in, affine out) */
int bls12_377_g1_add(const uint8_t *a, const uint8_t *b, uint8_t *out);
int bw6_761_g1_add(const uint8_t *a, const uint8_t *b, uint8_t *out);

/* out = scalar * a */
int bls12_377_g1_mul(const uint8_t *a, const uint8_t *scalar, uint8_t *out);
int bw6_761_g1_mul(const uint8_t *a, const uint8_t *scalar, uint8_t *out);

/* curve membership of an affine buffer */
int bls12_377_g1_is_on_curve(const uint8_t *a);
int bw6_761_g1_is_on_curve(const uint8_t *a);

/* out = generator */
int bls12_377_g1_generator(uint8_t *out);
int bw6_761_g1_generator(uint8_t *out);

/* G2 buffer sizes: bls12_377 = 4 x 48 (x.c0 || x.c1 || y.c0 || y.c1),
 * bw6_761 = 2 x 96 (G2 is defined over Fq itself). */
size_t bls12_377_g2_size(void);
size_t bw6_761_g2_size(void);

/* 4-pair pairing-product check (reference ffi/ffi.h:37-53,79-95):
 * returns 1 iff e(a,b) * e(c,d) * e(e,f) * e(g,h) == 1.  Identity
 * points (all-zero buffers) contribute the neutral factor. */
int bls12_377_pairing(const uint8_t *a_g1, const uint8_t *b_g2,
                      const uint8_t *c_g1, const uint8_t *d_g2,
                      const uint8_t *e_g1, const uint8_t *f_g2,
                      const uint8_t *g_g1, const uint8_t *h_g2);
int bw6_761_pairing(const uint8_t *a_g1, const uint8_t *b_g2,
                    const uint8_t *c_g1, const uint8_t *d_g2,
                    const uint8_t *e_g1, const uint8_t *f_g2,
                    const uint8_t *g_g1, const uint8_t *h_g2);

#ifdef __cplusplus
}
#endif

#endif /* LIBFF_TPU_FFI_H */
