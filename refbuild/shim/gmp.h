/* Minimal ABI-compatible GMP header shim.
 *
 * The build image ships the GMP runtime (libgmp.so.10) but not its dev
 * headers. This shim declares exactly the subset of the (stable, documented)
 * GMP 6.x ABI that the reference library uses, so the reference benchmark
 * harness can be built out-of-tree to measure BASELINE.md numbers.
 * Symbol names follow GMP's convention: public names are macros over
 * __gmpn_* / __gmpz_* / __gmp_* entry points.
 */
#ifndef __GMP_H_SHIM__
#define __GMP_H_SHIM__

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef unsigned long int mp_limb_t;
typedef long int mp_size_t;
typedef unsigned long int mp_bitcnt_t;
typedef mp_limb_t *mp_ptr;
typedef const mp_limb_t *mp_srcptr;

#define GMP_LIMB_BITS 64
#define GMP_NAIL_BITS 0
#define GMP_NUMB_BITS (GMP_LIMB_BITS - GMP_NAIL_BITS)
#define GMP_NUMB_MASK (~(mp_limb_t)0)
#define GMP_NUMB_MAX GMP_NUMB_MASK

typedef struct
{
    int _mp_alloc;
    int _mp_size;
    mp_limb_t *_mp_d;
} __mpz_struct;

typedef __mpz_struct mpz_t[1];
typedef __mpz_struct *mpz_ptr;
typedef const __mpz_struct *mpz_srcptr;

/* ---- mpn ---- */
mp_limb_t __gmpn_add_n(mp_ptr, mp_srcptr, mp_srcptr, mp_size_t);
mp_limb_t __gmpn_sub_n(mp_ptr, mp_srcptr, mp_srcptr, mp_size_t);
mp_limb_t __gmpn_add_1(mp_ptr, mp_srcptr, mp_size_t, mp_limb_t);
mp_limb_t __gmpn_sub_1(mp_ptr, mp_srcptr, mp_size_t, mp_limb_t);
mp_limb_t __gmpn_add(mp_ptr, mp_srcptr, mp_size_t, mp_srcptr, mp_size_t);
mp_limb_t __gmpn_sub(mp_ptr, mp_srcptr, mp_size_t, mp_srcptr, mp_size_t);
int __gmpn_cmp(mp_srcptr, mp_srcptr, mp_size_t);
void __gmpn_copyi(mp_ptr, mp_srcptr, mp_size_t);
void __gmpn_zero(mp_ptr, mp_size_t);
mp_limb_t __gmpn_mul_1(mp_ptr, mp_srcptr, mp_size_t, mp_limb_t);
mp_limb_t __gmpn_addmul_1(mp_ptr, mp_srcptr, mp_size_t, mp_limb_t);
mp_limb_t __gmpn_submul_1(mp_ptr, mp_srcptr, mp_size_t, mp_limb_t);
void __gmpn_mul_n(mp_ptr, mp_srcptr, mp_srcptr, mp_size_t);
void __gmpn_sqr(mp_ptr, mp_srcptr, mp_size_t);
mp_limb_t __gmpn_mul(mp_ptr, mp_srcptr, mp_size_t, mp_srcptr, mp_size_t);
void __gmpn_tdiv_qr(
    mp_ptr, mp_ptr, mp_size_t, mp_srcptr, mp_size_t, mp_srcptr, mp_size_t);
mp_size_t __gmpn_gcdext(
    mp_ptr, mp_ptr, mp_size_t *, mp_ptr, mp_size_t, mp_ptr, mp_size_t);
mp_size_t __gmpn_set_str(mp_ptr, const unsigned char *, size_t, int);
size_t __gmpn_get_str(unsigned char *, int, mp_ptr, mp_size_t);
mp_bitcnt_t __gmpn_scan1(mp_srcptr, mp_bitcnt_t);
mp_limb_t __gmpn_rshift(mp_ptr, mp_srcptr, mp_size_t, unsigned int);
mp_limb_t __gmpn_lshift(mp_ptr, mp_srcptr, mp_size_t, unsigned int);

#define mpn_add_n __gmpn_add_n
#define mpn_sub_n __gmpn_sub_n
#define mpn_add_1 __gmpn_add_1
#define mpn_sub_1 __gmpn_sub_1
#define mpn_add __gmpn_add
#define mpn_sub __gmpn_sub
#define mpn_cmp __gmpn_cmp
#define mpn_copyi __gmpn_copyi
#define mpn_zero __gmpn_zero
#define mpn_mul_1 __gmpn_mul_1
#define mpn_addmul_1 __gmpn_addmul_1
#define mpn_submul_1 __gmpn_submul_1
#define mpn_mul_n __gmpn_mul_n
#define mpn_sqr __gmpn_sqr
#define mpn_mul __gmpn_mul
#define mpn_tdiv_qr __gmpn_tdiv_qr
#define mpn_gcdext __gmpn_gcdext
#define mpn_set_str __gmpn_set_str
#define mpn_get_str __gmpn_get_str
#define mpn_scan1 __gmpn_scan1
#define mpn_rshift __gmpn_rshift
#define mpn_lshift __gmpn_lshift

/* ---- mpz ---- */
void __gmpz_init(mpz_ptr);
void __gmpz_init_set(mpz_ptr, mpz_srcptr);
void __gmpz_clear(mpz_ptr);
void __gmpz_set_ui(mpz_ptr, unsigned long int);
unsigned long int __gmpz_get_ui(mpz_srcptr);
void __gmpz_mul_2exp(mpz_ptr, mpz_srcptr, mp_bitcnt_t);
void __gmpz_fdiv_q_2exp(mpz_ptr, mpz_srcptr, mp_bitcnt_t);
void __gmpz_add_ui(mpz_ptr, mpz_srcptr, unsigned long int);

#define mpz_init __gmpz_init
#define mpz_init_set __gmpz_init_set
#define mpz_clear __gmpz_clear
#define mpz_set_ui __gmpz_set_ui
#define mpz_get_ui __gmpz_get_ui
#define mpz_mul_2exp __gmpz_mul_2exp
#define mpz_fdiv_q_2exp __gmpz_fdiv_q_2exp
#define mpz_add_ui __gmpz_add_ui
#define mpz_sgn(z) ((z)->_mp_size < 0 ? -1 : ((z)->_mp_size > 0 ? 1 : 0))

/* ---- formatted output ---- */
int __gmp_printf(const char *, ...);
int __gmp_snprintf(char *, size_t, const char *, ...);
#define gmp_printf __gmp_printf
#define gmp_snprintf __gmp_snprintf

#ifdef __cplusplus
}
#endif

#endif /* __GMP_H_SHIM__ */
