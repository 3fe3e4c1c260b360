/* Minimal ABI-compatible OpenSSL SHA-512 header shim (legacy low-level API).
 * libcrypto.so.3 exports SHA512_Init/Update/Final; only the headers are
 * missing from the image. Struct layout matches OpenSSL's stable ABI.
 */
#ifndef __OPENSSL_SHA_H_SHIM__
#define __OPENSSL_SHA_H_SHIM__

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

#define SHA_LBLOCK 16
#define SHA512_CBLOCK (SHA_LBLOCK * 8)
#define SHA512_DIGEST_LENGTH 64

typedef unsigned long long SHA_LONG64;

typedef struct SHA512state_st
{
    SHA_LONG64 h[8];
    SHA_LONG64 Nl, Nh;
    union
    {
        SHA_LONG64 d[SHA_LBLOCK];
        unsigned char p[SHA512_CBLOCK];
    } u;
    unsigned int num, md_len;
} SHA512_CTX;

int SHA512_Init(SHA512_CTX *c);
int SHA512_Update(SHA512_CTX *c, const void *data, size_t len);
int SHA512_Final(unsigned char *md, SHA512_CTX *c);
unsigned char *SHA512(const unsigned char *d, size_t n, unsigned char *md);

#ifdef __cplusplus
}
#endif

#endif
