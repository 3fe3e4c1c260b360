"""Batched prime-field arithmetic on TPU (radix-2^16 Montgomery CIOS).

Design (SURVEY.md §7): a field element is not an object but an array — shape
``(n_limbs, *batch)`` of uint32, each lane holding one 16-bit limb of one
element, in Montgomery form with the same R as libff (R = 2^(64*n64), see
host/mont.py), canonically reduced (< p).

Why radix 2^16 in uint32: the TPU has no 64x64->128 multiply (libff's asm
CIOS at fp_aux.tcc:88-120 is built on mulq); but a 16x16 product plus two
16-bit addends fits *exactly* in uint32:
    (2^16-1)^2 + 2*(2^16-1) = 2^32 - 1
so the CIOS recurrence  t = a_i*b_j + t_j + carry  (the portable spec of
fp.tcc:204-227 / HAC 14.36) runs wrap-free in uint32 lanes, fully
vectorized over the batch.  Limbs-major layout keeps the batch on the
minor (lane) axis, so every limb op is a full-width VPU op.

Montgomery mul is exposed in two flavors with identical semantics:
  * ``mul``      — fully unrolled (fastest; used on hot paths like MSM)
  * ``mul_loop`` — ``lax.fori_loop`` over the outer limb index (small trace;
                   used inside long jitted loops like Miller loops)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..host import mont as hm
from ..host import field as hfield

U32 = jnp.uint32
MASK = 0xFFFF


def _split(x):
    """(lo, hi) 16-bit halves of a uint32 value."""
    return x & MASK, x >> 16


def align_batch(a, b):
    """Broadcast two field arrays whose *batch* dims trail: pad the
    lower-rank one with trailing singleton dims first (numpy broadcasting
    aligns from the right, which is wrong for our limbs-major layout)."""
    nd = max(a.ndim, b.ndim)
    a = a.reshape(a.shape + (1,) * (nd - a.ndim))
    b = b.reshape(b.shape + (1,) * (nd - b.ndim))
    return jnp.broadcast_arrays(a, b)


class PrimeField:
    """Vectorized arithmetic over F_p.  All methods are jit-safe."""

    # number of leading structural axes of an element array (limbs)
    el_ndim = 1
    degree = 1

    def __init__(self, p: int, bits: int | None = None, name: str = "Fp"):
        self.name = name
        self.mp = hm.derive(p, bits)
        self.p = p
        self.n = self.mp.n16
        self.p_limbs = tuple(hm.int_to_limbs(p, self.n))
        self.inv16 = self.mp.inv16
        # frequently used constants (Montgomery form), as numpy for cheap
        # embedding into jaxprs
        self._one_mont = self._np_limbs(self.mp.R % p)
        self._r2 = self._np_limbs(self.mp.R2)
        self._one_plain = self._np_limbs(1)
        self._host = hfield.Fp(p, bits, name)

    # -- host-side packing ---------------------------------------------------
    def _np_limbs(self, v: int) -> np.ndarray:
        return np.array(hm.int_to_limbs(v, self.n), dtype=np.uint32)

    def const(self, v: int) -> jnp.ndarray:
        """Montgomery-form constant, shape (n,)."""
        return jnp.asarray(self._np_limbs(hm.to_mont(self.mp, v)))

    def from_host(self, v: int) -> jnp.ndarray:
        """Host-field element (plain int) -> device constant."""
        return self.const(v)

    def from_ints(self, vals) -> jnp.ndarray:
        """Host ints -> Montgomery limb array (n, N) (or (n,) for a scalar)."""
        if isinstance(vals, int):
            return self.const(vals)
        arr = np.stack(
            [self._np_limbs(hm.to_mont(self.mp, int(v))) for v in vals],
            axis=-1)
        return jnp.asarray(arr)

    def to_ints(self, x) -> list[int]:
        """Montgomery limb array -> host plain ints (flattens batch)."""
        a = np.asarray(jax.device_get(x)).reshape(self.n, -1)
        return [
            hm.from_mont(self.mp, hm.limbs_to_int(a[:, j]))
            for j in range(a.shape[1])
        ]

    def to_host(self, x) -> int:
        """Unbatched element -> host int."""
        (v,) = self.to_ints(x.reshape(self.n, 1))
        return v

    # uniform names used by the tower layer
    def from_host_batch(self, vals):
        return self.from_ints(vals)

    def to_host_batch(self, x):
        return self.to_ints(x)

    def frobenius(self, a, power: int = 1):
        return a  # identity on the prime field

    def mul_small_const(self, a, c: int):
        """Multiply by a host constant, using an addition chain when the
        constant (or its negation) is small — the vector analogue of libff's
        hand-written mul_by_non_residue specializations."""
        c %= self.p
        if c == 0:
            return jnp.zeros_like(a)
        if c == 1:
            return a
        if c == self.p - 1:
            return self.neg(a)
        neg = False
        k = c
        if self.p - c <= 64:
            k = self.p - c
            neg = True
        if k <= 64:
            acc = None
            for bit in bin(k)[2:]:
                acc = self.double(acc) if acc is not None else None
                if bit == "1":
                    acc = a if acc is None else self.add(acc, a)
            out = acc
            return self.neg(out) if neg else out
        cc = self.const(c)
        return self.mul(a, jnp.broadcast_to(
            cc.reshape((self.n,) + (1,) * (a.ndim - 1)), a.shape))

    def plain_from_ints(self, vals) -> jnp.ndarray:
        """Host ints -> plain (non-Montgomery) limb array (n, N)."""
        if isinstance(vals, int):
            return jnp.asarray(self._np_limbs(vals % self.p))
        arr = np.stack([self._np_limbs(int(v) % self.p) for v in vals], axis=-1)
        return jnp.asarray(arr)

    def plain_to_ints(self, x) -> list[int]:
        a = np.asarray(jax.device_get(x)).reshape(self.n, -1)
        return [hm.limbs_to_int(a[:, j]) for j in range(a.shape[1])]

    # -- constructors ----------------------------------------------------------
    def zero(self, batch=()) -> jnp.ndarray:
        return jnp.zeros((self.n, *batch), dtype=U32)

    def one(self, batch=()) -> jnp.ndarray:
        o = jnp.asarray(self._one_mont)
        return jnp.broadcast_to(o.reshape((self.n,) + (1,) * len(batch)),
                                (self.n, *batch))

    # -- low-level limb chains -------------------------------------------------
    def _add_limbs(self, a, b):
        """(a + b) as n limbs plus carry bit. Sequential 16-bit carry chain."""
        out = []
        c = jnp.zeros_like(a[0])
        for i in range(self.n):
            x = a[i] + b[i] + c
            out.append(x & MASK)
            c = x >> 16
        return out, c

    def _sub_limbs(self, a, b):
        """(a - b) mod 2^(16n) as n limbs plus borrow bit."""
        out = []
        brw = jnp.zeros_like(a[0])
        for i in range(self.n):
            x = a[i] - b[i] - brw          # uint32 wraps on borrow
            out.append(x & MASK)
            brw = (x >> 16) & 1            # wrap puts 0xffff in the top half
        return out, brw

    def _sub_p(self, a):
        """a - p (wrapping), plus borrow."""
        out = []
        brw = jnp.zeros_like(a[0])
        for i in range(self.n):
            x = a[i] - self.p_limbs[i] - brw
            out.append(x & MASK)
            brw = (x >> 16) & 1
        return out, brw

    @staticmethod
    def _unpack(x):
        return [x[i] for i in range(x.shape[0])]

    @staticmethod
    def _pack(limbs):
        return jnp.stack(limbs, axis=0)

    # -- ring ops ----------------------------------------------------------------
    def add(self, a, b):
        a, b = align_batch(a, b)
        al, bl = self._unpack(a), self._unpack(b)
        s, c = self._add_limbs(al, bl)
        d, brw = self._sub_p(s)
        need = (c | (1 - brw)).astype(jnp.bool_)
        return self._pack([jnp.where(need, x, y) for x, y in zip(d, s)])

    def sub(self, a, b):
        a, b = align_batch(a, b)
        al, bl = self._unpack(a), self._unpack(b)
        d, brw = self._sub_limbs(al, bl)
        # on borrow, add p back (wrapping)
        out = []
        c = jnp.zeros_like(d[0])
        for i in range(self.n):
            x = d[i] + brw * self.p_limbs[i] + c
            out.append(x & MASK)
            c = x >> 16
        return self._pack(out)

    def neg(self, a):
        return self.sub(self.zero(a.shape[1:]), a)

    def double(self, a):
        return self.add(a, a)

    def mul(self, a, b):
        """Montgomery product a*b*R^-1 mod p, canonical.

        Defaults to the fori_loop CIOS: measured ~6x faster than the fully
        unrolled graph on TPU v5e (better fusion / on-chip state reuse) and
        much cheaper to trace."""
        return self.mul_loop(a, b)

    def mul_unrolled(self, a, b):
        """Fully unrolled CIOS (kept for Pallas reference / comparison)."""
        a, b = align_batch(a, b)
        return self._cios(self._unpack(a), self._unpack(b))

    def _cios(self, al, bl):
        n = self.n
        z = jnp.zeros_like(al[0])
        t = [z] * (n + 2)
        for i in range(n):
            ai = al[i]
            # multiply-accumulate row i
            c = z
            for j in range(n):
                x = ai * bl[j] + t[j] + c
                t[j] = x & MASK
                c = x >> 16
            x = t[n] + c
            t[n] = x & MASK
            t[n + 1] = t[n + 1] + (x >> 16)
            # Montgomery reduction step
            m = (t[0] * self.inv16) & MASK
            x = m * self.p_limbs[0] + t[0]
            c = x >> 16
            for j in range(1, n):
                x = m * self.p_limbs[j] + t[j] + c
                t[j - 1] = x & MASK
                c = x >> 16
            x = t[n] + c
            t[n - 1] = x & MASK
            t[n] = t[n + 1] + (x >> 16)
            t[n + 1] = z
        res = t[:n]
        d, brw = self._sub_p(res)
        need = ((t[n] & 1) | (1 - brw)).astype(jnp.bool_)
        return self._pack([jnp.where(need, x, y) for x, y in zip(d, res)])

    def mul_sos(self, a, b):
        """Montgomery product via deferred-carry SOS (separated operand
        scanning, eprint 2012/140 method 1) — same op MIX as _cios
        (2n^2+n u32 muls, ~4 cheap ops per mul) but a restructured
        dependency graph for VPU ILP:

          * product phase: all n^2 limb products are INDEPENDENT; their
            16-bit halves accumulate into 2n+1 relaxed u32 columns (a
            column's worst case is 2n*(2^16-1) + reduction-phase terms
            < 2^23 — no overflow, no per-step carry chain);
          * reduction phase: n serial steps (vs CIOS's 2n^2-step carry
            chain), each step's n products independent; m_i needs only
            t[i] mod 2^16, which is exact in a relaxed column because
            carries flow strictly upward;
          * one short carry-propagation pass + the standard conditional
            subtract at the end.

        Bit-identical to mul()/mul_unrolled() (tests/test_fp.py)."""
        a, b = align_batch(a, b)
        al, bl = self._unpack(a), self._unpack(b)
        n = self.n
        z = jnp.zeros_like(al[0])
        t = [z] * (2 * n + 1)
        # product phase: independent MACs, column accumulation
        for i in range(n):
            ai = al[i]
            for j in range(n):
                x = ai * bl[j]
                t[i + j] = t[i + j] + (x & MASK)
                t[i + j + 1] = t[i + j + 1] + (x >> 16)
        # reduction phase: serial only across the n m_i steps
        for i in range(n):
            m = ((t[i] & MASK) * self.inv16) & MASK
            for j in range(n):
                x = m * self.p_limbs[j]
                t[i + j] = t[i + j] + (x & MASK)
                t[i + j + 1] = t[i + j + 1] + (x >> 16)
            # t[i] is now ≡ 0 mod 2^16 and final: push its carry up
            t[i + 1] = t[i + 1] + (t[i] >> 16)
        # final carry propagation over the upper half
        res = []
        c = z
        for k in range(n, 2 * n):
            x = t[k] + c
            res.append(x & MASK)
            c = x >> 16
        over = c + t[2 * n]                  # result < 2p => 0 or 1
        d, brw = self._sub_p(res)
        need = ((over & 1) | (1 - brw)).astype(jnp.bool_)
        return self._pack([jnp.where(need, x, y) for x, y in zip(d, res)])

    def mul_sos2(self, a, b):
        """mul_sos with BLOCK-2 Montgomery reduction: one reduction wave
        retires TWO limbs using m32 = t_low32 * (-p^-1 mod 2^32), halving
        the serial wave count of the reduce phase (n/2 waves of 2n+1
        independent muls each vs n waves of n+1).  t[i] + (t[i+1] << 16)
        wraps to the EXACT low 32 bits of the relaxed column state
        (carries flow strictly upward), so m32 needs no prior carry
        propagation.  Same total op mix; bit-identical results."""
        a, b = align_batch(a, b)
        al, bl = self._unpack(a), self._unpack(b)
        n = self.n
        assert n % 2 == 0, "block-2 reduction needs an even limb count"
        inv32 = jnp.uint32(self.mp.inv64 & 0xFFFFFFFF)   # -p^-1 mod 2^32
        z = jnp.zeros_like(al[0])
        t = [z] * (2 * n + 2)
        for i in range(n):
            ai = al[i]
            for j in range(n):
                x = ai * bl[j]
                t[i + j] = t[i + j] + (x & MASK)
                t[i + j + 1] = t[i + j + 1] + (x >> 16)
        for i in range(0, n, 2):
            tlow = t[i] + (t[i + 1] << 16)          # exact low 32 bits
            m32 = tlow * inv32                      # wrap mul mod 2^32
            mlo = m32 & MASK
            mhi = m32 >> 16
            for j in range(n):
                pj = self.p_limbs[j]
                x = mlo * pj
                t[i + j] = t[i + j] + (x & MASK)
                t[i + j + 1] = t[i + j + 1] + (x >> 16)
                x = mhi * pj
                t[i + j + 1] = t[i + j + 1] + (x & MASK)
                t[i + j + 2] = t[i + j + 2] + (x >> 16)
            # the block's two columns are ≡ 0 mod 2^16 and final: push
            # their joint carry into column i+2
            t[i + 2] = t[i + 2] + ((t[i + 1] + (t[i] >> 16)) >> 16)
        res = []
        c = z
        for k in range(n, 2 * n):
            x = t[k] + c
            res.append(x & MASK)
            c = x >> 16
        over = c + t[2 * n] + (t[2 * n + 1] << 16)
        d, brw = self._sub_p(res)
        need = ((over & 1) | (1 - brw)).astype(jnp.bool_)
        return self._pack([jnp.where(need, x, y) for x, y in zip(d, res)])

    def mul_loop(self, a, b):
        """Same as mul(), with the outer limb loop as lax.fori_loop (small
        trace; for use inside long jitted sequential loops)."""
        a, b = align_batch(a, b)
        n = self.n
        batch = a.shape[1:]
        p_arr = jnp.asarray(np.array(self.p_limbs, dtype=np.uint32)).reshape(
            (n,) + (1,) * len(batch))

        def body(i, t):
            ai = jax.lax.dynamic_index_in_dim(a, i, axis=0, keepdims=False)
            tl = [t[k] for k in range(n + 2)]
            z = jnp.zeros_like(ai)
            c = z
            for j in range(n):
                x = ai * b[j] + tl[j] + c
                tl[j] = x & MASK
                c = x >> 16
            x = tl[n] + c
            tl[n] = x & MASK
            tl[n + 1] = tl[n + 1] + (x >> 16)
            m = (tl[0] * self.inv16) & MASK
            x = m * p_arr[0] + tl[0]
            c = x >> 16
            for j in range(1, n):
                x = m * p_arr[j] + tl[j] + c
                tl[j - 1] = x & MASK
                c = x >> 16
            x = tl[n] + c
            tl[n - 1] = x & MASK
            tl[n] = tl[n + 1] + (x >> 16)
            tl[n + 1] = z
            return jnp.stack(tl, axis=0)

        t0 = jnp.zeros((n + 2, *batch), dtype=U32)
        t = jax.lax.fori_loop(0, n, body, t0)
        res = [t[i] for i in range(n)]
        d, brw = self._sub_p(res)
        need = ((t[n] & 1) | (1 - brw)).astype(jnp.bool_)
        return self._pack([jnp.where(need, x, y) for x, y in zip(d, res)])

    def sqr(self, a):
        return self.mul(a, a)

    # -- Montgomery domain conversion ---------------------------------------------
    def to_mont(self, a_plain):
        """plain limbs -> Montgomery form (mul by R^2)."""
        r2 = jnp.asarray(self._r2).reshape(
            (self.n,) + (1,) * (a_plain.ndim - 1))
        return self.mul(a_plain, jnp.broadcast_to(r2, a_plain.shape))

    def from_mont(self, a):
        """Montgomery form -> plain limbs (mul by 1). libff as_bigint()."""
        o = jnp.asarray(self._one_plain).reshape(
            (self.n,) + (1,) * (a.ndim - 1))
        return self.mul(a, jnp.broadcast_to(o, a.shape))

    # -- predicates -----------------------------------------------------------------
    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def eq(self, a, b):
        # canonical representation => limb-wise equality
        return jnp.all(a == b, axis=0)

    def select(self, mask, a, b):
        """where(mask, a, b) with batch-shaped mask."""
        return jnp.where(mask[None], a, b)

    # -- exponentiation --------------------------------------------------------------
    def pow_static(self, a, e: int):
        """a^e for a static host integer exponent (square-and-multiply as a
        lax.scan over the bits, msb first; exponentiation.tcc:22-47)."""
        if e == 0:
            return self.one(a.shape[1:])
        bits = np.array([int(c) for c in bin(e)[2:]], dtype=np.bool_)
        acc = jnp.broadcast_to(
            self.one().reshape((self.n,) + (1,) * (a.ndim - 1)), a.shape)

        def step(acc, bit):
            acc = self.sqr(acc)
            acc = self.select(
                jnp.broadcast_to(bit, acc.shape[1:]), self.mul(acc, a), acc)
            return acc, None

        acc, _ = jax.lax.scan(step, acc, jnp.asarray(bits))
        return acc

    def inv(self, a):
        """Fermat inverse a^(p-2); maps 0 -> 0 (convenient for masked batch
        paths; libff asserts non-zero instead, fp.tcc:679-727)."""
        return self.pow_static(a, self.p - 2)

    def batch_inverse(self, a, axis=-1):
        """Montgomery-trick batched inversion along a batch axis
        (field_utils.tcc:419-439) as two associative scans + one Fermat
        inversion.  Zeros pass through as zeros."""
        axis = axis % a.ndim
        nz = ~self.is_zero(a)
        one = jnp.broadcast_to(
            self.one().reshape((self.n,) + (1,) * (a.ndim - 1)), a.shape)
        x = jnp.where(nz[None], a, one)
        mulfn = lambda u, v: self.mul(u, v)
        pre = jax.lax.associative_scan(mulfn, x, axis=axis)
        suf = jax.lax.associative_scan(mulfn, x, axis=axis, reverse=True)
        total = jax.lax.index_in_dim(pre, pre.shape[axis] - 1, axis=axis,
                                     keepdims=True)
        inv_total = self.inv(total)
        # exclusive prefix/suffix
        excl_pre = jnp.roll(pre, 1, axis=axis)
        excl_pre = _set_index(excl_pre, 0, one, axis)
        excl_suf = jnp.roll(suf, -1, axis=axis)
        excl_suf = _set_index(excl_suf, a.shape[axis] - 1, one, axis)
        out = self.mul(self.mul(excl_pre, excl_suf),
                       jnp.broadcast_to(inv_total, a.shape))
        return jnp.where(nz[None], out, jnp.zeros_like(out))

    # -- square roots ------------------------------------------------------------------
    def sqrt(self, a):
        """Tonelli-Shanks (fp.tcc:763-812) with jit-safe control flow.

        Returns (root, is_square). For non-residues root is unspecified.
        """
        mp = self.mp
        nqr_to_t = self.const(self._host.pow(self._host.nqr(), mp.t))
        batch = a.shape[1:]
        z = jnp.broadcast_to(nqr_to_t.reshape((self.n,) + (1,) * len(batch)),
                             a.shape)
        w = self.pow_static(a, mp.t_minus_1_over_2)
        x = self.mul(a, w)
        b = self.mul(x, w)
        one = jnp.broadcast_to(
            self.one().reshape((self.n,) + (1,) * len(batch)), a.shape)
        v0 = jnp.full(batch, mp.s, dtype=jnp.int32)

        def order_of(b):
            """smallest m with b^(2^m) == 1, in at most s masked steps."""
            def step(_, st):
                m, cur, done = st
                notdone = ~done
                m = m + notdone.astype(jnp.int32)
                cur = self.select(notdone, self.sqr(cur), cur)
                done = done | self.eq(cur, one)
                return (m, cur, done)

            m0 = jnp.zeros(batch, dtype=jnp.int32)
            m, _, _ = jax.lax.fori_loop(0, mp.s, step,
                                        (m0, b, self.eq(b, one)))
            return m

        def cond(state):
            _, _, b, _, _ = state
            return ~jnp.all(self.eq(b, one))

        def body(state):
            x, z, b, w, v = state
            m = order_of(b)
            active = ~self.eq(b, one)
            # w = z^(2^(v-m-1)) via repeated squaring with mask
            e = v - m - 1
            wz = z
            # square wz (v-m-1) times: loop s times with predicate
            def sq_step(k, wz):
                do = (k < e) & active
                return self.select(do, self.sqr(wz), wz)
            wz = jax.lax.fori_loop(0, mp.s, sq_step, wz)
            z2 = self.sqr(wz)
            x = self.select(active, self.mul(x, wz), x)
            b = self.select(active, self.mul(b, z2), b)
            z = self.select(active, z2, z)
            v = jnp.where(active, m, v)
            return (x, z, b, w, v)

        x, _, b, _, _ = jax.lax.while_loop(cond, body, (x, z, b, w, v0))
        # verify: x^2 == a
        ok = self.eq(self.sqr(x), a)
        return x, ok


def _set_index(x, idx, val, axis):
    """x with x[..., idx, ...] (along `axis`) replaced by the same slice of
    `val` (val broadcast-compatible with x)."""
    sl = [slice(None)] * x.ndim
    sl[axis] = idx
    sl = tuple(sl)
    vs = jnp.broadcast_to(val, x.shape)[sl]
    return x.at[sl].set(vs)


@functools.lru_cache(maxsize=None)
def prime_field(p: int, bits: int | None = None, name: str = "Fp") -> PrimeField:
    return PrimeField(p, bits, name)
