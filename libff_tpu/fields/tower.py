"""Batched tower-extension field arithmetic on device.

The device counterpart of libff's Fp2/Fp3/Fp4/Fp6/Fp12 models
(libff/algebra/fields/fp*.tcc), built as a generic quadratic/cubic
extension over any device field object — the same recursive construction
as the host oracle (host/field.py).  An element of a degree-d extension is
an array with one extra leading axis of size d:

    Fp    (n, *batch)
    Fp2   (2, n, *batch)
    Fp6   (3, 2, n, *batch)
    Fp12  (2, 3, 2, n, *batch)

Multiplication uses Karatsuba for d=2 (fp2.tcc:101-114) and the
interpolation-style 3-way formula for d=3 (fp6_3over2.tcc), exactly the
reference's operation counts.  Multiplication by the non-residue is
special-cased for small constants (e.g. -1 -> negate; 9+u -> shift-add
chains), which is where most of the reference's hand-tuned
mul_by_non_residue savings come from.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .fp import align_batch


def generic_pow_static(F, a, e: int):
    """Square-and-multiply over the bits of a static exponent, as lax.scan."""
    if e < 0:
        return generic_pow_static(F, F.inv(a), -e)
    batch = a.shape[F.el_ndim:]
    if e == 0:
        return F.one(batch)
    bits = np.array([int(c) for c in bin(e)[2:]], dtype=np.bool_)
    acc = jnp.broadcast_to(
        F.one().reshape(F.one().shape + (1,) * len(batch)), a.shape)

    def step(acc, bit):
        acc = F.sqr(acc)
        acc = F.select(jnp.broadcast_to(bit, batch), F.mul(acc, a), acc)
        return acc, None

    acc, _ = jax.lax.scan(step, acc, jnp.asarray(bits))
    return acc


def generic_batch_inverse(F, a, axis=-1):
    """Montgomery-trick batch inversion via two associative scans."""
    axis = axis % a.ndim
    nz = ~F.is_zero(a)
    one = jnp.broadcast_to(
        F.one().reshape(F.one().shape + (1,) * (a.ndim - F.el_ndim)), a.shape)
    x = jnp.where(_emask(F, nz, a.ndim), a, one)
    mulfn = lambda u, v: F.mul(u, v)
    pre = jax.lax.associative_scan(mulfn, x, axis=axis)
    suf = jax.lax.associative_scan(mulfn, x, axis=axis, reverse=True)
    total = jax.lax.index_in_dim(pre, pre.shape[axis] - 1, axis=axis,
                                 keepdims=True)
    inv_total = F.inv(total)
    excl_pre = jnp.roll(pre, 1, axis=axis)
    excl_pre = _set_index(excl_pre, 0, one, axis)
    excl_suf = jnp.roll(suf, -1, axis=axis)
    excl_suf = _set_index(excl_suf, a.shape[axis] - 1, one, axis)
    out = F.mul(F.mul(excl_pre, excl_suf),
                jnp.broadcast_to(inv_total, a.shape))
    return jnp.where(_emask(F, nz, a.ndim), out, jnp.zeros_like(out))


def generic_sqrt(F, a, s: int, t: int, nqr_to_t_dev):
    """Batched Tonelli-Shanks over any device field (fp2.tcc:178-228 /
    fp.tcc:763-812 semantics), with BOUNDED jit-safe control flow: the
    main loop runs exactly `s` masked iterations (v strictly decreases per
    active round, so s iterations always suffice — the reference loops
    until b == 1, which diverges on non-residues).

    Returns (root, is_square); zero maps to (zero, True); for non-residue
    lanes the root is unspecified and is_square is False.

    F: device field (PrimeField or ExtField); s, t: p^degree - 1 =
    2^s * t; nqr_to_t_dev: device constant nqr^t (no batch dims).
    """
    batch = a.shape[F.el_ndim:]
    zero_in = F.is_zero(a)
    one_el = F.one(batch)
    # substitute 1 for zero lanes so the ladder stays well-defined
    a_safe = F.select(zero_in, one_el, a)

    def bc(c):
        return jnp.broadcast_to(
            c.reshape(c.shape + (1,) * len(batch)), c.shape + tuple(batch))

    z = bc(nqr_to_t_dev)
    w = generic_pow_static(F, a_safe, (t - 1) // 2)
    x = F.mul(a_safe, w)                      # a^((t+1)/2)
    b = F.mul(x, w)                           # a^t
    v = jnp.full(batch, s, dtype=jnp.int32)

    def order_of(b):
        def step(_, st):
            m, cur, done = st
            notdone = ~done
            m = m + notdone.astype(jnp.int32)
            cur = F.select(notdone, F.sqr(cur), cur)
            done = done | F.eq(cur, one_el)
            return (m, cur, done)

        m0 = jnp.zeros(batch, dtype=jnp.int32)
        m, _, _ = jax.lax.fori_loop(0, s, step, (m0, b, F.eq(b, one_el)))
        return m

    def body(_, state):
        x, z, b, v = state
        active = ~F.eq(b, one_el)
        m = order_of(b)
        e = v - m - 1                          # z^(2^e) via masked squaring
        wz = z

        def sq_step(k, wz):
            do = (k < e) & active
            return F.select(do, F.sqr(wz), wz)

        wz = jax.lax.fori_loop(0, s, sq_step, wz)
        z2 = F.sqr(wz)
        x = F.select(active, F.mul(x, wz), x)
        b = F.select(active, F.mul(b, z2), b)
        z = F.select(active, z2, z)
        v = jnp.where(active, m, v)
        return (x, z, b, v)

    x, _, b, _ = jax.lax.fori_loop(0, s, body, (x, z, b, v))
    x = F.select(zero_in, F.zero(batch), x)
    ok = F.eq(F.sqr(x), a)
    return x, ok


def _emask(F, mask, ndim):
    return mask[(None,) * (ndim - mask.ndim)]


def _set_index(x, idx, val, axis):
    sl = [slice(None)] * x.ndim
    sl[axis] = idx
    sl = tuple(sl)
    return x.at[sl].set(jnp.broadcast_to(val, x.shape)[sl])


class ExtField:
    """Degree-d extension B[x]/(x^d - nr) over device field B."""

    def __init__(self, B, host_ext, name: str | None = None):
        """B: device base field; host_ext: the host Ext (for constants)."""
        assert host_ext.d in (2, 3)
        self.B = B
        self.h = host_ext
        self.d = host_ext.d
        self.name = name or host_ext.name
        self.el_ndim = 1 + B.el_ndim
        self.degree = host_ext.degree
        self._frob_host = host_ext.frobenius_coeffs()
        self._nr_host = host_ext.nr

    # -- host interop -----------------------------------------------------------
    def from_host(self, v) -> jnp.ndarray:
        """Host tuple element -> device constant, shape (d, *base)."""
        return jnp.stack([self.B.from_host(c) for c in v], axis=0)

    def to_host(self, x):
        """Device element (no batch) -> host tuple."""
        return tuple(self.B.to_host(x[i]) for i in range(self.d))

    def from_host_batch(self, vals):
        """List of host tuples -> batched device array (d, *base, N)."""
        return jnp.stack(
            [self.B.from_host_batch([v[i] for v in vals])
             for i in range(self.d)], axis=0)

    def to_host_batch(self, x):
        """Batched device array -> list of host tuples."""
        comps = [self.B.to_host_batch(x[i]) for i in range(self.d)]
        return list(zip(*comps))

    # -- constructors ---------------------------------------------------------------
    def zero(self, batch=()):
        return jnp.stack([self.B.zero(batch)] * self.d, axis=0)

    def one(self, batch=()):
        rest = [self.B.zero(batch)] * (self.d - 1)
        return jnp.stack([self.B.one(batch)] + rest, axis=0)

    # -- predicates --------------------------------------------------------------------
    def is_zero(self, a):
        r = self.B.is_zero(a[0])
        for i in range(1, self.d):
            r = r & self.B.is_zero(a[i])
        return r

    def eq(self, a, b):
        r = self.B.eq(a[0], b[0])
        for i in range(1, self.d):
            r = r & self.B.eq(a[i], b[i])
        return r

    def select(self, mask, a, b):
        return jnp.where(mask[(None,) * self.el_ndim], a, b)

    # -- linear ops -----------------------------------------------------------------------
    def add(self, a, b):
        a, b = align_batch(a, b)
        return jnp.stack([self.B.add(a[i], b[i]) for i in range(self.d)], 0)

    def sub(self, a, b):
        a, b = align_batch(a, b)
        return jnp.stack([self.B.sub(a[i], b[i]) for i in range(self.d)], 0)

    def neg(self, a):
        return jnp.stack([self.B.neg(a[i]) for i in range(self.d)], 0)

    def double(self, a):
        return jnp.stack([self.B.double(a[i]) for i in range(self.d)], 0)

    def mul_small_const(self, a, c_host):
        """Multiply by a host constant with small / structured coefficients
        (addition chains instead of full Montgomery mults)."""
        d = self.d
        B = self.B
        outs = []
        for k in range(d):  # output coefficient k
            acc = None
            for i in range(d):  # a_i * c_{j} with i + j ≡ k, reduced by nr
                j = (k - i) % d
                cij = c_host[j]
                if i + j >= d:
                    term = B.mul_small_const(
                        a[i], self.h.B.mul(self._nr_host, cij))
                else:
                    term = B.mul_small_const(a[i], cij)
                acc = term if acc is None else B.add(acc, term)
            outs.append(acc)
        return jnp.stack(outs, 0)

    def mul_by_nr(self, x):
        """x (a *base* element) times the non-residue."""
        return self.B.mul_small_const(x, self._nr_host)

    # -- multiplication ----------------------------------------------------------------------
    def mul(self, a, b):
        a, b = align_batch(a, b)
        B, d = self.B, self.d
        if d == 2:
            a0, a1 = a[0], a[1]
            b0, b1 = b[0], b[1]
            v0 = B.mul(a0, b0)
            v1 = B.mul(a1, b1)
            t = B.mul(B.add(a0, a1), B.add(b0, b1))
            c1 = B.sub(B.sub(t, v0), v1)
            c0 = B.add(v0, self.mul_by_nr(v1))
            return jnp.stack([c0, c1], 0)
        a0, a1, a2 = a[0], a[1], a[2]
        b0, b1, b2 = b[0], b[1], b[2]
        v0 = B.mul(a0, b0)
        v1 = B.mul(a1, b1)
        v2 = B.mul(a2, b2)
        c0 = B.add(v0, self.mul_by_nr(
            B.sub(B.mul(B.add(a1, a2), B.add(b1, b2)), B.add(v1, v2))))
        c1 = B.add(
            B.sub(B.mul(B.add(a0, a1), B.add(b0, b1)), B.add(v0, v1)),
            self.mul_by_nr(v2))
        c2 = B.add(
            B.sub(B.mul(B.add(a0, a2), B.add(b0, b2)), B.add(v0, v2)), v1)
        return jnp.stack([c0, c1, c2], 0)

    def sqr(self, a):
        B, d = self.B, self.d
        if d == 2:
            # complex squaring (fp2.tcc:122-135)
            a0, a1 = a[0], a[1]
            v = B.mul(a0, a1)
            t0 = B.mul(B.add(a0, a1), B.add(a0, self.mul_by_nr(a1)))
            c0 = B.sub(B.sub(t0, v), self.mul_by_nr(v))
            c1 = B.double(v)
            return jnp.stack([c0, c1], 0)
        # CH-SQR2 style (fp6_3over2.tcc squared)
        a0, a1, a2 = a[0], a[1], a[2]
        s0 = B.sqr(a0)
        ab = B.mul(a0, a1)
        s1 = B.double(ab)
        s2 = B.sqr(B.add(B.sub(a0, a1), a2))
        bc = B.mul(a1, a2)
        s3 = B.double(bc)
        s4 = B.sqr(a2)
        c0 = B.add(s0, self.mul_by_nr(s3))
        c1 = B.add(s1, self.mul_by_nr(s4))
        c2 = B.sub(B.add(B.add(s1, s2), s3), B.add(s0, s4))
        return jnp.stack([c0, c1, c2], 0)

    # -- inversion -----------------------------------------------------------------------------
    def inv(self, a):
        B, d = self.B, self.d
        if d == 2:
            a0, a1 = a[0], a[1]
            t = B.sub(B.sqr(a0), self.mul_by_nr(B.sqr(a1)))
            ti = B.inv(t)
            return jnp.stack([B.mul(a0, ti), B.neg(B.mul(a1, ti))], 0)
        a0, a1, a2 = a[0], a[1], a[2]
        t0 = B.sqr(a0)
        t1 = B.sqr(a1)
        t2 = B.sqr(a2)
        t3 = B.mul(a0, a1)
        t4 = B.mul(a0, a2)
        t5 = B.mul(a1, a2)
        c0 = B.sub(t0, self.mul_by_nr(t5))
        c1 = B.sub(self.mul_by_nr(t2), t3)
        c2 = B.sub(t1, t4)
        t6 = B.inv(B.add(B.mul(a0, c0),
                         self.mul_by_nr(B.add(B.mul(a2, c1), B.mul(a1, c2)))))
        return jnp.stack([B.mul(t6, c0), B.mul(t6, c1), B.mul(t6, c2)], 0)

    def batch_inverse(self, a, axis=-1):
        return generic_batch_inverse(self, a, axis)

    # -- exponentiation / Frobenius ------------------------------------------------------------
    def pow_static(self, a, e: int):
        return generic_pow_static(self, a, e)

    def sqrt(self, a):
        """Batched Tonelli-Shanks over the extension (fp2.tcc:178-228),
        with the host oracle's deterministic non-residue choice — device
        and host roots agree exactly.  Returns (root, is_square)."""
        s, t, nqr = self.h.two_adic_params()
        nqr_to_t = self.from_host(self.h.pow(nqr, t))
        return generic_sqrt(self, a, s, t, nqr_to_t)

    def frobenius(self, a, power: int = 1):
        """a^(p^power): coefficient-wise base Frobenius times the derived
        coefficient table (same values as libff's Frobenius_coeffs_c1/_c2)."""
        j = power % self.degree
        co = self._frob_host[j]
        outs = []
        for i in range(self.d):
            x = self.B.frobenius(a[i], power)
            if self.h.B.eq(co[i], self.h.B.one()):
                outs.append(x)
            else:
                outs.append(self.B.mul(x, _bc(self.B.from_host(co[i]), x)))
        return jnp.stack(outs, 0)

    def conjugate(self, a):
        """Unitary inverse for d == 2 (fp12_2over3over2.tcc:201)."""
        assert self.d == 2
        return jnp.stack([a[0], self.B.neg(a[1])], 0)

    def coeffs(self, a):
        return tuple(a[i] for i in range(self.d))

    def from_coeffs(self, cs):
        """Stack d coefficient arrays (batch-aligned) into an element."""
        cs = list(cs)
        nd = max(c.ndim for c in cs)
        cs = [c.reshape(c.shape + (1,) * (nd - c.ndim)) for c in cs]
        cs = jnp.broadcast_arrays(*cs)
        return jnp.stack(cs, axis=0)

    unitary_inverse = conjugate

    # -- cyclotomic-subgroup / sparse GT ops (gt_ops.py) ---------------------------------------
    def cyclotomic_squared(self, a):
        from . import gt_ops
        return gt_ops.cyclotomic_squared(self, a)

    def cyclotomic_exp(self, a, e: int):
        from . import gt_ops
        return gt_ops.cyclotomic_exp(self, a, e)

    def mul_by_024(self, a, ell_0, ell_VW, ell_VV):
        from . import gt_ops
        return gt_ops.fq12_mul_by_024(self, a, ell_0, ell_VW, ell_VV)

    def mul_by_045(self, a, ell_0, ell_VW, ell_VV):
        from . import gt_ops
        return gt_ops.fq12_mul_by_045(self, a, ell_0, ell_VW, ell_VV)

    def mul_by_023(self, a, other):
        from . import gt_ops
        return gt_ops.fq4_mul_by_023(self, a, other)

    def mul_by_2345(self, a, other):
        from . import gt_ops
        return gt_ops.fq6_2over3_mul_by_2345(self, a, other)

    # -- misc ---------------------------------------------------------------------------------
    def mul_base(self, a, s):
        """Multiply by an element of the immediate base field."""
        return jnp.stack([self.B.mul(a[i], _bc(s, a[i])) for i in range(self.d)], 0)


def _bc(c, like):
    """Broadcast an unbatched constant against a batched element."""
    return jnp.broadcast_to(c.reshape(c.shape + (1,) * (like.ndim - c.ndim)),
                            like.shape)
