"""Formula VM: straight-line field formulas as data, not graphs.

Why this exists.  libff executes EC/pairing formulas as C++ expression
trees over scalar field elements (e.g. alt_bn128_g1.cpp:149-326); the naive
TPU translation inlines one Montgomery-multiplier subgraph per field `mul`,
and XLA compile time grows superlinearly in the number of such subgraphs
(measured: a single Jacobian `add` took ~2 minutes to compile on the CPU
backend, an MSM graph did not finish).  The TPU-native fix is to make the
*formula* data instead of graph: a straight-line program of prime-field
instructions

    (op, src1, src2, dst)      op in {MUL, ADD, SUB}

executed by ONE `lax.scan` whose body contains exactly one Montgomery
multiplier (`PrimeField.mul_loop`), one adder and one subtractor, with a
`lax.switch` picking the unit per step.  Compile cost is O(1) in formula
length; runtime equals the sequential field-op chain, which is what the
formula dependency structure dictates anyway, applied across the whole
batch per step (full VPU-lane occupancy).

Formulas are written once against the generic field API (mul/sqr/add/sub/
neg/double) and traced by symbolic field views:

    * ``FpSym``  — prime field; values are register handles.
    * ``ExtSym`` — quadratic/cubic tower extension over any Sym field,
      with the same Karatsuba/CH-SQR2/non-residue formulas as the host
      oracle (host/field.py) and device tower (fields/tower.py); values
      are tuples of base-field values.

Tracing yields a ``Program`` (instruction table + constant pool + register
count after liveness-based reuse) that `run_program` executes on device.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

MUL, ADD, SUB = 0, 1, 2

U32 = jnp.uint32


class Reg(int):
    """A virtual-register handle.  Subclasses int so the emitter can use it
    directly in instruction rows, while remaining distinguishable from a
    plain host integer VALUE: Sym field ops coerce non-Reg ints to constant
    registers, which lets host-oracle formula code (whose Fp elements are
    plain ints) be traced unchanged into device programs."""
    __slots__ = ()


@dataclasses.dataclass(frozen=True)
class Program:
    instr: np.ndarray                 # (S, 4) int32 rows [op, s1, s2, dst]
    num_regs: int
    const_loads: tuple                # ((phys_reg, limbs_tuple), ...)
    input_regs: tuple                 # phys reg per input, in order
    output_regs: tuple                # phys reg per output, in order
    # SSA (pre-allocation) view, consumed by run_program_rounds: the same
    # instruction list over virtual registers (no reuse), plus the virtual
    # ids of constants/inputs/outputs.
    ssa_instr: np.ndarray | None = None
    ssa_consts: tuple = ()            # ((vreg, limbs_tuple), ...)
    ssa_inputs: tuple = ()            # vreg per input, in order
    ssa_outputs: tuple = ()           # vreg per output, in order

    @property
    def num_instructions(self) -> int:
        return len(self.instr)


class Emitter:
    """Collects instructions over SSA virtual registers; `finish` performs
    liveness-based physical register allocation."""

    def __init__(self, F):
        """F: device PrimeField (supplies limb count + Montgomery form)."""
        self.F = F
        self.instr: list[list[int]] = []
        self.n_virtual = 0
        self._inputs: list[int] = []
        self._consts: dict[int, int] = {}      # host value -> virtual reg
        self._const_list: list[tuple[int, int]] = []  # (vreg, host value)

    # -- registers -----------------------------------------------------------
    def fresh(self) -> Reg:
        r = Reg(self.n_virtual)
        self.n_virtual += 1
        return r

    def input(self) -> Reg:
        r = self.fresh()
        self._inputs.append(r)
        return r

    def const(self, host_value: int) -> Reg:
        """Montgomery-form field constant, deduplicated."""
        v = int(host_value) % self.F.p
        if v not in self._consts:
            r = self.fresh()
            self._consts[v] = r
            self._const_list.append((r, v))
        return self._consts[v]

    def zero(self) -> Reg:
        return self.const_plain(0)

    def const_plain(self, v: int) -> Reg:
        """A register preloaded with raw limbs (not Montgomery-converted).
        Only 0 is representation-independent; other plain uses are rare."""
        assert v == 0, "only the zero register is form-independent"
        key = -1
        if key not in self._consts:
            r = self.fresh()
            self._consts[key] = r
            self._const_list.append((r, None))
        return self._consts[key]

    # -- instructions --------------------------------------------------------
    def emit(self, op: int, s1: int, s2: int) -> Reg:
        d = self.fresh()
        self.instr.append([op, s1, s2, d])
        return d

    # -- finalize ------------------------------------------------------------
    def finish(self, outputs: Sequence[int]) -> Program:
        """Allocate physical registers with a linear-scan free list.

        Inputs/constants are freed after their last use (their physical
        slots may be reused); outputs are never freed.
        """
        import math

        outputs = list(outputs)
        last_use = {}
        for i, (op, s1, s2, d) in enumerate(self.instr):
            last_use[s1] = i
            last_use[s2] = i
        INF = math.inf
        for r in outputs:
            last_use[r] = INF

        phys_of: dict[int, int] = {}
        free: list[int] = []
        n_phys = 0

        def alloc(v):
            nonlocal n_phys
            if v in phys_of:
                return phys_of[v]
            if free:
                p = free.pop()
            else:
                p = n_phys
                n_phys += 1
            phys_of[v] = p
            return p

        # inputs and constants are live from the start
        for r, _ in self._const_list:
            alloc(r)
        for r in self._inputs:
            alloc(r)

        rows = []
        live_until = {v: u for v, u in last_use.items()}
        for i, (op, s1, s2, d) in enumerate(self.instr):
            p1 = phys_of[s1]
            p2 = phys_of[s2]
            # free operands whose last use is this instruction BEFORE
            # allocating the destination: dst may not alias a source,
            # because the VM computes out-of-place then writes back.
            # (Aliasing dst==src is actually safe — the read happens before
            # the write — so we free first to maximize reuse.)
            for s in {s1, s2}:
                if live_until.get(s, -1) == i and s in phys_of:
                    free.append(phys_of.pop(s))
            pd = alloc(d)
            rows.append([op, p1, p2, pd])
            if live_until.get(d, -1) == i and d not in (s1, s2):
                # result never used (dead code) — keep the write anyway
                pass

        const_loads = []
        # physical slots of constants may have been reused later; but the
        # initial load happens before any instruction, so the original
        # mapping (captured before reuse) is what we need.  Rebuild it:
        # constants were allocated first and freed only after last use,
        # so their initial physical registers are their alloc-time ids.
        # We recorded them implicitly: re-run allocation order.
        # Simpler: constants and inputs got distinct physical ids
        # 0..k-1 in allocation order above.
        p = 0
        for r, v in self._const_list:
            if v is None:
                limbs = tuple([0] * self.F.n)
            else:
                import libff_tpu.host.mont as hm

                limbs = tuple(hm.int_to_limbs(
                    hm.to_mont(self.F.mp, v), self.F.n))
            const_loads.append((p, limbs))
            p += 1
        input_regs = tuple(range(p, p + len(self._inputs)))

        out_phys = tuple(phys_of[r] for r in outputs)
        ssa_consts = tuple(
            (int(r), limbs)
            for (r, _), (_, limbs) in zip(self._const_list, const_loads))
        return Program(
            instr=np.array(rows, dtype=np.int32).reshape(-1, 4),
            num_regs=n_phys,
            const_loads=tuple(const_loads),
            input_regs=input_regs,
            output_regs=out_phys,
            ssa_instr=np.array(self.instr, dtype=np.int32).reshape(-1, 4),
            ssa_consts=ssa_consts,
            ssa_inputs=tuple(int(r) for r in self._inputs),
            ssa_outputs=tuple(int(r) for r in outputs),
        )


# ---------------------------------------------------------------------------
# Symbolic field views (the tracing "interpreters" of the field API)
# ---------------------------------------------------------------------------


class FpSym:
    """Prime field whose values are VM register handles (vm.Reg).

    Plain (non-Reg) integer operands are coerced to constant registers, so
    host-oracle formula code — whose Fp elements are plain Python ints —
    traces through unchanged (the key to curve-generic device pairings)."""

    degree = 1

    def __init__(self, em: Emitter):
        self.em = em
        self.p = em.F.p

    def _c(self, v):
        if isinstance(v, Reg):
            return v
        return self.em.zero() if int(v) % self.p == 0 else self.em.const(v)

    def zero(self):
        return self.em.zero()

    def one(self):
        return self.em.const(1)

    def const(self, v: int):
        return self._c(v)

    def add(self, a, b):
        return self.em.emit(ADD, self._c(a), self._c(b))

    def sub(self, a, b):
        return self.em.emit(SUB, self._c(a), self._c(b))

    def neg(self, a):
        return self.em.emit(SUB, self.em.zero(), self._c(a))

    def mul(self, a, b):
        return self.em.emit(MUL, self._c(a), self._c(b))

    def sqr(self, a):
        a = self._c(a)
        return self.em.emit(MUL, a, a)

    def double(self, a):
        a = self._c(a)
        return self.em.emit(ADD, a, a)

    def mul_small_const(self, a, c: int):
        """Shift-add chain for small constants (the vector analogue of
        libff's mul_by_non_residue specializations); falls back to a full
        Montgomery mul by a pooled constant."""
        a = self._c(a)
        c = int(c) % self.p
        if c == 0:
            return self.em.zero()
        if c == 1:
            return a
        neg = False
        k = c
        if self.p - c <= 64:
            k = self.p - c
            neg = True
        if k <= 64:
            acc = None
            for bit in bin(k)[2:]:
                if acc is not None:
                    acc = self.double(acc)
                if bit == "1":
                    acc = a if acc is None else self.add(acc, a)
            return self.neg(acc) if neg else acc
        return self.mul(a, self.em.const(c))

    def mul_scalar_int(self, a, k: int):
        return self.mul_small_const(a, k)

    def pow_static(self, a, e: int):
        """Square-and-multiply ladder emitted as instructions (the VM
        analogue of exponentiation.tcc:22-47); e is a static host int."""
        assert e >= 0
        if e == 0:
            return self.one()
        a = self._c(a)
        acc = a
        for bit in bin(e)[3:]:
            acc = self.sqr(acc)
            if bit == "1":
                acc = self.mul(acc, a)
        return acc

    def pow(self, a, e: int):
        return self.pow_static(a, e)

    def inv(self, a):
        """Fermat inverse a^(p-2) (maps 0 -> 0), as an emitted ladder."""
        return self.pow_static(a, self.p - 2)

    def frobenius(self, a, power: int = 1):
        return self._c(a)

    def is_zero(self, a):
        raise TypeError("predicates are not VM-traceable; mask outside")

    def select(self, mask, a, b):
        raise TypeError("select is not VM-traceable; mask outside")


class ExtSym:
    """Degree-d tower extension over a Sym base, mirroring the formulas of
    the host oracle (host/field.py Ext) exactly.  Values are d-tuples."""

    def __init__(self, B, host_ext):
        self.B = B
        self.h = host_ext
        self.d = host_ext.d
        self.degree = host_ext.degree

    # constants -------------------------------------------------------------
    def zero(self):
        return tuple(self.B.zero() for _ in range(self.d))

    def one(self):
        return (self.B.one(),) + tuple(
            self.B.zero() for _ in range(self.d - 1))

    def const(self, host_val):
        """Host tuple element of this extension -> register tuple."""
        return tuple(self.B.const(c) for c in host_val)

    # ring ops ---------------------------------------------------------------
    def add(self, a, b):
        return tuple(self.B.add(x, y) for x, y in zip(a, b))

    def sub(self, a, b):
        return tuple(self.B.sub(x, y) for x, y in zip(a, b))

    def neg(self, a):
        return tuple(self.B.neg(x) for x in a)

    def double(self, a):
        return tuple(self.B.double(x) for x in a)

    def mul_by_nr(self, x):
        """Base-field element times the non-residue (shift-add chains when
        the non-residue is small/structured, as in the reference's
        mul_by_non_residue)."""
        nr = self.h.nr
        if self.h.d >= 2 and not isinstance(nr, tuple):
            return self.B.mul_small_const(x, nr)
        return self.B.mul_small_const_ext(x, nr) if hasattr(
            self.B, "mul_small_const_ext") else self.B.mul(x, self.B.const(nr))

    def mul(self, a, b):
        B, d = self.B, self.d
        if d == 2:
            a0, a1 = a
            b0, b1 = b
            v0 = B.mul(a0, b0)
            v1 = B.mul(a1, b1)
            t = B.mul(B.add(a0, a1), B.add(b0, b1))
            c1 = B.sub(B.sub(t, v0), v1)
            c0 = B.add(v0, self.mul_by_nr(v1))
            return (c0, c1)
        a0, a1, a2 = a
        b0, b1, b2 = b
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
        return (c0, c1, c2)

    def sqr(self, a):
        B, d = self.B, self.d
        if d == 2:
            a0, a1 = a
            v = B.mul(a0, a1)
            t0 = B.mul(B.add(a0, a1), B.add(a0, self.mul_by_nr(a1)))
            c0 = B.sub(B.sub(t0, v), self.mul_by_nr(v))
            c1 = B.double(v)
            return (c0, c1)
        a0, a1, a2 = a
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
        return (c0, c1, c2)

    def mul_base(self, a, s):
        return tuple(self.B.mul(x, s) for x in a)

    def mul_small_const_ext(self, a, c_host):
        """Multiply by a host constant of THIS extension (for nested
        non-residues like Fq6's (9, 1) over Fq2)."""
        d = self.d
        B = self.B
        outs = []
        for k in range(d):
            acc = None
            for i in range(d):
                j = (k - i) % d
                cij = self.h.coeffs(c_host)[j]
                if i + j >= d:
                    cij = self.h.B.mul(self.h.nr, cij)
                term = (B.mul_small_const_ext(a[i], cij)
                        if hasattr(B, "mul_small_const_ext")
                        else B.mul_small_const(a[i], cij))
                acc = term if acc is None else B.add(acc, term)
            outs.append(acc)
        return tuple(outs)

    def mul_small_const(self, a, c_host):
        return self.mul_small_const_ext(a, c_host)

    def conjugate(self, a):
        assert self.d == 2
        return (a[0], self.B.neg(a[1]))

    def coeffs(self, a):
        return a

    def from_coeffs(self, cs):
        return tuple(cs)

    unitary_inverse = conjugate

    # cyclotomic-subgroup / sparse GT ops (fields/gt_ops.py) — same surface
    # as the host Ext so host pairing code traces unchanged
    def cyclotomic_squared(self, a):
        from .fields import gt_ops
        return gt_ops.cyclotomic_squared(self, a)

    def cyclotomic_exp(self, a, e: int):
        from .fields import gt_ops
        return gt_ops.cyclotomic_exp(self, a, e)

    def mul_by_024(self, a, ell_0, ell_VW, ell_VV):
        from .fields import gt_ops
        return gt_ops.fq12_mul_by_024(self, a, ell_0, ell_VW, ell_VV)

    def mul_by_045(self, a, ell_0, ell_VW, ell_VV):
        from .fields import gt_ops
        return gt_ops.fq12_mul_by_045(self, a, ell_0, ell_VW, ell_VV)

    def mul_by_023(self, a, other):
        from .fields import gt_ops
        return gt_ops.fq4_mul_by_023(self, a, other)

    def mul_by_2345(self, a, other):
        from .fields import gt_ops
        return gt_ops.fq6_2over3_mul_by_2345(self, a, other)

    def inv(self, a):
        """Tower inversion, same formulas as the host oracle (host/field.py
        Ext.inv, after fp2.tcc:153-168); bottoms out in the Fermat ladder."""
        B, d = self.B, self.d
        if d == 2:
            a0, a1 = a
            t = B.sub(B.sqr(a0), self.mul_by_nr(B.sqr(a1)))
            ti = B.inv(t)
            return (B.mul(a0, ti), B.neg(B.mul(a1, ti)))
        a0, a1, a2 = a
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
        return (B.mul(t6, c0), B.mul(t6, c1), B.mul(t6, c2))

    def pow_static(self, a, e: int):
        assert e >= 0
        if e == 0:
            return self.one()
        acc = a
        for bit in bin(e)[3:]:
            acc = self.sqr(acc)
            if bit == "1":
                acc = self.mul(acc, a)
        return acc

    def pow(self, a, e: int):
        return self.pow_static(a, e)

    def mul_scalar_int(self, a, k: int):
        return tuple(self.B.mul_scalar_int(x, k) for x in a)

    def frobenius(self, a, power: int = 1):
        j = power % self.degree
        co = self.h.frobenius_coeffs()[j]
        out = []
        for i, x in enumerate(a):
            y = self.B.frobenius(x, power)
            if self.h.B.eq(co[i], self.h.B.one()):
                out.append(y)
            else:
                out.append(self.B.mul(y, self.B.const(co[i])
                                      if not isinstance(co[i], tuple)
                                      else self.B.const(co[i])))
        return tuple(out)


def flatten_value(v) -> list[int]:
    """Flatten a Sym value (register or nested tuple) to a register list,
    lowest coefficient first (libff coefficient order)."""
    if isinstance(v, (int, np.integer)):
        return [v]          # preserve Reg-ness; trace_general validates
    out = []
    for c in v:
        out.extend(flatten_value(c))
    return out


def _fresh_value(em: Emitter, s):
    if isinstance(s, FpSym):
        return em.input()
    return tuple(_fresh_value(em, s.B) for _ in range(s.d))


def trace_general(F, build: Callable) -> Program:
    """Trace an arbitrary formula into a Program.

    `build(fp_sym, mksym, inp)` is called with:
      * fp_sym  — the prime-field Sym view,
      * mksym   — host field -> Sym view (builds/returns the tower level),
      * inp     — Sym view -> fresh input value (call in input order),
    and must return the flat list/tuple of output values.
    """
    em = Emitter(F)
    fp = FpSym(em)
    cache: dict[int, Any] = {}

    def mksym(h):
        from .host import field as hf

        if isinstance(h, hf.Fp):
            return fp
        if id(h) not in cache:
            cache[id(h)] = ExtSym(mksym(h.B), h)
        return cache[id(h)]

    def inp(sym):
        return _fresh_value(em, sym)

    outs = build(fp, mksym, inp)
    if not isinstance(outs, (list, tuple)):
        outs = (outs,)
    out_regs = []
    for o in outs:
        for r in flatten_value(o):
            # a plain int here would silently alias a register index
            assert isinstance(r, Reg), (
                "program output contains a non-register value; coerce host "
                "constants through the Sym field before returning")
            out_regs.append(r)
    return em.finish(out_regs)


def trace(F, fn: Callable, num_inputs: int, *, ext=None) -> Program:
    """Trace `fn(sym_field, *input_values)` into a Program.

    F: device PrimeField.  If `ext` (a host Ext) is given, inputs/outputs
    are elements of that extension (nested register tuples); otherwise
    prime-field registers.
    """

    def build(fp, mksym, inp):
        sym = fp if ext is None else mksym(ext)
        ins = [inp(sym) for _ in range(num_inputs)]
        return fn(sym, *ins)

    return trace_general(F, build)


# ---------------------------------------------------------------------------
# Execution
# ---------------------------------------------------------------------------


def flatten_element(Fdev, arr) -> list[jnp.ndarray]:
    """Device field element array -> list of (n, *batch) component arrays,
    lowest coefficient first (matching trace input/output order)."""
    el = Fdev.el_ndim
    n = arr.shape[el - 1]
    batch = arr.shape[el:]
    flat = arr.reshape((-1, n) + batch)
    return [flat[i] for i in range(flat.shape[0])]


def unflatten_element(Fdev, comps: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Inverse of flatten_element: component list -> element array with the
    field's leading extension axes."""
    el = Fdev.el_ndim
    stacked = jnp.stack(list(comps), axis=0)
    if el == 1:
        assert stacked.shape[0] == 1
        return stacked[0]
    # leading ext shape, e.g. (2,), (3, 2), (2, 3, 2)
    shape = []
    f = Fdev
    while hasattr(f, "B"):
        shape.append(f.d)
        f = f.B
    return stacked.reshape(tuple(shape) + stacked.shape[1:])


def run_program(F, prog: Program, inputs: Sequence[jnp.ndarray],
                batch: tuple, *, unroll: int = 1,
                mul: str = "loop") -> list[jnp.ndarray]:
    """Execute `prog` on device field F over a batch.

    inputs: one (n, *batch)-shaped u32 array per input register (prime
    field components, flattened lowest-first for extensions).
    Returns one array per output register.

    unroll / mul: latency knobs for small-batch programs.  Each scan step
    costs one loop turnaround plus (with mul="loop") 16 inner fori-loop
    turnarounds inside the Montgomery multiplier; for batch-starved tail
    programs (window recombination, final exponentiation) set mul="unrolled"
    and unroll>1 to trade instruction-cache size for ~10x lower latency.
    """
    n = F.n
    assert len(inputs) == len(prog.input_regs), (
        f"program expects {len(prog.input_regs)} inputs, got {len(inputs)}")
    regs = jnp.zeros((prog.num_regs, n) + tuple(batch), dtype=U32)
    for (r, limbs) in prog.const_loads:
        c = jnp.asarray(np.array(limbs, dtype=np.uint32)).reshape(
            (n,) + (1,) * len(batch))
        regs = regs.at[r].set(jnp.broadcast_to(c, (n,) + tuple(batch)))
    for r, arr in zip(prog.input_regs, inputs):
        # batch dims trail: pad with singleton dims on the right, then
        # broadcast (align_batch convention of fields/fp.py)
        pad = 1 + len(batch) - arr.ndim
        arr = arr.reshape(arr.shape + (1,) * pad)
        regs = regs.at[r].set(jnp.broadcast_to(arr, (n,) + tuple(batch)))

    instr = jnp.asarray(prog.instr)
    mulfn = {"unrolled": F.mul_unrolled, "sos": F.mul_sos,
             "sos2": F.mul_sos2}.get(mul, F.mul_loop)

    def step(regs, ins):
        op, s1, s2, d = ins[0], ins[1], ins[2], ins[3]
        a = jax.lax.dynamic_index_in_dim(regs, s1, 0, keepdims=False)
        b = jax.lax.dynamic_index_in_dim(regs, s2, 0, keepdims=False)
        out = jax.lax.switch(op, [mulfn, F.add, F.sub], a, b)
        regs = jax.lax.dynamic_update_index_in_dim(regs, out, d, 0)
        return regs, None

    regs, _ = jax.lax.scan(step, regs, instr, unroll=unroll)
    return [regs[r] for r in prog.output_regs]


def mul_levels(prog: Program) -> list[list[int]]:
    """Partition the SSA MUL instructions into dependency levels.

    Level of a value = its multiplication depth: inputs/constants are 0,
    ADD/SUB take the max of their operands, MUL takes max + 1.  All MULs
    of one level have operands computable from levels below, so each level
    can execute as ONE stacked multiplier call (run_program_rounds)."""
    assert prog.ssa_instr is not None, "program predates the SSA capture"
    depth: dict[int, int] = {}
    for r, _ in prog.ssa_consts:
        depth[r] = 0
    for r in prog.ssa_inputs:
        depth[r] = 0
    levels: dict[int, list[int]] = {}
    for i, (op, s1, s2, d) in enumerate(prog.ssa_instr):
        m = max(depth[int(s1)], depth[int(s2)])
        if op == MUL:
            depth[int(d)] = m + 1
            levels.setdefault(m + 1, []).append(i)
        else:
            depth[int(d)] = m
    return [levels[k] for k in sorted(levels)]


def run_program_rounds(F, prog: Program, inputs: Sequence[jnp.ndarray],
                       batch: tuple, *, mul: str | None = None
                       ) -> list[jnp.ndarray]:
    """Execute `prog` by levelized multiplication ROUNDS.

    The scan executor (run_program) issues one field op per step —
    compile-optimal but dispatch/latency-bound on large batches (measured
    ~0.3 Mop/s for a batched Jacobian add on v5e, while the same chip does
    a full G2 mixed-add in 62 ns inside the MSM insert kernel).  This
    executor is the generalization of the direct rounds engine
    (curves/direct.py) to EVERY traced program: MUL instructions are
    levelled by multiplication depth (mul_levels) and each level runs as
    ONE multiplier call on operands stacked along a new axis after the
    limb axis; ADD/SUB run eagerly as vector ops that XLA fuses between
    rounds.  Runtime is bounded by the formula's mul-depth — what the
    dependency structure dictates — instead of its instruction count.

    Results are bit-identical to run_program: same formula sequence, same
    CIOS multiplier, only the schedule differs.

    mul: multiplier variant; default "unrolled" for <=16-limb fields (the
    fully inlined CIOS — XLA compile cost is superlinear in limb count)
    and "loop" for wider fields (still one fori-CIOS per ROUND rather
    than per mul).
    """
    n = F.n
    assert len(inputs) == len(prog.input_regs)
    if mul is None:
        mul = "unrolled" if F.n <= 16 else "loop"
    mulfn = {"unrolled": F.mul_unrolled, "sos": F.mul_sos,
             "sos2": F.mul_sos2}.get(mul, F.mul_loop)

    env: dict[int, jnp.ndarray] = {}
    full = (n,) + tuple(batch)
    for r, limbs in prog.ssa_consts:
        c = jnp.asarray(np.array(limbs, dtype=np.uint32)).reshape(
            (n,) + (1,) * len(batch))
        env[r] = jnp.broadcast_to(c, full)
    for r, arr in zip(prog.ssa_inputs, inputs):
        pad = 1 + len(batch) - arr.ndim
        arr = arr.reshape(arr.shape + (1,) * pad)
        env[r] = jnp.broadcast_to(arr, full)

    rows = prog.ssa_instr
    level_of_instr: dict[int, int] = {}
    for li, instrs in enumerate(mul_levels(prog)):
        for i in instrs:
            level_of_instr[i] = li
    nlevels = len(set(level_of_instr.values()))

    # execute level by level: the MULs of level k first (stacked), then
    # every ADD/SUB whose operands are now available, in program order
    done = np.zeros(len(rows), dtype=bool)

    def drain_addsub():
        for i, (op, s1, s2, d) in enumerate(rows):
            if done[i] or op == MUL:
                continue
            if int(s1) in env and int(s2) in env:
                fn = F.add if op == ADD else F.sub
                env[int(d)] = fn(env[int(s1)], env[int(s2)])
                done[i] = True

    drain_addsub()
    for li in range(nlevels):
        instrs = [i for i in range(len(rows)) if level_of_instr.get(i) == li]
        if len(instrs) == 1:
            op, s1, s2, d = rows[instrs[0]]
            env[int(d)] = mulfn(env[int(s1)], env[int(s2)])
        else:
            s1 = jnp.stack([env[int(rows[i][1])] for i in instrs], axis=1)
            s2 = jnp.stack([env[int(rows[i][2])] for i in instrs], axis=1)
            r = mulfn(s1, s2)
            for k, i in enumerate(instrs):
                env[int(rows[i][3])] = r[:, k]
        for i in instrs:
            done[i] = True
        drain_addsub()
    assert done.all(), "rounds executor left unexecuted instructions"
    return [env[r] for r in prog.ssa_outputs]
