"""Signed-digit Pippenger MSM, TPU-native formulation.

Algorithmically this matches libff's BDLO12_signed method
(multiexp.tcc:507-641): scalars are recoded into signed c-bit digits
(digits.py), negative digits contribute the negated point (free on a
short-Weierstrass curve), each window accumulates 2^(c-1) buckets, buckets
reduce by suffix-summing, and windows combine with c doublings between.

The *schedule* is redesigned for a vector machine with no efficient random
scatter (SURVEY.md §7 hard part #2).  libff inserts points into buckets
serially (multiexp.tcc:519-561); here the batch is split into L independent
lanes, each lane owning a private bucket array for every window, laid out
as (limbs, W, B, L) with lanes on the minor axis:

  insert : a lax.scan over T = N/L steps; each step gathers the (W, L)
           addressed buckets, performs one batched Jacobian mixed-add for
           all windows of all lanes at once, and scatters back.  Exactly
           N*W group adds of vector width W*L — the same op count as the
           serial algorithm, at full lane occupancy.
  merge  : log2(L) batched tree-add rounds collapsing the lane axis.
  reduce : suffix sums over the bucket axis (scan of 2 adds, batch (W,)).
  combine: Horner over windows with c doublings per step (scan).

Cross-chip parallelism shards N and/or the window set (parallel/
mesh_msm.py); only per-window partial points cross the interconnect.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..curves.group import (AffinePoint, Group, JacobianPoint,
                            ProjectivePoint)
from .. import vm
from . import digits as dig


class MsmConfig(NamedTuple):
    c: int        # signed-digit window width
    lanes: int    # number of independent bucket lanes
    scatter: str = "select"   # bucket update: "select" (one-hot masked
                              # read/write, TPU-friendly) or "gather"
                              # (dynamic indexing; generic gather/scatter
                              # is very slow on TPU)
    engine: str = "auto"      # insert phase: "auto" (pallas3 vreg-lane
                              # kernel when eligible: TPU + prime-field G1
                              # + complete formulas + L % 128 == 0),
                              # "pallas3", "pallas", or "xla"
    formulas: str = "auto"    # per-phase formula engine (see Engines):
                              # "auto" (VM insert/reduce + direct-rounds
                              # horner on TPU), "direct" (all phases
                              # direct), or "vm" (all phases VM)
    merge: bool | str = False  # pallas3 lane merge: False = XLA halving
                               # tree, "kernel" = second Pallas kernel,
                               # True = fused into the insert body (Mosaic
                               # compile blow-up; reference tests only —
                               # see pallas_insert3.insert_pallas3)
    tb: int = 16               # pallas3 time-rows per grid step; Mosaic
                               # compile time scales with the tb-unrolled
                               # madd body (G2's Karatsuba madd needs
                               # tb <= 8 to compile in bounded time)
    kmul: str = "cios"         # pallas3 in-kernel Montgomery multiplier:
                               # "cios" (serial carry chain) or "sos"
                               # (deferred-carry column accumulation —
                               # same op mix, more VPU ILP; fields/fp.py
                               # mul_sos)


def default_config(n: int, G=None) -> MsmConfig:
    """Heuristic window/lane choice, platform-aware.

    TPU: select-scatter (generic gather/scatter does not vectorize on the
    VPU; measured ~8x slower).  The insert phase is then madd-compute-bound
    (N*W mixed adds) plus bucket-array traffic proportional to N*W*B; small
    windows keep W*B small — measured optimum on TPU v5e is c=5/c=6.
    CPU (tests): dynamic gather/scatter is fast and avoids the B-fold
    masked reads, so keep the indexed formulation with larger windows.

    Wide fields (component > 16 limbs, e.g. BW6-761's 48) stay on the
    XLA one-hot path whose bucket-array traffic scales with limbs*W*B*L:
    the c=6/L=512 shape tuned for the 16-limb Pallas kernel measured
    0.56x baseline at BW6 2^16 while c=5/L=256 ran 2.1x at 2^14 — cap
    their window/lanes accordingly.
    """
    import jax

    if jax.default_backend() == "tpu":
        comp_n = None
        if G is not None:
            comp_n = G.F.n if G.F.el_ndim == 1 else G.F.B.n
        if comp_n is not None and comp_n > 16 and n >= (1 << 12):
            return MsmConfig(c=5, lanes=256)
        if n >= (1 << 16):
            # honest v5e @ 2^20 sweep (input-varying, fenced), round-2
            # PACKED kernel: c=6/L=512 1320 Kpts/s > c=5/L=512 1276 >
            # c=7/L=256 (insert 1.4 s, one-hot B=64 dominates)
            return MsmConfig(c=6, lanes=512)
        if n >= (1 << 12):
            return MsmConfig(c=5, lanes=256)
        if n >= (1 << 8):
            return MsmConfig(c=4, lanes=64)
        if n >= 64:
            return MsmConfig(c=4, lanes=32)
        return MsmConfig(c=3, lanes=1)
    if n >= (1 << 18):
        return MsmConfig(c=9, lanes=512, scatter="gather")
    if n >= (1 << 14):
        return MsmConfig(c=8, lanes=256, scatter="gather")
    if n >= (1 << 10):
        return MsmConfig(c=6, lanes=128, scatter="gather")
    if n >= 64:
        return MsmConfig(c=4, lanes=32, scatter="gather")
    return MsmConfig(c=3, lanes=1, scatter="gather")


def _prepare(G, scalar_limbs, points, cfg):
    """Pad to a lane multiple and reshape into (T, L) steps x lanes.

    pneg holds the negated coordinate for the signed-digit bucket trick:
    -P flips y on a Weierstrass curve but x on a twisted Edwards curve
    (G.affine_neg_axis)."""
    F = G.F
    N = scalar_limbs.shape[-1]
    L = min(cfg.lanes, 1 << (N.bit_length() - 1))
    T = -(-N // L)
    pad = T * L - N
    if pad:
        scalar_limbs = jnp.pad(scalar_limbs, [(0, 0), (0, pad)])
        points = AffinePoint(
            jnp.pad(points.x, [(0, 0)] * (points.x.ndim - 1) + [(0, pad)]),
            jnp.pad(points.y, [(0, 0)] * (points.y.ndim - 1) + [(0, pad)]),
            jnp.pad(points.inf, [(0, pad)], constant_values=True))
    el = points.x.shape[:-1]
    px = points.x.reshape(el + (T, L))
    py = points.y.reshape(el + (T, L))
    neg_axis = getattr(G, "affine_neg_axis", "y")
    src = points.y if neg_axis == "y" else points.x
    pneg = F.neg(src).reshape(el + (T, L))
    pinf = points.inf.reshape(T, L)
    return scalar_limbs, (px, py, pneg, pinf), el, T, L


def _window_totals(G: Group, d, pts, el, B: int,
                   scatter: str = "select") -> JacobianPoint:
    """Bucket accumulation + lane merge + suffix-sum reduction.

    d: (W, T, L) signed digits; pts: (px, py, pneg, pinf) in (T, L) layout.
    Returns per-window totals sum_j j*B_j as a JacobianPoint batch (W,).

    scatter="select": the addressed bucket is read with a one-hot masked
    sum and written back with a one-hot masked select over the B axis —
    pure vector ops that XLA fuses into streaming passes (generic
    gather/scatter on TPU is orders of magnitude slower; measured 55s ->
    ~2s on a 2^20 MSM).  scatter="gather" keeps the indexed formulation.
    """
    F = G.F
    px, py, pneg, pinf = pts
    W, T, L = d.shape
    zero = G.zero((W, B, L))
    w_iota = jnp.arange(W)[:, None]
    l_iota = jnp.arange(L)[None, :]
    b_iota = jnp.arange(B)[None, :, None]            # (1, B, 1)

    def insert_step(buckets, inputs):
        dt, xt, yt, ynt, inft = inputs               # (W,L), el+(L,), ...
        absd = jnp.abs(dt)
        idx = jnp.minimum(jnp.maximum(absd - 1, 0), B - 1)
        valid = (absd > 0) & (~inft)[None, :]
        ysel = F.select((dt < 0), _bc_el(ynt, W), _bc_el(yt, W))
        xsel = _bc_el(xt, W)
        q = AffinePoint(xsel, ysel, ~valid)

        if scatter == "select":
            onehot = (idx[:, None, :] == b_iota)     # (W, B, L) bool
            oh = onehot[(None,) * len(el)]           # el-broadcast

            def read(arr):                           # (*el, W, B, L) -> no B
                return jnp.sum(jnp.where(oh, arr, 0), axis=-2)

            cur = JacobianPoint(read(buckets.x), read(buckets.y),
                                read(buckets.z))
            new = G.mixed_add(cur, q)                # == cur where q.inf

            def write(arr, newv):
                return jnp.where(oh, newv[..., None, :], arr)

            buckets = JacobianPoint(
                write(buckets.x, new.x), write(buckets.y, new.y),
                write(buckets.z, new.z))
            return buckets, None

        gidx = (slice(None),) * len(el) + (w_iota, idx, l_iota)
        cur = JacobianPoint(buckets.x[gidx], buckets.y[gidx], buckets.z[gidx])
        new = G.mixed_add(cur, q)                    # == cur where q.inf
        buckets = JacobianPoint(
            buckets.x.at[gidx].set(new.x, mode="promise_in_bounds"),
            buckets.y.at[gidx].set(new.y, mode="promise_in_bounds"),
            buckets.z.at[gidx].set(new.z, mode="promise_in_bounds"))
        return buckets, None

    xs = (jnp.moveaxis(d, 1, 0),                     # (T, W, L)
          jnp.moveaxis(px, -2, 0),                   # (T, *el, L)
          jnp.moveaxis(py, -2, 0),
          jnp.moveaxis(pneg, -2, 0),
          pinf)
    buckets, _ = jax.lax.scan(insert_step, zero, xs)

    # merge lanes: tree reduction over L (L is a power of two)
    while buckets.z.shape[-1] > 1:
        half = buckets.z.shape[-1] // 2
        lo = _slice_last(buckets, 0, half)
        hi = _slice_last(buckets, half, half)
        buckets = G.add(lo, hi)
    buckets = JacobianPoint(buckets.x[..., 0], buckets.y[..., 0],
                            buckets.z[..., 0])       # (el, W, B)

    # bucket suffix-sum reduction (multiexp.tcc:90-125)
    def bucket_step(carry, bslice):
        running, total = carry
        running = G.add(running, bslice)
        total = G.add(total, running)
        return (running, total), None

    rev = JacobianPoint(buckets.x[..., ::-1], buckets.y[..., ::-1],
                        buckets.z[..., ::-1])
    rev = jax.tree.map(lambda a: jnp.moveaxis(a, -1, 0), rev)  # (B, el, W)
    (_, total), _ = jax.lax.scan(
        bucket_step, (G.zero((W,)), G.zero((W,))), rev)
    return total                                      # batch (W,)


def _shift_down(G: Group, P: ProjectivePoint, k: int, axis: int
                ) -> ProjectivePoint:
    """P'_b = P_{b+k} along `axis` (full-array position in P.z), padding the
    tail with projective identities (static shift)."""
    n = P.z.shape[axis]
    el = G.F.el_ndim
    sl = [slice(None)] * P.z.ndim
    sl[axis] = slice(k, n)
    sl = tuple(sl)
    pad_batch = list(P.z.shape[el:])
    pad_batch[axis - el] = k
    zero = G.proj_zero(tuple(pad_batch))
    return ProjectivePoint(
        jnp.concatenate([P.x[sl], zero.x], axis=axis),
        jnp.concatenate([P.y[sl], zero.y], axis=axis),
        jnp.concatenate([P.z[sl], zero.z], axis=axis))


class Engines(NamedTuple):
    """Per-phase formula-engine choice (measured on TPU v5e @ 2^16,
    alt_bn128, c=6/L=512):

      insert:  VM mixed-add wins — the scan body is one traced program
               with a fori_loop CIOS; the direct/uint16 variant measured
               slower (344 vs 217 ms) and costs ~20 min of XLA compile.
      reduce:  VM — identical runtime to the direct rounds (~100 ms,
               HBM-bound tree), 16x cheaper compile (34 s vs 552 s).
      horner:  direct rounds win 14x (40 vs 573 ms): the VM Horner is a
               batch-free sequential program (dispatch-bound), the direct
               version is a window-parallel masked-doubling scan.
    """
    insert: bool   # True = direct rounds + uint16 bucket carry
    reduce: bool   # True = padd_direct tree
    horner: bool   # True = masked-doubling scan via pdbl_direct


def _use_direct(G, cfg) -> Engines:
    """Resolve the formula-engine knob per phase."""
    if cfg.formulas == "vm":
        return Engines(False, False, False)
    ok = getattr(G, "supports_direct", False)
    if cfg.formulas == "direct":
        assert ok, "direct engine requires a complete prime-field group"
        return Engines(True, True, True)
    # auto: direct only where it wins (horner), and only for <=16-limb
    # fields — XLA compile time of the unrolled CIOS subgraphs is
    # superlinear in limb count (a 24-limb body takes >10 min; see
    # tests/test_fp.py); larger fields keep the VM path unless the
    # caller opts in explicitly.
    on_tpu = jax.default_backend() == "tpu"
    horner: bool | str = ok and G.F.n <= 16 and on_tpu
    if not horner and on_tpu:
        # every other complete group — towers (G2), wide prime fields
        # (BW6-761 G1), and Edwards — takes the window-parallel
        # masked-doubling scan over the group's OWN batched pdbl: the
        # batch-free VM Horner program measured ~1.5 s of G2 2^16's
        # 2.33 s total (results/g2_phases_r04b.log).  _use_direct is
        # only reached for supports_complete groups, so pdbl exists.
        horner = "scan"
    return Engines(False, False, horner)


def _window_totals_complete(G: Group, d, pts, el, B: int,
                            eng: Engines = Engines(False, False, False)
                            ) -> ProjectivePoint:
    """Bucket phase with complete RCB projective arithmetic (a == 0 curves):
    one-hot select insert, halving lane merge, and a log-depth bucket
    suffix-sum tree — all straight-line, no special-case masks.

    Returns per-window totals sum_j j*B_j as a ProjectivePoint batch (W,).

    direct: route the mixed add through the rounds engine (curves/direct.py)
    and hold the bucket array in uint16 limbs (canonical limbs are 16-bit,
    so the u16 form is lossless; it halves the scan-carry HBM/VMEM traffic
    and doubles VPU element packing for the one-hot select — measured ~1.5x
    on the insert phase on v5e).
    """
    direct = eng.insert
    F = G.F
    px, py, pneg, pinf = pts
    W, T, L = d.shape
    zero = G.proj_zero((W, B, L))
    if direct:
        zero = ProjectivePoint(*(z.astype(jnp.uint16) for z in zero))
    b_iota = jnp.arange(B)[None, :, None]            # (1, B, 1)

    neg_axis = getattr(G, "affine_neg_axis", "y")

    def insert_step(buckets, inputs):
        dt, xt, yt, ynt, inft = inputs               # (W,L), el+(L,), ...
        absd = jnp.abs(dt)
        idx = jnp.minimum(jnp.maximum(absd - 1, 0), B - 1)
        valid = (absd > 0) & (~inft)[None, :]
        neg = (dt < 0)
        if neg_axis == "y":
            xsel = _bc_el(xt, W)
            ysel = F.select(neg, _bc_el(ynt, W), _bc_el(yt, W))
        else:                                        # Edwards: -P = (-x, y)
            xsel = F.select(neg, _bc_el(ynt, W), _bc_el(xt, W))
            ysel = _bc_el(yt, W)
        q = AffinePoint(xsel, ysel, ~valid)

        onehot = (idx[:, None, :] == b_iota)         # (W, B, L) bool
        oh = onehot[(None,) * len(el)]

        def read(arr):
            r = jnp.sum(jnp.where(oh, arr, 0), axis=-2)
            return r.astype(jnp.uint32) if direct else r

        cur = ProjectivePoint(read(buckets.x), read(buckets.y),
                              read(buckets.z))
        if direct:
            from ..curves import direct as dr

            X3, Y3, Z3 = dr.madd(F, cur.x, cur.y, cur.z, q.x, q.y,
                                 G._b3_host)
            new = ProjectivePoint(
                F.select(valid, X3, cur.x).astype(jnp.uint16),
                F.select(valid, Y3, cur.y).astype(jnp.uint16),
                F.select(valid, Z3, cur.z).astype(jnp.uint16))
        else:
            new = G.pmadd(cur, q)                    # == cur where q.inf

        def write(arr, newv):
            return jnp.where(oh, newv[..., None, :], arr)

        return ProjectivePoint(
            write(buckets.x, new.x), write(buckets.y, new.y),
            write(buckets.z, new.z)), None

    xs = (jnp.moveaxis(d, 1, 0),
          jnp.moveaxis(px, -2, 0),
          jnp.moveaxis(py, -2, 0),
          jnp.moveaxis(pneg, -2, 0),
          pinf)
    buckets, _ = jax.lax.scan(insert_step, zero, xs)
    if direct:
        buckets = ProjectivePoint(*(b.astype(jnp.uint32) for b in buckets))
    return _reduce_buckets(G, buckets, B, eng.reduce)


def _reduce_buckets(G: Group, buckets: ProjectivePoint, B: int,
                    direct: bool = False) -> ProjectivePoint:
    """Lane merge + bucket suffix reduction of a (W, B, L) bucket array.
    Returns per-window totals sum_j j*B_j as a (W,) batch."""
    padd = G.padd_direct if direct else G.padd

    # merge lanes: halving tree (work-optimal, big batches)
    while buckets.z.shape[-1] > 1:
        half = buckets.z.shape[-1] // 2
        lo = _pslice_last(buckets, 0, half)
        hi = _pslice_last(buckets, half, half)
        buckets = padd(lo, hi)
    buckets = ProjectivePoint(buckets.x[..., 0], buckets.y[..., 0],
                              buckets.z[..., 0])     # batch (W, B)

    # suffix sums s_b = sum_{b'>=b} B_b' via log-depth shift tree, then
    # total = sum_b s_b = sum_b (b+1) * B_b  (multiexp.tcc:90-125 semantics)
    s = buckets
    k = 1
    while k < B:
        s = padd(s, _shift_down(G, s, k, axis=s.z.ndim - 1))
        k *= 2
    return G.proj_sum_tree(s, axis=-1, padd=padd)    # batch (W,)


def _horner_complete(G: Group, totals: ProjectivePoint, c: int,
                     direct: bool = False) -> ProjectivePoint:
    """res = sum_w 2^(c*w) * totals_w.

    direct (TPU): window-parallel masked doubling — a scan of c*(W-1)
    batched doublings where window w participates while k < c*w, then one
    log-depth sum tree.  Same sequential depth as Horner but every step is
    a full-width batched op through the rounds engine instead of ~9cW
    scalar VM instructions (measured 608 ms -> ~3 ms on v5e at c=6, W=43).

    "scan" (TPU towers): the same window-parallel masked-doubling scan,
    but each step is the batched VM pdbl instead of the direct rounds
    engine (towers have no direct engine; r04 g2_phases measurement:
    the batch-free VM Horner is the dominant cost of the whole G2 MSM
    at 2^16 — ~1.5 s of the 2.33 s total).

    vm (CPU/towers): ONE straight-line VM program (complete formulas need
    no masks): ~W*(9c + 35) instructions, batch-free."""
    W = totals.z.shape[-1]
    if direct:
        use_direct = direct is True
        pdbl = G.pdbl_direct if use_direct else G.pdbl
        padd = G.padd_direct if use_direct else G.padd
        wsteps = jnp.arange(c * (W - 1), dtype=jnp.int32)
        thresh = c * jnp.arange(W, dtype=jnp.int32)

        def step(P, k):
            D = pdbl(P)
            live = k < thresh                        # (W,)
            return G.select(live, D, P), None

        P, _ = jax.lax.scan(step, totals, wsteps)
        return G.proj_sum_tree(P, axis=-1, padd=padd)
    key = f"horner_c{c}_W{W}"

    def build(fp, mksym, inp):
        s = mksym(G._host_field) if G._ncomp > 1 else fp
        Ts = [(inp(s), inp(s), inp(s)) for _ in range(W)]
        R = Ts[W - 1]
        for w in range(W - 2, -1, -1):
            for _ in range(c):
                R = G.sym_pdbl(s, R)
            R = G.sym_padd(s, R, Ts[w])
        return list(R)

    prog = G._program(key, build)
    inputs = []
    for w in range(W):
        for coord in (totals.x, totals.y, totals.z):
            inputs.extend(vm.flatten_element(G.F, coord[..., w]))
    # latency knobs pay off on TPU (loop-turnaround bound); on CPU the big
    # unrolled bodies only bloat XLA compile time
    tpu = jax.default_backend() == "tpu"
    outs = vm.run_program(G._fp, prog, inputs, (),
                          unroll=8 if tpu else 1,
                          mul="unrolled" if tpu else "loop")
    k = G._ncomp
    return ProjectivePoint(
        vm.unflatten_element(G.F, outs[0:k]),
        vm.unflatten_element(G.F, outs[k:2 * k]),
        vm.unflatten_element(G.F, outs[2 * k:3 * k]))


def _horner(G: Group, totals: JacobianPoint, c: int) -> JacobianPoint:
    """res = sum_w 2^(c*w) * totals_w via Horner, high window first."""
    def window_step(res, tw):
        res = jax.lax.fori_loop(0, c, lambda _, r: G.dbl(r), res)
        res = G.add(res, tw)
        return res, None

    rev_w = jax.tree.map(lambda a: jnp.moveaxis(a, -1, 0)[::-1], totals)
    top = jax.tree.map(lambda a: a[0], rev_w)
    rest = jax.tree.map(lambda a: a[1:], rev_w)
    res, _ = jax.lax.scan(window_step, top, rest)
    return res


def _horner_masked(G: Group, totals: JacobianPoint, c: int) -> JacobianPoint:
    """Window-parallel masked-doubling Horner for JACOBIAN (a != 0)
    groups — the non-complete counterpart of _horner_complete's "scan"
    mode (VERDICT r04 weak #6: MNT-class curves kept the batch-free
    sequential Horner that dominated G2's runtime before r04).  Window w
    doubles while k < c*w (zero-safe: dbl keeps Z == 0), then one
    log-depth masked-add tree collapses the window axis."""
    W = totals.z.shape[-1]
    wsteps = jnp.arange(c * (W - 1), dtype=jnp.int32)
    thresh = c * jnp.arange(W, dtype=jnp.int32)

    def step(P, k):
        D = G.dbl(P)
        return G.select(k < thresh, D, P), None

    P, _ = jax.lax.scan(step, totals, wsteps)
    return G.sum_tree(P, axis=-1)


def msm_pippenger(G: Group, scalar_limbs: jnp.ndarray, points: AffinePoint,
                  num_bits: int, *, config: MsmConfig | None = None,
                  signed: bool = True) -> JacobianPoint:
    """Multi-scalar multiplication  sum_i scalars[i] * points[i].

    scalar_limbs: (n_limbs, N) plain-form u32 limbs (values < group order).
    points: affine batch of N points (infinity allowed via mask).
    num_bits: bit width of the scalar field (static).
    signed: signed-digit (BDLO12_signed, the default fast path) vs plain
    c-bit windows (BDLO12; 2^c - 1 buckets, multiexp.tcc:276-381).
    """
    N = scalar_limbs.shape[-1]
    cfg = config or default_config(N, G)
    c = cfg.c
    if signed:
        W = dig.num_signed_digits(G.order, num_bits, c)
        B = 1 << (c - 1)
    else:
        W = -(-num_bits // c)
        B = (1 << c) - 1
    scalar_limbs, pts, el, T, L = _prepare(G, scalar_limbs, points, cfg)
    dfn = dig.signed_digits if signed else dig.unsigned_digits
    d = dfn(scalar_limbs, c, W).reshape(W, T, L)
    if G.supports_complete:
        eng = _use_direct(G, cfg)
        engine = _resolve_engine(G, cfg, T, L)
        if engine == "pallas3":
            from .pallas_insert3 import insert_pallas3

            # tower (k=2) kernels: the Karatsuba madd body does not
            # compile in bounded time at tb=16 (measured >15 min Mosaic;
            # tb<=8 compiles) — clamp when the engine was auto-selected
            # so a default config can never ship an unseen compile
            tb = cfg.tb
            if cfg.engine == "auto" and G.F.el_ndim > 1:
                tb = min(tb, 8)
            buckets = insert_pallas3(G, d, pts, B, merge=cfg.merge,
                                     tb=tb, kmul=cfg.kmul)
            totals = _reduce_buckets(G, buckets, B, eng.reduce)
        elif engine == "pallas":
            from .pallas_insert import insert_pallas

            buckets = insert_pallas(G, d, pts, B)
            totals = _reduce_buckets(G, buckets, B, eng.reduce)
        else:
            totals = _window_totals_complete(G, d, pts, el, B, eng)
        res = _horner_complete(G, totals, c, eng.horner)
        return G.proj_to_jacobian(res)
    totals = _window_totals(G, d, pts, el, B, cfg.scatter)
    if jax.default_backend() == "tpu":
        return _horner_masked(G, totals, c)
    return _horner(G, totals, c)


def _resolve_engine(G, cfg, T: int, L: int) -> str:
    """Insert-phase engine choice.

    pallas3 keeps the per-window bucket block VMEM-resident and shapes the
    lane axis as (L/128, 128) vregs, so every CIOS step is a native 2-D
    vector op — measured 33 ms per insert pass at 2^16/c=5/L=1024 on v5e
    vs ~180 ms for the XLA one-hot select path (bucket-HBM-bound).  "auto"
    therefore resolves to pallas3 whenever the kernel's layout
    preconditions hold (prime-field G1 and, since round 2, Fq2-tower G2);
    the XLA path remains the fallback (CPU tests, deeper towers, non-vreg
    lane counts)."""
    from .pallas_insert3 import kernel_eligible

    # a_is_zero gates on SHORT-WEIERSTRASS a == 0 groups specifically:
    # the kernels hardcode the RCB15 formulas, so Edwards (which is also
    # "complete" and prime-field) must stay on the XLA path
    eligible = (kernel_eligible(G.F) and G.supports_complete
                and getattr(G, "a_is_zero", False)
                and L % 128 == 0 and T % min(cfg.tb, T) == 0
                and jax.default_backend() == "tpu")
    if cfg.engine == "auto":
        # Mosaic compile time scales with the unrolled per-component CIOS
        # body (~n^2 ops x tb madds): 16 limbs is the largest component
        # width whose kernel compile has been seen finish (minutes);
        # BW6-761's 48-limb field must not auto-select it — wide fields
        # stay on the XLA + formula-VM path unless explicitly opted in.
        comp_n = G.F.n if G.F.el_ndim == 1 else G.F.B.n
        return "pallas3" if (eligible and comp_n <= 16) else "xla"
    if cfg.engine in ("pallas", "pallas3"):
        assert eligible, "pallas engine requires TPU + prime-field G1"
        return cfg.engine
    return "xla"


def msm_pippenger_windows(G: Group, scalar_limbs, points: AffinePoint,
                          num_bits: int, chunk_idx, num_chunks: int, *,
                          config: MsmConfig | None = None) -> JacobianPoint:
    """Window-parallel Pippenger partial: this caller computes only window
    chunk `chunk_idx` of `num_chunks` and scales it by 2^(c * w_offset).
    Summing the partials over all chunks gives the full MSM.  chunk_idx may
    be a traced value (e.g. a mesh axis_index)."""
    N = scalar_limbs.shape[-1]
    cfg = config or default_config(N, G)
    c = cfg.c
    W = dig.num_signed_digits(G.order, num_bits, c)
    Wpad = -(-W // num_chunks) * num_chunks
    Wper = Wpad // num_chunks
    B = 1 << (c - 1)
    scalar_limbs, pts, el, T, L = _prepare(G, scalar_limbs, points, cfg)
    d = dig.signed_digits(scalar_limbs, c, W)
    d = jnp.pad(d, [(0, Wpad - W), (0, 0)]).reshape(Wpad, T, L)
    dchunk = jax.lax.dynamic_slice_in_dim(d, chunk_idx * Wper, Wper, axis=0)
    # scale by 2^(c * Wper * chunk_idx): dynamic doubling count
    ndbl = (c * Wper) * chunk_idx
    if G.supports_complete:
        eng = _use_direct(G, cfg)
        totals = _window_totals_complete(G, dchunk, pts, el, B, eng)
        local = _horner_complete(G, totals, c, eng.horner)
        pdbl = G.pdbl_direct if eng.horner is True else G.pdbl
        local = jax.lax.fori_loop(0, ndbl, lambda _, r: pdbl(r), local)
        return G.proj_to_jacobian(local)
    totals = _window_totals(G, dchunk, pts, el, B, cfg.scatter)
    local = _horner(G, totals, c)
    return jax.lax.fori_loop(0, ndbl, lambda _, r: G.dbl(r), local)


def _bc_el(x, W):
    """(el..., L) -> (el..., W, L) broadcast."""
    return jnp.broadcast_to(x[..., None, :], x.shape[:-1] + (W, x.shape[-1]))


def _slice_last(P: JacobianPoint, start, size):
    return JacobianPoint(
        jax.lax.slice_in_dim(P.x, start, start + size, axis=P.x.ndim - 1),
        jax.lax.slice_in_dim(P.y, start, start + size, axis=P.y.ndim - 1),
        jax.lax.slice_in_dim(P.z, start, start + size, axis=P.z.ndim - 1))


def _pslice_last(P: ProjectivePoint, start, size):
    return ProjectivePoint(
        jax.lax.slice_in_dim(P.x, start, start + size, axis=P.x.ndim - 1),
        jax.lax.slice_in_dim(P.y, start, start + size, axis=P.y.ndim - 1),
        jax.lax.slice_in_dim(P.z, start, start + size, axis=P.z.ndim - 1))
