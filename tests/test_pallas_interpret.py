"""Pallas bucket-insert kernels executed in interpret mode on CPU.

Round-2 lesson: the TPU-only engine tests (test_msm_methods.py) skip in CI,
so a broken default kernel config shipped unnoticed.  These tests run the
ACTUAL kernel bodies (pallas_insert.insert_pallas, pallas_insert3.
insert_pallas3 — G1 and G2-style tower coords, packed x merge on/off)
through a deterministic reference executor (msm/pallas_ref.py — grid
loop + functional refs + shimmed pl primitives, the kernel BODY byte-for-
byte), so CPU CI compiles and executes the kernel logic on every push.
Reference semantics: multiexp.tcc:519-561.

The kernels are generic over the field; production-width fields (16 limbs)
make the interpreter's unrolled-CIOS XLA graph pathologically slow to
compile on CPU, so the tests instantiate the SAME kernel code over a toy
short-Weierstrass curve with a 2-limb field:

    E : y^2 = x^3 + 11 over F_p,  p = 65539 (17 bits -> two 16-bit limbs)
    #E = 65287 (prime, odd)  => the complete RCB15 a=0 formulas the kernel
    uses are valid for every input pair.
    E(Fp2), Fp2 = Fp[u]/(u^2 - 2): order 4295427591 (odd) — the stand-in
    for the G2 tower path (same k=2 kernel branch as alt_bn128 G2).
"""

import pytest

import jax.numpy as jnp

from libff_tpu.curves.curvedef import GroupDef
from libff_tpu.curves.group import AffinePoint, Group
from libff_tpu.fields.fp import PrimeField
from libff_tpu.fields.tower import ExtField
from libff_tpu.host import ec as hec
from libff_tpu.host import field as hf
from libff_tpu.msm import digits as dig
from libff_tpu.msm.pippenger import MsmConfig, _prepare

P_TOY = 65539
B_TOY = 11
N_TOY = 65287                 # prime group order, trace t = 253 (odd)
GEN_TOY = (2, 29831)
NR_TOY = 2                    # quadratic non-residue mod P_TOY
NUM_BITS = 8                  # small scalars keep W (= kernel grid) tiny
C = 4


def _gdef(curve, gen, order):
    return GroupDef(name="toy", curve=curve, generator=gen, cofactor=1,
                    order=order, wnaf_window_table=(4,),
                    fixed_base_exp_window_table=(1,))


@pytest.fixture(scope="module")
def g1ctx():
    Fh = hf.Fp(P_TOY, name="toy_Fp")
    E = hec.WeierstrassCurve(Fh, 0, B_TOY, name="toy_E")
    assert E.mul(N_TOY, GEN_TOY) is None
    G = Group(PrimeField(P_TOY, name="toy_Fp"), _gdef(E, GEN_TOY, N_TOY))
    return _make_ctx(G, E, GEN_TOY, n=256, load=G.F.from_ints)


@pytest.fixture(scope="module")
def g2ctx():
    Fh = hf.Fp(P_TOY, name="toy_Fp")
    F2h = hf.Ext(Fh, 2, NR_TOY, name="toy_Fp2")
    E2 = hec.WeierstrassCurve(F2h, F2h.zero(), (B_TOY, 0), name="toy_E2")
    # a generator outside E(Fp): first x = (x0, 1) whose RHS is a square
    gen2 = None
    for x0 in range(P_TOY):
        x = (x0, 1)
        rhs = F2h.add(F2h.mul(F2h.sqr(x), x), (B_TOY, 0))
        if F2h.is_square(rhs):
            gen2 = (x, F2h.sqrt(rhs))
            break
    assert E2.is_on_curve(gen2)
    F2d = ExtField(PrimeField(P_TOY, name="toy_Fp"), F2h, name="toy_Fp2")
    G = Group(F2d, _gdef(E2, gen2, N_TOY))
    return _make_ctx(G, E2, gen2, n=128, load=G.F.from_host_batch)


def _make_ctx(G, E, gen, n, load, lanes=128):
    ks = [(37 * i * i + 11 * i + 5) % (1 << NUM_BITS) for i in range(n)]
    ks[2] = 0
    pts = [E.mul((i % 8) + 1, gen) for i in range(n)]
    limbs = _plain_limbs(G.F, ks, n)
    A = AffinePoint(load([p[0] for p in pts]), load([p[1] for p in pts]),
                    jnp.zeros((n,), bool))
    want = E.msm(ks, pts)
    cfg = MsmConfig(c=C, lanes=lanes)
    W = dig.num_signed_digits(G.order, NUM_BITS, C)
    B = 1 << (C - 1)
    s2, prep_pts, el, T, L = _prepare(G, limbs, A, cfg)
    d = dig.signed_digits(s2, C, W).reshape(W, T, L)
    return G, E, d, prep_pts, B, want


def _plain_limbs(F, ks, n):
    """(n_limbs, n) plain-form u16-in-u32 scalar limbs."""
    import numpy as np

    fp = F
    while hasattr(fp, "B"):
        fp = fp.B
    nl = max(fp.n, 1)
    out = np.zeros((nl, n), dtype=np.uint32)
    for i, k in enumerate(ks):
        for l in range(nl):
            out[l, i] = (k >> (16 * l)) & 0xFFFF
    return jnp.asarray(out)


def _finish(G, E, buckets, B, tower):
    """Host-side bucket reduction: pull the kernel's projective bucket
    array to exact host integers and finish (lane merge + sum_b (b+1)B_b +
    Horner) with host curve arithmetic.  Keeps the test's device work —
    and its CPU compile cost — limited to the kernel under test."""
    F = G.F
    Fh = E.F
    W = buckets.z.shape[-3]
    L = buckets.z.shape[-1]

    def host_elems(arr):                  # (el..., W, B, L) -> flat list
        flat = arr.reshape(arr.shape[:-3] + (W * B * L,))
        return F.to_ints(flat) if not tower else F.to_host_batch(flat)

    X, Y, Z = host_elems(buckets.x), host_elems(buckets.y), \
        host_elems(buckets.z)

    def affine(i):
        if Fh.is_zero(Z[i]):
            return None
        zi = Fh.inv(Z[i])
        return (Fh.mul(X[i], zi), Fh.mul(Y[i], zi))

    total = None
    for w in range(W - 1, -1, -1):
        for _ in range(C if w < W - 1 else 0):
            total = E.dbl(total)
        for b in range(B):
            P = None
            for lane in range(L):         # lane merge
                P = E.add(P, affine((w * B + b) * L + lane))
            for _ in range(b + 1):        # sum_b (b+1) * B_b
                total = E.add(total, P)
    return total


def _run_insert(G, insert_fn, d, pts, **kw):
    """Run the kernel body through the deterministic reference executor
    (pallas_ref.py), EAGERLY: `interpret=True`'s Mosaic emulation hangs
    nondeterministically on this CPU backend, and jit-compiling the
    reference program trips the same XLA:CPU execution stall — eager
    dispatch is a few seconds at these toy shapes and fully
    deterministic."""
    return insert_fn(G, d, pts, interpret="reference", **kw)


@pytest.mark.parametrize("packed", [False, True])
@pytest.mark.parametrize("merge", [False, True, "kernel"])
def test_insert_pallas3_interpret_g1(g1ctx, packed, merge):
    from libff_tpu.msm.pallas_insert3 import insert_pallas3

    G, E, d, pts, B, want = g1ctx
    buckets = _run_insert(
        G, lambda G, d, p, **kw: insert_pallas3(G, d, p, B, **kw),
        d, pts, packed=packed, merge=merge)
    assert _finish(G, E, buckets, B, tower=False) == want


@pytest.mark.parametrize("which", ["g1", "g2"])
def test_insert_pallas3_interpret_kmul_sos(g1ctx, g2ctx, which):
    """The deferred-carry SOS kernel multiplier (MsmConfig.kmul="sos")
    produces the same buckets through the same kernel body."""
    from libff_tpu.msm.pallas_insert3 import insert_pallas3

    G, E, d, pts, B, want = g1ctx if which == "g1" else g2ctx
    buckets = _run_insert(
        G, lambda G, d, p, **kw: insert_pallas3(G, d, p, B, **kw),
        d, pts, packed=True, kmul="sos")
    assert _finish(G, E, buckets, B, tower=which == "g2") == want


@pytest.mark.parametrize("packed", [False, True])
@pytest.mark.parametrize("merge", [False, "kernel"])
def test_insert_pallas3_interpret_g2(g2ctx, packed, merge):
    from libff_tpu.msm.pallas_insert3 import insert_pallas3

    G, E, d, pts, B, want = g2ctx
    buckets = _run_insert(
        G, lambda G, d, p, **kw: insert_pallas3(G, d, p, B, **kw),
        d, pts, packed=packed, merge=merge)
    assert _finish(G, E, buckets, B, tower=True) == want


@pytest.fixture(scope="module")
def g2ctx_ls2(g2ctx):
    """G2 context at lanes=256 (Ls=2): exercises the _lane_merge halving
    stage, which every lanes=128 fixture skips (advisor r03 finding: the
    merge-time b3 override shape was only correct for Ls=1)."""
    G = g2ctx[0]
    gen = G.gdef.generator
    E = G.gdef.curve
    return _make_ctx(G, E, gen, n=256, load=G.F.from_host_batch, lanes=256)


@pytest.mark.parametrize("merge", [True, "kernel"])
def test_insert_pallas3_interpret_g2_ls2(g2ctx_ls2, merge):
    from libff_tpu.msm.pallas_insert3 import insert_pallas3

    G, E, d, pts, B, want = g2ctx_ls2
    buckets = _run_insert(
        G, lambda G, d, p, **kw: insert_pallas3(G, d, p, B, **kw),
        d, pts, packed=True, merge=merge)
    assert _finish(G, E, buckets, B, tower=True) == want


def test_insert_pallas_interpret_g1(g1ctx):
    from libff_tpu.msm.pallas_insert import insert_pallas

    G, E, d, pts, B, want = g1ctx
    buckets = _run_insert(
        G, lambda G, d, p, **kw: insert_pallas(G, d, p, B, **kw), d, pts)
    assert _finish(G, E, buckets, B, tower=False) == want
