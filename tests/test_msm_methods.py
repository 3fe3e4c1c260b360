"""Cross-method MSM equality (libff test_multiexp.cpp:205-283 analogue),
fixed-base windowed exponentiation, streaming MSM, and the small
infrastructure modules (field_utils / misc / profiling / Double)."""

import tempfile

import pytest

import jax
import jax.numpy as jnp

from libff_tpu.curves.device import device_curve
from libff_tpu.curves.group import AffinePoint
from libff_tpu.host import field as hf
from libff_tpu.msm import fixed_base as fb
from libff_tpu.msm.multiexp import (Method, host_multi_exp_bos_coster,
                                    host_multi_exp_naive, multi_exp)
from libff_tpu.msm.pippenger import MsmConfig
from libff_tpu.msm.streaming import msm_stream, points_from_file
from libff_tpu.serialization import codec as ser
from libff_tpu.utils import field_utils as fu
from libff_tpu.utils import misc
from libff_tpu.utils.double_field import Double


@pytest.fixture(autouse=True)
def _fresh_executable_arena():
    """This box's XLA:CPU segfaults flakily once ~6+ fresh program sets
    accumulate in one process (every observed suite worker crash was in
    this module); clearing the in-memory executable arena per test avoids
    it, and the persistent disk cache keeps recompiles cheap."""
    jax.clear_caches()


@pytest.fixture(scope="module")
def ctx():
    dc = device_curve("alt_bn128")
    cd = dc.cd
    E = cd.g1.curve
    gen = cd.g1.generator
    n = 33
    ks = [hf.sha512_rng(cd.fr.mp, i) for i in range(n)]
    ks[1] = 0
    pts = [E.mul(i + 1, gen) for i in range(n)]
    return dc, E, gen, ks, pts


def _aff(dc, P):
    G = dc.g1
    A = G.to_affine(jax.tree.map(lambda a: a[..., None], P))
    return (G.F.to_ints(A.x)[0], G.F.to_ints(A.y)[0])


def test_all_methods_agree(ctx):
    dc, E, gen, ks, pts = ctx
    cd = dc.cd
    G = dc.g1
    want = E.msm(ks, pts)
    assert host_multi_exp_bos_coster(E, ks, pts) == want
    assert host_multi_exp_naive(E, cd.g1.wnaf_window_table, ks, pts,
                                254) == want
    limbs = dc.fr.plain_from_ints(ks)
    A = AffinePoint(G.F.from_ints([p[0] for p in pts]),
                    G.F.from_ints([p[1] for p in pts]),
                    jnp.zeros((len(ks),), bool))
    cfg = MsmConfig(c=4, lanes=8)
    for m in (Method.naive_plain, Method.BDLO12, Method.BDLO12_signed):
        assert _aff(dc, multi_exp(G, limbs, A, 254, method=m,
                                  config=cfg)) == want
    assert _aff(dc, multi_exp(G, limbs, A, 254, chunks=3,
                              config=cfg)) == want


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 256, 257])
def test_all_methods_agree_edge_sizes(n):
    """libff sweeps exactly these sizes across every method against
    naive_plain (test_multiexp.cpp:205-283); sizes 1-5 hit the
    empty/one-element/padding edges, 256/257 the lane-boundary edges.

    Each size compiles a fresh program set (crash mitigation: the
    module-wide autouse _fresh_executable_arena fixture)."""
    dc = device_curve("alt_bn128")
    cd = dc.cd
    E = cd.g1.curve
    gen = cd.g1.generator
    G = dc.g1
    ks = [hf.sha512_rng(cd.fr.mp, 1000 + i) for i in range(n)]
    if n >= 2:
        ks[1] = 0
    pts = [E.mul((i % 32) + 1, gen) for i in range(n)]
    want = E.msm(ks, pts)
    assert host_multi_exp_bos_coster(E, ks, pts) == want
    assert host_multi_exp_naive(E, cd.g1.wnaf_window_table, ks, pts,
                                254) == want
    limbs = dc.fr.plain_from_ints(ks)
    A = AffinePoint(G.F.from_ints([p[0] for p in pts]),
                    G.F.from_ints([p[1] for p in pts]),
                    jnp.zeros((n,), bool))
    cfg = MsmConfig(c=4, lanes=8)
    for m in (Method.naive, Method.naive_plain, Method.BDLO12,
              Method.BDLO12_signed):
        got = multi_exp(G, limbs, A, 254, method=m, config=cfg)
        if want is None:
            assert bool(G.is_zero(
                jax.tree.map(lambda a: a[..., None], got))[0]), m
        else:
            assert _aff(dc, got) == want, m


def test_all_methods_agree_large():
    """Full-roster agreement at an MSM-realistic size (2^14) against the
    structured oracle: point i = (i%32 + 1)*gen, so the expected value is
    one host scalar mul — no O(n) host MSM needed (the profiler's
    cross-check trick, profile_multiexp.cpp:316-375)."""
    dc = device_curve("alt_bn128")
    cd = dc.cd
    E = cd.g1.curve
    gen = cd.g1.generator
    G = dc.g1
    n = 1 << 14
    ks = [hf.sha512_rng(cd.fr.mp, i) for i in range(n)]
    total = sum(k * ((i % 32) + 1) for i, k in enumerate(ks)) % cd.r
    want = E.mul(total, gen)
    base = [E.mul(j + 1, gen) for j in range(32)]
    import numpy as np

    bx = np.asarray(G.F.from_ints([p[0] for p in base]))
    by = np.asarray(G.F.from_ints([p[1] for p in base]))
    rep = np.arange(n) % 32
    A = AffinePoint(jnp.asarray(bx[:, rep]), jnp.asarray(by[:, rep]),
                    jnp.zeros((n,), bool))
    limbs = dc.fr.plain_from_ints(ks)
    cfg = MsmConfig(c=5, lanes=256)
    for m in (Method.BDLO12, Method.BDLO12_signed):
        assert _aff(dc, multi_exp(G, limbs, A, 254, method=m,
                                  config=cfg)) == want, m
    assert _aff(dc, multi_exp(G, limbs, A, 254, chunks=4,
                              config=cfg)) == want


def test_filter_one_zero(ctx):
    """multi_exp_filter_one_zero (multiexp.tcc:695-757): 0-scalars skipped,
    1-scalars direct-added, remainder through the bucket method."""
    from libff_tpu.msm.multiexp import multi_exp_filter_one_zero

    dc, E, gen, ks, pts = ctx
    G = dc.g1
    ks = list(ks)
    ks[0] = 1
    ks[2] = 1                            # exercise the direct-add branch
    want = E.msm(ks, pts)
    limbs = dc.fr.plain_from_ints(ks)
    A = AffinePoint(G.F.from_ints([p[0] for p in pts]),
                    G.F.from_ints([p[1] for p in pts]),
                    jnp.zeros((len(ks),), bool))
    cfg = MsmConfig(c=4, lanes=8)
    got = multi_exp_filter_one_zero(G, limbs, A, 254, config=cfg)
    assert _aff(dc, got) == want
    # all-zero edge: result is the identity
    z = dc.fr.plain_from_ints([0] * len(ks))
    gz = multi_exp_filter_one_zero(G, z, A, 254, config=cfg)
    assert bool(G.is_zero(jax.tree.map(lambda a: a[..., None], gz))[0])


def test_inner_product(ctx):
    """inner_product (multiexp.hpp:92-99): host oracle vs batched device
    tree reduction, bit-exact."""
    from libff_tpu.host.field import Fp
    from libff_tpu.utils.field_utils import (device_inner_product,
                                             inner_product)

    dc, E, gen, ks, pts = ctx
    cd = dc.cd
    F = Fp(cd.r)
    a = [hf.sha512_rng(cd.fr.mp, i) for i in range(7)]
    b = [hf.sha512_rng(cd.fr.mp, 100 + i) for i in range(7)]
    want = sum(x * y for x, y in zip(a, b)) % cd.r
    assert inner_product(F, a, b) == want
    dev = device_inner_product(dc.fr, dc.fr.from_ints(a), dc.fr.from_ints(b))
    assert dc.fr.to_ints(dev[..., None])[0] == want


def test_fixed_base_exp(ctx):
    dc, E, gen, ks, pts = ctx
    cd = dc.cd
    G = dc.g1
    w = fb.get_exp_window_size(G, 1000)
    assert w == 8                       # from the alt_bn128 tuned table
    assert fb.get_exp_window_size(G, 10**9, lowmem=True) == 14
    table = fb.get_window_table(E, 254, w, gen)
    sc = [1, 5, 12345, cd.r - 1]
    assert fb.batch_exp(E, 254, w, table, sc) == [E.mul(k, gen) for k in sc]
    assert fb.batch_exp_with_coeff(E, 254, w, table, 7, sc, cd.r) == \
        [E.mul(7 * k % cd.r, gen) for k in sc]
    dt = fb.device_window_table(G, E, 254, w, gen)
    limbs = dc.fr.plain_from_ints(sc)
    res = jax.jit(lambda l: fb.device_batch_exp(G, 254, w, dt, l))(limbs)
    A = G.to_affine(res)
    assert list(zip(G.F.to_ints(A.x), G.F.to_ints(A.y))) == \
        [E.mul(k, gen) for k in sc]


def test_streaming_msm(ctx):
    dc, E, gen, ks, pts = ctx
    G = dc.g1
    pts = list(pts)
    pts[5] = None
    gc = ser.GroupCodec(dc.cd.g1)
    blob = ser.write_point_vector(gc, pts, compressed=True)
    with tempfile.NamedTemporaryFile(delete=False) as f:
        f.write(blob)
        path = f.name
    res = msm_stream(G, ks, points_from_file(path, gc, compressed=True,
                                             chunk=16),
                     254, config=MsmConfig(c=4, lanes=8))
    want = E.msm([k for k, p in zip(ks, pts) if p],
                 [p for p in pts if p])
    assert _aff(dc, res) == want


def test_streaming_msm_arrays(ctx):
    """msm_stream_arrays (host-resident limb arrays, chunked upload) is
    bit-identical to the host oracle, including a chunk count > 1 and an
    infinity entry."""
    import numpy as np

    from libff_tpu.msm.streaming import msm_stream_arrays

    dc, E, gen, ks, pts = ctx
    G = dc.g1
    n = 32                               # 2 chunks of 16
    ks = ks[:n]
    pts = list(pts[:n])
    pts[5] = None
    limbs = np.asarray(dc.fr.plain_from_ints(ks))
    x = np.asarray(G.F.from_ints([p[0] if p else 0 for p in pts]))
    y = np.asarray(G.F.from_ints([p[1] if p else 1 for p in pts]))
    inf = np.array([p is None for p in pts])
    res = msm_stream_arrays(G, limbs, x, y, inf, 254, chunk_size=16,
                            config=MsmConfig(c=4, lanes=8))
    want = E.msm([k for k, p in zip(ks, pts) if p],
                 [p for p in pts if p])
    assert _aff(dc, res) == want


def test_streaming_msm_precomputed(ctx):
    """Stream-with-precompute variant (multiexp_stream.tcc:124-223): on-disk
    [2^(wc)]e multiples, ONE bucket array, no Horner doublings; agrees with
    the other methods."""
    from libff_tpu.msm.streaming import (msm_stream_precomputed,
                                         multiples_from_file,
                                         write_precomputed_multiples)

    dc, E, gen, ks, pts = ctx
    G = dc.g1
    pts = list(pts)
    pts[5] = None
    c = 5
    gc = ser.GroupCodec(dc.cd.g1)
    blob = write_precomputed_multiples(gc, pts, c, 254, compressed=False)
    with tempfile.NamedTemporaryFile(delete=False) as f:
        f.write(blob)
        path = f.name
    res = msm_stream_precomputed(
        G, ks, multiples_from_file(path, gc, c, 254, chunk=16),
        c, 254, lanes=8)
    want = E.msm([k for k, p in zip(ks, pts) if p],
                 [p for p in pts if p])
    assert _aff(dc, res) == want


def test_engine_resolution(monkeypatch):
    """pallas3 auto-selection is gated on TPU + short-Weierstrass a == 0 +
    <= 16-limb components: Edwards (complete but BBJLP formulas) and
    BW6-761 (48-limb field) must resolve to the XLA path even on TPU."""
    import jax as _jax

    from libff_tpu.msm import pippenger as pp

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    cfg = MsmConfig(c=5, lanes=256)
    g1 = device_curve("alt_bn128").g1
    assert pp._resolve_engine(g1, cfg, T=8, L=256) == "pallas3"
    g2 = device_curve("alt_bn128").g2
    assert pp._resolve_engine(g2, cfg, T=8, L=256) == "pallas3"
    ed = device_curve("edwards").g1
    assert pp._resolve_engine(ed, cfg, T=8, L=256) == "xla"
    bw = device_curve("bw6_761").g1
    assert pp._resolve_engine(bw, cfg, T=8, L=256) == "xla"
    # non-vreg lane counts also fall back
    assert pp._resolve_engine(g1, cfg, T=8, L=96) == "xla"


def test_field_utils_and_misc():
    dc = device_curve("alt_bn128")
    Fr = dc.cd.fr
    for k in (1, 2, 8, 1 << 10):
        om = fu.get_root_of_unity(Fr, k, 5)
        assert Fr.pow(om, k) == 1
        if k > 1:
            assert Fr.pow(om, k // 2) != 1
    assert not fu.has_root_of_unity(Fr, 3)
    bits = [1, 0, 1, 1] * 60
    packed = fu.pack_bit_vector_into_field_element_vector(Fr, bits)
    assert fu.unpack_field_element_vector_into_bit_vector(
        Fr, packed, total_bits=len(bits)) == bits
    xs = [3, 7, 11, dc.cd.r - 2]
    assert all(Fr.mul(a, b) == 1
               for a, b in zip(xs, fu.batch_invert(Fr, xs)))
    assert misc.log2(1) == 0 and misc.log2(5) == 3
    assert misc.bitreverse(0b1101, 4) == 0b1011
    b = [1, 0, 1, 1, 1, 0, 0, 0, 1]
    rb, rest = misc.deserialize_bit_vector(misc.serialize_bit_vector(b))
    assert rb == b and rest == b""
    d = Double.get_root_of_unity(8)
    assert abs((d.power(8) - Double.one()).val) < 1e-12


def test_profiling_blocks(capsys):
    from libff_tpu.utils import profiling as prof

    prof.start_profiling()
    prof.enter_block("outer")
    prof.count_op("fp_mul", 10)
    prof.enter_block("inner")
    prof.leave_block("inner")
    prof.leave_block("outer")
    out = capsys.readouterr().out
    assert "(enter) outer" in out and "(leave) inner" in out
    assert "fp_mul=10" in out
    assert prof.op_counts()["fp_mul"] == 10


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas insert kernel requires a TPU")
def test_pallas_engine_matches_xla():
    """MsmConfig(engine='pallas') must agree with the XLA select path."""
    dc = device_curve("alt_bn128")
    cd = dc.cd
    G = dc.g1
    E = cd.g1.curve
    gen = cd.g1.generator
    n = 512
    ks = [hf.sha512_rng(cd.fr.mp, i) for i in range(n)]
    pts = [E.mul((i % 32) + 1, gen) for i in range(n)]
    limbs = dc.fr.plain_from_ints(ks)
    A = AffinePoint(G.F.from_ints([p[0] for p in pts]),
                    G.F.from_ints([p[1] for p in pts]),
                    jnp.zeros((n,), bool))
    from libff_tpu.msm.pippenger import msm_pippenger

    r_x = msm_pippenger(G, limbs, A, 254,
                        config=MsmConfig(c=6, lanes=128, engine="xla"))
    ax = _aff_pair(dc, r_x)
    for eng in ("pallas", "pallas3"):
        r_p = msm_pippenger(G, limbs, A, 254,
                            config=MsmConfig(c=6, lanes=128, engine=eng))
        assert _aff_pair(dc, r_p) == ax, eng


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas insert kernel requires a TPU")
def test_pallas_engine_matches_xla_g2():
    """The vreg-lane kernels on tower (Fp2) coordinates: G2 MSM through
    engine='pallas3'/'pallas3m' must agree with the XLA select path."""
    dc = device_curve("alt_bn128")
    cd = dc.cd
    G = dc.g2
    E = cd.g2.curve
    gen = cd.g2.generator
    n = 256
    ks = [hf.sha512_rng(cd.fr.mp, i) for i in range(n)]
    pts = [E.mul((i % 16) + 1, gen) for i in range(n)]
    limbs = dc.fr.plain_from_ints(ks)
    A = AffinePoint(G.F.from_host_batch([p[0] for p in pts]),
                    G.F.from_host_batch([p[1] for p in pts]),
                    jnp.zeros((n,), bool))
    from libff_tpu.msm.pippenger import msm_pippenger

    def aff(P):
        Aq = G.to_affine(jax.tree.map(lambda a: a[..., None], P))
        return (G.F.to_host_batch(Aq.x)[0], G.F.to_host_batch(Aq.y)[0])

    r_x = msm_pippenger(G, limbs, A, 254,
                        config=MsmConfig(c=5, lanes=128, engine="xla"))
    ax = aff(r_x)
    r_p = msm_pippenger(G, limbs, A, 254,
                        config=MsmConfig(c=5, lanes=128, engine="pallas3"))
    assert aff(r_p) == ax


def _aff_pair(dc, P):
    G = dc.g1
    A = G.to_affine(jax.tree.map(lambda a: a[..., None], P))
    return (G.F.to_ints(A.x)[0], G.F.to_ints(A.y)[0])
