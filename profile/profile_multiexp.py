"""MSM profiling harness — the multiexp_profile counterpart.

Mirrors libff/algebra/scalar_multiplication/profile/profile_multiexp.cpp:
for sizes 2^lo..2^hi, times the MSM method roster on alt_bn128 G1 AND G2
with deterministic SHA512_rng scalars over 32 repeated generator multiples
(profile_multiexp.cpp:36-64), cross-checks every method's answer
(:316-375) against an EXACT full-size oracle (the inputs are structured:
point i = (i%32+1)*gen, so the expected MSM is one host scalar mul), and
prints a CSV-ish table in points/sec.

Method roster vs the reference harness:
  bdlo12_signed       multi_exp<BDLO12_signed, special>  (the fast path)
  bdlo12              multi_exp<BDLO12>                  (unsigned windows)
  naive               per-term double-and-add   (sizes <= 2^12)
  stream              multi_exp_stream           (sizes <= 2^16; points
                      deserialized from the serialized blob per iteration,
                      like the reference's disk streaming)
  stream_precomp      multi_exp_stream_with_precompute (sizes <= 2^12;
                      multiples precomputed once, excluded from timing —
                      profile_multiexp.cpp:241-268 semantics)
  bos_coster is a host oracle (inherently sequential); it participates in
  the answer check at small sizes only.

Usage:  python profile/profile_multiexp.py [lo_log2] [hi_log2] [g1|g2|both]
Timing uses host-transfer fencing + per-iteration input variation
(tunneled TPU backends serve repeat dispatches from a cache).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax                                             # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # env alone can be overridden by the site boot; config wins
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/libff_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp                                # noqa: E402
import numpy as np                                     # noqa: E402

from libff_tpu.curves.device import device_curve       # noqa: E402
from libff_tpu.curves.group import AffinePoint         # noqa: E402
from libff_tpu.host import field as hf                 # noqa: E402
from libff_tpu.msm.multiexp import (Method, host_multi_exp_bos_coster,  # noqa: E402
                                    multi_exp)
from libff_tpu.msm.streaming import (msm_stream,       # noqa: E402
                                     msm_stream_precomputed)
from libff_tpu.serialization import codec as ser       # noqa: E402

NUM_ITERATIONS = 3
NAIVE_MAX = 1 << 12
STREAM_MAX = 1 << 16
PRECOMP_MAX = 1 << 16


def _structured_oracle(E, gen, r, ks):
    total = 0
    for i, k in enumerate(ks):
        total = (total + (i % 32 + 1) * k) % r
    return E.mul(total, gen) if total else None


def _aff(G, P):
    A = G.to_affine(jax.tree.map(lambda a: a[..., None], P))
    if G.F.degree == 1:
        return (G.F.to_ints(A.x)[0], G.F.to_ints(A.y)[0])
    return (G.F.to_host_batch(A.x)[0], G.F.to_host_batch(A.y)[0])


def _time(run, iters=NUM_ITERATIONS):
    run(0)                                   # warm-up
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        run(i)
    return (time.perf_counter() - t0) / iters


def profile_group(tag, G, E, gen, Fdev, fr, r, sizes):
    base = [E.mul(i + 1, gen) for i in range(32)]
    bx = np.asarray(Fdev.from_host_batch([p[0] for p in base])
                    if Fdev.degree > 1 else
                    Fdev.from_ints([p[0] for p in base]))
    by = np.asarray(Fdev.from_host_batch([p[1] for p in base])
                    if Fdev.degree > 1 else
                    Fdev.from_ints([p[1] for p in base]))
    gc = ser.GroupCodec(G.gdef)
    cols = ["bdlo12_signed", "bdlo12", "naive", "stream", "stream_precomp"]
    print(f"Profiling {tag}\nsize," + ",".join(cols) + "  (points/sec)",
          flush=True)
    for logn in sizes:
        n = 1 << logn
        ks = [hf.sha512_rng(fr.mp, i) for i in range(n)]
        hpts = [base[i % 32] for i in range(n)]
        rep = np.arange(n) % 32
        A = AffinePoint(jnp.asarray(bx[..., rep]), jnp.asarray(by[..., rep]),
                        jnp.zeros((n,), bool))
        limbs = fr.plain_from_ints(ks)
        want = _structured_oracle(E, gen, r, ks)
        if n <= 512:
            assert host_multi_exp_bos_coster(E, ks, hpts) == want
        row = [str(n)]

        methods = [Method.BDLO12_signed]
        if (jax.default_backend() != "tpu"
                or (n <= (1 << 16) and G.F.degree == 1)):
            # the unsigned column runs the scan-VM engine on TPU (below):
            # compile-cheap but ~linear-in-N runtime (~12 min at G1 2^16,
            # ~3x that for G2, ~45+ min at 2^20) — cap it at G1 2^16;
            # cross-method equality incl. G2 is pinned by the suite
            # (tests/test_msm_methods.py) at every libff edge size
            methods.append(Method.BDLO12)
        for m in methods:
            # the unsigned column is the reference's non-default method —
            # it participates for ANSWER parity, not peak speed.  On TPU
            # it runs the scan-VM engine: the rounds/kernel engines cost
            # a fresh 20-min-class compile per (size, method) cell, which
            # the signed column (the production pallas3 path) already
            # proves out.
            cfg = None
            scan_vm = (m is Method.BDLO12
                       and jax.default_backend() == "tpu")
            if scan_vm:
                from libff_tpu.msm.pippenger import default_config
                cfg = default_config(n)._replace(engine="xla",
                                                formulas="vm")
                G.vm_engine = "scan"
            try:
                fn = jax.jit(lambda s, x, y, i, sft, m=m, cfg=cfg:
                             multi_exp(
                                 G, s.at[0].set((s[0] + sft) & 0xFFFF),
                                 AffinePoint(x, y, i), 254, method=m,
                                 config=cfg))
                out = fn(limbs, A.x, A.y, A.inf, jnp.uint32(0))
                assert _aff(G, out) == want, (tag, m, logn)

                def run(i, fn=fn):
                    o = fn(limbs, A.x, A.y, A.inf, jnp.uint32(i))
                    _ = np.asarray(o.z).sum()
                row.append(f"{n / _time(run):.0f}")
            finally:
                if scan_vm:
                    G.vm_engine = "auto"
        if len(methods) == 1:
            row.append("-")                      # unsigned column capped

        if n <= NAIVE_MAX:
            fnn = jax.jit(lambda s, x, y, i, sft: multi_exp(
                G, s.at[0].set((s[0] + sft) & 0xFFFF),
                AffinePoint(x, y, i), 254, method=Method.naive_plain))
            out = fnn(limbs, A.x, A.y, A.inf, jnp.uint32(0))
            assert _aff(G, out) == want, (tag, "naive", logn)

            def runn(i):
                o = fnn(limbs, A.x, A.y, A.inf, jnp.uint32(i))
                _ = np.asarray(o.z).sum()
            row.append(f"{n / _time(runn):.0f}")
        else:
            row.append("-")

        if n <= STREAM_MAX:
            blob = ser.write_point_vector(gc, hpts, compressed=False)

            def chunks():
                sz = gc.uncompressed_size
                for c0 in range(0, n, 1 << 14):
                    c1 = min(n, c0 + (1 << 14))
                    yield [gc.read_uncompressed(
                        blob[i * sz:(i + 1) * sz]) for i in range(c0, c1)]

            out = msm_stream(G, ks, chunks(), 254)
            assert _aff(G, out) == want, (tag, "stream", logn)

            def runs(i):
                o = msm_stream(G, ks, chunks(), 254)
                _ = np.asarray(o.z).sum()
            t_stream = _time(runs, iters=1)
            row.append(f"{n / t_stream:.0f}")
            if logn == min(STREAM_MAX.bit_length() - 1, max(sizes)):
                # producer/consumer overlap evidence (SURVEY §2.6): the
                # streamed MSM's wall time vs the sum of its two phases
                # run back-to-back (host deserialization; device compute)
                t0 = time.perf_counter()
                for _ in chunks():
                    pass
                t_deser = time.perf_counter() - t0
                print(f"  [overlap] stream wall {t_stream*1e3:.0f} ms vs "
                      f"host deserialize alone {t_deser*1e3:.0f} ms "
                      f"(+ device compute; wall < sum => overlap)",
                      flush=True)
        else:
            row.append("-")

        if n <= PRECOMP_MAX:
            # TPU: pin this cell's group ops to the scan-VM executor —
            # the W=1 precompute reduction walks log2(B)~13 HALVING batch
            # shapes, and every shape through the kernel/rounds engines is
            # a fresh compile (the attempt-4 grid burned 30+ min here);
            # the scan VM compiles once per program and the cell is small
            on_tpu = jax.default_backend() == "tpu"
            if on_tpu:
                G.vm_engine = "scan"
            c = max(4, logn - (logn // 3 - 2) + 1)
            # the inputs repeat 32 distinct bases, so only 32*W host
            # multiples are needed (the reference generates its precompute
            # files offline too, profile_multiexp.cpp:120-160)
            base_mult = []
            for P in base:
                ms, m = [], P
                for _ in range(-(-254 // c)):
                    ms.append(m)
                    m = E.mul(1 << c, m)
                base_mult.append(ms)

            def mchunks():
                for c0 in range(0, n, 1 << 14):
                    c1 = min(n, c0 + (1 << 14))
                    yield [base_mult[i % 32] for i in range(c0, c1)]

            try:
                out = msm_stream_precomputed(G, ks, mchunks(), c, 254)
                assert _aff(G, out) == want, (tag, "stream_precomp", logn)

                def runp(i):
                    o = msm_stream_precomputed(G, ks, mchunks(), c, 254)
                    _ = np.asarray(o.z).sum()
                row.append(f"{n / _time(runp, iters=1):.0f}")
            finally:
                if on_tpu:
                    G.vm_engine = "auto"
        else:
            row.append("-")
        print(",".join(row), flush=True)


def main():
    # sizes: either "lo hi" (inclusive range, the reference harness's
    # convention) or one comma-separated list "16,18,20"
    if len(sys.argv) > 1 and "," in sys.argv[1]:
        sizes = [int(s) for s in sys.argv[1].split(",")]
        which = sys.argv[2] if len(sys.argv) > 2 else "both"
    else:
        lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
        hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
        sizes = list(range(lo, hi + 1))
        which = sys.argv[3] if len(sys.argv) > 3 else "both"
    dc = device_curve("alt_bn128")
    cd = dc.cd
    if which in ("g1", "both"):
        profile_group("alt_bn128_g1", dc.g1, cd.g1.curve, cd.g1.generator,
                      dc.fq, dc.fr, cd.r, sizes)
    if which in ("g2", "both"):
        profile_group("alt_bn128_g2", dc.g2, cd.g2.curve, cd.g2.generator,
                      dc.fq2, dc.fr, cd.r, sizes)


if __name__ == "__main__":
    main()
