"""Group-operation and deserialization profiler — the counterpart of
libff's profile_algebra_groups (curves/profile/profile_algebra_groups.cpp:
17-99,190-244) and profile_algebra_groups_read
(profile_algebra_groups_read.cpp:72-286).

Measures, per curve in {alt_bn128, bls12_377} (the reference's pair):
  * G1/G2 add, mixed-add (madd), dbl throughput on a 2^logn batch
  * subgroup-membership check throughput
  * e-over-e pairing check latency (e(P1,Q1) == e(P2,Q2) via
    double-miller + final-exp, profile_algebra_groups.cpp:233-244)
  * point deserialization throughput (uncompressed & compressed binary,
    the codec path streaming MSM uses)

Usage: python profile/profile_groups.py [logn] [curve ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax                                             # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/libff_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp                                # noqa: E402
import numpy as np                                     # noqa: E402

from libff_tpu.curves.device import device_curve       # noqa: E402
from libff_tpu.curves.group import AffinePoint     # noqa: E402
from libff_tpu.serialization import codec as ser       # noqa: E402


def _fence(x):
    """Force execution and round-trip ONE element to the host.

    np.asarray(full_leaf) would transfer the whole array through the
    tunneled backend (~35 MB/s — a 16 MB coordinate costs ~450 ms and
    dominates the measurement; this exact bug made the r04 group-op
    capture measure the tunnel, not the chip).  Slicing on device first
    keeps the fence at a few bytes."""
    leaf = jax.tree.leaves(x)[0]
    sl = leaf[(slice(0, 1),) * leaf.ndim]
    return float(np.asarray(sl).sum())


def _bench(name, fn, args_of, units, unit, iters=3):
    _fence(fn(*args_of(0)))
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        _fence(fn(*args_of(i)))
    dt = (time.perf_counter() - t0) / iters
    print(f"  {name:28s}: {units / dt / 1e6:10.3f} M{unit}/s"
          f"  ({dt * 1e3:8.2f} ms)", flush=True)


def _mk_points(G, E, gen, n):
    base = [E.mul(i + 1, gen) for i in range(32)]
    if G.F.degree == 1:
        bx = np.asarray(G.F.from_ints([p[0] for p in base]))
        by = np.asarray(G.F.from_ints([p[1] for p in base]))
    else:
        bx = np.asarray(G.F.from_host_batch([p[0] for p in base]))
        by = np.asarray(G.F.from_host_batch([p[1] for p in base]))
    rep = np.arange(n) % 32
    A = AffinePoint(jnp.asarray(bx[..., rep]), jnp.asarray(by[..., rep]),
                    jnp.zeros((n,), bool))
    return base, A


def profile_curve(name: str, logn: int):
    dc = device_curve(name)
    cd = dc.cd
    n = 1 << logn
    reps = 4
    for gname, G, gd in (("g1", dc.g1, cd.g1), ("g2", dc.g2, cd.g2)):
        E, gen = gd.curve, gd.generator
        print(f"{name} {gname} (batch 2^{logn}):", flush=True)
        base, A = _mk_points(G, E, gen, n)
        P = G.from_affine(A)

        # vary inputs per iteration by rotating the batch (honest timing
        # on the tunneled backend; see microbench.py docstring)
        addf = jax.jit(lambda P, r: G.add(
            P, jax.tree.map(lambda a: jnp.roll(a, r, axis=-1), P)))
        _bench("add", lambda P, r: addf(P, r),
               lambda i: (P, jnp.int32(i + 1)), n, "op", iters=reps)
        maddf = jax.jit(lambda P, x, y, inf, r: G.mixed_add(
            P, AffinePoint(jnp.roll(x, r, axis=-1),
                           jnp.roll(y, r, axis=-1), inf)))
        _bench("mixed_add", lambda P, x, y, i, r: maddf(P, x, y, i, r),
               lambda i: (P, A.x, A.y, A.inf, jnp.int32(i + 1)),
               n, "op", iters=reps)
        dblf = jax.jit(lambda P, r: G.dbl(
            jax.tree.map(lambda a: jnp.roll(a, r, axis=-1), P)))
        _bench("dbl", lambda P, r: dblf(P, r),
               lambda i: (P, jnp.int32(i)), n, "op", iters=reps)

        # batch >= 2^13 routes the ladder's dbl/add through the Pallas
        # formula kernels (curves/pallas_ops.py) — the r04 capture at
        # batch 2^8 was scan-VM dispatch-bound (0.000-0.010 Mop/s)
        nsub = min(n, 1 << 13)
        Psub = jax.tree.map(lambda a: a[..., :nsub], P)
        subf = jax.jit(lambda P, r: G.is_in_safe_subgroup(
            jax.tree.map(lambda a: jnp.roll(a, r, axis=-1), P)))
        _bench(f"is_in_safe_subgroup (2^{nsub.bit_length()-1})",
               lambda P, r: subf(P, r), lambda i: (Psub, jnp.int32(i)),
               nsub, "op", iters=2)

        # deserialization throughput (host codec; the streaming-MSM input
        # path — profile_algebra_groups_read.cpp's sequential strategy)
        gc = ser.GroupCodec(gd)
        npts = min(n, 1 << 12)
        hpts = [base[i % 32] for i in range(npts)]
        for comp in (False, True):
            blob = ser.write_point_vector(gc, hpts, compressed=comp)
            t0 = time.perf_counter()
            out = ser.read_point_vector(gc, blob, compressed=comp)
            dt = time.perf_counter() - t0
            assert out[:32] == hpts[:32]
            tag = "compressed" if comp else "uncompressed"
            print(f"  deserialize {tag:13s}: {npts / dt / 1e3:10.3f} Kpts/s",
                  flush=True)

        # BULK device deserialization (serialization/device_codec.py):
        # one numpy limb pass + batched device Tonelli-Shanks y-recovery
        from libff_tpu.serialization import device_codec as dser

        # compressed decode: the batched-sqrt graph has CRASHED the axon
        # TPU worker twice (alt_bn128 G2 @2^20, bls12_377 G1 @2^20), and a
        # crashed worker poisons every later call in this process — so the
        # compressed row runs from its own process (profile/
        # bench_dev_decode.py) unless explicitly enabled here.
        comps = (False, True) if os.environ.get("PG_DEV_COMP") else (False,)
        for comp in comps:
            nbig = n if (not comp or G.F.degree == 1) else min(n, 1 << 16)
            hbig = [base[i % 32] for i in range(nbig)]
            try:
                blob = ser.write_point_vector(gc, hbig, compressed=comp)
                Ad, bad = dser.read_point_vector_device(gc, G, blob,
                                                        compressed=comp)
                _fence(Ad.x)           # warm compile before timing
                t0 = time.perf_counter()
                Ad, bad = dser.read_point_vector_device(gc, G, blob,
                                                        compressed=comp)
                _fence(Ad.x)
                dt = time.perf_counter() - t0
                assert not bool(np.asarray(bad).any())
                # spot-check lanes vs the host codec
                sub = jax.tree.map(lambda a: a[..., :8], Ad)
                if G.F.degree == 1:
                    xs, ys = G.F.to_ints(sub.x), G.F.to_ints(sub.y)
                else:
                    xs = G.F.to_host_batch(sub.x)
                    ys = G.F.to_host_batch(sub.y)
                assert all((xs[i], ys[i]) == hbig[i] for i in range(8))
                tag = "compressed" if comp else "uncompressed"
                print(f"  deserialize {tag:9s} dev: {nbig / dt / 1e3:10.3f}"
                      " Kpts/s", flush=True)
            except Exception as e:  # noqa: BLE001 - keep the grid alive
                print(f"  deserialize dev comp={comp}: FAILED "
                      f"{type(e).__name__}: {e}"[:120], flush=True)

        # I/O-strategy comparison on a point-vector FILE — sequential read
        # vs per-element seek vs mmap (profile_algebra_groups_read.cpp:
        # 72-286 profiles the same three strategies)
        import mmap as mmap_mod
        import tempfile

        blob = ser.write_point_vector(gc, hpts, compressed=False)
        sz = gc.uncompressed_size
        with tempfile.NamedTemporaryFile(delete=False) as f:
            f.write(blob)
            path = f.name

        def _seq():
            with open(path, "rb") as fh:
                return ser.read_point_vector(gc, fh.read())

        def _seek():
            out = []
            with open(path, "rb") as fh:
                for i in range(npts):
                    fh.seek(i * sz)
                    out.append(gc.read_uncompressed(fh.read(sz)))
            return out

        def _mmapped():
            with open(path, "rb") as fh:
                with mmap_mod.mmap(fh.fileno(), 0,
                                   access=mmap_mod.ACCESS_READ) as mm:
                    return [gc.read_uncompressed(mm[i * sz:(i + 1) * sz])
                            for i in range(npts)]

        for tag, fn in (("sequential", _seq), ("seek", _seek),
                        ("mmap", _mmapped)):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            assert out[:32] == hpts[:32]
            print(f"  read strategy {tag:11s}: {npts / dt / 1e3:10.3f}"
                  " Kpts/s", flush=True)
        os.unlink(path)

    # e-over-e pairing check latency (profile_algebra_groups.cpp:233-244)
    E1, E2 = cd.g1.curve, cd.g2.curve
    P0, Q0 = cd.g1.generator, cd.g2.generator
    s = 777
    pairs = [(E1.mul(s, P0), Q0), (P0, E2.mul(s, Q0))]
    if name in ("alt_bn128", "bls12_377", "bls12_381"):
        from libff_tpu.curves.pairing import AtePairing, G1Precomp

        pr = AtePairing(dc)
        px = dc.fq.from_ints([p[0] for p, q in pairs])
        py = dc.fq.from_ints([p[1] for p, q in pairs])
        qx = dc.fq2.from_host_batch([q[0] for p, q in pairs])
        qy = dc.fq2.from_host_batch([q[1] for p, q in pairs])
        eef = jax.jit(lambda px, py, qx, qy: pr.final_exponentiation(
            pr.miller_loop(G1Precomp(px, py), pr.precompute_g2((qx, qy)))))
        _fence(eef(px, py, qx, qy))
        t0 = time.perf_counter()
        out = eef(px, py, qx, qy)
        eq = bool(np.asarray(jax.jit(dc.gt.eq)(
            jax.tree.map(lambda a: a[..., 0], out),
            jax.tree.map(lambda a: a[..., 1], out))))
        dt = time.perf_counter() - t0
        assert eq, "e([s]P, Q) != e(P, [s]Q)"
        print(f"  e-over-e check (warm)       : {dt * 1e3:10.2f} ms",
              flush=True)


def main():
    # 2^20 on TPU: the tunneled backend adds ~30 ms of dispatch round-trip
    # per call, so bigger batches keep the measurement compute-dominated
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else (
        20 if jax.default_backend() == "tpu" else 10)
    curves = sys.argv[2:] or ["alt_bn128", "bls12_377"]
    for c in curves:
        profile_curve(c, logn)


if __name__ == "__main__":
    main()
