"""Honest config sweep for the pallas3 MSM on the real chip.

Measures the FULL msm_pippenger (not just the insert phase) at a given
size across a grid of (c, lanes, tb, merge) configurations, with
input-varying fenced timing (dispatch-cache defeat) and a bit-exact
structured-oracle check per config.  Prints one JSON line per config and
a final "best" line.  The counterpart of libff's profile loop
(profile_multiexp.cpp:275-399) for the kernel's tuning axes.

Usage:
  python profile/sweep_insert.py [log2n] [g1|g2] [budget_s]

Each NEW config costs a Mosaic/XLA compile (~4-6 min G1 via the tunnel);
the sweep stops starting new configs once the wall-clock budget
(default 3000 s) is near.  Compiled programs persist in the JAX cache, so
re-runs are cheap.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np                                     # noqa: E402

import jax                                             # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/libff_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp                                # noqa: E402

from libff_tpu.curves.device import device_curve       # noqa: E402
from libff_tpu.curves.group import AffinePoint         # noqa: E402
from libff_tpu.host import field as hf                 # noqa: E402
from libff_tpu.msm.pippenger import MsmConfig, msm_pippenger  # noqa: E402

T0 = time.time()


def main() -> None:
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    which = sys.argv[2] if len(sys.argv) > 2 else "g1"
    budget = float(sys.argv[3]) if len(sys.argv) > 3 else 3000.0
    n = 1 << log2n
    dc = device_curve("alt_bn128")
    cd = dc.cd
    if which == "g1":
        G, E, gen = dc.g1, cd.g1.curve, cd.g1.generator
        load = G.F.from_ints
        # priority order: incumbent first, then the round-4 SOS-multiplier
        # hypothesis (deferred-carry ILP, fields/fp.py mul_sos), then the
        # merge-kernel and L=1024 hypotheses (L=1024 halves the number of
        # one-hot bucket passes T = N/L at 2x the VMEM bucket block)
        grid = [(6, 512, 16, False, "cios"), (6, 512, 16, False, "sos"),
                (6, 512, 16, False, "sos2"),
                (6, 512, 16, "kernel", "sos"), (6, 1024, 16, False, "sos"),
                (5, 512, 16, False, "sos"), (6, 512, 16, "kernel", "cios"),
                (6, 1024, 16, "kernel", "cios"), (7, 512, 16, False, "sos"),
                (5, 1024, 16, "kernel", "cios"), (6, 1024, 16, False, "cios"),
                (7, 1024, 16, False, "sos")]
    else:
        G, E, gen = dc.g2, cd.g2.curve, cd.g2.generator
        load = G.F.from_host_batch
        grid = [(5, 256, 4, False, "cios"), (5, 256, 4, False, "sos"),
                (5, 256, 8, False, "sos"), (6, 512, 4, False, "sos"),
                (4, 256, 4, False, "cios")]

    if os.environ.get("SWEEP_SOS", "1") != "1":
        grid = [g for g in grid if g[4] == "cios"]
        print(json.dumps({"note": "SOS configs skipped (SWEEP_SOS=0: "
                          "roofline compile not seen to finish)"}),
              flush=True)

    nrep = 16
    ks = [hf.sha512_rng(cd.fr.mp, i) for i in range(n)]
    base = [E.mul(i + 1, gen) for i in range(nrep)]
    bx = np.asarray(load([p[0] for p in base]))
    by = np.asarray(load([p[1] for p in base]))
    rep = np.arange(n) % nrep
    x, y = jnp.asarray(bx[..., rep]), jnp.asarray(by[..., rep])
    inf = jnp.zeros((n,), dtype=jnp.bool_)
    raw = b"".join(k.to_bytes(32, "little") for k in ks)
    limbs = jnp.asarray(
        np.frombuffer(raw, dtype="<u2").reshape(n, 16).T.astype(np.uint32))

    total = 0
    for j in range(nrep):
        kj = sum(k for i, k in enumerate(ks) if i % nrep == j)
        total = (total + (j + 1) * kj) % cd.r
    want = E.mul(total, gen)

    def check(out):
        A = G.to_affine(out)
        ax, ay = jax.device_get(A.x), jax.device_get(A.y)
        if which == "g1":
            got = (G.F.to_host(ax), G.F.to_host(ay))
        else:
            got = (G.F.to_host(ax), G.F.to_host(ay))
        return got == want

    results = []
    for c, L, tb, merge, kmul in grid:
        if time.time() - T0 > budget - 420:
            print(json.dumps({"skipped": f"c{c}/L{L}/tb{tb}/m{merge}/{kmul}",
                              "reason": "budget"}), flush=True)
            continue
        cfg = MsmConfig(c=c, lanes=L, tb=tb, merge=merge, kmul=kmul)

        def step(s, x, y, i, sft, cfg=cfg):
            s = s.at[0].set((s[0] + sft) & 0xFFFF)
            return msm_pippenger(G, s, AffinePoint(x, y, i), 254,
                                 config=cfg)

        fn = jax.jit(step)
        t0 = time.time()
        try:
            out = fn(limbs, x, y, inf, jnp.uint32(0))
            ok = check(out)
            t_compile = time.time() - t0
            iters = 3
            t0 = time.time()
            for i in range(1, iters + 1):
                out = fn(limbs, x, y, inf, jnp.uint32(i))
                _ = np.asarray(out.z).sum()
            dt = (time.time() - t0) / iters
            rec = {"which": which, "log2n": log2n, "c": c, "L": L,
                   "tb": tb, "merge": str(merge), "kmul": kmul,
                   "pts_per_sec": round(n / dt, 1),
                   "ms": round(dt * 1e3, 1), "bit_exact": bool(ok),
                   "compile_s": round(t_compile, 1)}
        except Exception as e:  # noqa: BLE001 - record and continue
            rec = {"which": which, "c": c, "L": L, "tb": tb,
                   "merge": str(merge), "kmul": kmul,
                   "error": f"{type(e).__name__}: {e}"[:160]}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    good = [r for r in results if r.get("bit_exact")]
    if good:
        best = max(good, key=lambda r: r["pts_per_sec"])
        print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
