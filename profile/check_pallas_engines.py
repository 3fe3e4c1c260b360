"""TPU-only check: the Pallas insert engines agree bit-exactly with the
XLA one-hot path on G1 AND G2 (the conftest pins pytest to CPU, where the
kernels cannot run, so this drives the same assertions standalone).

Usage: python profile/check_pallas_engines.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax                                             # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/libff_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp                                # noqa: E402

from libff_tpu.curves.device import device_curve       # noqa: E402
from libff_tpu.curves.group import AffinePoint         # noqa: E402
from libff_tpu.host import field as hf                 # noqa: E402
from libff_tpu.msm.pippenger import MsmConfig, msm_pippenger  # noqa: E402


def main():
    assert jax.default_backend() == "tpu", "requires the TPU"
    dc = device_curve("alt_bn128")
    cd = dc.cd

    for gname, G, gd, nel in (("g1", dc.g1, cd.g1, 512),
                              ("g2", dc.g2, cd.g2, 256)):
        E, gen = gd.curve, gd.generator
        ks = [hf.sha512_rng(cd.fr.mp, i) for i in range(nel)]
        pts = [E.mul((i % 16) + 1, gen) for i in range(nel)]
        limbs = dc.fr.plain_from_ints(ks)
        load = (G.F.from_ints if G.F.degree == 1 else G.F.from_host_batch)
        A = AffinePoint(load([p[0] for p in pts]), load([p[1] for p in pts]),
                        jnp.zeros((nel,), bool))

        def aff(P):
            Aq = G.to_affine(jax.tree.map(lambda a: a[..., None], P))
            if G.F.degree == 1:
                return (G.F.to_ints(Aq.x)[0], G.F.to_ints(Aq.y)[0])
            return (G.F.to_host_batch(Aq.x)[0], G.F.to_host_batch(Aq.y)[0])

        # exact host expectation
        want = E.msm(ks, pts)

        r_x = msm_pippenger(G, limbs, A, 254,
                            config=MsmConfig(c=5, lanes=128, engine="xla"))
        got_x = aff(r_x)
        assert got_x == want, f"{gname} xla mismatch"
        # G2 kernel bodies need small tb to compile in bounded time
        tb = 16 if gname == "g1" else 4
        combos = ([("pallas", False, "cios"), ("pallas3", False, "cios"),
                   ("pallas3", "kernel", "cios"), ("pallas3", False, "sos")]
                  if gname == "g1"
                  else [("pallas3", False, "cios"),
                        ("pallas3", "kernel", "cios"),
                        ("pallas3", False, "sos")])
        for eng, merge, kmul in combos:
            r_p = msm_pippenger(G, limbs, A, 254,
                                config=MsmConfig(c=5, lanes=128, engine=eng,
                                                 merge=merge, tb=tb,
                                                 kmul=kmul))
            assert aff(r_p) == want, \
                f"{gname} {eng} merge={merge} kmul={kmul} mismatch"
            print(f"{gname} {eng} merge={merge} kmul={kmul}: OK (bit-exact "
                  "vs host oracle)", flush=True)


if __name__ == "__main__":
    main()
