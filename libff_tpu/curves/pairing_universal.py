"""Curve-generic device pairings by tracing the host oracle.

The host pairing modules (host/pairing_mnt.py, host/pairing_edwards.py,
host/pairing_bw6.py) are written against the abstract field API with plain
Python ints as prime-field elements.  The formula VM's Sym fields coerce
plain ints to constant registers (vm.FpSym._c), so the SAME host functions
trace unchanged into straight-line device programs: one program per
pairing — G2 (or G1, for Tate) coefficient schedule, Miller loop, and
final exponentiation fused end-to-end, executed as a single lax.scan with
one Montgomery multiplier.

This gives every remaining curve family (MNT4, MNT6, Edwards-181,
BW6-761) a device pairing with zero formula duplication; alt_bn128 and
the BLS12 curves keep their bespoke scan-structured AtePairing
(curves/pairing.py), which has lower compile cost for large batches.

Batched: P/Q inputs may carry trailing batch dims.
"""

from __future__ import annotations

import copy

import jax

from .. import vm
from ..host import pairing_bw6 as pb
from ..host import pairing_edwards as pe
from ..host import pairing_mnt as pm


class VmPairing:
    """reduced_pairing / miller_loop / final_exponentiation for the curve
    families without a bespoke device pairing."""

    def __init__(self, dc):
        self.dc = dc
        cd = dc.cd
        self.cd = cd
        self.kind = cd.pairing.kind
        self._fp = dc.fq
        self._progs: dict[str, vm.Program] = {}
        if self.kind in ("mnt4", "mnt6"):
            self._host_ap = pm.MntParams(cd)
            self._mod = pm
            self._qfield_host = cd.fq2 if self.kind == "mnt4" else cd.fq3
            self._qfield_dev = dc.fq2 if self.kind == "mnt4" else dc.fq3
        elif self.kind == "edwards":
            self._host_ap = pe.EdwardsParams(cd)
            self._mod = pe
            self._qfield_host = cd.fq3
            self._qfield_dev = dc.fq3
        elif self.kind == "bw6":
            self._host_ap = pb.Bw6Params(cd)
            self._mod = pb
            self._qfield_host = cd.fq          # G2 is over Fq itself
            self._qfield_dev = dc.fq
        else:
            raise NotImplementedError(
                f"{self.kind}: use curves.pairing.AtePairing")
        self.gt_dev = dc.gt

    # -- plumbing -------------------------------------------------------------
    def _sym_ap(self, fp, mksym):
        """Clone the host params object with Sym field views (host constant
        VALUES stay as plain ints/tuples — the Sym ops coerce them)."""
        ap = copy.copy(self._host_ap)
        cd = self.cd
        if self.kind in ("mnt4", "mnt6"):
            ap.Fq = fp
            ap.Ft = mksym(self._qfield_host)
            ap.Fgt = mksym(cd.gt)
        elif self.kind == "edwards":
            ap.Fq = fp
            ap.Fq3 = mksym(cd.fq3)
            ap.Fq6 = mksym(cd.gt)
        else:
            ap.Fq = fp
            ap.Fq3 = mksym(cd.fq3)
            ap.Fq6 = mksym(cd.gt)
        return ap

    def _program(self, key, build):
        if key not in self._progs:
            self._progs[key] = vm.trace_general(self._fp, build)
        return self._progs[key]

    def _run_gt(self, prog, pairs, batch):
        inputs = []
        for F, arr in pairs:
            inputs.extend(vm.flatten_element(F, arr))
        tpu = jax.default_backend() == "tpu"
        outs = vm.run_program(self._fp, prog, inputs, batch,
                              unroll=8 if tpu else 1,
                              mul="unrolled" if tpu else "loop")
        return vm.unflatten_element(self.gt_dev, outs)

    def _batch_of(self, pairs):
        import numpy as np

        shapes = [arr.shape[F.el_ndim:] for F, arr in pairs]
        m = max(len(s) for s in shapes)
        return tuple(np.broadcast_shapes(
            *[tuple(s) + (1,) * (m - len(s)) for s in shapes]))

    # -- API ------------------------------------------------------------------
    def reduced_pairing(self, P, Q):
        """P = (px, py) device Fq arrays; Q = (qx, qy) device arrays over
        the curve's G2 coordinate field.  Returns a GT element array."""
        mod, kind = self._mod, self.kind

        def build(fp, mksym, inp):
            ap = self._sym_ap(fp, mksym)
            qsym = fp if self._qfield_host is self.cd.fq else mksym(
                self._qfield_host)
            Ps = (inp(fp), inp(fp))
            Qs = (inp(qsym), inp(qsym))
            if kind == "bw6":
                f = pb.reduced_pairing(ap, Ps, Qs)
            elif kind == "edwards":
                f = pe.ate_reduced_pairing(ap, Ps, Qs)
            else:
                f = pm.reduced_pairing(ap, Ps, Qs)
            return list(vm.flatten_value(f))

        prog = self._program("reduced", build)
        pairs = [(self.dc.fq, P[0]), (self.dc.fq, P[1]),
                 (self._qfield_dev, Q[0]), (self._qfield_dev, Q[1])]
        return self._run_gt(prog, pairs, self._batch_of(pairs))

    def double_miller_loop(self, P1, Q1, P2, Q2):
        """Shared-squaring product of two Miller loops (the reference's
        <curve>_double_miller_loop), traced end-to-end from the host
        formulas.  Returns the unreduced GT element
        miller(P1,Q1)*miller(P2,Q2); apply final_exponentiation to reduce."""
        mod, kind = self._mod, self.kind

        def build(fp, mksym, inp):
            ap = self._sym_ap(fp, mksym)
            qsym = fp if self._qfield_host is self.cd.fq else mksym(
                self._qfield_host)
            P1s, Q1s = (inp(fp), inp(fp)), (inp(qsym), inp(qsym))
            P2s, Q2s = (inp(fp), inp(fp)), (inp(qsym), inp(qsym))
            if kind == "bw6":
                f = pb.ate_double_miller_loop(
                    ap, pb.precompute_g1(ap, P1s), pb.precompute_g2(ap, Q1s),
                    pb.precompute_g1(ap, P2s), pb.precompute_g2(ap, Q2s))
            elif kind == "edwards":
                f = pe.ate_double_miller_loop(
                    ap, pe.ate_precompute_g1(ap, P1s),
                    pe.ate_precompute_g2(ap, Q1s),
                    pe.ate_precompute_g1(ap, P2s),
                    pe.ate_precompute_g2(ap, Q2s))
            else:
                f = pm.ate_double_miller_loop(
                    ap, pm.precompute_g1(ap, P1s), pm.precompute_g2(ap, Q1s),
                    pm.precompute_g1(ap, P2s), pm.precompute_g2(ap, Q2s))
            return list(vm.flatten_value(f))

        prog = self._program("double_miller", build)
        pairs = [(self.dc.fq, P1[0]), (self.dc.fq, P1[1]),
                 (self._qfield_dev, Q1[0]), (self._qfield_dev, Q1[1]),
                 (self.dc.fq, P2[0]), (self.dc.fq, P2[1]),
                 (self._qfield_dev, Q2[0]), (self._qfield_dev, Q2[1])]
        return self._run_gt(prog, pairs, self._batch_of(pairs))

    def final_exponentiation(self, f):
        def build(fp, mksym, inp):
            ap = self._sym_ap(fp, mksym)
            gts = mksym(self.cd.gt)
            x = inp(gts)
            if self.kind == "bw6":
                out = pb.final_exponentiation(ap, x)
            elif self.kind == "edwards":
                out = pe.final_exponentiation(ap, x)
            else:
                out = pm.final_exponentiation(ap, x)
            return list(vm.flatten_value(out))

        prog = self._program("final_exp", build)
        pairs = [(self.gt_dev, f)]
        return self._run_gt(prog, pairs, self._batch_of(pairs))

    def tate_reduced_pairing(self, P, Q):
        """Edwards only: the Tate pairing (edwards_pairing.cpp:444-462)."""
        assert self.kind == "edwards"

        def build(fp, mksym, inp):
            ap = self._sym_ap(fp, mksym)
            Ps = (inp(fp), inp(fp))
            q3 = mksym(self.cd.fq3)
            Qs = (inp(q3), inp(q3))
            f = pe.tate_reduced_pairing(ap, Ps, Qs)
            return list(vm.flatten_value(f))

        prog = self._program("tate_reduced", build)
        pairs = [(self.dc.fq, P[0]), (self.dc.fq, P[1]),
                 (self.dc.fq3, Q[0]), (self.dc.fq3, Q[1])]
        return self._run_gt(prog, pairs, self._batch_of(pairs))

    def affine_reduced_pairing(self, P, Q):
        """MNT only: affine-ate variant (mnt4_pairing.cpp:222-380)."""
        assert self.kind in ("mnt4", "mnt6")

        def build(fp, mksym, inp):
            ap = self._sym_ap(fp, mksym)
            qsym = mksym(self._qfield_host)
            Ps = (inp(fp), inp(fp))
            Qs = (inp(qsym), inp(qsym))
            f = pm.affine_reduced_pairing(ap, Ps, Qs)
            return list(vm.flatten_value(f))

        prog = self._program("affine_reduced", build)
        pairs = [(self.dc.fq, P[0]), (self.dc.fq, P[1]),
                 (self._qfield_dev, Q[0]), (self._qfield_dev, Q[1])]
        return self._run_gt(prog, pairs, self._batch_of(pairs))
