"""Assembly of device-side field/group objects from a host CurveDef.

The counterpart of libff's `<curve>_pp` traits classes
(libff/algebra/curves/public_params.hpp:15-73): one object bundling the
scalar field, base field, tower, and groups of a curve — but as a value
constructed from pure data, not global static initialization.
"""

from __future__ import annotations

import functools

from ..fields.fp import PrimeField
from ..fields.tower import ExtField
from .curvedef import CurveDef, get_curve
from .group import Group


class DeviceCurve:
    def __init__(self, cd: CurveDef):
        self.cd = cd
        self.name = cd.name
        self.r = cd.r
        self.q = cd.q
        self.fr = PrimeField(cd.r, cd.fr.mp.bits, cd.fr.name)
        self.fq = PrimeField(cd.q, cd.fq.mp.bits, cd.fq.name)
        # map host field objects -> device fields, building the tower
        fmap = {id(cd.fq): self.fq}
        self.fq2 = self.fq3 = self.fq4 = self.fq6 = self.fq12 = None
        for attr in ("fq2", "fq3", "fq4", "fq6", "fq12"):
            h = getattr(cd, attr)
            if h is None:
                continue
            base_dev = fmap[id(h.B)]
            dev = ExtField(base_dev, h, name=h.name)
            setattr(self, attr, dev)
            fmap[id(h)] = dev
        self.gt = fmap.get(id(cd.gt))
        self._fmap = fmap
        from ..host.ec import EdwardsCurve

        if isinstance(cd.g1.curve, EdwardsCurve):
            # twisted-Edwards groups use their own (inverted-coordinate)
            # device group class; pairings go through VmPairing which only
            # needs the device fields
            from .group_edwards import EdwardsGroup

            self.g1 = EdwardsGroup(fmap[id(cd.g1.curve.F)], cd.g1)
            self.g2 = EdwardsGroup(fmap[id(cd.g2.curve.F)], cd.g2)
        else:
            self.g1 = Group(fmap[id(cd.g1.curve.F)], cd.g1)
            self.g2 = Group(fmap[id(cd.g2.curve.F)], cd.g2) if cd.g2 else None

    def field_for(self, host_field):
        return self._fmap[id(host_field)]


@functools.lru_cache(maxsize=None)
def device_curve(name: str) -> DeviceCurve:
    return DeviceCurve(get_curve(name))
