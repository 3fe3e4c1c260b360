"""Host-side exact elliptic-curve group arithmetic (oracle).

Short-Weierstrass groups y^2 = x^3 + a*x + b over any host field from
``libff_tpu.host.field`` — the semantic reference for the batched Jacobian
device kernels (which follow libff's formula choices, e.g.
alt_bn128_g1.cpp:149-326).  Points here are affine tuples ``(x, y)`` or
``None`` for the identity; correctness, not speed.
"""

from __future__ import annotations


class WeierstrassCurve:
    def __init__(self, F, a, b, name: str = "E"):
        self.F = F
        self.a = a
        self.b = b
        self.name = name

    # points: None == identity, else (x, y) affine
    def is_on_curve(self, P) -> bool:
        if P is None:
            return True
        F = self.F
        x, y = P
        lhs = F.sqr(y)
        rhs = F.add(F.add(F.mul(F.sqr(x), x), F.mul(self.a, x)), self.b)
        return F.eq(lhs, rhs)

    def neg(self, P):
        if P is None:
            return None
        return (P[0], self.F.neg(P[1]))

    def add(self, P, Q):
        F = self.F
        if P is None:
            return Q
        if Q is None:
            return P
        x1, y1 = P
        x2, y2 = Q
        if F.eq(x1, x2):
            if F.eq(y1, y2):
                return self.dbl(P)
            return None
        lam = F.mul(F.sub(y2, y1), F.inv(F.sub(x2, x1)))
        x3 = F.sub(F.sub(F.sqr(lam), x1), x2)
        y3 = F.sub(F.mul(lam, F.sub(x1, x3)), y1)
        return (x3, y3)

    def dbl(self, P):
        F = self.F
        if P is None:
            return None
        x1, y1 = P
        if F.is_zero(y1):
            return None
        num = F.add(F.mul_scalar_int(F.sqr(x1), 3), self.a)
        lam = F.mul(num, F.inv(F.mul_scalar_int(y1, 2)))
        x3 = F.sub(F.sqr(lam), F.mul_scalar_int(x1, 2))
        y3 = F.sub(F.mul(lam, F.sub(x1, x3)), y1)
        return (x3, y3)

    def mul(self, k: int, P):
        if k < 0:
            return self.mul(-k, self.neg(P))
        R = None
        for bit in bin(k)[2:] if k else "":
            R = self.dbl(R)
            if bit == "1":
                R = self.add(R, P)
        return R

    def msm(self, scalars, points):
        R = None
        for k, P in zip(scalars, points):
            R = self.add(R, self.mul(k, P))
        return R

    def y_at_x(self, x):
        """curve_point_y_at_x (curve_utils.tcc:34-46): y = sqrt(x^3+ax+b)."""
        F = self.F
        y2 = F.add(F.add(F.mul(F.sqr(x), x), F.mul(self.a, x)), self.b)
        return F.sqrt(y2)
