"""edwards (Edwards-181) curve definition — the 80-bit-security Edwards
curve of the original libff/libsnark stack.

Seed constants are the public parameters (cross-checked in tests against
the literals of libff/algebra/curves/edwards/edwards_init.cpp).

E(Fq): x^2 + y^2 = 1 + d x^2 y^2 (twisted Edwards with a = 1), identity
(0, 1).  Tower: Fq3 = Fq[U]/(U^3-61), Fq6 = Fq3[W]/(W^2-U); GT = Fq6.
G2 lies on the twist a' = U, d' = d*U over Fq3 (edwards_init.cpp:166-178).
Pairings: Tate with Fq conic coefficients and an ate variant over Fq3
(edwards_pairing.cpp:249-770); final exponent (q^3-1)(q+1) first chunk,
last chunk w1*q + w0 with w0 = -17970038794095729281964441603, w1 = 4
(edwards_init.cpp:316-340).
"""

from __future__ import annotations

from ..host import ec as hec
from ..host import field as hf
from .curvedef import CurveDef, GroupDef, PairingDef, register

R = 1552511030102430251236801561344621993261920897571225601
Q = 6210044120409721004947206240885978274523751269793792001

Fr = hf.Fp(R, bits=181, name="edwards_Fr")
Fq = hf.Fp(Q, bits=183, name="edwards_Fq")

# Fq3 = Fq[U]/(U^3 - 61)  (edwards_init.cpp:130)
FQ3_NON_RESIDUE = 61
Fq3 = hf.Ext(Fq, 3, FQ3_NON_RESIDUE, name="edwards_Fq3")
# Fq6 = Fq3[W]/(W^2 - U)  (2-over-3; edwards_init.cpp:150-162)
Fq6 = hf.Ext(Fq3, 2, (0, 1, 0), name="edwards_Fq6")

# --- groups ---------------------------------------------------------------

COEFF_A = 1
COEFF_D = 600581931845324488256649384912508268813600056237543024

G1_CURVE = hec.EdwardsCurve(Fq, COEFF_A, COEFF_D, name="edwards_G1")

TWIST = (0, 1, 0)                                 # U
TWIST_COEFF_A = (0, 1, 0)                         # a * U (a = 1)
TWIST_COEFF_D = (0, COEFF_D, 0)                   # d * U
G2_CURVE = hec.EdwardsCurve(Fq3, TWIST_COEFF_A, TWIST_COEFF_D,
                            name="edwards_G2")

# generators (edwards_init.cpp:195-199, 232-246)
G1_ONE = (
    3713709671941291996998665608188072510389821008693530490,
    4869953702976555123067178261685365085639705297852816679,
)
G2_ONE = (
    (4531683359223370252210990718516622098304721701253228128,
     5339624155305731263217400504407647531329993548123477368,
     3964037981777308726208525982198654699800283729988686552),
    (364634864866983740775341816274081071386963546650700569,
     3264380230116139014996291397901297105159834497864380415,
     3504781284999684163274269077749440837914479176282903747),
)

# cofactors: #E(Fq) = 4r so h1 = 4; h2 derived from the twist order
# q^3 + 1 + t3 (t = q + 1 - 4r, t3 = t^3 - 3qt), the r-divisible branch
G1_COFACTOR = 4
_T = Q + 1 - 4 * R
_T3 = _T**3 - 3 * Q * _T
_ORD_PLUS = Q**3 + 1 + _T3
_ORD_MINUS = Q**3 + 1 - _T3
G2_COFACTOR = (_ORD_PLUS // R if _ORD_PLUS % R == 0 else _ORD_MINUS // R)

g1 = GroupDef(
    name="edwards_G1",
    curve=G1_CURVE,
    generator=G1_ONE,
    cofactor=G1_COFACTOR,
    order=R,
    wnaf_window_table=(9, 14, 24, 117),           # edwards_init.cpp:201-206
    fixed_base_exp_window_table=(                  # edwards_init.cpp:208-...
        1, 4, 10, 25, 60, 149, 370, 849, 1765, 4430, 13389, 15368, 74912,
        0, 438107, 0, 1045626, 1577434, 0, 0, 17350594, 0),
)

g2 = GroupDef(
    name="edwards_G2",
    curve=G2_CURVE,
    generator=G2_ONE,
    cofactor=G2_COFACTOR,
    order=R,
    wnaf_window_table=(6, 12, 42, 97),
    fixed_base_exp_window_table=(
        1, 5, 11, 26, 61, 146, 357, 823, 1589, 4136, 14298, 16745, 51769,
        99811, 193307, 0, 907185, 1389683, 0, 6752696, 193642895, 226760202),
)

pairing = PairingDef(
    kind="edwards",
    ate_loop_count=4492509698523932320491110403,   # edwards_init.cpp:316
    ate_is_loop_count_neg=False,
    final_exponent=(Q**6 - 1) // R,
    final_exponent_z=0,
    final_exponent_is_z_neg=False,
    twist=TWIST,
    twist_type="M",
    embedding_degree=6,
    extra={
        "final_exponent_last_chunk_abs_of_w0": 17970038794095729281964441603,
        "final_exponent_last_chunk_is_w0_neg": True,
        "final_exponent_last_chunk_w1": 4,
        "coeff_d": COEFF_D,
        "twist_coeff_d": TWIST_COEFF_D,
    },
)

curve = register(CurveDef(
    name="edwards",
    r=R,
    q=Q,
    fr_nqr=11,                                     # edwards_init.cpp:76
    fr_multiplicative_generator=19,                # edwards_init.cpp:73
    fq_nqr=23,                                     # edwards_init.cpp:110
    fq_multiplicative_generator=61,                # edwards_init.cpp:107
    fr=Fr,
    fq=Fq,
    fq2=None,
    fq3=Fq3,
    fq6=Fq6,
    fq12=None,
    gt=Fq6,
    g1=g1,
    g2=g2,
    pairing=pairing,
))
