"""MNT6-298 curve definition (other half of the MNT4/MNT6 pairing cycle).

Seed constants are the public MNT6-298 parameters (cross-checked in tests
against the literals of libff/algebra/curves/mnt/mnt6/mnt6_init.cpp);
mnt6.r == mnt4.q and mnt6.q == mnt4.r (the cycle property).

E(Fq): y^2 = x^3 + 11x + b.  Tower: Fq3 = Fq[U]/(U^3-5),
Fq6 = Fq3[W]/(W^2-U) (2-over-3); GT = Fq6.  G2 lies on the twist
y^2 = x^3 + (0,0,11) x + (b*5,0,0) over Fq3 (mnt6_init.cpp:192-203).
Ate pairing with the same extended-Jacobian coefficient schedule as MNT4
(over Fq3), negative loop count, final exponentiation first chunk
(q^3-1)(q+1) and last chunk w1*q + w0 with w0 = -(loop_count), w1 = 1
(mnt6_init.cpp:~340, mnt6_pairing.cpp:70-130).
"""

from __future__ import annotations

from ..host import ec as hec
from ..host import field as hf
from .curvedef import CurveDef, GroupDef, PairingDef, register

# mnt46_common.cpp moduli (mnt6: r = modulus_B, q = modulus_A — swapped
# relative to mnt4)
R = 475922286169261325753349249653048451545124879242694725395555128576210262817955800483758081
Q = 475922286169261325753349249653048451545124878552823515553267735739164647307408490559963137

Fr = hf.Fp(R, bits=298, name="mnt6_Fr")
Fq = hf.Fp(Q, bits=298, name="mnt6_Fq")

# Fq3 = Fq[U]/(U^3 - 5)  (mnt6_init.cpp:149)
FQ3_NON_RESIDUE = 5
Fq3 = hf.Ext(Fq, 3, FQ3_NON_RESIDUE, name="mnt6_Fq3")
# Fq6 = Fq3[W]/(W^2 - U)  (2-over-3; mnt6_init.cpp:172-189)
Fq6 = hf.Ext(Fq3, 2, (0, 1, 0), name="mnt6_Fq6")

# --- groups ---------------------------------------------------------------

COEFF_A = 11
COEFF_B = 106700080510851735677967319632585352256454251201367587890185989362936000262606668469523074

G1_CURVE = hec.WeierstrassCurve(Fq, COEFF_A, COEFF_B, name="mnt6_G1")

TWIST = (0, 1, 0)                                # U (mnt6_init.cpp:195)
TWIST_COEFF_A = (0, 0, COEFF_A)
TWIST_COEFF_B = (COEFF_B * FQ3_NON_RESIDUE % Q, 0, 0)
G2_CURVE = hec.WeierstrassCurve(Fq3, TWIST_COEFF_A, TWIST_COEFF_B,
                                name="mnt6_G2")

# generators (mnt6_init.cpp:221-227, 292-306)
G1_ONE = (
    336685752883082228109289846353937104185698209371404178342968838739115829740084426881123453,
    402596290139780989709332707716568920777622032073762749862342374583908837063963736098549800,
)
G2_ONE = (
    (421456435772811846256826561593908322288509115489119907560382401870203318738334702321297427,
     103072927438548502463527009961344915021167584706439945404959058962657261178393635706405114,
     143029172143731852627002926324735183809768363301149009204849580478324784395590388826052558),
    (464673596668689463130099227575639512541218133445388869383893594087634649237515554342751377,
     100642907501977375184575075967118071807821117960152743335603284583254620685343989304941678,
     123019855502969896026940545715841181300275180157288044663051565390506010149881373807142903),
)

G2_COFACTOR = int(
    "226502022472576270196498690498308461791828762732602586162207535351960"
    "270082712694977333372361549082214519252261735048131889018501404377856"
    "786623430385820659037970876666767495659520")

g1 = GroupDef(
    name="mnt6_G1",
    curve=G1_CURVE,
    generator=G1_ONE,
    cofactor=1,
    order=R,
    wnaf_window_table=(11, 24, 60, 127),
    fixed_base_exp_window_table=(
        1, 4, 10, 25, 60, 146, 350, 845, 1840, 3904, 11309, 24016, 72289,
        138413, 156390, 562560, 1036742, 2053819, 4370224, 8215704, 0,
        42682375),
)

g2 = GroupDef(
    name="mnt6_G2",
    curve=G2_CURVE,
    generator=G2_ONE,
    cofactor=G2_COFACTOR,
    order=R,
    wnaf_window_table=(5, 15, 39, 109),
    fixed_base_exp_window_table=(
        1, 4, 10, 25, 60, 144, 346, 819, 1782, 4002, 10870, 18023, 43161, 0,
        149743, 551844, 1041828, 1977372, 3703620, 7057237, 0, 38554492),
)

ATE_LOOP_COUNT = 689871209842287392837045615510547309923794944

pairing = PairingDef(
    kind="mnt6",
    ate_loop_count=ATE_LOOP_COUNT,                # mnt6 loop count, NEGATIVE
    ate_is_loop_count_neg=True,
    final_exponent=(Q**6 - 1) // R,
    final_exponent_z=0,
    final_exponent_is_z_neg=False,
    twist=TWIST,
    twist_type="M",
    embedding_degree=6,
    extra={
        "final_exponent_last_chunk_abs_of_w0": ATE_LOOP_COUNT,
        "final_exponent_last_chunk_is_w0_neg": True,
        "final_exponent_last_chunk_w1": 1,
    },
)

curve = register(CurveDef(
    name="mnt6",
    r=R,
    q=Q,
    fr_nqr=17,                                    # mnt6_init.cpp:87
    fr_multiplicative_generator=17,               # mnt6_init.cpp:83
    fq_nqr=5,                                     # mnt6_init.cpp:127
    fq_multiplicative_generator=10,               # mnt6_init.cpp:123
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
