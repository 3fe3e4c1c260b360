"""MNT4-298 curve definition (half of the MNT4/MNT6 pairing cycle).

Seed constants are the public MNT4-298 parameters (cross-checked in tests
against the literals of libff/algebra/curves/mnt/mnt4/mnt4_init.cpp); the
MNT cycle property is that mnt4.q == mnt6.r and mnt4.r == mnt6.q
(mnt/mnt46_common.cpp).

E(Fq): y^2 = x^3 + 2x + b.  Tower: Fq2 = Fq[U]/(U^2-17),
Fq4 = Fq2[W]/(W^2-U); GT = Fq4.  G2 lies on the twist
y^2 = x^3 + (17*2) x + (0 + b*17 U) over Fq2 (mnt4_init.cpp:170-180).
Ate pairing with extended-Jacobian dbl/add coefficient schedule and a
(q^2-1)(q^2+1)-structured final exponentiation with last chunk
w1*q + w0 where w0 = loop_count + 1, w1 = 1 (mnt4_init.cpp:335-346);
also an affine-ate variant (mnt4_pairing.cpp:222-380).
"""

from __future__ import annotations

from ..host import ec as hec
from ..host import field as hf
from .curvedef import CurveDef, GroupDef, PairingDef, register

# mnt46_common.cpp moduli (mnt4: r = modulus_A, q = modulus_B)
R = 475922286169261325753349249653048451545124878552823515553267735739164647307408490559963137
Q = 475922286169261325753349249653048451545124879242694725395555128576210262817955800483758081

Fr = hf.Fp(R, bits=298, name="mnt4_Fr")
Fq = hf.Fp(Q, bits=298, name="mnt4_Fq")

# Fq2 = Fq[U]/(U^2 - 17)  (mnt4_init.cpp:144)
FQ2_NON_RESIDUE = 17
Fq2 = hf.Ext(Fq, 2, FQ2_NON_RESIDUE, name="mnt4_Fq2")
# Fq4 = Fq2[W]/(W^2 - U)  (libff Fp4_model with non_residue 17 = U^2)
Fq4 = hf.Ext(Fq2, 2, (0, 1), name="mnt4_Fq4")

# --- groups ---------------------------------------------------------------

COEFF_A = 2
COEFF_B = 423894536526684178289416011533888240029318103673896002803341544124054745019340795360841685

G1_CURVE = hec.WeierstrassCurve(Fq, COEFF_A, COEFF_B, name="mnt4_G1")

TWIST = (0, 1)                                  # U (mnt4_init.cpp:173)
TWIST_COEFF_A = (COEFF_A * FQ2_NON_RESIDUE % Q, 0)
TWIST_COEFF_B = (0, COEFF_B * FQ2_NON_RESIDUE % Q)
G2_CURVE = hec.WeierstrassCurve(Fq2, TWIST_COEFF_A, TWIST_COEFF_B,
                                name="mnt4_G2")

# generators (mnt4_init.cpp:196-202, 263-275)
G1_ONE = (
    60760244141852568949126569781626075788424196370144486719385562369396875346601926534016838,
    363732850702582978263902770815145784459747722357071843971107674179038674942891694705904306,
)
G2_ONE = (
    (438374926219350099854919100077809681842783509163790991847867546339851681564223481322252708,
     37620953615500480110935514360923278605464476459712393277679280819942849043649216370485641),
    (37437409008528968268352521034936931842973546441370663118543015118291998305624025037512482,
     424621479598893882672393190337420680597584695892317197646113820787463109735345923009077489),
)

G2_COFACTOR = int(
    "475922286169261325753349249653048451545124879932565935237842521413255"
    "878328503110407553025")

g1 = GroupDef(
    name="mnt4_G1",
    curve=G1_CURVE,
    generator=G1_ONE,
    cofactor=1,
    order=R,
    wnaf_window_table=(11, 24, 60, 127),
    fixed_base_exp_window_table=(
        1, 5, 10, 25, 60, 144, 345, 855, 1805, 3912, 11265, 27898, 57597,
        145299, 157205, 601601, 1107377, 1789647, 4392627, 8221211, 0,
        42363731),
)

g2 = GroupDef(
    name="mnt4_G2",
    curve=G2_CURVE,
    generator=G2_ONE,
    cofactor=G2_COFACTOR,
    order=R,
    wnaf_window_table=(5, 15, 39, 109),
    fixed_base_exp_window_table=(
        1, 4, 10, 25, 60, 143, 345, 821, 1794, 3920, 11301, 18960, 44199, 0,
        150800, 548695, 1051769, 2023926, 3787109, 7107480, 0, 38760027),
)

ATE_LOOP_COUNT = 689871209842287392837045615510547309923794944

pairing = PairingDef(
    kind="mnt4",
    ate_loop_count=ATE_LOOP_COUNT,                # mnt4_init.cpp:335-337
    ate_is_loop_count_neg=False,
    final_exponent=(Q**4 - 1) // R,
    final_exponent_z=0,
    final_exponent_is_z_neg=False,
    twist=TWIST,
    twist_type="M",
    embedding_degree=4,
    extra={
        # last-chunk decomposition (mnt4_init.cpp:343-346)
        "final_exponent_last_chunk_abs_of_w0": ATE_LOOP_COUNT + 1,
        "final_exponent_last_chunk_is_w0_neg": False,
        "final_exponent_last_chunk_w1": 1,
    },
)

curve = register(CurveDef(
    name="mnt4",
    r=R,
    q=Q,
    fr=Fr,
    fq=Fq,
    fr_nqr=5,                                     # mnt4_init.cpp:85
    fr_multiplicative_generator=10,               # mnt4_init.cpp:81
    fq_nqr=17,                                    # mnt4_init.cpp:125
    fq_multiplicative_generator=17,               # mnt4_init.cpp:121
    fq2=Fq2,
    fq3=None,
    fq6=None,
    fq12=None,
    gt=Fq4,
    g1=g1,
    g2=g2,
    pairing=pairing,
    fq4=Fq4,
))
