// Dumps reference serialization bytes for fixed test vectors, to be pinned
// as golden values in tests/test_serialization_golden.py.
//
// Covers the runtime-templated codecs (field_read/write<Enc,Form>,
// group_read/write<Enc,Form,Comp>) for alt_bn128 Fr/Fq/Fq2/G1/G2 across all
// encoding x form x compression configs, plus the legacy per-class
// write_uncompressed / write_compressed ('0'+flags char prefix) and the
// macro-selected stream operator<< under this build's configuration
// (BINARY_OUTPUT + MONTGOMERY_OUTPUT).
//
// Output: one line per vector:  <tag> <hex>
#include "libff/algebra/curves/alt_bn128/alt_bn128_pp.hpp"
#include "libff/algebra/curves/bls12_377/bls12_377_pp.hpp"
#include "libff/algebra/curves/curve_serialization.hpp"
#include "libff/algebra/fields/field_serialization.hpp"

#include <iostream>
#include <sstream>

using namespace libff;

static std::string hexify(const std::string &s)
{
    static const char *d = "0123456789abcdef";
    std::string out;
    for (unsigned char c : s) {
        out.push_back(d[c >> 4]);
        out.push_back(d[c & 15]);
    }
    return out;
}

template <typename T> static std::string via_stream(const T &v)
{
    std::stringstream ss;
    ss << v;
    return ss.str();
}

template <encoding_t E, form_t F, typename FieldT>
static void dump_field(const std::string &tag, const FieldT &v)
{
    std::stringstream ss;
    field_write<E, F>(v, ss);
    std::cout << tag << " " << hexify(ss.str()) << "\n";
}

template <encoding_t E, form_t F, compression_t C, typename GroupT>
static void dump_group(const std::string &tag, const GroupT &g)
{
    std::stringstream ss;
    group_write<E, F, C>(g, ss);
    std::cout << tag << " " << hexify(ss.str()) << "\n";
}

template <typename FieldT>
static void dump_field_all(const std::string &name, const FieldT &v)
{
    dump_field<encoding_binary, form_plain>(name + " bin plain", v);
    dump_field<encoding_binary, form_montgomery>(name + " bin mont", v);
    dump_field<encoding_json, form_plain>(name + " json plain", v);
    dump_field<encoding_json, form_montgomery>(name + " json mont", v);
}

template <typename GroupT>
static void dump_group_all(const std::string &name, const GroupT &g)
{
    dump_group<encoding_binary, form_plain, compression_off>(
        name + " bin plain uncomp", g);
    dump_group<encoding_binary, form_plain, compression_on>(
        name + " bin plain comp", g);
    dump_group<encoding_binary, form_montgomery, compression_off>(
        name + " bin mont uncomp", g);
    dump_group<encoding_binary, form_montgomery, compression_on>(
        name + " bin mont comp", g);
    // JSON group encoding exists only uncompressed in the reference
    dump_group<encoding_json, form_plain, compression_off>(
        name + " json plain uncomp", g);
}

int main()
{
    alt_bn128_pp::init_public_params();

    using Fr = alt_bn128_Fr;
    using Fq = alt_bn128_Fq;
    using Fq2 = alt_bn128_Fq2;
    using G1 = alt_bn128_G1;
    using G2 = alt_bn128_G2;

    const Fr fr_vals[] = {
        Fr::zero(), Fr::one(), Fr("2"), (-Fr::one()),
        Fr("12345678901234567890123456789012345678901234567890")};
    const char *fr_names[] = {"fr0", "fr1", "fr2", "frm1", "frbig"};
    for (int i = 0; i < 5; i++)
        dump_field_all(std::string("Fr ") + fr_names[i], fr_vals[i]);

    const Fq fq_vals[] = {
        Fq::zero(), Fq::one(), (-Fq::one()),
        Fq("98765432109876543210987654321098765432109876543210")};
    const char *fq_names[] = {"fq0", "fq1", "fqm1", "fqbig"};
    for (int i = 0; i < 4; i++)
        dump_field_all(std::string("Fq ") + fq_names[i], fq_vals[i]);

    const Fq2 fq2 = Fq2(
        Fq("11111111111111111111111111111111111"),
        Fq("22222222222222222222222222222222222"));
    dump_field_all("Fq2 ab", fq2);

    const G1 g1_vals[] = {
        G1::zero(), G1::one(), Fr("7").as_bigint() * G1::one(),
        (-Fr::one()).as_bigint() * G1::one()};
    const char *g1_names[] = {"zero", "one", "sevenG", "m1G"};
    for (int i = 0; i < 4; i++)
        dump_group_all(std::string("G1 ") + g1_names[i], g1_vals[i]);

    const G2 g2_vals[] = {
        G2::zero(), G2::one(), Fr("7").as_bigint() * G2::one()};
    const char *g2_names[] = {"zero", "one", "sevenG"};
    for (int i = 0; i < 3; i++)
        dump_group_all(std::string("G2 ") + g2_names[i], g2_vals[i]);

    // legacy per-class formats (alt_bn128_g1.cpp:374-434): '0'+flags char
    // then the macro-configured field stream operator (this build:
    // BINARY_OUTPUT + MONTGOMERY_OUTPUT -> raw 64-bit-limb Montgomery)
    for (int i = 0; i < 4; i++) {
        std::stringstream su, sc;
        g1_vals[i].write_uncompressed(su);
        g1_vals[i].write_compressed(sc);
        std::cout << "G1legacy " << g1_names[i] << " uncomp binmont "
                  << hexify(su.str()) << "\n";
        std::cout << "G1legacy " << g1_names[i] << " comp binmont "
                  << hexify(sc.str()) << "\n";
    }
    for (int i = 0; i < 3; i++) {
        std::stringstream su, sc;
        g2_vals[i].write_uncompressed(su);
        g2_vals[i].write_compressed(sc);
        std::cout << "G2legacy " << g2_names[i] << " uncomp binmont "
                  << hexify(su.str()) << "\n";
        std::cout << "G2legacy " << g2_names[i] << " comp binmont "
                  << hexify(sc.str()) << "\n";
    }

    // macro-selected stream operator<< for field elements (this build:
    // raw little-endian 64-bit limbs of the Montgomery representation)
    std::cout << "Frstream fr2 binmont " << hexify(via_stream(fr_vals[2]))
              << "\n";
    std::cout << "Fqstream fqbig binmont " << hexify(via_stream(fq_vals[3]))
              << "\n";

    // bls12_377 legacy per-class formats: a DIFFERENT layout from
    // alt_bn128's — '0'/'1' zero char, X, then trailing '0'/'1' Y-parity
    // char when compressed (bls12_377_g1.cpp:465-480)
    bls12_377_pp::init_public_params();
    using Fr377 = bls12_377_Fr;
    using G1_377 = bls12_377_G1;
    using G2_377 = bls12_377_G2;
    const G1_377 b377_g1[] = {
        G1_377::zero(), G1_377::one(),
        Fr377("7").as_bigint() * G1_377::one()};
    const G2_377 b377_g2[] = {
        G2_377::zero(), G2_377::one(),
        Fr377("7").as_bigint() * G2_377::one()};
    const char *b377_names[] = {"zero", "one", "sevenG"};
    for (int i = 0; i < 3; i++) {
        std::stringstream su, sc, su2, sc2;
        b377_g1[i].write_uncompressed(su);
        b377_g1[i].write_compressed(sc);
        b377_g2[i].write_uncompressed(su2);
        b377_g2[i].write_compressed(sc2);
        std::cout << "B377G1legacy " << b377_names[i] << " uncomp binmont "
                  << hexify(su.str()) << "\n";
        std::cout << "B377G1legacy " << b377_names[i] << " comp binmont "
                  << hexify(sc.str()) << "\n";
        std::cout << "B377G2legacy " << b377_names[i] << " uncomp binmont "
                  << hexify(su2.str()) << "\n";
        std::cout << "B377G2legacy " << b377_names[i] << " comp binmont "
                  << hexify(sc2.str()) << "\n";
    }
    // bigint decimal/hex strings (bigint.tcc:154-194 text path is
    // macro-gated; decimal strings via mpn_get_str are stable)
    return 0;
}
