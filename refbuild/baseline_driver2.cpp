// Extended baseline driver (round 5): the reference columns missing from
// baseline_driver.cpp —
//   * BW6-761 G1 MSM (the repo's first 48-limb TPU datapoints had no libff
//     column; profile_multiexp.cpp:401-414 instantiates per-pp, this is
//     the same measurement for bw6_761_pp)
//   * alt_bn128 G2 2^20 (for the TPU G2 2^20 arm)
//   * pairing throughput: reduced_pairing over fresh inputs, single
//     thread, alt_bn128 + bls12_377 + bw6_761
//     (profile_algebra_groups.cpp:233-244 measures the e-over-e check;
//     here we amortize over K pairings for a pairings/sec figure)
//   * fixed-base batch_exp at 2^16 scalars with the library's own window
//     table + OpenMP (multiexp.tcc:885-947), alt_bn128 G1.
#include "libff/algebra/curves/alt_bn128/alt_bn128_pp.hpp"
#include "libff/algebra/curves/bls12_377/bls12_377_pp.hpp"
#include "libff/algebra/curves/bw6_761/bw6_761_pp.hpp"
#include "libff/algebra/scalar_multiplication/multiexp.hpp"
#include "libff/common/rng.hpp"

#include <chrono>
#include <cstdio>
#include <vector>

using namespace libff;

template <typename GroupT> std::vector<GroupT> gen_elements(size_t n)
{
    std::vector<GroupT> v;
    v.reserve(n);
    for (size_t i = 0; i < 32 && i < n; ++i) {
        GroupT x = GroupT::random_element();
        x.to_special();
        v.push_back(x);
    }
    for (size_t i = v.size(); i < n; ++i)
        v.push_back(v[i % 32]);
    return v;
}

template <typename FieldT> std::vector<FieldT> gen_scalars(size_t n)
{
    std::vector<FieldT> v;
    v.reserve(n);
    for (size_t i = 0; i < n; ++i)
        v.push_back(SHA512_rng<FieldT>(i));
    return v;
}

template <typename GroupT, typename FieldT>
void msm_rows(const char *curve, const char *grp, size_t lo, size_t hi,
              size_t nproc)
{
    for (size_t expn = lo; expn <= hi; expn += 2) {
        const size_t n = 1ull << expn;
        auto els = gen_elements<GroupT>(n);
        auto scs = gen_scalars<FieldT>(n);
        size_t iters = expn >= 20 ? 2 : 3;
        GroupT ans;
        auto t0 = std::chrono::steady_clock::now();
        for (size_t i = 0; i < iters; ++i)
            ans = multi_exp<GroupT, FieldT, multi_exp_method_BDLO12_signed,
                            multi_exp_base_form_special>(
                els.cbegin(), els.cend(), scs.cbegin(), scs.cend(), 1);
        auto t1 = std::chrono::steady_clock::now();
        for (size_t i = 0; i < iters; ++i)
            ans = multi_exp<GroupT, FieldT, multi_exp_method_BDLO12_signed,
                            multi_exp_base_form_special>(
                els.cbegin(), els.cend(), scs.cbegin(), scs.cend(), nproc);
        auto t2 = std::chrono::steady_clock::now();
        double d1 = std::chrono::duration<double>(t1 - t0).count() / iters;
        double dm = std::chrono::duration<double>(t2 - t1).count() / iters;
        printf("%s %s 2^%zu\tsigned_mixed %.0f\tsigned_mixed_mc%zu %.0f\t"
               "(points/s)\n",
               curve, grp, expn, n / d1, nproc, n / dm);
        fflush(stdout);
    }
}

template <typename ppT>
void pairing_row(const char *curve, size_t K)
{
    auto Ps = gen_elements<G1<ppT>>(K);
    auto Qs = gen_elements<G2<ppT>>(K);
    // one warm-up
    GT<ppT> acc = ppT::reduced_pairing(Ps[0], Qs[0]);
    auto t0 = std::chrono::steady_clock::now();
    for (size_t i = 0; i < K; ++i)
        acc = acc * ppT::reduced_pairing(Ps[i], Qs[i]);
    auto t1 = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(t1 - t0).count();
    printf("%s reduced_pairing\t%zu pairings\t%.1f pair/s\t%.2f ms each\n",
           curve, K, K / dt, dt * 1e3 / K);
    fflush(stdout);
}

int main()
{
    alt_bn128_pp::init_public_params();
    bls12_377_pp::init_public_params();
    bw6_761_pp::init_public_params();
    const size_t nproc = 4;

    msm_rows<G1<bw6_761_pp>, Fr<bw6_761_pp>>("bw6_761", "g1", 14, 16, nproc);
    msm_rows<G2<alt_bn128_pp>, Fr<alt_bn128_pp>>("alt_bn128", "g2", 20, 20,
                                                 nproc);
    msm_rows<G2<bls12_377_pp>, Fr<bls12_377_pp>>("bls12_377", "g2", 16, 16,
                                                 nproc);

    pairing_row<alt_bn128_pp>("alt_bn128", 256);
    pairing_row<bls12_377_pp>("bls12_377", 128);
    pairing_row<bw6_761_pp>("bw6_761", 32);

    // fixed-base batch_exp (multiexp.tcc:885-947): the library's own
    // window-size choice for 2^16 exponents, OpenMP-parallel
    {
        using G = G1<alt_bn128_pp>;
        using F = Fr<alt_bn128_pp>;
        const size_t n = 1ull << 16;
        auto scs = gen_scalars<F>(n);
        const size_t scalar_size = F::size_in_bits();
        const size_t window = get_exp_window_size<G>(n);
        auto table = get_window_table<G>(scalar_size, window, G::one());
        auto t0 = std::chrono::steady_clock::now();
        auto out = batch_exp<G, F>(scalar_size, window, table, scs);
        auto t1 = std::chrono::steady_clock::now();
        double dt = std::chrono::duration<double>(t1 - t0).count();
        printf("alt_bn128 g1 batch_exp 2^16\twindow %zu\t%.0f exps/s\n",
               window, n / dt);
        (void)out;
    }
    return 0;
}
