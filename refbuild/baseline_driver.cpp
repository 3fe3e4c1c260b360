// Minimal baseline driver over the reference libff build.
//
// The stock profile_multiexp harness segfaults deterministically inside its
// streaming-MSM path at 2^17 on this machine (see BASELINE.md), so this
// driver measures the in-memory methods only, with the same input
// construction as profile_multiexp.cpp:26-64 (32 random group elements
// repeated + SHA512_rng scalars), at sizes 2^16..2^20.  It reports
// points/sec for BDLO12, BDLO12_signed, BDLO12_signed+mixed with chunks=1
// (what the stock harness measures) and chunks=nproc (MULTICORE).
#include "libff/algebra/curves/alt_bn128/alt_bn128_pp.hpp"
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

template <
    typename GroupT,
    typename FieldT,
    multi_exp_method Method,
    multi_exp_base_form Form>
double time_method(
    const std::vector<GroupT> &els,
    const std::vector<FieldT> &scs,
    size_t chunks,
    size_t iters)
{
    GroupT ans;
    auto t0 = std::chrono::steady_clock::now();
    for (size_t i = 0; i < iters; ++i)
        ans = multi_exp<GroupT, FieldT, Method, Form>(
            els.cbegin(), els.cend(), scs.cbegin(), scs.cend(), chunks);
    auto t1 = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(t1 - t0).count() / iters;
    return (double)els.size() / dt;
}

int main()
{
    alt_bn128_pp::init_public_params();
    const size_t nproc = 4;
    printf(
        "curve group expn\tdjb\tdjb_signed\tdjb_signed_mixed\t"
        "djb_signed_mixed_mc%zu\t(points/s)\n",
        nproc);
    for (size_t expn = 16; expn <= 20; expn += 2) {
        const size_t n = 1ull << expn;
        auto els = gen_elements<G1<alt_bn128_pp>>(n);
        auto scs = gen_scalars<Fr<alt_bn128_pp>>(n);
        size_t iters = expn >= 20 ? 2 : 3;
        double djb = time_method<
            G1<alt_bn128_pp>,
            Fr<alt_bn128_pp>,
            multi_exp_method_BDLO12,
            multi_exp_base_form_normal>(els, scs, 1, iters);
        double sg = time_method<
            G1<alt_bn128_pp>,
            Fr<alt_bn128_pp>,
            multi_exp_method_BDLO12_signed,
            multi_exp_base_form_normal>(els, scs, 1, iters);
        double sgm = time_method<
            G1<alt_bn128_pp>,
            Fr<alt_bn128_pp>,
            multi_exp_method_BDLO12_signed,
            multi_exp_base_form_special>(els, scs, 1, iters);
        double sgm_mc = time_method<
            G1<alt_bn128_pp>,
            Fr<alt_bn128_pp>,
            multi_exp_method_BDLO12_signed,
            multi_exp_base_form_special>(els, scs, nproc, iters);
        printf(
            "alt_bn128 g1 2^%zu\t%.0f\t%.0f\t%.0f\t%.0f\n",
            expn,
            djb,
            sg,
            sgm,
            sgm_mc);
        fflush(stdout);
    }
    for (size_t expn = 16; expn <= 18; expn += 2) {
        const size_t n = 1ull << expn;
        auto els = gen_elements<G2<alt_bn128_pp>>(n);
        auto scs = gen_scalars<Fr<alt_bn128_pp>>(n);
        double sgm = time_method<
            G2<alt_bn128_pp>,
            Fr<alt_bn128_pp>,
            multi_exp_method_BDLO12_signed,
            multi_exp_base_form_special>(els, scs, 1, 2);
        double sgm_mc = time_method<
            G2<alt_bn128_pp>,
            Fr<alt_bn128_pp>,
            multi_exp_method_BDLO12_signed,
            multi_exp_base_form_special>(els, scs, nproc, 2);
        printf("alt_bn128 g2 2^%zu\t-\t-\t%.0f\t%.0f\n", expn, sgm, sgm_mc);
        fflush(stdout);
    }
    return 0;
}
