// Native box-channel builders.
//
// Single-pass double-precision running sums for the correlator channels
// (the numpy cumsum-diff formulation costs several full-array temporaries;
// these write the f32 result directly).  Semantics match dsp/channels.py:
// left zero padding (ring warm-up) and f64 accumulation.

#include <cstdint>

extern "C" {

// B[u] = sum x[max(0,u-w+1) .. u]
void nfclab_box_sum(const float *x, int64_t n, int32_t w, float *out)
{
    double acc = 0.0;
    for (int64_t i = 0; i < n; i++) {
        acc += x[i];
        if (i >= w)
            acc -= x[i - w];
        out[i] = static_cast<float>(acc);
    }
}

// box of q = filt^2 * 10 (listen ASK channel integrand)
void nfclab_box_sq(const float *filt, int64_t n, int32_t w, float *out)
{
    double acc = 0.0;
    for (int64_t i = 0; i < n; i++) {
        const float q = filt[i] * filt[i] * 10.0f;
        acc += q;
        if (i >= w) {
            const float qo = filt[i - w] * filt[i - w] * 10.0f;
            acc -= qo;
        }
        out[i] = static_cast<float>(acc);
    }
}

// box of prod = filt[i] * filt[i-lag] * 10 (BPSK integrand; zero below lag)
void nfclab_box_bpsk(const float *filt, int64_t n, int32_t lag, int32_t w,
                     float *out)
{
    double acc = 0.0;
    for (int64_t i = 0; i < n; i++) {
        const float p =
            (i >= lag) ? filt[i] * filt[i - lag] * 10.0f : 0.0f;
        acc += p;
        if (i >= w) {
            const int64_t j = i - w;
            const float po =
                (j >= lag) ? filt[j] * filt[j - lag] * 10.0f : 0.0f;
            acc -= po;
        }
        out[i] = static_cast<float>(acc);
    }
}

} // extern "C"
