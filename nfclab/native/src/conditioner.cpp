// Exact sequential signal-conditioning oracle.
//
// Reproduces, in original float32 operation order, the per-sample conditioning
// chain of the reference decoder (NfcTech.cpp:28-105, NfcDecoderStatus fields
// NfcTech.h:317-393):
//
//   - conditional exponential envelope with silence timeout reset
//   - 1-pole IIR DC removal filter
//   - exponential mean deviation of |filtered|
//   - exponential signal average
//   - modulation depth (envelope - clamp(value)) / envelope
//   - carrier edge peak tracker (hysteresis high/low thresholds)
//
// This is the ground-truth against which the block-parallel TPU conditioner is
// validated; it is also the production fallback on hosts without accelerators.
//
// Build: g++ -O2 -shared -fPIC (see nfclab/native/build.py)

#include <cmath>
#include <cstring>
#include <cstdint>
#include <algorithm>

extern "C" {

// Streaming variant: identical math with an explicit carry so blocks can be
// conditioned incrementally (the live-capture path).  state layout:
// [0]=envelope [1]=filter_n1 [2]=deviation [3]=average [4]=edge_peak
// [5]=edge_time(bits of uint32) [6]=pulse_filter [7]=clock_base
void nfclab_condition_stream(
    const float *value, int64_t n,
    float enve_w0, float enve_w1,
    float mdev_w0, float mdev_w1,
    float mean_w0, float mean_w1,
    float iir_a,
    int32_t etu,
    float low_thr, float high_thr,
    double *state,
    float *env_out, float *filt_out, float *mdev_out, float *avg_out,
    float *mdepth_out, float *edge_peak_out, uint32_t *edge_time_out)
{
    float envelope = static_cast<float>(state[0]);
    float filter_n1 = static_cast<float>(state[1]);
    float deviation = static_cast<float>(state[2]);
    float average = static_cast<float>(state[3]);
    float edge_peak = static_cast<float>(state[4]);
    uint32_t edge_time = static_cast<uint32_t>(state[5]);
    int64_t pulse_filter = static_cast<int64_t>(state[6]);
    int64_t clock_base = static_cast<int64_t>(state[7]);
    const int64_t silence_limit = static_cast<int64_t>(etu) * 10;

    for (int64_t i = 0; i < n; i++) {
        const int64_t clock = clock_base + i;
        pulse_filter++;

        const float v = value[i];
        const float diff = std::fabs(v - envelope) / envelope;
        if (diff < 0.05f || pulse_filter > silence_limit) {
            pulse_filter = 0;
            envelope = envelope * enve_w0 + v * enve_w1;
        } else if (clock < etu) {
            envelope = v;
        }

        const float filter_n0 = v + filter_n1 * iir_a;
        const float filtered = filter_n0 - filter_n1;
        filter_n1 = filter_n0;

        deviation = deviation * mdev_w0 + std::fabs(filtered) * mdev_w1;
        average = average * mean_w0 + v * mean_w1;

        const float clamped = std::max(0.0f, std::min(v, envelope));
        const float mdepth = (envelope - clamped) / envelope;

        const float rectified = std::fabs(filtered);
        if (rectified > high_thr) {
            if (rectified > edge_peak) {
                edge_peak = rectified;
                edge_time = static_cast<uint32_t>(clock);
            }
        } else if (rectified < low_thr) {
            edge_peak = 0.0f;
        }

        env_out[i] = envelope;
        filt_out[i] = filtered;
        mdev_out[i] = deviation;
        avg_out[i] = average;
        mdepth_out[i] = mdepth;
        edge_peak_out[i] = edge_peak;
        edge_time_out[i] = edge_time;
    }

    state[0] = envelope;
    state[1] = filter_n1;
    state[2] = deviation;
    state[3] = average;
    state[4] = edge_peak;
    state[5] = edge_time;
    state[6] = static_cast<double>(pulse_filter);
    state[7] = static_cast<double>(clock_base + n);
}

// Standalone carrier-edge peak tracker (NfcTech.cpp:77-92) over an
// externally conditioned `filtered` stream — the TPU farm path fetches
// envelope/filtered/etc. from the fused device kernel (which does not emit
// the edge channels) and runs only this scan on the host.  Clocks are
// absolute; pointers are virtual (window base pre-subtracted) like the
// other _ext kernels.  state: [0]=edge_peak [1]=edge_time(u32 bits).
void nfclab_edge_track_ext(
    const float *filt, int64_t start, int64_t n,
    float low_thr, float high_thr, double *state,
    float *edge_peak_out, uint32_t *edge_time_out)
{
    float edge_peak = static_cast<float>(state[0]);
    uint32_t edge_time = static_cast<uint32_t>(state[1]);
    for (int64_t clock = start; clock < n; clock++) {
        const float rectified = std::fabs(filt[clock]);
        if (rectified > high_thr) {
            if (rectified > edge_peak) {
                edge_peak = rectified;
                edge_time = static_cast<uint32_t>(clock);
            }
        } else if (rectified < low_thr) {
            edge_peak = 0.0f;
        }
        edge_peak_out[clock] = edge_peak;
        edge_time_out[clock] = edge_time;
    }
    state[0] = edge_peak;
    state[1] = edge_time;
}

void nfclab_condition(
    const float *value, int64_t n,
    float enve_w0, float enve_w1,
    float mdev_w0, float mdev_w1,
    float mean_w0, float mean_w1,
    float iir_a,
    int32_t etu,
    float low_thr, float high_thr,
    float *env_out, float *filt_out, float *mdev_out, float *avg_out,
    float *mdepth_out, float *edge_peak_out, uint32_t *edge_time_out)
{
    float envelope = 0.0f;
    float filter_n1 = 0.0f;
    float deviation = 0.0f;
    float average = 0.0f;
    float edge_peak = 0.0f;
    uint32_t edge_time = 0;
    int64_t pulse_filter = 0;
    const int64_t silence_limit = static_cast<int64_t>(etu) * 10;

    for (int64_t clock = 0; clock < n; clock++) {
        // ++signalClock; ++pulseFilter (NfcTech.cpp:34-35)
        pulse_filter++;

        const float v = value[clock];

        // conditional envelope update (NfcTech.cpp:39-53)
        const float diff = std::fabs(v - envelope) / envelope;
        if (diff < 0.05f || pulse_filter > silence_limit) {
            pulse_filter = 0;
            envelope = envelope * enve_w0 + v * enve_w1;
        } else if (clock < etu) {
            envelope = v;
        }

        // 1-pole IIR DC removal (NfcTech.cpp:56-62)
        const float filter_n0 = v + filter_n1 * iir_a;
        const float filtered = filter_n0 - filter_n1;
        filter_n1 = filter_n0;

        // mean deviation and signal average (NfcTech.cpp:65-68)
        deviation = deviation * mdev_w0 + std::fabs(filtered) * mdev_w1;
        average = average * mean_w0 + v * mean_w1;

        // modulation depth (NfcTech.cpp:74); clamp(v, 0, envelope)
        const float clamped = std::max(0.0f, std::min(v, envelope));
        const float mdepth = (envelope - clamped) / envelope;

        // carrier edge peak tracker (NfcTech.cpp:77-92)
        const float rectified = std::fabs(filtered);
        if (rectified > high_thr) {
            if (rectified > edge_peak) {
                edge_peak = rectified;
                edge_time = static_cast<uint32_t>(clock);
            }
        } else if (rectified < low_thr) {
            edge_peak = 0.0f;
        }

        env_out[clock] = envelope;
        filt_out[clock] = filtered;
        mdev_out[clock] = deviation;
        avg_out[clock] = average;
        mdepth_out[clock] = mdepth;
        edge_peak_out[clock] = edge_peak;
        edge_time_out[clock] = edge_time;
    }
}

} // extern "C"
