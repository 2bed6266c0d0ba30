// IQ -> magnitude conversion with power metering.
//
// Native port of the RadioDeviceTask hot loop (RadioDeviceTask.cpp:560-660):
// the reference hand-writes SSE2 square/shuffle/add/sqrt; here plain loops
// autovectorize under -O2 (and the TPU path does the same expression inside
// the jitted frontend).  Also computes the 0.001-weight exponential level
// average the software AGC consumes (updated every 4th sample, matching the
// reference's stride).

#include <cmath>
#include <cstdint>

extern "C" {

// iq: interleaved [n*2] floats; mag_out: [n] floats.
// Returns updated level average through *avrg_io and mean power through
// *power_out.
void nfclab_iq_magnitude(
    const float *iq, int64_t n,
    float *mag_out, float *avrg_io, float *power_out)
{
    float avrg = *avrg_io;
    double powr = 0.0;

    for (int64_t j = 0; j < n; j++) {
        const float i = iq[2 * j + 0];
        const float q = iq[2 * j + 1];
        const float p = i * i + q * q;
        mag_out[j] = std::sqrt(p);
        powr += p;
        if ((j & 3) == 0) {
            avrg = avrg * (1.0f - 0.001f) + mag_out[j] * 0.001f;
        }
    }

    *avrg_io = avrg;
    *power_out = n ? static_cast<float>(powr / static_cast<double>(n)) : 0.0f;
}

} // extern "C"
