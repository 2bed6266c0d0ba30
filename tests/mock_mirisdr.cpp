// Mock libmirisdr for the MSi2500 vendor-driver live-decode test.
//
// Implements the mirisdr_* surface that nfclab/native/src/usb_drivers.cpp
// binds with dlopen (load_rtl + miri_open_tr bring-up), so a subprocess
// started with LD_LIBRARY_PATH pointing here exercises the REAL vendor
// driver + task chain without hardware.  Behavior:
//   - one device
//   - read_async streams the int16 "384_S16" IQ payload from
//     $NFCLAB_MOCK_MIRI_PAYLOAD in chunks via the callback (len in BYTES,
//     like the real lib), then returns -> driver emits in-band EOF
//   - every set_* call appends a line to $NFCLAB_MOCK_MIRI_LOG so the test
//     can assert the miri-specific bring-up (hw flavour, 8 MHz bandwidth,
//     384_S16 format, BULK transfer, zero IF) actually reached the
//     "hardware", plus sample rate / tuner gain in plain dB
//
// Reference counterpart: MiriDevice.cpp:117-205 drives the real libmirisdr
// with this same open/bring-up/read_async sequence.

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <thread>
#include <vector>

namespace {

struct MockDev {
    std::atomic<bool> cancel {false};
};

void log_line_l(const char *fmt, long value)
{
    const char *path = getenv("NFCLAB_MOCK_MIRI_LOG");
    if (!path)
        return;
    if (FILE *f = fopen(path, "a")) {
        fprintf(f, fmt, value);
        fputc('\n', f);
        fclose(f);
    }
}

void log_line_s(const char *fmt, const char *value)
{
    const char *path = getenv("NFCLAB_MOCK_MIRI_LOG");
    if (!path)
        return;
    if (FILE *f = fopen(path, "a")) {
        fprintf(f, fmt, value);
        fputc('\n', f);
        fclose(f);
    }
}

}  // namespace

extern "C" {

uint32_t mirisdr_get_device_count() { return 1; }

int mirisdr_open(void **dev, uint32_t index)
{
    if (index != 0)
        return -1;
    *dev = new MockDev();
    return 0;
}

int mirisdr_close(void *dev)
{
    delete static_cast<MockDev *>(dev);
    return 0;
}

// ------------------------------------------------ miri-specific bring-up

int mirisdr_set_hw_flavour(void *, int flavour)
{
    log_line_l("hw_flavour %ld", flavour);
    return 0;
}

int mirisdr_set_bandwidth(void *, uint32_t bw)
{
    log_line_l("bandwidth %ld", (long)bw);
    return 0;
}

int mirisdr_set_sample_format(void *, char *fmt)
{
    log_line_s("sample_format %s", fmt);
    return 0;
}

int mirisdr_set_transfer(void *, char *kind)
{
    log_line_s("transfer %s", kind);
    return 0;
}

int mirisdr_set_if_freq(void *, uint32_t freq)
{
    log_line_l("if_freq %ld", (long)freq);
    return 0;
}

// ------------------------------------------------------- shared surface

int mirisdr_set_sample_rate(void *, uint32_t rate)
{
    log_line_l("sample_rate %ld", (long)rate);
    return 0;
}

int mirisdr_set_center_freq(void *, uint32_t freq)
{
    log_line_l("center_freq %ld", (long)freq);
    return 0;
}

int mirisdr_set_tuner_gain_mode(void *, int mode)
{
    log_line_l("gain_mode %ld", mode);
    return 0;
}

int mirisdr_set_tuner_gain(void *, int db)
{
    log_line_l("tuner_gain %ld", db);
    return 0;
}

int mirisdr_reset_buffer(void *) { return 0; }

int mirisdr_read_async(void *dev,
                       void (*cb)(unsigned char *, uint32_t, void *),
                       void *ctx, uint32_t, uint32_t)
{
    auto *d = static_cast<MockDev *>(dev);
    const char *path = getenv("NFCLAB_MOCK_MIRI_PAYLOAD");
    if (!path)
        return -1;
    std::vector<unsigned char> payload;
    if (FILE *f = fopen(path, "rb")) {
        fseek(f, 0, SEEK_END);
        payload.resize(ftell(f));
        fseek(f, 0, SEEK_SET);
        if (fread(payload.data(), 1, payload.size(), f) != payload.size())
            payload.clear();
        fclose(f);
    }
    const size_t chunk = 4 * 16384;  // bytes; int16 I/Q pairs
    for (size_t off = 0; off < payload.size() && !d->cancel.load();
         off += chunk) {
        size_t n = payload.size() - off < chunk ? payload.size() - off : chunk;
        cb(payload.data() + off, static_cast<uint32_t>(n), ctx);
        std::this_thread::sleep_for(std::chrono::milliseconds(1));
    }
    return 0;
}

int mirisdr_cancel_async(void *dev)
{
    static_cast<MockDev *>(dev)->cancel.store(true);
    return 0;
}

}  // extern "C"
