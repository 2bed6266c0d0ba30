// Mock librtlsdr for the USB vendor-driver live-decode test.
//
// Implements the rtlsdr_* surface that nfclab/native/src/usb_drivers.cpp
// binds with dlopen (load_rtl), so a subprocess started with
// LD_LIBRARY_PATH pointing here exercises the REAL vendor driver + task
// chain without hardware.  Behavior:
//   - one device ("Mock RTL2832U")
//   - read_async streams the u8 IQ payload from $NFCLAB_MOCK_RTL_PAYLOAD
//     in chunks via the callback, then returns (-> driver emits in-band
//     EOF), or returns early on cancel_async
//   - every set_* call appends a line to $NFCLAB_MOCK_RTL_LOG so the test
//     can assert the parameter plumbing (sample rate, tuner gain from the
//     software AGC) actually reached the "hardware"
//
// Reference counterpart: RealtekDevice.cpp drives the real librtlsdr with
// this same call sequence.

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

void log_line(const char *fmt, long value)
{
    const char *path = getenv("NFCLAB_MOCK_RTL_LOG");
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

uint32_t rtlsdr_get_device_count() { return 1; }

int rtlsdr_open(void **dev, uint32_t index)
{
    if (index != 0)
        return -1;
    *dev = new MockDev();
    return 0;
}

int rtlsdr_close(void *dev)
{
    delete static_cast<MockDev *>(dev);
    return 0;
}

int rtlsdr_set_sample_rate(void *, uint32_t rate)
{
    log_line("sample_rate %ld", rate);
    return 0;
}

int rtlsdr_set_center_freq(void *, uint32_t freq)
{
    log_line("center_freq %ld", freq);
    return 0;
}

int rtlsdr_set_tuner_gain_mode(void *, int mode)
{
    log_line("gain_mode %ld", mode);
    return 0;
}

int rtlsdr_set_tuner_gain(void *, int tenths_db)
{
    log_line("tuner_gain %ld", tenths_db);
    return 0;
}

int rtlsdr_set_agc_mode(void *, int mode)
{
    log_line("agc_mode %ld", mode);
    return 0;
}

int rtlsdr_set_direct_sampling(void *, int mode)
{
    log_line("direct_sampling %ld", mode);
    return 0;
}

int rtlsdr_reset_buffer(void *) { return 0; }

int rtlsdr_read_async(void *dev,
                      void (*cb)(unsigned char *, uint32_t, void *),
                      void *ctx, uint32_t, uint32_t)
{
    auto *d = static_cast<MockDev *>(dev);
    const char *path = getenv("NFCLAB_MOCK_RTL_PAYLOAD");
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
    const size_t chunk = 2 * 16384;
    for (size_t off = 0; off < payload.size() && !d->cancel.load();
         off += chunk) {
        const size_t n = std::min(chunk, payload.size() - off);
        cb(payload.data() + off, static_cast<uint32_t>(n), ctx);
        // pace a little so the consumer-side queue never overflows
        std::this_thread::sleep_for(std::chrono::milliseconds(1));
    }
    return 0;  // payload exhausted: driver reports in-band EOF
}

int rtlsdr_cancel_async(void *dev)
{
    static_cast<MockDev *>(dev)->cancel.store(true);
    return 0;
}

}  // extern "C"
