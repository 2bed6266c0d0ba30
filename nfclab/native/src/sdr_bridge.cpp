// Native SDR capture bridge.
//
// The reference's live-capture layer is C++ over libusb vendor libraries
// (AirspyDevice.cpp, HydraDevice.cpp, RealtekDevice.cpp, MiriDevice.cpp,
// DSLogicDevice.cpp).  This bridge exposes the same surface — enumerate /
// open / set-param / start(callback) / stop — as a C ABI for the Python
// runtime.  Vendor drivers register themselves in the driver table; in
// environments without the vendor libraries (such as CI) only the loopback
// test driver is present, exactly mirroring the reference's replay-device
// strategy (RecordDevice stands in for hardware, SURVEY.md §4.5).
//
// Driver entry points mirror hw::radio::RadioDevice (RadioDevice.h:33-78):
// parameter ids match nfclab.hw.device.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <atomic>
#include <thread>
#include <vector>
#include <cmath>

extern "C" {

typedef void (*nfclab_stream_cb)(const float *samples, int64_t count,
                                 int64_t offset, void *user);

struct NfclabSdrDriver {
    const char *type_name;
    int (*enumerate)(char *out, int out_len);
    void *(*open_dev)(const char *ident);
    int (*set_param)(void *dev, int param, double value);
    double (*get_param)(void *dev, int param);
    int (*start)(void *dev, nfclab_stream_cb cb, void *user);
    int (*stop)(void *dev);
    void (*close_dev)(void *dev);
};

// ---------------------------------------------------------------- loopback

// A synthetic 13.56 MHz-envelope generator used for pipeline smoke tests
// (the CI stand-in for real SDR hardware).
struct LoopbackDevice {
    double sample_rate = 10e6;
    double gain = 3;
    std::atomic<bool> running {false};
    std::thread worker;
    int64_t offset = 0;
};

static int loopback_enumerate(char *out, int out_len)
{
    return snprintf(out, out_len, "loopback://test");
}

static void *loopback_open(const char *)
{
    return new LoopbackDevice();
}

static int loopback_set(void *dev, int param, double value)
{
    auto *d = static_cast<LoopbackDevice *>(dev);
    switch (param) {
        case 100: d->sample_rate = value; return 0;  // PARAM_SAMPLE_RATE
        case 1003: d->gain = value; return 0;        // PARAM_GAIN_VALUE
    }
    return -1;
}

static double loopback_get(void *dev, int param)
{
    auto *d = static_cast<LoopbackDevice *>(dev);
    switch (param) {
        case 100: return d->sample_rate;
        case 1003: return d->gain;
    }
    return -1;
}

static int loopback_start(void *dev, nfclab_stream_cb cb, void *user)
{
    auto *d = static_cast<LoopbackDevice *>(dev);
    if (d->running.exchange(true))
        return -1;
    d->worker = std::thread([d, cb, user] {
        std::vector<float> block(65536);
        while (d->running.load()) {
            for (size_t i = 0; i < block.size(); i++) {
                // steady carrier envelope with mild noise
                block[i] = 0.35f + 0.001f * std::sin(0.001f * (d->offset + i));
            }
            cb(block.data(), static_cast<int64_t>(block.size()), d->offset, user);
            d->offset += static_cast<int64_t>(block.size());
        }
    });
    return 0;
}

static int loopback_stop(void *dev)
{
    auto *d = static_cast<LoopbackDevice *>(dev);
    if (!d->running.exchange(false))
        return -1;
    if (d->worker.joinable())
        d->worker.join();
    return 0;
}

static void loopback_close(void *dev)
{
    loopback_stop(dev);
    delete static_cast<LoopbackDevice *>(dev);
}

static NfclabSdrDriver g_drivers[] = {
    {"loopback", loopback_enumerate, loopback_open, loopback_set,
     loopback_get, loopback_start, loopback_stop, loopback_close},
    // vendor drivers (airspy/hydrasdr/rtlsdr/mirisdr/dslogic) register here
    // when their libraries are linked; absent in this build environment
};

// ------------------------------------------------------------------- C ABI

int nfclab_sdr_driver_count()
{
    return static_cast<int>(sizeof(g_drivers) / sizeof(g_drivers[0]));
}

const char *nfclab_sdr_driver_name(int index)
{
    if (index < 0 || index >= nfclab_sdr_driver_count())
        return nullptr;
    return g_drivers[index].type_name;
}

static NfclabSdrDriver *find_driver(const char *ident)
{
    for (auto &drv : g_drivers) {
        const size_t n = strlen(drv.type_name);
        if (strncmp(ident, drv.type_name, n) == 0)
            return &drv;
    }
    return nullptr;
}

int nfclab_sdr_enumerate(char *out, int out_len)
{
    int written = 0;
    for (auto &drv : g_drivers) {
        if (written > 0 && written < out_len - 1)
            out[written++] = '\n';
        written += drv.enumerate(out + written, out_len - written);
    }
    return written;
}

void *nfclab_sdr_open(const char *ident)
{
    NfclabSdrDriver *drv = find_driver(ident);
    return drv ? drv->open_dev(ident) : nullptr;
}

int nfclab_sdr_set_param(const char *ident, void *dev, int param, double value)
{
    NfclabSdrDriver *drv = find_driver(ident);
    return drv ? drv->set_param(dev, param, value) : -1;
}

double nfclab_sdr_get_param(const char *ident, void *dev, int param)
{
    NfclabSdrDriver *drv = find_driver(ident);
    return drv ? drv->get_param(dev, param) : -1;
}

int nfclab_sdr_start(const char *ident, void *dev, nfclab_stream_cb cb, void *user)
{
    NfclabSdrDriver *drv = find_driver(ident);
    return drv ? drv->start(dev, cb, user) : -1;
}

int nfclab_sdr_stop(const char *ident, void *dev)
{
    NfclabSdrDriver *drv = find_driver(ident);
    return drv ? drv->stop(dev) : -1;
}

void nfclab_sdr_close(const char *ident, void *dev)
{
    NfclabSdrDriver *drv = find_driver(ident);
    if (drv)
        drv->close_dev(dev);
}

} // extern "C"
