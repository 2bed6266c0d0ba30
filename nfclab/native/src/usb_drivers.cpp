// Vendor USB capture drivers, bound at runtime with dlopen.
//
// The reference links vendored static builds of the vendor device libraries
// (lib-ext: airspy / hydrasdr / rtlsdr / mirisdr over libusb) and wraps them
// in AirspyDevice.cpp:42-309, HydraDevice.cpp, RealtekDevice.cpp,
// MiriDevice.cpp.  Here the same four vendor surfaces bind dynamically: if
// the system library is present (libairspy.so.0 etc.) the driver enumerates
// and opens real hardware; if not (the CI case) it reports no devices and
// refuses open, and the network clients (rtltcp / spyserver, sdr_bridge.cpp)
// cover remote capture.  Parameter ids are nfclab.hw.device's
// (RadioDevice.h:33-78 scheme); every driver delivers float32 interleaved
// IQ through the common bridge callback.
//
// A minimal libusb-1.0 probe (hw::usb wrapper parity, Usb.cpp:22-616 role)
// is exposed as nfclab_usb_available / nfclab_usb_device_list for device
// discovery and diagnostics.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <atomic>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <dlfcn.h>

#include "bridge.h"
#include "usb_api.h"

namespace {

void *dl(const char *const *names)
{
    for (const char *const *n = names; *n; n++) {
        if (void *h = dlopen(*n, RTLD_NOW | RTLD_LOCAL))
            return h;
    }
    return nullptr;
}

template <typename T>
bool sym(void *h, const char *name, T &fn)
{
    fn = reinterpret_cast<T>(dlsym(h, name));
    return fn != nullptr;
}

}  // namespace

extern "C" {

int nfclab_usb_available()
{
    return nfclab_usb_api().handle != nullptr;
}

// newline-separated "vid:pid bus:addr" lines for every USB device
int nfclab_usb_device_list(char *out, int out_len)
{
    NfclabUsbApi &a = nfclab_usb_api();
    if (!a.handle || out_len <= 0)
        return -1;
    void **list = nullptr;
    const ssize_t n = a.get_device_list(a.ctx, &list);
    int written = 0;
    for (ssize_t i = 0; i < n; i++) {
        // the first 8 bytes of libusb_device_descriptor are fixed-layout:
        // bLength, bDescriptorType, bcdUSB(2), bDeviceClass, bDeviceSubClass,
        // bDeviceProtocol, bMaxPacketSize0; idVendor/idProduct follow at 8/10
        unsigned char desc[64] = {0};
        if (a.get_device_descriptor(list[i], desc) != 0)
            continue;
        const uint16_t vid = desc[8] | (desc[9] << 8);
        const uint16_t pid = desc[10] | (desc[11] << 8);
        written += snprintf(
            out + written, out_len - written, "%s%04x:%04x %u:%u",
            written ? "\n" : "", vid, pid,
            a.get_bus_number(list[i]), a.get_device_address(list[i]));
        if (written >= out_len - 1)
            break;
    }
    if (list)
        a.free_device_list(list, 1);
    return written;
}

}  // extern "C"

namespace {

// ------------------------------------------------- airspy / hydrasdr family
//
// HydraSDR RFOne ships a fork of the Airspy library with identically-shaped
// entry points under the hydrasdr_ prefix (the reference's HydraDevice.cpp
// is the same wrapper as AirspyDevice.cpp), so one template serves both.

struct AspyTransfer {       // airspy_transfer / hydrasdr_transfer layout
    void *device;
    void *ctx;
    void *samples;
    int sample_count;
    uint64_t dropped_samples;
    int sample_type;
};

struct AspyApi {
    void *handle = nullptr;
    int (*list_devices)(uint64_t *, int) = nullptr;
    int (*open_sn)(void **, uint64_t) = nullptr;
    int (*open_)(void **) = nullptr;
    int (*close_)(void *) = nullptr;
    int (*set_samplerate)(void *, uint32_t) = nullptr;
    int (*set_freq)(void *, uint32_t) = nullptr;
    int (*set_sample_type)(void *, int) = nullptr;
    int (*set_linearity_gain)(void *, uint8_t) = nullptr;
    int (*set_sensitivity_gain)(void *, uint8_t) = nullptr;
    int (*set_rf_bias)(void *, uint8_t) = nullptr;
    int (*start_rx)(void *, int (*)(AspyTransfer *), void *) = nullptr;
    int (*stop_rx)(void *) = nullptr;
};

AspyApi load_aspy(const char *const *libnames, const char *prefix)
{
    AspyApi a;
    void *h = dl(libnames);
    if (!h)
        return a;
    std::string p(prefix);
    bool ok = sym(h, (p + "_list_devices").c_str(), a.list_devices)
        && sym(h, (p + "_open_sn").c_str(), a.open_sn)
        && sym(h, (p + "_open").c_str(), a.open_)
        && sym(h, (p + "_close").c_str(), a.close_)
        && sym(h, (p + "_set_samplerate").c_str(), a.set_samplerate)
        && sym(h, (p + "_set_freq").c_str(), a.set_freq)
        && sym(h, (p + "_set_sample_type").c_str(), a.set_sample_type)
        && sym(h, (p + "_set_linearity_gain").c_str(), a.set_linearity_gain)
        && sym(h, (p + "_set_sensitivity_gain").c_str(),
               a.set_sensitivity_gain)
        && sym(h, (p + "_start_rx").c_str(), a.start_rx)
        && sym(h, (p + "_stop_rx").c_str(), a.stop_rx);
    sym(h, (p + "_set_rf_bias").c_str(), a.set_rf_bias);  // optional
    if (ok)
        a.handle = h;
    return a;
}

AspyApi &airspy_api()
{
    static AspyApi api = [] {
        static const char *names[] = {"libairspy.so.0", "libairspy.so",
                                      nullptr};
        return load_aspy(names, "airspy");
    }();
    return api;
}

AspyApi &hydrasdr_api()
{
    static AspyApi api = [] {
        static const char *names[] = {"libhydrasdr.so.0", "libhydrasdr.so",
                                      nullptr};
        return load_aspy(names, "hydrasdr");
    }();
    return api;
}

struct AspyDevice {
    AspyApi *api;
    void *dev = nullptr;
    double sample_rate = 10e6;
    double frequency = 40.68e6;
    double gain_mode = 0;  // 0 linearity / 1 sensitivity (AirspyDevice.cpp)
    double gain = 3;
    double bias_tee = 0;
    nfclab_stream_cb cb = nullptr;
    void *user = nullptr;
    std::atomic<int64_t> offset {0};
};

int aspy_rx(AspyTransfer *t)
{
    auto *d = static_cast<AspyDevice *>(t->ctx);
    // FLOAT32_IQ: sample_count IQ pairs, interleaved floats
    const int64_t n = static_cast<int64_t>(t->sample_count) * 2;
    d->cb(static_cast<const float *>(t->samples), n,
          d->offset.fetch_add(n), d->user);
    return 0;  // continue streaming
}

int aspy_enumerate(AspyApi &api, const char *scheme, char *out, int out_len)
{
    if (!api.handle || out_len <= 0) {
        if (out_len > 0)
            out[0] = '\0';
        return 0;
    }
    uint64_t serials[8] = {0};
    const int n = api.list_devices(serials, 8);
    int written = 0;
    for (int i = 0; i < n && i < 8; i++)
        written += snprintf(out + written, out_len - written,
                            "%s%s://%016llx", written ? "\n" : "", scheme,
                            static_cast<unsigned long long>(serials[i]));
    return written;
}

void *aspy_open(AspyApi &api, const char *ident)
{
    if (!api.handle)
        return nullptr;
    const char *p = strstr(ident, "://");
    uint64_t serial = 0;
    if (p && p[3])
        serial = strtoull(p + 3, nullptr, 16);
    void *dev = nullptr;
    const int rc = serial ? api.open_sn(&dev, serial) : api.open_(&dev);
    if (rc != 0 || !dev)
        return nullptr;
    api.set_sample_type(dev, 0);  // FLOAT32_IQ
    auto *d = new AspyDevice();
    d->api = &api;
    d->dev = dev;
    return d;
}

int aspy_set(void *vd, int param, double value)
{
    auto *d = static_cast<AspyDevice *>(vd);
    AspyApi &a = *d->api;
    switch (param) {
        case 100:  // PARAM_SAMPLE_RATE
            d->sample_rate = value;
            return a.set_samplerate(d->dev, (uint32_t)value);
        case 1001:  // PARAM_TUNE_FREQUENCY
            d->frequency = value;
            return a.set_freq(d->dev, (uint32_t)value);
        case 1002:  // PARAM_GAIN_MODE (0 linearity / 1 sensitivity)
            d->gain_mode = value;
            return 0;
        case 1003:  // PARAM_GAIN_VALUE
            d->gain = value;
            return d->gain_mode < 1
                ? a.set_linearity_gain(d->dev, (uint8_t)value)
                : a.set_sensitivity_gain(d->dev, (uint8_t)value);
        case 1006:  // PARAM_BIAS_TEE
            d->bias_tee = value;
            return a.set_rf_bias ? a.set_rf_bias(d->dev, (uint8_t)value) : -1;
    }
    return -1;
}

double aspy_get(void *vd, int param)
{
    auto *d = static_cast<AspyDevice *>(vd);
    switch (param) {
        case 100: return d->sample_rate;
        case 102: return 1;  // PARAM_SAMPLE_TYPE: RADIO_IQ (interleaved)
        case 1001: return d->frequency;
        case 1002: return d->gain_mode;
        case 1003: return d->gain;
        case 1006: return d->bias_tee;
    }
    return -1;
}

int aspy_start(void *vd, nfclab_stream_cb cb, void *user)
{
    auto *d = static_cast<AspyDevice *>(vd);
    d->cb = cb;
    d->user = user;
    return d->api->start_rx(d->dev, aspy_rx, d);
}

int aspy_stop(void *vd)
{
    auto *d = static_cast<AspyDevice *>(vd);
    return d->api->stop_rx(d->dev);
}

void aspy_close(void *vd)
{
    auto *d = static_cast<AspyDevice *>(vd);
    if (d->dev)
        d->api->close_(d->dev);
    delete d;
}

int airspy_enum_tr(char *out, int len)
{ return aspy_enumerate(airspy_api(), "airspy", out, len); }
void *airspy_open_tr(const char *ident)
{ return aspy_open(airspy_api(), ident); }
int hydra_enum_tr(char *out, int len)
{ return aspy_enumerate(hydrasdr_api(), "hydrasdr", out, len); }
void *hydra_open_tr(const char *ident)
{ return aspy_open(hydrasdr_api(), ident); }

// -------------------------------------------------- rtlsdr / mirisdr family
//
// Both expose the same index-open + read_async(u8 buffer) surface; the
// reference converts 8-bit IQ to float exactly as the rtl_tcp client does
// (RealtekDevice.cpp scaling, (x - 127.5) / 127.5).

struct RtlApi {
    void *handle = nullptr;
    uint32_t (*get_device_count)() = nullptr;
    int (*open_)(void **, uint32_t) = nullptr;
    int (*close_)(void *) = nullptr;
    int (*set_sample_rate)(void *, uint32_t) = nullptr;
    int (*set_center_freq)(void *, uint32_t) = nullptr;
    int (*set_tuner_gain_mode)(void *, int) = nullptr;
    int (*set_tuner_gain)(void *, int) = nullptr;
    int (*set_agc_mode)(void *, int) = nullptr;
    int (*set_direct_sampling)(void *, int) = nullptr;
    int (*reset_buffer)(void *) = nullptr;
    int (*read_async)(void *, void (*)(unsigned char *, uint32_t, void *),
                      void *, uint32_t, uint32_t) = nullptr;
    int (*cancel_async)(void *) = nullptr;
    // miri-only bring-up surface (MiriDevice.cpp:149-165); absent from
    // librtlsdr, loaded opportunistically
    int (*set_hw_flavour)(void *, int) = nullptr;
    int (*set_bandwidth)(void *, uint32_t) = nullptr;
    int (*set_sample_format)(void *, char *) = nullptr;
    int (*set_transfer)(void *, char *) = nullptr;
    int (*set_if_freq)(void *, uint32_t) = nullptr;
};

RtlApi load_rtl(const char *const *libnames, const char *prefix)
{
    RtlApi a;
    void *h = dl(libnames);
    if (!h)
        return a;
    std::string p(prefix);
    bool ok = sym(h, (p + "_get_device_count").c_str(), a.get_device_count)
        && sym(h, (p + "_open").c_str(), a.open_)
        && sym(h, (p + "_close").c_str(), a.close_)
        && sym(h, (p + "_set_sample_rate").c_str(), a.set_sample_rate)
        && sym(h, (p + "_set_center_freq").c_str(), a.set_center_freq)
        && sym(h, (p + "_set_tuner_gain_mode").c_str(), a.set_tuner_gain_mode)
        && sym(h, (p + "_set_tuner_gain").c_str(), a.set_tuner_gain)
        && sym(h, (p + "_reset_buffer").c_str(), a.reset_buffer)
        && sym(h, (p + "_read_async").c_str(), a.read_async)
        && sym(h, (p + "_cancel_async").c_str(), a.cancel_async);
    sym(h, (p + "_set_agc_mode").c_str(), a.set_agc_mode);            // opt
    sym(h, (p + "_set_direct_sampling").c_str(), a.set_direct_sampling);
    sym(h, (p + "_set_hw_flavour").c_str(), a.set_hw_flavour);        // miri
    sym(h, (p + "_set_bandwidth").c_str(), a.set_bandwidth);
    sym(h, (p + "_set_sample_format").c_str(), a.set_sample_format);
    sym(h, (p + "_set_transfer").c_str(), a.set_transfer);
    sym(h, (p + "_set_if_freq").c_str(), a.set_if_freq);
    if (ok)
        a.handle = h;
    return a;
}

RtlApi &rtlsdr_api()
{
    static RtlApi api = [] {
        static const char *names[] = {"librtlsdr.so.0", "librtlsdr.so.2",
                                      "librtlsdr.so", nullptr};
        return load_rtl(names, "rtlsdr");
    }();
    return api;
}

RtlApi &mirisdr_api()
{
    static RtlApi api = [] {
        static const char *names[] = {"libmirisdr.so.0", "libmirisdr.so.4",
                                      "libmirisdr.so", nullptr};
        return load_rtl(names, "mirisdr");
    }();
    return api;
}

struct RtlDevice {
    RtlApi *api;
    void *dev = nullptr;
    double sample_rate = 3.2e6;
    double frequency = 27.12e6;
    double gain_mode = 0;
    double gain = 0;
    double agc = 0;
    double direct = 0;
    bool s16 = false;         // miri 384_S16 stream: 16-bit I/Q values
    bool gain_tenths = true;  // librtlsdr takes tenths of dB, miri plain dB
    nfclab_stream_cb cb = nullptr;
    void *user = nullptr;
    std::atomic<bool> running {false};
    std::thread worker;
    int64_t offset = 0;
    std::vector<float> block;
};

void rtl_rx(unsigned char *buf, uint32_t len, void *ctx)
{
    auto *d = static_cast<RtlDevice *>(ctx);
    uint32_t n = len;
    if (d->s16) {
        // miri 384_S16: interleaved 16-bit I/Q, scaled -32768..32767 -> ±1
        // (MiriDevice.cpp process_transfer semantics; len is in bytes)
        n = len / 2;
        if (d->block.size() < n)
            d->block.resize(n);
        const int16_t *data = reinterpret_cast<const int16_t *>(buf);
        for (uint32_t i = 0; i < n; i++)
            d->block[i] = data[i] / 32768.0f;
    } else {
        if (d->block.size() < n)
            d->block.resize(n);
        for (uint32_t i = 0; i < n; i++)
            d->block[i] = (buf[i] - 127.5f) / 127.5f;
    }
    d->cb(d->block.data(), static_cast<int64_t>(n), d->offset, d->user);
    d->offset += n;
}

int rtl_enumerate(RtlApi &api, const char *scheme, char *out, int out_len)
{
    if (!api.handle || out_len <= 0) {
        if (out_len > 0)
            out[0] = '\0';
        return 0;
    }
    const uint32_t n = api.get_device_count();
    int written = 0;
    for (uint32_t i = 0; i < n; i++)
        written += snprintf(out + written, out_len - written, "%s%s://%u",
                            written ? "\n" : "", scheme, i);
    return written;
}

void *rtl_open(RtlApi &api, const char *ident)
{
    if (!api.handle)
        return nullptr;
    const char *p = strstr(ident, "://");
    const uint32_t index = p && p[3] ? (uint32_t)atoi(p + 3) : 0;
    void *dev = nullptr;
    if (api.open_(&dev, index) != 0 || !dev)
        return nullptr;
    auto *d = new RtlDevice();
    d->api = &api;
    d->dev = dev;
    return d;
}

int rtl_set(void *vd, int param, double value)
{
    auto *d = static_cast<RtlDevice *>(vd);
    RtlApi &a = *d->api;
    switch (param) {
        case 100:
            d->sample_rate = value;
            return a.set_sample_rate(d->dev, (uint32_t)value);
        case 1001:
            d->frequency = value;
            return a.set_center_freq(d->dev, (uint32_t)value);
        case 1002:
            d->gain_mode = value;
            return a.set_tuner_gain_mode(d->dev, (int)value);
        case 1003:  // dB -> tenths of dB (librtlsdr convention; miri in dB)
            d->gain = value;
            return a.set_tuner_gain(
                d->dev, (int)(value * (d->gain_tenths ? 10.0 : 1.0)));
        case 1005:
            d->agc = value;
            return a.set_agc_mode ? a.set_agc_mode(d->dev, (int)value) : -1;
        case 1007:
            d->direct = value;
            return a.set_direct_sampling
                ? a.set_direct_sampling(d->dev, (int)value) : -1;
    }
    return -1;
}

double rtl_get(void *vd, int param)
{
    auto *d = static_cast<RtlDevice *>(vd);
    switch (param) {
        case 100: return d->sample_rate;
        case 102: return 1;  // PARAM_SAMPLE_TYPE: RADIO_IQ (interleaved)
        case 1001: return d->frequency;
        case 1002: return d->gain_mode;
        case 1003: return d->gain;
        case 1005: return d->agc;
        case 1007: return d->direct;
    }
    return -1;
}

int rtl_start(void *vd, nfclab_stream_cb cb, void *user)
{
    auto *d = static_cast<RtlDevice *>(vd);
    if (d->running.exchange(true))
        return -1;
    d->cb = cb;
    d->user = user;
    d->api->reset_buffer(d->dev);
    d->worker = std::thread([d] {
        // blocks until cancel_async; default buffering (0, 0)
        d->api->read_async(d->dev, rtl_rx, d, 0, 0);
        if (d->running.load() && d->cb)
            d->cb(d->block.data(), 0, d->offset, d->user);  // EOF on exit
    });
    return 0;
}

int rtl_stop(void *vd)
{
    auto *d = static_cast<RtlDevice *>(vd);
    if (!d->running.exchange(false))
        return -1;
    d->api->cancel_async(d->dev);
    if (d->worker.joinable())
        d->worker.join();
    return 0;
}

void rtl_close(void *vd)
{
    auto *d = static_cast<RtlDevice *>(vd);
    if (d->running.load())
        rtl_stop(vd);
    if (d->dev)
        d->api->close_(d->dev);
    delete d;
}

int rtlsdr_enum_tr(char *out, int len)
{ return rtl_enumerate(rtlsdr_api(), "rtlsdr", out, len); }
void *rtlsdr_open_tr(const char *ident)
{ return rtl_open(rtlsdr_api(), ident); }
int miri_enum_tr(char *out, int len)
{ return rtl_enumerate(mirisdr_api(), "mirisdr", out, len); }
void *miri_open_tr(const char *ident)
{
    // MSi2500 bring-up (MiriDevice.cpp:149-165): hw flavour, 8 MHz
    // bandwidth, 10+2-bit "384_S16" sample format, BULK transfers, zero-IF
    auto *d = static_cast<RtlDevice *>(rtl_open(mirisdr_api(), ident));
    if (!d)
        return nullptr;
    RtlApi &a = *d->api;
    d->s16 = true;
    d->gain_tenths = false;
    if (a.set_hw_flavour)
        a.set_hw_flavour(d->dev, 0);  // MIRISDR_HW_DEFAULT
    if (a.set_bandwidth)
        a.set_bandwidth(d->dev, 8000000);
    if (a.set_sample_format)
        a.set_sample_format(d->dev, const_cast<char *>("384_S16"));
    if (a.set_transfer)
        a.set_transfer(d->dev, const_cast<char *>("BULK"));
    if (a.set_if_freq)
        a.set_if_freq(d->dev, 0);
    return d;
}

}  // namespace

void nfclab_register_usb_drivers(std::vector<NfclabSdrDriver> &out)
{
    out.push_back({"airspy", airspy_enum_tr, airspy_open_tr, aspy_set,
                   aspy_get, aspy_start, aspy_stop, aspy_close});
    out.push_back({"hydrasdr", hydra_enum_tr, hydra_open_tr, aspy_set,
                   aspy_get, aspy_start, aspy_stop, aspy_close});
    out.push_back({"rtlsdr", rtlsdr_enum_tr, rtlsdr_open_tr, rtl_set,
                   rtl_get, rtl_start, rtl_stop, rtl_close});
    out.push_back({"mirisdr", miri_enum_tr, miri_open_tr, rtl_set,
                   rtl_get, rtl_start, rtl_stop, rtl_close});
}
