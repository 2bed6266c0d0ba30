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
#include <cstdlib>
#include <atomic>
#include <thread>
#include <vector>
#include <cmath>
#include <string>

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <sys/time.h>
#include <unistd.h>

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

// ----------------------------------------------------------------- rtl_tcp
//
// Network client for the rtl_tcp protocol (librtlsdr's TCP server; the
// standard way to stream an RTL-SDR without local USB access).  Wire format:
// on connect the server sends a 12-byte header ("RTL0" magic + tuner type +
// gain count, both u32 BE), then a raw unsigned 8-bit interleaved IQ stream.
// The client sends 5-byte commands (u8 opcode + u32 BE argument):
//   0x01 tune frequency   0x02 sample rate     0x03 gain mode
//   0x04 tuner gain (0.1 dB)   0x08 AGC mode   0x09 direct sampling
// Samples are converted to float IQ as (x - 127.5) / 127.5, matching the
// reference's 8-bit conversion (RealtekDevice.cpp scaling).

struct RtlTcpDevice {
    int fd = -1;
    double sample_rate = 10e6;
    double frequency = 0;
    double gain_mode = 0;
    double gain = 0;
    double agc = 0;
    double direct = 0;
    uint32_t tuner_type = 0;
    uint32_t gain_count = 0;
    std::atomic<bool> running {false};
    std::thread worker;
    int64_t offset = 0;
};

static int rtltcp_send_cmd(RtlTcpDevice *d, uint8_t op, uint32_t arg)
{
    uint8_t buf[5];
    buf[0] = op;
    const uint32_t be = htonl(arg);
    memcpy(buf + 1, &be, 4);
    return send(d->fd, buf, 5, 0) == 5 ? 0 : -1;
}

static int rtltcp_enumerate(char *out, int out_len)
{
    // network device: no local scan; opened explicitly by ident
    if (out_len > 0)
        out[0] = '\0';
    return 0;
}

static void *rtltcp_open(const char *ident)
{
    // ident: rtltcp://host:port
    const char *p = strstr(ident, "://");
    if (!p)
        return nullptr;
    std::string hostport(p + 3);
    const size_t colon = hostport.rfind(':');
    if (colon == std::string::npos)
        return nullptr;
    const std::string host = hostport.substr(0, colon);
    const int port = atoi(hostport.c_str() + colon + 1);

    struct addrinfo hints {};
    hints.ai_family = AF_UNSPEC;
    hints.ai_socktype = SOCK_STREAM;
    struct addrinfo *res = nullptr;
    char portstr[16];
    snprintf(portstr, sizeof portstr, "%d", port);
    if (getaddrinfo(host.c_str(), portstr, &hints, &res) != 0 || !res)
        return nullptr;

    int fd = socket(res->ai_family, res->ai_socktype, res->ai_protocol);
    if (fd < 0 || connect(fd, res->ai_addr, res->ai_addrlen) != 0) {
        if (fd >= 0)
            ::close(fd);
        freeaddrinfo(res);
        return nullptr;
    }
    freeaddrinfo(res);

    struct timeval tv {5, 0};
    setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof tv);

    uint8_t header[12];
    size_t got = 0;
    while (got < sizeof header) {
        const ssize_t r = recv(fd, header + got, sizeof header - got, 0);
        if (r <= 0) {
            ::close(fd);
            return nullptr;
        }
        got += static_cast<size_t>(r);
    }
    if (memcmp(header, "RTL0", 4) != 0) {
        ::close(fd);
        return nullptr;
    }

    auto *d = new RtlTcpDevice();
    d->fd = fd;
    uint32_t v;
    memcpy(&v, header + 4, 4);
    d->tuner_type = ntohl(v);
    memcpy(&v, header + 8, 4);
    d->gain_count = ntohl(v);
    return d;
}

static int rtltcp_set(void *dev, int param, double value)
{
    auto *d = static_cast<RtlTcpDevice *>(dev);
    switch (param) {
        case 100:  // PARAM_SAMPLE_RATE
            d->sample_rate = value;
            return rtltcp_send_cmd(d, 0x02, (uint32_t)value);
        case 1001:  // PARAM_TUNE_FREQUENCY
            d->frequency = value;
            return rtltcp_send_cmd(d, 0x01, (uint32_t)value);
        case 1002:  // PARAM_GAIN_MODE
            d->gain_mode = value;
            return rtltcp_send_cmd(d, 0x03, (uint32_t)value);
        case 1003:  // PARAM_GAIN_VALUE (dB -> tenths of dB)
            d->gain = value;
            return rtltcp_send_cmd(d, 0x04, (uint32_t)(value * 10.0));
        case 1005:  // PARAM_TUNER_AGC
            d->agc = value;
            return rtltcp_send_cmd(d, 0x08, (uint32_t)value);
        case 1007:  // PARAM_DIRECT_SAMPLING
            d->direct = value;
            return rtltcp_send_cmd(d, 0x09, (uint32_t)value);
    }
    return -1;
}

static double rtltcp_get(void *dev, int param)
{
    auto *d = static_cast<RtlTcpDevice *>(dev);
    switch (param) {
        case 100: return d->sample_rate;
        case 1001: return d->frequency;
        case 1002: return d->gain_mode;
        case 1003: return d->gain;
        case 1005: return d->agc;
        case 1007: return d->direct;
        case 2001: return d->tuner_type;   // driver-specific info
        case 2002: return d->gain_count;
    }
    return -1;
}

static int rtltcp_start(void *dev, nfclab_stream_cb cb, void *user)
{
    auto *d = static_cast<RtlTcpDevice *>(dev);
    if (d->running.exchange(true))
        return -1;
    d->worker = std::thread([d, cb, user] {
        std::vector<uint8_t> raw(65537);
        std::vector<float> block(65537);
        size_t held = 0;  // carry an odd byte so IQ pairs stay aligned
        while (d->running.load()) {
            const ssize_t r =
                recv(d->fd, raw.data() + held, raw.size() - held, 0);
            if (r == 0) {
                // orderly server shutdown: signal EOF (zero-length block)
                // instead of busy-spinning on an endless stream of zeros
                cb(block.data(), 0, d->offset, user);
                break;
            }
            if (r < 0) {
                if (d->running.load())
                    continue;  // timeout; poll the running flag
                break;
            }
            size_t avail = held + static_cast<size_t>(r);
            const size_t usable = avail & ~size_t(1);
            for (size_t i = 0; i < usable; i++)
                block[i] = (raw[i] - 127.5f) / 127.5f;
            if (usable) {
                cb(block.data(), static_cast<int64_t>(usable), d->offset,
                   user);
                d->offset += static_cast<int64_t>(usable);
            }
            held = avail - usable;
            if (held)
                raw[0] = raw[usable];
        }
    });
    return 0;
}

static int rtltcp_stop(void *dev)
{
    auto *d = static_cast<RtlTcpDevice *>(dev);
    if (!d->running.exchange(false))
        return -1;
    shutdown(d->fd, SHUT_RDWR);
    if (d->worker.joinable())
        d->worker.join();
    return 0;
}

static void rtltcp_close(void *dev)
{
    auto *d = static_cast<RtlTcpDevice *>(dev);
    if (d->running.load())
        rtltcp_stop(dev);
    if (d->fd >= 0)
        ::close(d->fd);
    delete d;
}

static NfclabSdrDriver g_drivers[] = {
    {"loopback", loopback_enumerate, loopback_open, loopback_set,
     loopback_get, loopback_start, loopback_stop, loopback_close},
    {"rtltcp", rtltcp_enumerate, rtltcp_open, rtltcp_set,
     rtltcp_get, rtltcp_start, rtltcp_stop, rtltcp_close},
    // libusb vendor drivers (airspy/hydrasdr/mirisdr/dslogic) register here
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
