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

#include "bridge.h"

extern "C" {

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
        case 102: return 2;  // PARAM_SAMPLE_TYPE: RADIO_SAMPLES (magnitude)
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
        case 102: return 1;  // PARAM_SAMPLE_TYPE: RADIO_IQ (interleaved)
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

// --------------------------------------------------------------- spyserver
//
// Network client for Airspy's SpyServer protocol (the standard remote
// transport for AirSpy / AirSpy HF+ / RTL-SDR devices behind an Airspy
// SpyServer instance; the reference's AirspyDevice covers the same hardware
// locally over USB, AirspyDevice.cpp:42-309).  Wire format (little-endian
// throughout; the protocol is defined by the Windows-native SDR# client):
//
//   client -> server: CommandHeader { u32 command; u32 body_size; } + body
//     CMD_HELLO (0): u32 protocol_version + client-name bytes
//     CMD_SET_SETTING (2): u32 setting + u32 value
//   server -> client: MessageHeader { u32 protocol_id; u32 message_type;
//     u32 stream_type; u32 sequence; u32 body_size; } + body
//     MSG_DEVICE_INFO (0): 12 x u32 (device type/serial/max rate/...)
//     MSG_CLIENT_SYNC (1): 9 x u32 (can_control/gain/frequencies)
//     MSG_UINT8_IQ (100) / MSG_INT16_IQ (101) / MSG_FLOAT_IQ (103):
//       interleaved IQ payload in that sample format
//
// The client requests INT16 IQ (SpyServer's full-precision network format
// for non-premium streams); conversions to float match the reference's
// integer scaling (RecordDevice.cpp:282-299 family):
//   u8: (x - 128) / 128, i16: x / 32768, f32: as-is.
// Sample rate is selected via the decimation-stage setting:
// rate = max_rate >> stage.

enum {
    SPY_CMD_HELLO = 0,
    SPY_CMD_SET_SETTING = 2,
    SPY_SETTING_STREAMING_MODE = 0,
    SPY_SETTING_STREAMING_ENABLED = 1,
    SPY_SETTING_GAIN = 2,
    SPY_SETTING_IQ_FORMAT = 100,
    SPY_SETTING_IQ_FREQUENCY = 101,
    SPY_SETTING_IQ_DECIMATION = 102,
    SPY_SETTING_IQ_DIGITAL_GAIN = 103,
    SPY_STREAM_MODE_IQ_ONLY = 1,
    SPY_FORMAT_UINT8 = 1,
    SPY_FORMAT_INT16 = 2,
    SPY_FORMAT_FLOAT = 4,
    SPY_MSG_DEVICE_INFO = 0,
    SPY_MSG_CLIENT_SYNC = 1,
    SPY_MSG_UINT8_IQ = 100,
    SPY_MSG_INT16_IQ = 101,
    SPY_MSG_FLOAT_IQ = 103,
};

static const uint32_t SPY_PROTOCOL_VERSION =
    (2u << 24) | (0u << 16) | 1700u;  // SpyServer protocol 2.0.1700
static const uint32_t SPY_MAX_BODY = 1u << 20;

struct SpyServerDevice {
    int fd = -1;
    // DeviceInfo
    uint32_t device_type = 0;
    uint32_t device_serial = 0;
    uint32_t max_sample_rate = 0;
    uint32_t decimation_stages = 0;
    uint32_t max_gain_index = 0;
    uint32_t min_iq_decimation = 0;
    // ClientSync
    uint32_t can_control = 0;
    uint32_t initial_gain = 0;
    // settings
    double sample_rate = 0;
    double frequency = 0;
    double gain = 0;
    uint32_t decimation = 0;
    std::atomic<bool> running {false};
    std::thread worker;
    int64_t offset = 0;
};

static int net_connect(const char *ident)
{
    // ident: <scheme>://host:port
    const char *p = strstr(ident, "://");
    if (!p)
        return -1;
    std::string hostport(p + 3);
    const size_t colon = hostport.rfind(':');
    if (colon == std::string::npos)
        return -1;
    const std::string host = hostport.substr(0, colon);
    const int port = atoi(hostport.c_str() + colon + 1);

    struct addrinfo hints {};
    hints.ai_family = AF_UNSPEC;
    hints.ai_socktype = SOCK_STREAM;
    struct addrinfo *res = nullptr;
    char portstr[16];
    snprintf(portstr, sizeof portstr, "%d", port);
    if (getaddrinfo(host.c_str(), portstr, &hints, &res) != 0 || !res)
        return -1;
    int fd = socket(res->ai_family, res->ai_socktype, res->ai_protocol);
    if (fd < 0 || connect(fd, res->ai_addr, res->ai_addrlen) != 0) {
        if (fd >= 0)
            ::close(fd);
        freeaddrinfo(res);
        return -1;
    }
    freeaddrinfo(res);
    struct timeval tv {5, 0};
    setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof tv);
    return fd;
}

static bool recv_exact(int fd, void *buf, size_t len,
                       const std::atomic<bool> *alive = nullptr)
{
    uint8_t *p = static_cast<uint8_t *>(buf);
    size_t got = 0;
    while (got < len) {
        const ssize_t r = recv(fd, p + got, len - got, 0);
        if (r == 0)
            return false;
        if (r < 0) {
            if (alive && alive->load())
                continue;  // timeout while streaming: poll the flag
            return false;
        }
        got += static_cast<size_t>(r);
    }
    return true;
}

static int spy_set_setting(SpyServerDevice *d, uint32_t setting, uint32_t value)
{
    uint32_t pkt[4] = {SPY_CMD_SET_SETTING, 8, setting, value};
    return send(d->fd, pkt, sizeof pkt, 0) == (ssize_t)sizeof pkt ? 0 : -1;
}

static int spyserver_enumerate(char *out, int out_len)
{
    if (out_len > 0)
        out[0] = '\0';  // network device: opened explicitly by ident
    return 0;
}

static void *spyserver_open(const char *ident)
{
    const int fd = net_connect(ident);
    if (fd < 0)
        return nullptr;

    // HELLO: protocol version + client name
    static const char name[] = "nfclab";
    uint32_t hdr[3] = {SPY_CMD_HELLO,
                       (uint32_t)(4 + sizeof name - 1),
                       SPY_PROTOCOL_VERSION};
    if (send(fd, hdr, sizeof hdr, 0) != (ssize_t)sizeof hdr ||
        send(fd, name, sizeof name - 1, 0) != (ssize_t)(sizeof name - 1)) {
        ::close(fd);
        return nullptr;
    }

    auto *d = new SpyServerDevice();
    d->fd = fd;

    // the server answers with DEVICE_INFO and CLIENT_SYNC (order not
    // guaranteed); collect both before returning
    bool have_info = false, have_sync = false;
    std::vector<uint8_t> body;
    for (int i = 0; i < 16 && !(have_info && have_sync); i++) {
        uint32_t mh[5];
        if (!recv_exact(fd, mh, sizeof mh))
            break;
        const uint32_t mtype = mh[1] & 0xFFFF, blen = mh[4];
        if (blen > SPY_MAX_BODY)
            break;
        body.resize(blen);
        if (blen && !recv_exact(fd, body.data(), blen))
            break;
        if (mtype == SPY_MSG_DEVICE_INFO && blen >= 48) {
            const uint32_t *v = reinterpret_cast<const uint32_t *>(body.data());
            d->device_type = v[0];
            d->device_serial = v[1];
            d->max_sample_rate = v[2];
            d->decimation_stages = v[4];
            d->max_gain_index = v[6];
            d->min_iq_decimation = v[10];
            have_info = true;
        } else if (mtype == SPY_MSG_CLIENT_SYNC && blen >= 8) {
            const uint32_t *v = reinterpret_cast<const uint32_t *>(body.data());
            d->can_control = v[0];
            d->initial_gain = v[1];
            have_sync = true;
        }
        // IQ/FFT messages can't arrive yet (streaming is off); skip others
    }
    if (!have_info) {
        ::close(fd);
        delete d;
        return nullptr;
    }
    d->sample_rate = d->max_sample_rate;
    return d;
}

static int spyserver_set(void *dev, int param, double value)
{
    auto *d = static_cast<SpyServerDevice *>(dev);
    switch (param) {
        case 100: {  // PARAM_SAMPLE_RATE -> decimation stage
            if (value <= 0 || d->max_sample_rate == 0)
                return -1;
            uint32_t stage = 0;
            while ((d->max_sample_rate >> stage) > value &&
                   stage + 1 < (d->decimation_stages ? d->decimation_stages : 32))
                stage++;
            if (stage < d->min_iq_decimation)
                stage = d->min_iq_decimation;
            d->decimation = stage;
            d->sample_rate = (double)(d->max_sample_rate >> stage);
            return spy_set_setting(d, SPY_SETTING_IQ_DECIMATION, stage);
        }
        case 1001:  // PARAM_TUNE_FREQUENCY
            d->frequency = value;
            return spy_set_setting(d, SPY_SETTING_IQ_FREQUENCY,
                                   (uint32_t)value);
        case 1003:  // PARAM_GAIN_VALUE (gain index)
            d->gain = value;
            return spy_set_setting(d, SPY_SETTING_GAIN, (uint32_t)value);
        case 1004:  // PARAM_DIGITAL_GAIN (IQ digital gain)
            return spy_set_setting(d, SPY_SETTING_IQ_DIGITAL_GAIN,
                                   (uint32_t)value);
    }
    return -1;
}

static double spyserver_get(void *dev, int param)
{
    auto *d = static_cast<SpyServerDevice *>(dev);
    switch (param) {
        case 100: return d->sample_rate;
        case 102: return 1;  // PARAM_SAMPLE_TYPE: RADIO_IQ (interleaved)
        case 1001: return d->frequency;
        case 1003: return d->gain;
        case 2001: return d->device_type;      // driver-specific info
        case 2002: return d->device_serial;
        case 2003: return d->max_sample_rate;
        case 2004: return d->can_control;
        case 2005: return d->decimation;
    }
    return -1;
}

static int spyserver_start(void *dev, nfclab_stream_cb cb, void *user)
{
    auto *d = static_cast<SpyServerDevice *>(dev);
    if (d->running.exchange(true))
        return -1;
    if (spy_set_setting(d, SPY_SETTING_IQ_FORMAT, SPY_FORMAT_INT16) != 0 ||
        spy_set_setting(d, SPY_SETTING_STREAMING_MODE,
                        SPY_STREAM_MODE_IQ_ONLY) != 0 ||
        spy_set_setting(d, SPY_SETTING_STREAMING_ENABLED, 1) != 0) {
        d->running.store(false);
        return -1;
    }
    d->worker = std::thread([d, cb, user] {
        std::vector<uint8_t> body;
        std::vector<float> block;
        while (d->running.load()) {
            uint32_t mh[5];
            if (!recv_exact(d->fd, mh, sizeof mh, &d->running)) {
                if (d->running.load())
                    cb(nullptr, 0, d->offset, user);  // in-band EOF
                break;
            }
            const uint32_t mtype = mh[1] & 0xFFFF, blen = mh[4];
            if (blen > SPY_MAX_BODY) {
                if (d->running.load())
                    cb(nullptr, 0, d->offset, user);  // protocol violation
                break;
            }
            body.resize(blen);
            if (blen && !recv_exact(d->fd, body.data(), blen, &d->running)) {
                if (d->running.load())
                    cb(nullptr, 0, d->offset, user);
                break;
            }
            size_t n = 0;
            if (mtype == SPY_MSG_INT16_IQ) {
                n = blen / 2;
                block.resize(n);
                const int16_t *s = reinterpret_cast<const int16_t *>(body.data());
                for (size_t i = 0; i < n; i++)
                    block[i] = s[i] / 32768.0f;
            } else if (mtype == SPY_MSG_UINT8_IQ) {
                n = blen;
                block.resize(n);
                for (size_t i = 0; i < n; i++)
                    block[i] = (body[i] - 128.0f) / 128.0f;
            } else if (mtype == SPY_MSG_FLOAT_IQ) {
                n = blen / 4;
                block.resize(n);
                memcpy(block.data(), body.data(), n * 4);
            } else {
                continue;  // CLIENT_SYNC updates etc.
            }
            if (n) {
                cb(block.data(), (int64_t)n, d->offset, user);
                d->offset += (int64_t)n;
            }
        }
    });
    return 0;
}

static int spyserver_stop(void *dev)
{
    auto *d = static_cast<SpyServerDevice *>(dev);
    if (!d->running.exchange(false))
        return -1;
    spy_set_setting(d, SPY_SETTING_STREAMING_ENABLED, 0);
    shutdown(d->fd, SHUT_RDWR);
    if (d->worker.joinable())
        d->worker.join();
    return 0;
}

static void spyserver_close(void *dev)
{
    auto *d = static_cast<SpyServerDevice *>(dev);
    if (d->running.load())
        spyserver_stop(dev);
    if (d->fd >= 0)
        ::close(d->fd);
    delete d;
}

// ------------------------------------------------------------ logic capture
//
// Live sources for the ISO7816 decoder.  The reference captures N-channel
// logic over libusb from DreamSourceLab DSLogic devices in stream mode
// (DSLogicDevice.cpp:247-412: FX2 firmware check + FPGA bitstream upload,
// then continuous bulk transfers of packed probe bits).  This build
// environment has no USB hardware, so — exactly like the radio side's
// rtl_tcp/SpyServer network clients — the capture transport is a network
// stream shaped like DSLogic's stream mode; a libusb DSLogic/Sipeed backend
// slots into the same driver entry when its library is present.
//
// logictcp wire format: on connect the server sends a 12-byte header
// ("LGC0" magic + u8 channel count + 3 reserved bytes + u32 BE sample
// rate), then a raw stream of packed samples, one byte per sample, bit i =
// probe i (the 8-probe byte packing DSLogic stream mode uses).  The driver
// expands each sample to `channels` interleaved floats (0.0 / 1.0).

struct LogicTcpDevice {
    int fd = -1;
    double sample_rate = 10e6;
    int channels = 4;
    double voltage_threshold = 1.4;
    std::atomic<bool> running {false};
    std::thread worker;
    int64_t offset = 0;  // in samples
};

static int logictcp_enumerate(char *out, int out_len)
{
    if (out_len > 0)
        out[0] = '\0';  // network device: opened explicitly by ident
    return 0;
}

static int net_connect_hostport(const char *ident)
{
    // ident: <scheme>://host:port -> connected TCP socket or -1
    const char *p = strstr(ident, "://");
    if (!p)
        return -1;
    std::string hostport(p + 3);
    const size_t colon = hostport.rfind(':');
    if (colon == std::string::npos)
        return -1;
    const std::string host = hostport.substr(0, colon);
    const int port = atoi(hostport.c_str() + colon + 1);

    struct addrinfo hints {};
    hints.ai_family = AF_UNSPEC;
    hints.ai_socktype = SOCK_STREAM;
    struct addrinfo *res = nullptr;
    char portstr[16];
    snprintf(portstr, sizeof portstr, "%d", port);
    if (getaddrinfo(host.c_str(), portstr, &hints, &res) != 0 || !res)
        return -1;
    int fd = socket(res->ai_family, res->ai_socktype, res->ai_protocol);
    if (fd < 0 || connect(fd, res->ai_addr, res->ai_addrlen) != 0) {
        if (fd >= 0)
            ::close(fd);
        freeaddrinfo(res);
        return -1;
    }
    freeaddrinfo(res);
    struct timeval tv {5, 0};
    setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof tv);
    return fd;
}

static void *logictcp_open(const char *ident)
{
    const int fd = net_connect_hostport(ident);
    if (fd < 0)
        return nullptr;
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
    if (memcmp(header, "LGC0", 4) != 0 || header[4] < 1 || header[4] > 8) {
        ::close(fd);
        return nullptr;
    }
    auto *d = new LogicTcpDevice();
    d->fd = fd;
    d->channels = header[4];
    uint32_t v;
    memcpy(&v, header + 8, 4);
    d->sample_rate = ntohl(v);
    return d;
}

static int logictcp_set(void *dev, int param, double value)
{
    auto *d = static_cast<LogicTcpDevice *>(dev);
    switch (param) {
        case 100: d->sample_rate = value; return 0;   // PARAM_SAMPLE_RATE
        case 1104: d->voltage_threshold = value; return 0;
    }
    return -1;
}

static double logictcp_get(void *dev, int param)
{
    auto *d = static_cast<LogicTcpDevice *>(dev);
    switch (param) {
        case 100: return d->sample_rate;
        case 102: return 4;  // PARAM_SAMPLE_TYPE: LOGIC_SAMPLES
        case 120: return d->channels;  // PARAM_CHANNEL_COUNT
        case 1104: return d->voltage_threshold;
    }
    return -1;
}

static int logictcp_start(void *dev, nfclab_stream_cb cb, void *user)
{
    auto *d = static_cast<LogicTcpDevice *>(dev);
    if (d->running.exchange(true))
        return -1;
    d->worker = std::thread([d, cb, user] {
        const int ch = d->channels;
        std::vector<uint8_t> raw(16384);
        std::vector<float> block(raw.size() * ch);
        while (d->running.load()) {
            const ssize_t r = recv(d->fd, raw.data(), raw.size(), 0);
            if (r == 0) {
                cb(block.data(), 0, d->offset, user);  // orderly EOF
                break;
            }
            if (r < 0) {
                if (d->running.load())
                    continue;  // timeout; poll the running flag
                break;
            }
            for (ssize_t i = 0; i < r; i++)
                for (int c = 0; c < ch; c++)
                    block[i * ch + c] = (raw[i] >> c) & 1 ? 1.0f : 0.0f;
            cb(block.data(), static_cast<int64_t>(r) * ch, d->offset, user);
            d->offset += static_cast<int64_t>(r);
        }
    });
    return 0;
}

static int logictcp_stop(void *dev)
{
    auto *d = static_cast<LogicTcpDevice *>(dev);
    if (!d->running.exchange(false))
        return -1;
    shutdown(d->fd, SHUT_RDWR);
    if (d->worker.joinable())
        d->worker.join();
    return 0;
}

static void logictcp_close(void *dev)
{
    auto *d = static_cast<LogicTcpDevice *>(dev);
    if (d->running.load())
        logictcp_stop(dev);
    if (d->fd >= 0)
        ::close(d->fd);
    delete d;
}

// Synthetic logic loopback: an idle smart-card interface (VCC high, RST
// high, CLK toggling at rate/4, IO mark) — the CI stand-in for a live
// logic analyzer, mirroring the radio loopback.

struct LogicLoopDevice {
    double sample_rate = 10e6;
    int channels = 4;
    std::atomic<bool> running {false};
    std::thread worker;
    int64_t offset = 0;
};

static int logicloop_enumerate(char *out, int out_len)
{
    return snprintf(out, out_len, "logicloop://test");
}

static void *logicloop_open(const char *)
{
    return new LogicLoopDevice();
}

static int logicloop_set(void *dev, int param, double value)
{
    auto *d = static_cast<LogicLoopDevice *>(dev);
    if (param == 100) {
        d->sample_rate = value;
        return 0;
    }
    return -1;
}

static double logicloop_get(void *dev, int param)
{
    auto *d = static_cast<LogicLoopDevice *>(dev);
    switch (param) {
        case 100: return d->sample_rate;
        case 102: return 4;  // PARAM_SAMPLE_TYPE: LOGIC_SAMPLES
        case 120: return d->channels;
    }
    return -1;
}

static int logicloop_start(void *dev, nfclab_stream_cb cb, void *user)
{
    auto *d = static_cast<LogicLoopDevice *>(dev);
    if (d->running.exchange(true))
        return -1;
    d->worker = std::thread([d, cb, user] {
        const int ch = d->channels;
        const int64_t n = 16384;
        std::vector<float> block(n * ch);
        while (d->running.load()) {
            for (int64_t i = 0; i < n; i++) {
                const int64_t t = d->offset + i;
                block[i * ch + 0] = 1.0f;                    // IO mark
                block[i * ch + 1] = (t >> 1) & 1 ? 1.0f : 0.0f;  // CLK
                block[i * ch + 2] = 1.0f;                    // RST
                block[i * ch + 3] = 1.0f;                    // VCC
            }
            cb(block.data(), n * ch, d->offset, user);
            d->offset += n;
        }
    });
    return 0;
}

static int logicloop_stop(void *dev)
{
    auto *d = static_cast<LogicLoopDevice *>(dev);
    if (!d->running.exchange(false))
        return -1;
    if (d->worker.joinable())
        d->worker.join();
    return 0;
}

static void logicloop_close(void *dev)
{
    logicloop_stop(dev);
    delete static_cast<LogicLoopDevice *>(dev);
}

// ----------------------------------------------------------- driver registry

static std::vector<NfclabSdrDriver> &registry()
{
    static std::vector<NfclabSdrDriver> drivers = [] {
        std::vector<NfclabSdrDriver> v = {
            {"loopback", loopback_enumerate, loopback_open, loopback_set,
             loopback_get, loopback_start, loopback_stop, loopback_close},
            {"logictcp", logictcp_enumerate, logictcp_open, logictcp_set,
             logictcp_get, logictcp_start, logictcp_stop, logictcp_close},
            {"logicloop", logicloop_enumerate, logicloop_open, logicloop_set,
             logicloop_get, logicloop_start, logicloop_stop, logicloop_close},
            {"rtltcp", rtltcp_enumerate, rtltcp_open, rtltcp_set,
             rtltcp_get, rtltcp_start, rtltcp_stop, rtltcp_close},
            {"spyserver", spyserver_enumerate, spyserver_open, spyserver_set,
             spyserver_get, spyserver_start, spyserver_stop, spyserver_close},
        };
        // dlopen'd vendor USB drivers (airspy/hydrasdr/rtlsdr/mirisdr) —
        // registered unconditionally; each reports no devices and refuses
        // open when its vendor library is absent (the CI case)
        nfclab_register_usb_drivers(v);
        // dlopen'd libusb logic analyzers (dslogic/sipeed) — same contract
        nfclab_register_usb_logic_drivers(v);
        return v;
    }();
    return drivers;
}

// ------------------------------------------------------------------- C ABI

int nfclab_sdr_driver_count()
{
    return static_cast<int>(registry().size());
}

const char *nfclab_sdr_driver_name(int index)
{
    if (index < 0 || index >= nfclab_sdr_driver_count())
        return nullptr;
    return registry()[index].type_name;
}

static NfclabSdrDriver *find_driver(const char *ident)
{
    for (auto &drv : registry()) {
        const size_t n = strlen(drv.type_name);
        if (strncmp(ident, drv.type_name, n) == 0)
            return &drv;
    }
    return nullptr;
}

int nfclab_sdr_enumerate(char *out, int out_len)
{
    int written = 0;
    for (auto &drv : registry()) {
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
