// USB logic-analyzer capture drivers: DreamSourceLab DSLogic (stream
// mode) and Sipeed SLogic Combo8.
//
// These fill the reference's LogicDevice slots (DSLogicDevice.cpp:247-412
// FX2/FPGA bring-up + continuous bulk stream capture; SipeedLogicDevice.cpp
// open/startAcquisition/interleave) on top of the shared dlopen'd libusb
// surface (usb_api.h).  Where the reference schedules 64 async transfers
// through a libusb event loop, these drivers run one reader thread of
// synchronous bulk transfers — the simpler scheme sustains the modest
// logic-capture rates (tens of MB/s) and delivers the same interleaved
// float probe samples through the native bridge callback (bridge.h), so
// LiveLogicSourceTask / StreamingIsoDecoder consume USB hardware exactly
// like the logictcp network stream.
//
// Wire-protocol constants (vendor requests, FPGA arm header words, sample
// bit packing) are the devices' published hardware protocol, shared with
// the sigrok drivers — they are fixed by the hardware, like a CRC
// polynomial.  Without hardware (CI) each driver enumerates nothing and
// refuses open; the test-suite substitutes a mock libusb via NFCLAB_LIBUSB
// to exercise the full capture path.

#include <unistd.h>

#include <atomic>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <memory>
#include <string>
#include <thread>
#include <vector>

#include "bridge.h"
#include "usb_api.h"

namespace {

// parameter ids (nfclab.hw.device scheme)
enum {
    PARAM_SAMPLE_RATE = 100,
    PARAM_SAMPLE_TYPE = 102,
    PARAM_CHANNEL_COUNT = 120,
    PARAM_VOLTAGE_THRESHOLD = 1104,
};

// ------------------------------------------------------------ shared layer

struct AsyncBulkPump;

struct LogicUsbDevice {
    void *handle = nullptr;     // libusb_device_handle
    int iface = 0;
    int channels = 4;           // probes delivered (interleaved floats)
    double sample_rate = 10e6;
    double vth = 1.4;
    nfclab_stream_cb cb = nullptr;
    void *user = nullptr;
    std::atomic<bool> running {false};
    std::thread worker;
    AsyncBulkPump *pump = nullptr;
    int64_t offset = 0;  // in samples
};

// Reference-parity asynchronous transfer engine (hw::usb Usb.cpp:22-616
// transferHandler): a pool of queued bulk-IN transfers serviced by one
// event thread; each completion delivers its payload (libusb preserves
// per-endpoint submission order) and resubmits itself.  Used whenever the
// bound libusb exports the async surface; the synchronous reader remains
// the fallback (and NFCLAB_USB_SYNC=1 forces it).
struct AsyncBulkPump {
    NfclabUsbApi *api = nullptr;
    std::function<void(const uint8_t *, int)> on_data;
    std::function<void()> on_end;
    std::vector<NfclabUsbTransfer *> transfers;
    std::vector<std::vector<uint8_t>> buffers;
    std::atomic<bool> running {false};
    std::atomic<int> inflight {0};
    bool ended = false;        // event-thread only
    bool error_seen = false;   // event-thread only
    bool device_gone = false;  // event-thread only
    std::thread events;

    static void completion(NfclabUsbTransfer *t)
    {
        auto *p = static_cast<AsyncBulkPump *>(t->user_data);
        const int left = p->inflight.fetch_sub(1,
                                               std::memory_order_relaxed) - 1;
        // TIMED_OUT = idle endpoint, not an error (the sync reader's
        // ERR_TIMEOUT-continue semantics): deliver any partial data and
        // resubmit like a completion
        const bool ok = t->status == NFCLAB_USB_TRANSFER_COMPLETED ||
                        t->status == NFCLAB_USB_TRANSFER_TIMED_OUT;
        if (ok && p->running.load()) {
            if (t->actual_length > 0)
                p->on_data(t->buffer, t->actual_length);
            if (p->api->submit_transfer(t) == 0) {
                p->inflight.fetch_add(1, std::memory_order_relaxed);
                // stop() may have raced between our running check and the
                // resubmit: its cancel pass saw this transfer unsubmitted
                // (a no-op), so cancel it ourselves or events.join() would
                // wait forever on an infinite-timeout transfer
                if (!p->running.load(std::memory_order_relaxed))
                    p->api->cancel_transfer(t);
                return;
            }
            p->error_seen = true;  // resubmit refused
        } else if (ok) {
            // stopping: reaped without resubmission
        } else if (t->status != NFCLAB_USB_TRANSFER_CANCELLED) {
            p->error_seen = true;  // transfer-level error
            if (t->status == NFCLAB_USB_TRANSFER_NO_DEVICE)
                p->device_gone = true;
        }
        if (!p->running.load() || p->ended)
            return;
        // EOF policy: a single failed transfer must not abort a live
        // capture while its 15 siblings are still streaming — the queue
        // drains in order first.  Only an unplugged device ends the stream
        // immediately; otherwise EOF fires when the last transfer retires.
        if (p->device_gone || (p->error_seen && left == 0)) {
            p->ended = true;  // event-thread only: signal EOF once
            p->on_end();
        }
    }

    bool start(NfclabUsbApi &a, void *handle, unsigned char ep,
               std::function<void(const uint8_t *, int)> data_fn,
               std::function<void()> end_fn,
               int n_transfers = 16, int size = 1 << 16)
    {
        api = &a;
        on_data = std::move(data_fn);
        on_end = std::move(end_fn);
        buffers.resize(n_transfers);
        running.store(true);
        for (int i = 0; i < n_transfers; i++) {
            NfclabUsbTransfer *t = a.alloc_transfer(0);
            if (!t)
                break;
            buffers[i].resize(size);
            t->dev_handle = handle;
            t->flags = 0;
            t->endpoint = ep;
            t->type = NFCLAB_USB_TRANSFER_TYPE_BULK;
            // finite timeout: an idle endpoint cycles through TIMED_OUT
            // resubmits (handled above) instead of pinning a transfer
            // forever, which also bounds shutdown latency
            t->timeout = 500;
            t->length = size;
            t->callback = completion;
            t->user_data = this;
            t->buffer = buffers[i].data();
            t->num_iso_packets = 0;
            if (a.submit_transfer(t) != 0) {
                a.free_transfer(t);
                break;
            }
            transfers.push_back(t);
            inflight.fetch_add(1, std::memory_order_relaxed);
        }
        if (transfers.empty()) {
            running.store(false);
            return false;
        }
        events = std::thread([this] {
            while (running.load(std::memory_order_relaxed) ||
                   inflight.load(std::memory_order_relaxed) > 0) {
                struct timeval tv {0, 100000};
                api->handle_events_timeout_completed(api->ctx, &tv, nullptr);
            }
        });
        return true;
    }

    void stop()
    {
        running.store(false);
        for (NfclabUsbTransfer *t : transfers)
            api->cancel_transfer(t);  // benign on already-completed ones
        if (events.joinable())
            events.join();
        for (NfclabUsbTransfer *t : transfers)
            api->free_transfer(t);
        transfers.clear();
    }
};

void pump_stop(LogicUsbDevice *d)
{
    if (d->pump) {
        d->pump->stop();
        delete d->pump;
        d->pump = nullptr;
    }
    if (d->worker.joinable())
        d->worker.join();
}

// enumerate "scheme://bus:addr" for each vid:pid match
int usb_enumerate_matching(uint16_t vid, uint16_t pid, const char *scheme,
                           char *out, int out_len)
{
    NfclabUsbApi &a = nfclab_usb_api();
    if (out_len > 0)
        out[0] = '\0';
    if (!a.handle)
        return 0;
    void **list = nullptr;
    const ssize_t n = a.get_device_list(a.ctx, &list);
    int written = 0;
    for (ssize_t i = 0; i < n; i++) {
        unsigned char desc[64] = {0};
        if (a.get_device_descriptor(list[i], desc) != 0)
            continue;
        const uint16_t dvid = desc[8] | (desc[9] << 8);
        const uint16_t dpid = desc[10] | (desc[11] << 8);
        if (dvid != vid || dpid != pid)
            continue;
        written += snprintf(out + written, out_len - written, "%s%s://%u:%u",
                            written ? "\n" : "", scheme,
                            a.get_bus_number(list[i]),
                            a.get_device_address(list[i]));
        if (written >= out_len - 1)
            break;
    }
    if (list)
        a.free_device_list(list, 1);
    return written;
}

// open the first vid:pid match (or the exact bus:addr if ident carries one)
void *usb_open_matching(uint16_t vid, uint16_t pid, const char *ident)
{
    NfclabUsbApi &a = nfclab_usb_api();
    if (!a.handle)
        return nullptr;
    int want_bus = -1, want_addr = -1;
    if (const char *p = strstr(ident, "://")) {
        if (p[3])
            sscanf(p + 3, "%d:%d", &want_bus, &want_addr);
    }
    void **list = nullptr;
    const ssize_t n = a.get_device_list(a.ctx, &list);
    void *handle = nullptr;
    for (ssize_t i = 0; i < n && !handle; i++) {
        unsigned char desc[64] = {0};
        if (a.get_device_descriptor(list[i], desc) != 0)
            continue;
        const uint16_t dvid = desc[8] | (desc[9] << 8);
        const uint16_t dpid = desc[10] | (desc[11] << 8);
        if (dvid != vid || dpid != pid)
            continue;
        if (want_bus >= 0 && (a.get_bus_number(list[i]) != want_bus
                              || a.get_device_address(list[i]) != want_addr))
            continue;
        if (a.open_(list[i], &handle) != 0)
            handle = nullptr;
    }
    if (list)
        a.free_device_list(list, 1);
    return handle;
}

// expand packed probe bytes (bit i = probe i, LSB first — the dsl_samples /
// sri_samples table semantics) into `ch` interleaved floats per sample
void deliver_packed(LogicUsbDevice *d, const uint8_t *raw, int count)
{
    const int ch = d->channels;
    static thread_local std::vector<float> block;
    if ((int)block.size() < count * ch)
        block.resize(count * ch);
    for (int i = 0; i < count; i++)
        for (int c = 0; c < ch; c++)
            block[i * ch + c] = (raw[i] >> c) & 1 ? 1.0f : 0.0f;
    d->cb(block.data(), static_cast<int64_t>(count) * ch, d->offset, d->user);
    d->offset += count;
}

void deliver_eof(LogicUsbDevice *d)
{
    const float none = 0.0f;
    d->cb(&none, 0, d->offset, d->user);
}

int generic_set(void *vd, int param, double value)
{
    auto *d = static_cast<LogicUsbDevice *>(vd);
    switch (param) {
        case PARAM_SAMPLE_RATE: d->sample_rate = value; return 0;
        case PARAM_VOLTAGE_THRESHOLD: d->vth = value; return 0;
    }
    return -1;
}

double generic_get(void *vd, int param)
{
    auto *d = static_cast<LogicUsbDevice *>(vd);
    switch (param) {
        case PARAM_SAMPLE_RATE: return d->sample_rate;
        case PARAM_SAMPLE_TYPE: return 4;  // LOGIC_SAMPLES
        case PARAM_CHANNEL_COUNT: return d->channels;
        case PARAM_VOLTAGE_THRESHOLD: return d->vth;
    }
    return -1;
}

// ------------------------------------------------------------------ Sipeed
//
// SLogic Combo8 (VID 359f PID 0300, SipeedLogicInternal.h profile): one
// vendor control request starts acquisition ({rate MHz u16, channel count
// u8, 0} on 0xb1), the device then streams one packed byte per sample on
// bulk EP1 IN; 0xb3 stops.

enum {
    SIPEED_VID = 0x359F,
    SIPEED_PID = 0x0300,
    SIPEED_CMD_START = 0xb1,
    SIPEED_CMD_STOP = 0xb3,
    SIPEED_EP_IN = 0x81,
    SIPEED_TOTAL_CHANNELS = 8,
};

int sipeed_enumerate(char *out, int out_len)
{
    return usb_enumerate_matching(SIPEED_VID, SIPEED_PID, "sipeed", out,
                                  out_len);
}

void *sipeed_open(const char *ident)
{
    NfclabUsbApi &a = nfclab_usb_api();
    void *handle = usb_open_matching(SIPEED_VID, SIPEED_PID, ident);
    if (!handle)
        return nullptr;
    if (a.claim_interface(handle, 0) != 0) {
        a.close_(handle);
        return nullptr;
    }
    auto *d = new LogicUsbDevice();
    d->handle = handle;
    d->channels = 4;          // validChannels (SipeedLogicDevice initChannels)
    d->sample_rate = 10e6;
    return d;
}

int sipeed_start(void *vd, nfclab_stream_cb cb, void *user)
{
    auto *d = static_cast<LogicUsbDevice *>(vd);
    NfclabUsbApi &a = nfclab_usb_api();
    if (d->running.exchange(true))
        return -1;
    d->cb = cb;
    d->user = user;
    // the device granularity is integer MHz; round and store the effective
    // rate back so get(PARAM_SAMPLE_RATE) reports what the hardware runs
    // (sub-MHz rates would otherwise send 0 and skew frame timestamps)
    unsigned rate_mhz = (unsigned)(d->sample_rate / 1e6 + 0.5);
    if (rate_mhz == 0)
        rate_mhz = 1;
    d->sample_rate = rate_mhz * 1e6;

    uint8_t start[4] = {(uint8_t)(rate_mhz & 0xff), (uint8_t)(rate_mhz >> 8),
                        SIPEED_TOTAL_CHANNELS, 0};
    if (a.control_transfer(d->handle,
                           NFCLAB_USB_DIR_OUT | NFCLAB_USB_TYPE_VENDOR,
                           SIPEED_CMD_START, 0, 0, start, sizeof start,
                           3000) < 0) {
        d->running.store(false);
        return -1;
    }
    if (a.async_ok()) {
        // reference-parity async engine: 16 queued 128 KB bulk transfers
        d->pump = new AsyncBulkPump();
        if (d->pump->start(
                a, d->handle, SIPEED_EP_IN,
                [d](const uint8_t *raw, int n) { deliver_packed(d, raw, n); },
                [d] { if (d->running.load()) deliver_eof(d); },
                16, 256 * 512)) {
            return 0;
        }
        delete d->pump;
        d->pump = nullptr;  // fall back to the synchronous reader
    }
    d->worker = std::thread([d, &a] {
        std::vector<uint8_t> raw(256 * 512);  // 256 high-speed EP packets
        while (d->running.load()) {
            int actual = 0;
            const int rc = a.bulk_transfer(d->handle, SIPEED_EP_IN,
                                           raw.data(), (int)raw.size(),
                                           &actual, 500);
            if (actual > 0 && (rc == 0 || rc == NFCLAB_USB_ERROR_TIMEOUT)) {
                deliver_packed(d, raw.data(), actual);
                continue;
            }
            if (rc == NFCLAB_USB_ERROR_TIMEOUT)
                continue;  // idle; poll the running flag
            if (d->running.load())
                deliver_eof(d);  // device gone / fatal error
            break;
        }
    });
    return 0;
}

int sipeed_stop(void *vd)
{
    auto *d = static_cast<LogicUsbDevice *>(vd);
    NfclabUsbApi &a = nfclab_usb_api();
    if (!d->running.exchange(false))
        return -1;
    a.control_transfer(d->handle, NFCLAB_USB_DIR_OUT | NFCLAB_USB_TYPE_VENDOR,
                       SIPEED_CMD_STOP, 0, 0, nullptr, 0, 3000);
    pump_stop(d);
    return 0;
}

void sipeed_close(void *vd)
{
    auto *d = static_cast<LogicUsbDevice *>(vd);
    NfclabUsbApi &a = nfclab_usb_api();
    if (d->running.load())
        sipeed_stop(vd);
    if (d->handle) {
        a.release_interface(d->handle, d->iface);
        a.close_(d->handle);
    }
    delete d;
}

// ----------------------------------------------------------------- DSLogic
//
// DSLogic Plus (VID 2a0e PID 0030).  Control plane: vendor request 0xb0
// writes {dest u8, offset u16, size u8}+payload, 0xb1/0xb2 pre+read the
// same header shape (DSLogicDevice.cpp usbWrite/usbRead).  Bring-up reads
// the FX2 firmware version and HW status, uploads the FPGA bitstream over
// bulk EP2 when the FPGA is not yet configured (PROG_B pulse + INTRDY
// framing), programs the comparator threshold over I2C, arms the FPGA with
// the dsl_setting header block (stream mode, divider from the 100 MHz base
// clock), then starts acquisition; sample data arrives on bulk EP6 packed
// as 8-byte-per-channel groups of 64 samples (the transpose() layout).

enum {
    DSL_VID = 0x2A0E,
    DSL_PID = 0x0030,
    DSL_CMD_CTL_WR = 0xb0,
    DSL_CMD_CTL_RD_PRE = 0xb1,
    DSL_CMD_CTL_RD = 0xb2,
    DSL_EP_OUT = 0x02,
    DSL_EP_IN = 0x86,

    DSL_CTL_FW_VERSION = 0,
    DSL_CTL_HW_STATUS = 2,
    DSL_CTL_PROG_B = 3,
    DSL_CTL_LED = 5,
    DSL_CTL_INTRDY = 6,
    DSL_CTL_WORDWIDE = 7,
    DSL_CTL_START = 8,
    DSL_CTL_STOP = 9,
    DSL_CTL_BULK_WR = 10,
    DSL_CTL_I2C_REG = 14,
    DSL_CTL_I2C_STATUS = 15,

    DSL_VTH_ADDR = 0x78,
    DSL_HDL_VERSION_ADDR = 0x04,

    DSL_bmGPIF_DONE = 1 << 7,
    DSL_bmFPGA_DONE = 1 << 6,
    DSL_bmSYS_CLR = 1 << 3,
    DSL_bmWR_PROG_B = 1 << 2,
    DSL_bmWR_INTRDY = 1 << 7,
    DSL_bmWR_WORDWIDE = 1 << 0,
    DSL_bmLED_GREEN = 1 << 0,
    DSL_bmLED_RED = 1 << 1,

    DSL_STREAM_MODE_BIT = 12,
    DSL_NUM_TRIGGER_STAGES = 16,
    DSL_BASE_CLOCK_HZ = 100000000,  // stream-mode hardware base clock
};

#pragma pack(push, 1)
struct DslHeader {       // usb_header (DSLogicInternal.h:279)
    uint8_t dest;
    uint16_t offset;
    uint8_t size;
};

struct DslSetting {      // dsl_setting (DSLogicInternal.h:385)
    uint32_t sync;
    uint16_t mode_header, mode;
    uint16_t divider_header, div_l, div_h;
    uint16_t count_header, cnt_l, cnt_h;
    uint16_t trig_pos_header, tpos_l, tpos_h;
    uint16_t trig_glb_header, trig_glb;
    uint16_t dso_count_header, dso_cnt_l, dso_cnt_h;
    uint16_t ch_en_header, ch_en_l, ch_en_h;
    uint16_t fgain_header, fgain;
    uint16_t trig_header;
    uint16_t trig_mask0[DSL_NUM_TRIGGER_STAGES];
    uint16_t trig_mask1[DSL_NUM_TRIGGER_STAGES];
    uint16_t trig_value0[DSL_NUM_TRIGGER_STAGES];
    uint16_t trig_value1[DSL_NUM_TRIGGER_STAGES];
    uint16_t trig_edge0[DSL_NUM_TRIGGER_STAGES];
    uint16_t trig_edge1[DSL_NUM_TRIGGER_STAGES];
    uint16_t trig_logic0[DSL_NUM_TRIGGER_STAGES];
    uint16_t trig_logic1[DSL_NUM_TRIGGER_STAGES];
    uint32_t trig_count[DSL_NUM_TRIGGER_STAGES];
    uint32_t end_sync;
};
#pragma pack(pop)

bool dsl_write(LogicUsbDevice *d, uint8_t dest, uint16_t offset,
               const uint8_t *data, uint8_t size)
{
    NfclabUsbApi &a = nfclab_usb_api();
    uint8_t buf[sizeof(DslHeader) + 60];
    DslHeader hdr {dest, offset, size};
    memcpy(buf, &hdr, sizeof hdr);
    if (size)
        memcpy(buf + sizeof hdr, data, size);
    return a.control_transfer(d->handle,
                              NFCLAB_USB_DIR_OUT | NFCLAB_USB_TYPE_VENDOR,
                              DSL_CMD_CTL_WR, 0, 0, buf,
                              sizeof(DslHeader) + size, 3000) >= 0;
}

bool dsl_write1(LogicUsbDevice *d, uint8_t dest, uint8_t value)
{
    return dsl_write(d, dest, 0, &value, 1);
}

bool dsl_read(LogicUsbDevice *d, uint8_t dest, uint16_t offset, uint8_t *rx,
              uint8_t size)
{
    NfclabUsbApi &a = nfclab_usb_api();
    DslHeader hdr {dest, offset, size};
    if (a.control_transfer(d->handle,
                           NFCLAB_USB_DIR_OUT | NFCLAB_USB_TYPE_VENDOR,
                           DSL_CMD_CTL_RD_PRE, 0, 0,
                           reinterpret_cast<uint8_t *>(&hdr), sizeof hdr,
                           3000) < 0)
        return false;
    usleep(10 * 1000);  // ctrlTransfer's inter-stage wait (Usb.cpp:271)
    return a.control_transfer(d->handle,
                              NFCLAB_USB_DIR_IN | NFCLAB_USB_TYPE_VENDOR,
                              DSL_CMD_CTL_RD, 0, 0, rx, size, 3000) >= 0;
}

bool dsl_wait_status(LogicUsbDevice *d, uint8_t bit)
{
    for (int i = 0; i < 100; i++) {
        uint8_t status = 0;
        if (!dsl_read(d, DSL_CTL_HW_STATUS, 0, &status, 1))
            return false;
        if (status & bit)
            return true;
        usleep(10 * 1000);
    }
    return false;
}

bool dsl_fpga_upload(LogicUsbDevice *d, const char *path)
{
    NfclabUsbApi &a = nfclab_usb_api();
    FILE *f = fopen(path, "rb");
    if (!f)
        return false;
    bool ok = dsl_write1(d, DSL_CTL_PROG_B, (uint8_t)~DSL_bmWR_PROG_B)
        && dsl_write1(d, DSL_CTL_LED,
                      (uint8_t)(~DSL_bmLED_GREEN & ~DSL_bmLED_RED))
        && dsl_write1(d, DSL_CTL_PROG_B, DSL_bmWR_PROG_B)
        && dsl_write1(d, DSL_CTL_INTRDY, (uint8_t)~DSL_bmWR_INTRDY);
    std::vector<uint8_t> chunk(16384);
    while (ok) {
        const size_t n = fread(chunk.data(), 1, chunk.size(), f);
        if (n == 0)
            break;
        int actual = 0;
        ok = a.bulk_transfer(d->handle, DSL_EP_OUT, chunk.data(), (int)n,
                             &actual, 5000) == 0 && actual == (int)n;
    }
    fclose(f);
    ok = ok && dsl_write1(d, DSL_CTL_INTRDY, DSL_bmWR_INTRDY)
        && dsl_wait_status(d, DSL_bmFPGA_DONE)
        && dsl_write1(d, DSL_CTL_LED, DSL_bmLED_GREEN)
        && dsl_write1(d, DSL_CTL_WORDWIDE, DSL_bmWR_WORDWIDE);
    return ok;
}

void dslogic_close_impl(LogicUsbDevice *d);

bool dsl_set_vth(LogicUsbDevice *d)
{
    // DSLogic Plus comparator scale (DSLogicDevice.cpp:385 non-MAX25 branch)
    const uint8_t val = (uint8_t)(d->vth / 3.3 * (1.5 / 2.5) * 255);
    return dsl_write(d, DSL_CTL_I2C_REG, DSL_VTH_ADDR, &val, 1);
}

int dslogic_enumerate(char *out, int out_len)
{
    return usb_enumerate_matching(DSL_VID, DSL_PID, "dslogic", out, out_len);
}

void *dslogic_open(const char *ident)
{
    NfclabUsbApi &a = nfclab_usb_api();
    void *handle = usb_open_matching(DSL_VID, DSL_PID, ident);
    if (!handle)
        return nullptr;
    a.set_configuration(handle, 1);
    if (a.claim_interface(handle, 0) != 0) {
        a.close_(handle);
        return nullptr;
    }
    auto *d = new LogicUsbDevice();
    d->handle = handle;
    d->channels = 4;
    d->sample_rate = 10e6;
    d->vth = 1.0;  // reference default (DSLogicDevice.cpp:1173)

    uint8_t fw[2] = {0, 0};
    uint8_t status = 0;
    if (!dsl_read(d, DSL_CTL_FW_VERSION, 0, fw, 2)
        || !dsl_read(d, DSL_CTL_HW_STATUS, 0, &status, 1)) {
        dslogic_close_impl(d);
        return nullptr;
    }
    if (!(status & DSL_bmFPGA_DONE)) {
        const char *fw_path = getenv("NFCLAB_DSLOGIC_FIRMWARE");
        if (!fw_path || !dsl_fpga_upload(d, fw_path)) {
            dslogic_close_impl(d);
            return nullptr;
        }
    }
    uint8_t hdl = 0;
    dsl_read(d, DSL_CTL_I2C_STATUS, DSL_HDL_VERSION_ADDR, &hdl, 1);
    dsl_set_vth(d);
    return d;
}

int dslogic_set(void *vd, int param, double value)
{
    const int rc = generic_set(vd, param, value);
    if (rc == 0 && param == PARAM_VOLTAGE_THRESHOLD)
        dsl_set_vth(static_cast<LogicUsbDevice *>(vd));
    return rc;
}

// decode one stream chunk (channels*8 bytes): 8 consecutive bytes per
// channel, each byte 8 samples LSB-first -> 64 interleaved samples
void dsl_deliver_chunks(LogicUsbDevice *d, const uint8_t *raw, int count,
                        std::vector<uint8_t> &carry)
{
    const int ch = d->channels;
    const int chunk = ch * 8;
    static thread_local std::vector<float> block;
    static thread_local std::vector<uint8_t> buf;
    buf.clear();
    if (!carry.empty()) {
        buf.insert(buf.end(), carry.begin(), carry.end());
        carry.clear();
    }
    buf.insert(buf.end(), raw, raw + count);
    const int whole = (int)(buf.size() / chunk);
    const int rem = (int)(buf.size() % chunk);
    if (whole) {
        const int samples = whole * 64;
        if ((int)block.size() < samples * ch)
            block.resize(samples * ch);
        for (int k = 0; k < whole; k++) {
            const uint8_t *src = buf.data() + k * chunk;
            float *dst = block.data() + k * 64 * ch;
            for (int c = 0; c < ch; c++)
                for (int i = 0; i < 8; i++) {
                    const uint8_t b = src[c * 8 + i];
                    for (int r = 0; r < 8; r++)
                        dst[(8 * i + r) * ch + c] = (b >> r) & 1 ? 1.f : 0.f;
                }
        }
        d->cb(block.data(), (int64_t)samples * ch, d->offset, d->user);
        d->offset += samples;
    }
    if (rem)
        carry.assign(buf.end() - rem, buf.end());
}

int dslogic_start(void *vd, nfclab_stream_cb cb, void *user)
{
    auto *d = static_cast<LogicUsbDevice *>(vd);
    NfclabUsbApi &a = nfclab_usb_api();
    if (d->running.exchange(true))
        return -1;
    d->cb = cb;
    d->user = user;

    // arm the FPGA: stream mode, zeroed triggers, probes 0..3 enabled
    DslSetting s;
    memset(&s, 0, sizeof s);
    s.sync = 0xf5a5f5a5;
    s.mode_header = 0x0001;
    s.mode = 1 << DSL_STREAM_MODE_BIT;
    s.divider_header = 0x0102;
    const uint32_t div =
        (uint32_t)ceil(DSL_BASE_CLOCK_HZ / d->sample_rate);
    s.div_l = div & 0xffff;
    s.div_h = div >> 16;
    s.count_header = 0x0302;
    const uint64_t limit = (uint64_t)(d->sample_rate * 3);  // stream default
    s.cnt_l = (limit >> 4) & 0xffff;    // hw unit: 16 logic samples
    s.cnt_h = (uint16_t)(limit >> 20);
    s.trig_pos_header = 0x0502;
    s.trig_glb_header = 0x0701;
    s.trig_glb = (d->channels & 0x1f) << 8;
    s.dso_count_header = 0x0802;
    s.ch_en_header = 0x0a02;
    s.ch_en_l = (1 << d->channels) - 1;
    s.fgain_header = 0x0c01;
    s.trig_header = 0x40a0;
    s.end_sync = 0xfa5afa5a;

    const uint32_t arm_words = sizeof(DslSetting) / sizeof(uint16_t);
    const uint8_t arm_cmd[3] = {(uint8_t)arm_words, (uint8_t)(arm_words >> 8),
                                (uint8_t)(arm_words >> 16)};
    int actual = 0;
    bool ok = dsl_write1(d, DSL_CTL_WORDWIDE, DSL_bmWR_WORDWIDE)
        && dsl_write(d, DSL_CTL_BULK_WR, 0, arm_cmd, 3)
        && dsl_wait_status(d, DSL_bmSYS_CLR)
        && a.bulk_transfer(d->handle, DSL_EP_OUT,
                           reinterpret_cast<uint8_t *>(&s), sizeof s,
                           &actual, 1000) == 0
        && actual == (int)sizeof s
        && dsl_write1(d, DSL_CTL_INTRDY, DSL_bmWR_INTRDY)
        && dsl_wait_status(d, DSL_bmGPIF_DONE)
        && dsl_write(d, DSL_CTL_START, 0, nullptr, 0);
    if (!ok) {
        d->running.store(false);
        return -1;
    }
    if (a.async_ok()) {
        // async engine with the stream-chunk carry held by the callbacks
        auto carry = std::make_shared<std::vector<uint8_t>>();
        d->pump = new AsyncBulkPump();
        if (d->pump->start(
                a, d->handle, DSL_EP_IN,
                [d, carry](const uint8_t *raw, int n) {
                    dsl_deliver_chunks(d, raw, n, *carry);
                },
                [d] { if (d->running.load()) deliver_eof(d); },
                16, 1 << 16)) {
            return 0;
        }
        delete d->pump;
        d->pump = nullptr;  // fall back to the synchronous reader
    }
    d->worker = std::thread([d, &a] {
        std::vector<uint8_t> raw(1 << 16);  // CHANNEL_BUFFER_SIZE
        std::vector<uint8_t> carry;
        while (d->running.load()) {
            int got = 0;
            const int rc = a.bulk_transfer(d->handle, DSL_EP_IN, raw.data(),
                                           (int)raw.size(), &got, 500);
            if (got > 0 && (rc == 0 || rc == NFCLAB_USB_ERROR_TIMEOUT)) {
                dsl_deliver_chunks(d, raw.data(), got, carry);
                continue;
            }
            if (rc == NFCLAB_USB_ERROR_TIMEOUT)
                continue;
            if (d->running.load())
                deliver_eof(d);
            break;
        }
    });
    return 0;
}

int dslogic_stop(void *vd)
{
    auto *d = static_cast<LogicUsbDevice *>(vd);
    if (!d->running.exchange(false))
        return -1;
    dsl_write(d, DSL_CTL_STOP, 0, nullptr, 0);
    pump_stop(d);
    return 0;
}

void dslogic_close_impl(LogicUsbDevice *d)
{
    NfclabUsbApi &a = nfclab_usb_api();
    if (d->running.load())
        dslogic_stop(d);
    if (d->handle) {
        a.release_interface(d->handle, d->iface);
        a.close_(d->handle);
    }
    delete d;
}

void dslogic_close(void *vd)
{
    dslogic_close_impl(static_cast<LogicUsbDevice *>(vd));
}

}  // namespace

void nfclab_register_usb_logic_drivers(std::vector<NfclabSdrDriver> &out)
{
    out.push_back({"dslogic", dslogic_enumerate, dslogic_open, dslogic_set,
                   generic_get, dslogic_start, dslogic_stop, dslogic_close});
    out.push_back({"sipeed", sipeed_enumerate, sipeed_open, generic_set,
                   generic_get, sipeed_start, sipeed_stop, sipeed_close});
}
